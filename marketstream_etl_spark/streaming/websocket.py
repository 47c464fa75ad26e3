"""RFC 6455 WebSocket protocol (pure stdlib) + the tick-feed query on it.

The reference speaks real WebSocket for its tick feed — server
(/root/reference/src/feed/TickServer.hpp:144-265) and client
(/root/reference/src/feed/TickClient.hpp:126-246): HTTP upgrade
handshake, text frames, CLOSE exchange.  Earlier rounds stood in a plain
TCP line emitter; this module closes the protocol gap with a from-scratch
RFC 6455 implementation:

- handshake: Sec-WebSocket-Key → SHA1(key + GUID) → base64 accept token
  (RFC 6455 §4.2.2; the RFC's own test vector is pinned in
  tests/test_websocket.py);
- framing: FIN/opcode byte, 7-bit / 16-bit / 64-bit payload lengths,
  client-to-server masking with the 4-byte XOR key (§5.2-§5.3);
- CLOSE: status-code frame from the server, masked echo from the client
  (§5.5.1), then TCP teardown.

Spark's socket source speaks raw lines, not WS — exactly like the
reference's DB loader needs a driver, the WS bytes need a client.  So the
ingest chain mirrors the reference's architecture 1:1:

    WSTickServer (RFC 6455 server, = TickServer.hpp)
        │  real WS frames over localhost TCP
    ws client bridge (RFC 6455 client, = TickClient.hpp)
        │  decoded text payloads, one JSON line each
    Spark socket source → from_json → dead-letter split

The bridge IS the TickClient role: it performs the handshake, validates
the accept token, decodes/unmasks frames, answers CLOSE — and hands the
decoded messages to the engine, which is what the reference's client does
with its parsed ticks.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket as socketlib
import struct
import threading

from pyspark.sql import DataFrame, SparkSession

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def ws_accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept for a client's Sec-WebSocket-Key (§4.2.2)."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def encode_frame(
    payload: bytes,
    opcode: int = OP_TEXT,
    mask: bytes | None = None,
    fin: bool = True,
) -> bytes:
    """One WebSocket frame (§5.2).  `mask` of 4 bytes → masked (client→
    server direction); None → unmasked (server→client)."""
    head = bytearray()
    head.append((0x80 if fin else 0x00) | (opcode & 0x0F))
    mask_bit = 0x80 if mask is not None else 0x00
    n = len(payload)
    if n < 126:
        head.append(mask_bit | n)
    elif n <= 0xFFFF:
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask is not None:
        if len(mask) != 4:
            raise ValueError("mask must be exactly 4 bytes")
        head += mask
        payload = bytes(
            b ^ mask[i % 4] for i, b in enumerate(payload)
        )
    return bytes(head) + payload


MAX_FRAME_BYTES = 16 << 20  # sanity bound on the declared payload length


def decode_frame(
    buf: bytes, max_frame_bytes: int = MAX_FRAME_BYTES
) -> tuple[int, bool, bytes, int] | None:
    """Parse ONE frame from the head of `buf`.

    Returns (opcode, fin, unmasked_payload, total_bytes_consumed), or
    None if the buffer does not yet hold a complete frame (streaming
    parser contract: append more bytes and retry).  A declared length
    beyond `max_frame_bytes` raises ValueError — one flipped bit in the
    64-bit extended-length field must fail loudly, not make the reader
    buffer 2^56 bytes waiting for a frame that never completes."""
    if len(buf) < 2:
        return None
    b0, b1 = buf[0], buf[1]
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    pos = 2
    if n == 126:
        if len(buf) < pos + 2:
            return None
        (n,) = struct.unpack(">H", buf[pos : pos + 2])
        pos += 2
    elif n == 127:
        if len(buf) < pos + 8:
            return None
        (n,) = struct.unpack(">Q", buf[pos : pos + 8])
        pos += 8
    if n > max_frame_bytes:
        raise ValueError(
            f"WebSocket frame declares {n} payload bytes "
            f"(> {max_frame_bytes} sanity bound) — corrupt length header"
        )
    mask = b""
    if masked:
        if len(buf) < pos + 4:
            return None
        mask = buf[pos : pos + 4]
        pos += 4
    if len(buf) < pos + n:
        return None
    payload = buf[pos : pos + n]
    if masked:
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return opcode, fin, payload, pos + n


def close_payload(code: int = 1000, reason: str = "") -> bytes:
    """CLOSE frame body: 2-byte status code + optional UTF-8 reason."""
    return struct.pack(">H", code) + reason.encode("utf-8")


def _read_http_head(conn: socketlib.socket) -> bytes:
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = conn.recv(4096)
        if not chunk:
            raise ConnectionError("peer closed during HTTP handshake")
        data += chunk
    return data


def _header(head: bytes, name: str) -> str:
    for line in head.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            if k.strip().lower() == name.lower().encode():
                return v.strip().decode("latin-1")
    raise ValueError(f"missing header {name}")


class WSTickServer:
    """RFC 6455 server for one client: upgrade handshake, one text frame
    per payload string, server-initiated CLOSE, masked-CLOSE echo wait.
    Plays the reference's TickServer (TickServer.hpp:144-265)."""

    def __init__(self, payloads: list[str]):
        self._payloads = payloads
        self._sock = socketlib.socket(
            socketlib.AF_INET, socketlib.SOCK_STREAM
        )
        self._sock.setsockopt(
            socketlib.SOL_SOCKET, socketlib.SO_REUSEADDR, 1
        )
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(1)
        self.port = self._sock.getsockname()[1]
        self.closed_clean = threading.Event()

    def serve_forever_once(self) -> None:
        conn, _ = self._sock.accept()
        try:
            head = _read_http_head(conn)
            req_line = head.split(b"\r\n", 1)[0]
            if not req_line.startswith(b"GET "):
                raise ValueError("not an HTTP GET upgrade request")
            if _header(head, "Upgrade").lower() != "websocket":
                raise ValueError("missing Upgrade: websocket")
            key = _header(head, "Sec-WebSocket-Key")
            conn.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\n"
                    "Connection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {ws_accept_key(key)}\r\n"
                    "\r\n"
                ).encode("ascii")
            )
            # chunked writes: one sendall per 1000 frames, not per frame —
            # the decode side is a streaming parser, so frame boundaries
            # need not align with writes (same batching rationale as the
            # plain-TCP twin's line emitter)
            for i in range(0, len(self._payloads), 1000):
                conn.sendall(
                    b"".join(
                        encode_frame(p.encode("utf-8"))
                        for p in self._payloads[i : i + 1000]
                    )
                )
            conn.sendall(encode_frame(close_payload(1000), opcode=OP_CLOSE))
            # await the client's (masked) CLOSE echo — §5.5.1
            buf = b""
            while True:
                got = decode_frame(buf)
                if got is not None:
                    opcode, _, payload, used = got
                    buf = buf[used:]
                    if opcode == OP_CLOSE:
                        # an empty close body is legal (§5.5.1: the status
                        # code is optional) and counts as a clean close
                        code = (
                            struct.unpack(">H", payload[:2])[0]
                            if len(payload) >= 2
                            else 1000
                        )
                        if code == 1000:
                            self.closed_clean.set()
                        break
                    continue
                chunk = conn.recv(4096)
                if not chunk:
                    break
                buf += chunk
        finally:
            conn.close()
            self._sock.close()


def ws_client_frames(host: str, port: int):
    """RFC 6455 client: handshake (validates the accept token), then an
    iterator of decoded TEXT payload strings; answers the server CLOSE
    with a masked echo.  Plays the reference's TickClient
    (TickClient.hpp:126-246)."""
    conn = socketlib.create_connection((host, port), timeout=60)
    try:
        key = base64.b64encode(os.urandom(16)).decode("ascii")
        conn.sendall(
            (
                f"GET /ticks HTTP/1.1\r\n"
                f"Host: {host}:{port}\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n"
                "\r\n"
            ).encode("ascii")
        )
        head = _read_http_head(conn)
        status = head.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise ConnectionError(f"upgrade refused: {status!r}")
        if _header(head, "Sec-WebSocket-Accept") != ws_accept_key(key):
            raise ConnectionError("Sec-WebSocket-Accept mismatch")
        buf = head.split(b"\r\n\r\n", 1)[1]
        text_parts: list[bytes] = []
        while True:
            got = decode_frame(buf)
            if got is None:
                chunk = conn.recv(65536)
                if not chunk:
                    return
                buf += chunk
                continue
            opcode, fin, payload, used = got
            buf = buf[used:]
            if opcode == OP_CLOSE:
                # masked echo, then done (§5.5.1: client frames are masked)
                conn.sendall(
                    encode_frame(
                        payload[:2], opcode=OP_CLOSE, mask=os.urandom(4)
                    )
                )
                return
            if opcode == OP_PING:
                conn.sendall(
                    encode_frame(payload, opcode=OP_PONG, mask=os.urandom(4))
                )
                continue
            if opcode in (OP_TEXT, OP_CONT):
                text_parts.append(payload)
                if fin:
                    yield b"".join(text_parts).decode("utf-8")
                    text_parts = []
    finally:
        conn.close()


def websocket_stream_deadletter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """S4/S5 over REAL RFC 6455: WSTickServer emits each wire frame as a
    WebSocket text frame; the ws client bridge performs the handshake,
    decodes/unmasks, answers CLOSE, and relays the decoded payloads as
    lines to Spark's socket source — handshake, framing, and CLOSE are
    all genuinely exercised on every run (the server asserts a clean
    masked CLOSE echo before the query returns).  Downstream is the
    shared dead-letter tail, so the same batch oracle applies."""
    from marketstream_etl_spark.streaming.ticks import (
        build_deadletter_payload,
        drain_deadletter_socket,
    )

    payload = build_deadletter_payload(
        spark, sf_dir, "websocket_stream_deadletter"
    )
    n_expected = len(payload)

    ws = WSTickServer(payload)
    threading.Thread(target=ws.serve_forever_once, daemon=True).start()

    # bridge: WS client → plain line socket for Spark's socket source
    bridge = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_STREAM)
    bridge.setsockopt(socketlib.SOL_SOCKET, socketlib.SO_REUSEADDR, 1)
    bridge.bind(("127.0.0.1", 0))
    bridge.listen(1)
    bridge_port = bridge.getsockname()[1]
    done = threading.Event()

    feed_error: list = []

    def run_bridge() -> None:
        conn, _ = bridge.accept()
        try:
            from marketstream_etl_spark.streaming.ticks import (
                send_lines_chunked,
            )

            batch: list[str] = []
            for msg in ws_client_frames("127.0.0.1", ws.port):
                batch.append(msg)
                if len(batch) >= 1000:
                    send_lines_chunked(conn, batch)
                    batch = []
            if batch:
                send_lines_chunked(conn, batch)
            done.wait(timeout=120)
        except Exception as e:  # noqa: BLE001 — surface to the drain loop
            # the drain poll aborts with THIS as the root cause instead of
            # stalling out its deadline on a bogus count mismatch
            feed_error.append(e)
        finally:
            conn.close()
            bridge.close()

    threading.Thread(target=run_bridge, daemon=True).start()

    out = drain_deadletter_socket(
        spark,
        bridge_port,
        n_expected,
        done,
        "stream_websocket",
        sf_dir,
        feed_error=feed_error,
    )
    if not ws.closed_clean.wait(timeout=30):
        raise RuntimeError(
            "websocket_stream_deadletter: server never received the "
            "client's clean (1000) CLOSE echo — the RFC 6455 teardown "
            "contract was not exercised"
        )
    return out
