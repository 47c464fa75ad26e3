"""RFC 6455 protocol unit tests: the RFC's own handshake vector, frame
round-trips across all three length encodings, masking, the streaming
(partial-buffer) parser contract, and a full server↔client session over
localhost including the CLOSE exchange — no Spark needed until the final
ingest test, which runs the whole WS → bridge → socket-source chain.
"""

from __future__ import annotations

import threading

from marketstream_etl_spark.streaming.websocket import (
    OP_CLOSE,
    OP_TEXT,
    WSTickServer,
    close_payload,
    decode_frame,
    encode_frame,
    ws_accept_key,
    ws_client_frames,
)


def test_rfc6455_handshake_vector():
    # the exact example from RFC 6455 §1.3 / §4.2.2
    assert (
        ws_accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


def test_frame_roundtrip_all_length_encodings():
    for n in (0, 1, 125, 126, 65535, 65536, 70_000):
        payload = bytes(i % 251 for i in range(n))
        frame = encode_frame(payload)
        got = decode_frame(frame)
        assert got is not None
        opcode, fin, out, used = got
        assert (opcode, fin, out, used) == (OP_TEXT, True, payload, len(frame))


def test_masked_frame_roundtrip():
    payload = b"masked tick {\"p\": 1.5}"
    frame = encode_frame(payload, mask=b"\x01\x02\x03\x04")
    # wire bytes must differ from the raw payload (really masked)
    assert payload not in frame
    opcode, fin, out, used = decode_frame(frame)
    assert out == payload and used == len(frame)


def test_streaming_parser_handles_partial_buffers():
    payload = b"x" * 300  # 16-bit length path + split delivery
    frame = encode_frame(payload)
    for cut in (1, 2, 3, 5, len(frame) - 1):
        assert decode_frame(frame[:cut]) is None  # incomplete → wait
    # two frames back-to-back parse sequentially
    double = frame + encode_frame(b"tail")
    op1, _, out1, used = decode_frame(double)
    assert out1 == payload
    op2, _, out2, used2 = decode_frame(double[used:])
    assert out2 == b"tail" and used + used2 == len(double)


def test_close_payload_status_code():
    body = close_payload(1000, "bye")
    frame = encode_frame(body, opcode=OP_CLOSE)
    opcode, _, out, _ = decode_frame(frame)
    assert opcode == OP_CLOSE
    assert out[:2] == b"\x03\xe8" and out[2:] == b"bye"  # 1000 big-endian


def test_full_session_handshake_frames_close():
    msgs = [f'{{"tick": {i}}}' for i in range(2500)]  # spans >1 sendall
    server = WSTickServer(msgs)
    t = threading.Thread(target=server.serve_forever_once, daemon=True)
    t.start()
    received = list(ws_client_frames("127.0.0.1", server.port))
    t.join(timeout=30)
    assert received == msgs
    # the server must have seen the client's clean masked CLOSE echo
    assert server.closed_clean.is_set()


def test_websocket_ingest_end_to_end(spark, sf_dir):
    """Full chain: RFC 6455 server → WS client bridge → Spark socket
    source → dead-letter split.  Counts must match the deterministic
    corruption contract (every 50th frame truncated)."""
    from marketstream_etl_spark.streaming.websocket import (
        websocket_stream_deadletter,
    )

    rows = {r["parse_error"]: r for r in
            websocket_stream_deadletter(spark, sf_dir).collect()}
    assert set(rows) == {True, False}
    total = sum(r["n_frames"] for r in rows.values())
    assert rows[True]["n_frames"] > 0
    assert rows[False]["n_frames"] > 0
    assert total == rows[True]["n_frames"] + rows[False]["n_frames"]


def test_decode_frame_rejects_corrupt_length():
    import pytest as _pytest

    from marketstream_etl_spark.streaming.websocket import MAX_FRAME_BYTES

    # craft a 64-bit-length header declaring 2^56 bytes
    import struct as _struct

    corrupt = bytes([0x81, 127]) + _struct.pack(">Q", 1 << 56)
    with _pytest.raises(ValueError, match="corrupt length"):
        decode_frame(corrupt)
    # the bound is a parameter: a tiny bound rejects a legal large frame
    legal = encode_frame(b"x" * 1000)
    with _pytest.raises(ValueError):
        decode_frame(legal, max_frame_bytes=10)
    assert MAX_FRAME_BYTES >= 1 << 20


def test_server_accepts_empty_close_echo():
    """RFC 6455 §5.5.1: the CLOSE body (status code) is OPTIONAL — a bare
    CLOSE echo must still count as a clean teardown."""
    import base64 as _b64
    import os as _os
    import socket as _socket
    import threading as _threading

    from marketstream_etl_spark.streaming.websocket import (
        OP_TEXT as _T,
        ws_accept_key as _wak,
    )

    server = WSTickServer(["one", "two"])
    t = _threading.Thread(target=server.serve_forever_once, daemon=True)
    t.start()
    conn = _socket.create_connection(("127.0.0.1", server.port), timeout=30)
    key = _b64.b64encode(_os.urandom(16)).decode()
    conn.sendall(
        (
            f"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n\r\n"
        ).encode()
    )
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += conn.recv(4096)
    assert _wak(key).encode() in buf
    buf = buf.split(b"\r\n\r\n", 1)[1]
    saw_close = False
    while not saw_close:
        got = decode_frame(buf)
        if got is None:
            buf += conn.recv(4096)
            continue
        opcode, _, payload, used = got
        buf = buf[used:]
        if opcode == OP_CLOSE:
            saw_close = True
    # masked EMPTY close echo (no status code)
    conn.sendall(encode_frame(b"", opcode=OP_CLOSE, mask=_os.urandom(4)))
    t.join(timeout=10)
    assert server.closed_clean.is_set()
    conn.close()
