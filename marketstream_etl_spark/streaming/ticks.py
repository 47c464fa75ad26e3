"""Structured Streaming tick pipeline — the Spark re-expression of the
reference's WebSocket demo (SURVEY §2.8, §3.2):

  TickServer (JSON over WS, ~5K ticks/s)  → rate source + column generation
  TickClient (parse JSON → Trade, SPSC)   → from_json + dead-letter channel
  consumer (filter + per-symbol counts)   → stateful streaming aggregation

Reference: src/feed/TickServer.hpp:144-265, src/feed/TickClient.hpp:126-246,
src/tools/websocket_demo.cpp:73-220.

Backpressure (SPSC ring, ST2) is engine-owned in Spark (`maxOffsetsPerTrigger`
etc.); the preserved semantic is lossless delivery.  Watermarks/windows (ST4)
are absent in the reference — `windowed_symbol_stats` adds them as the
engine-native generalization for late data.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marketstream_etl_spark.schemas import TICK_SCHEMA
from marketstream_etl_spark.sources.tables import sink_name

# Hard bound on the socket-test emitter's driver-side buffer (~200 B/frame →
# ≤ ~40 MB).  Covers sf0.1 (~100K events) with headroom; anything larger must
# fail loudly rather than grow the collect without bound.
SOCKET_EMITTER_MAX_ROWS = 200_000


class EmitterCapExceeded(RuntimeError):
    """The socket fixture would need a driver-side frame buffer past
    SOCKET_EMITTER_MAX_ROWS — a deliberate guard (the single-process
    emitter is a test harness, not a benchmarkable source), distinct
    from an operator failure so sweeps can record it as a by-design
    skip."""

STREAM_EPOCH_NS = 1_698_208_500_000_000_000  # TickServer.hpp:186
STREAM_SYMBOLS = ["RELIANCE", "TCS", "INFY", "HDFC", "WIPRO"]  # :196


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bounded replay of events.parquet as a file-source
    stream, with `ts` normalized to int64 epoch-ns exactly like the batch
    loader (sources/tables.normalize_event_ts) so streaming plans share the
    batch time model."""
    from marketstream_etl_spark.sources.tables import (
        ensure_engine_confs,
        normalize_event_ts,
    )

    ensure_engine_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source wants a directory; glob-filter down to the one table
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(spark, raw)


def tick_stream(spark: SparkSession, rows_per_second: int = 5000) -> DataFrame:
    """S4: rate-source tick generator with the server's column semantics —
    5K ticks/s, event time advancing 10µs/tick from a fixed epoch
    (TickServer.hpp:200-241), prices random-walk-ish per symbol."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    sym = F.element_at(
        F.array(*[F.lit(s) for s in STREAM_SYMBOLS]),
        (F.col("value") % len(STREAM_SYMBOLS) + 1).cast("int"),
    )
    return rate.select(
        (F.lit(3_000_000) + F.col("value")).alias("trade_id"),
        (F.lit(4_000_000) + F.col("value")).alias("order_id"),
        (F.lit(STREAM_EPOCH_NS) + F.col("value") * 10_000).alias("timestamp"),
        sym.alias("symbol"),
        F.round(
            F.lit(1000.0) + F.pmod(F.col("value") * F.lit(7.77), F.lit(500.0)), 2
        ).alias("price"),
        (F.pmod(F.col("value") * 37, 4991) + 10).cast("int").alias("volume"),
        F.when(F.col("value") % 2 == 0, F.lit("B")).otherwise(F.lit("S")).alias("side"),
        F.lit("M").alias("type"),
        F.lit(False).alias("is_pro"),
        F.lit("WSS").alias("exchange"),  # TickMessage.hpp:164
    )


def to_json_frames(ticks: DataFrame) -> DataFrame:
    """S6 serialize: one JSON text frame per tick (wire format)."""
    return ticks.select(
        F.to_json(F.struct(*[F.col(f.name) for f in TICK_SCHEMA.fields])).alias(
            "value"
        )
    )


def parse_json_frames(
    frames: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """S5/S6/ST6 ingest: JSON frame → typed tick + dead-letter flag.

    Corrupt frames keep the raw frame and set `parse_error` — the
    `parse_errors` counter channel of TickClient.hpp:224-231.  from_json in
    permissive mode yields an all-null struct (not a NULL struct) for
    malformed input, so corruption is detected via the always-present
    trade_id field.  `passthrough` names source-metadata columns to carry
    along (e.g. Kafka topic/partition/offset).
    """
    parsed = frames.withColumn(
        "tick", F.from_json("value", T.StructType(TICK_SCHEMA.fields))
    )
    # parse_error references ONLY tick.trade_id, never the whole struct:
    # a NULL struct (null/empty frame) extracts a NULL trade_id, so the
    # old `tick.isNull() | ...` first disjunct was redundant — and it
    # forced a FULL-schema from_json re-parse inside every downstream
    # filter once predicate pushdown substituted the alias (Catalyst's
    # per-expression JSON pruning cannot prune a whole-struct null test).
    # Measured on the 1M-frame bench pipeline: 1.20 s → 0.87 s per pass
    # (single full parse costs 0.48 s), identical outputs.
    return parsed.select(
        "tick.*",
        F.col("value").alias("raw_frame"),
        F.col("tick.trade_id").isNull().alias("parse_error"),
        *passthrough,
    )


_PUSHDOWN_RULE = "org.apache.spark.sql.catalyst.optimizer.PushDownPredicates"


@contextmanager
def single_parse_ingest(spark: SparkSession):
    """Scope `spark.sql.optimizer.excludedRules=PushDownPredicates` around
    a JSON-frame ingest streaming run (start → awaitTermination/stop).

    Why (guide §4.1/§2.2, r13 VERDICT item 5): predicate pushdown
    substitutes the `tick` parse alias into every downstream filter
    conjunct, so the ingest microbatch evaluates per-field pruned
    `from_json` re-parses per predicate (each re-scans the frame string);
    with pushdown excluded the filters stay ABOVE the parse projection
    and read extracted columns.  Semantics are unchanged (rule exclusion
    is plan-shape only).  Measured on the 1M-frame bench pipeline,
    interleaved A/B: 2.33 → 1.95 s best / every pair agreeing (~15–20%);
    microbatch plan drops from 5 to 3 from_json occurrences.

    Scope ONLY around from_json ingest queries: for parquet-scan batch or
    streaming plans the exclusion would forfeit real scan pushdown.  The
    conf is restored on exit even on error; microbatches plan inside the
    scope, so it must wrap the whole drain, not just `.start()`."""
    key = "spark.sql.optimizer.excludedRules"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, _PUSHDOWN_RULE)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def hot_path_filter(ticks: DataFrame) -> DataFrame:
    """F2: the consumer's sanity filter (websocket_demo.cpp:110-120)."""
    return ticks.filter((F.col("price") > 0) & (F.col("volume") > 0))


def symbol_counts(ticks: DataFrame) -> DataFrame:
    """ST3/A6: running per-symbol counts — unbounded keyed state, exactly
    ConsumerStats' unordered_map (websocket_demo.cpp:73-125)."""
    return ticks.groupBy("symbol").agg(
        F.count("*").alias("n_ticks"),
        F.sum("volume").alias("total_volume"),
    )


def windowed_symbol_stats(
    ticks: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 seconds",
) -> DataFrame:
    """ST4 (engine extension): tumbling-window per-symbol stats with a
    watermark for late data. The reference's last-N-rows indicators are not
    expressible on an unbounded stream (SURVEY §7 trap 1); time-windowed
    VWAP/avg is the streaming-native equivalent."""
    with_ts = ticks.withColumn(
        "event_time", F.timestamp_micros(F.expr("timestamp div 1000"))
    )
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "symbol")
        .agg(
            F.count("*").alias("n_ticks"),
            (
                F.sum(F.col("price") * F.col("volume"))
                / F.sum(F.col("volume").cast("double"))
            ).alias("vwap"),
            F.avg("price").alias("avg_price"),
        )
    )


def run_demo_batch(spark: SparkSession, frames: DataFrame) -> dict[str, DataFrame]:
    """The websocket_demo consumer as one availableNow pass over a bounded
    frame source: parse → dead-letter split → filter → counts.  Used by
    tests; production would writeStream each branch (foreachBatch for the
    dual sink)."""
    parsed = parse_json_frames(frames)
    good = hot_path_filter(parsed.filter(~F.col("parse_error")))
    dead = parsed.filter(F.col("parse_error")).select("raw_frame")
    return {"counts": symbol_counts(good), "dead_letter": dead}


def file_stream_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 with the driver's gate: run the consumer aggregation as a REAL
    Structured Streaming query (parquet file source → availableNow →
    memory sink) and return the final table.  Streaming/batch parity is
    the invariant: the result must equal the batch groupBy on the same
    data, so this entry is oracle-checkable like any batch query.

    availableNow processes the bounded input in micro-batches then stops —
    the graceful-drain shutdown of the reference demo (ST5,
    websocket_demo.cpp:174-214)."""
    from marketstream_etl_spark.plans.trades_view import trades_from_events

    events = stream_events(spark, sf_dir)
    counts = symbol_counts(hot_path_filter(trades_from_events(events)))
    name = sink_name("stream_counts", sf_dir)
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("symbol")


def file_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 with the driver's gate: tumbling 1-minute windowed per-symbol
    stats as a real streaming query (watermark + window + availableNow).
    On bounded replay the final state equals the batch bucketing, so the
    window/watermark machinery itself is oracle-checkable."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.plans.trades_view import trades_from_events

    events = stream_events(spark, sf_dir)
    stats = windowed_symbol_stats(
        hot_path_filter(trades_from_events(events)), window="1 minute"
    )
    out = stats.select(
        (F.unix_micros(F.col("window.start")) * 1000).alias("window_start_ns"),
        "symbol",
        "n_ticks",
        F.round("vwap", 6).alias("vwap"),
        F.round("avg_price", 6).alias("avg_price"),
    )
    name = sink_name("stream_windowed", sf_dir)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("window_start_ns", "symbol")


def file_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLCV: the q_ohlc_bars resample as a real windowed
    streaming aggregate — event-time tumbling windows over the bounded
    replay, open/close via the same min/max-of-struct trick (plain
    aggregates, so they run incrementally in window state with no sort).
    Batch/stream parity: on bounded input the final window state must
    equal the batch groupBy, which is what the oracle checks."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.plans.trades_view import trades_from_events

    events = stream_events(spark, sf_dir)
    ticks = hot_path_filter(trades_from_events(events)).withColumn(
        "event_time", F.timestamp_micros(F.expr("timestamp DIV 1000"))
    )
    key = F.struct("timestamp", "trade_id", "price")
    bars = (
        ticks.withWatermark("event_time", "10 minutes")
        .groupBy("symbol", F.window("event_time", "1 minute").alias("win"))
        .agg(
            F.round(F.min(key).getField("price"), 4).alias("open"),
            F.round(F.max("price"), 4).alias("high"),
            F.round(F.min("price"), 4).alias("low"),
            F.round(F.max(key).getField("price"), 4).alias("close"),
            F.sum("volume").alias("bar_volume"),
            F.count("*").alias("n_trades"),
        )
    )
    out = bars.select(
        "symbol",
        (F.unix_micros(F.col("win.start")) * 1000).alias("window_start_ns"),
        "open", "high", "low", "close", "bar_volume", "n_trades",
    )
    name = sink_name("stream_ohlc", sf_dir)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("symbol", "window_start_ns")


def file_stream_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 `parse_errors` as an oracle-checked streaming run: serialize
    the replayed trades to JSON wire frames, deterministically corrupt
    every 50th frame (truncate to 10 bytes — never valid JSON), run the
    real from_json ingest, and count the dead-letter split plus the
    clean-side volume.  The reference counts exactly this channel in
    TickClient.hpp:224-231; here the counter is a verifiable query."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.plans.trades_view import trades_from_events

    events = stream_events(spark, sf_dir)
    ticks = trades_from_events(events).withColumn("exchange", F.lit("WSS"))
    frames = ticks.select(
        "trade_id",
        F.to_json(
            F.struct(*[F.col(f.name) for f in TICK_SCHEMA.fields])
        ).alias("value"),
    )
    wire = frames.select(
        F.when(
            F.col("trade_id") % 50 == 0, F.substring("value", 1, 10)
        )
        .otherwise(F.col("value"))
        .alias("value")
    )
    parsed = parse_json_frames(wire)
    out = parsed.groupBy("parse_error").agg(
        F.count("*").alias("n_frames"),
        F.sum("volume").alias("total_volume"),
    )
    name = sink_name("stream_deadletter", sf_dir)
    with single_parse_ingest(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).orderBy("parse_error")


# one definition of the buy→sell pairing semantics for BOTH the inner and
# the LEFT OUTER variant — the outer row strictly subsumes the inner one,
# and that claim only holds while they share this construction
JOIN_WATERMARK = "30 days"
JOIN_HORIZON_NS = 3_600_000_000_000  # 1 hour — the reference horizon
JOIN_REF_ROWS = 100_000  # sf0.1 density: the largest SF the horizon holds


def join_horizon_ns(sf_dir: str) -> int:
    """Density-adaptive interval-join horizon (r8 VERDICT item 2).

    Expected pairs-per-buy ∝ row density × horizon, so total pair volume
    ∝ rows² × horizon — the one streaming family whose OUTPUT grows
    quadratically with data.  Holding horizon × (rows/REF)² constant
    pins the emitted pair volume at its sf0.1 level while input rows
    grow linearly: at every driver/bench SF (rows ≤ REF) the horizon is
    the unchanged 1 HOUR (oracle semantics fixed), at sf1 it is 36 s,
    at sf10 0.36 s.  Deterministic both sides: computed from the parquet
    footer row count, which an oracle replay can also read."""
    from marketstream_etl_spark.sources.tables import table_row_count

    n = table_row_count(sf_dir, "events") or JOIN_REF_ROWS
    scale = max(1, n // JOIN_REF_ROWS)
    # 1 ms floor: the band math divides by horizon µs (horizon_ns DIV
    # 1000), which would hit zero once scale² exceeds 3.6e9 (≈ 6B rows)
    # — far past any probe SF (sf10 = 10M rows → 0.36 s) but a real
    # divide-by-zero at extrapolated scale; property-locked in
    # tests/test_property_interval_join.py
    return max(JOIN_HORIZON_NS // (scale * scale), 1_000_000)


def _band(col: str, horizon_ns: int) -> F.Column:
    """Time band index at horizon width: floor(event_time_µs / h_µs)."""
    return F.floor(
        F.unix_micros(F.col(col)) / F.lit(horizon_ns // 1000)
    ).cast("long")


def _interval_join(
    frame: DataFrame,
    how: str,
    horizon_ns: int = JOIN_HORIZON_NS,
    mirror: bool = False,
) -> DataFrame:
    """BANDED watermarked buy→sell interval join over a (symbol, price,
    side, event_time) stream: sells within [buy_time, buy_time + horizon]
    of the same symbol.

    Scale design (r9): a symbol-only equality key gives the join state
    just |symbols| distinct keys, so every arriving row probes ~n/|symbols|
    state rows — O(n²) total, measured >590 s at sf1 even after the
    horizon shrink bounded the EMITTED pair volume (emission was never
    the bottleneck; probing was).  Both sides therefore also carry
    band = floor(event_time/horizon): a window of width `horizon` spans
    at most two bands, so the probe side is exploded to (band, band−1)
    and the join keys on (symbol, band) EQUALITY before the exact range
    predicate trims.  Probes become band-local (O(rows-per-band)), pair
    volume is unchanged (each true pair matches via exactly ONE probe
    copy, since the copies' bands differ), and the watermark/range
    bounds still evict state.  sf1: >590 s → ~20 s.

    The UNEXPLODED side is always the outer-preserved one, so `how` may
    be "inner" or "leftOuter" and unmatched left rows emit exactly once.
    `mirror=False` preserves buys (sells exploded); `mirror=True`
    preserves sells (buys exploded) — the second leg a full-outer
    decomposition needs.  Output columns are identical either way."""
    buys = frame.filter(F.col("side") == "B").select(
        F.col("symbol").alias("b_symbol"),
        F.col("price").alias("buy_price"),
        F.col("event_time").alias("buy_time"),
        _band("event_time", horizon_ns).alias("b_band"),
    )
    sells = frame.filter(F.col("side") == "S").select(
        F.col("symbol").alias("s_symbol"),
        F.col("price").alias("sell_price"),
        F.col("event_time").alias("sell_time"),
        _band("event_time", horizon_ns).alias("s_band"),
    )
    if mirror:
        # a buy's window [buy, buy+h] can host sells in bands
        # {b_band, b_band+1}: probe copies ahead of the preserved sells
        buys = buys.withColumn(
            "b_band",
            F.explode(F.array(F.col("b_band"), F.col("b_band") + F.lit(1))),
        )
    else:
        # a sell at band s matches buys in bands {s_band−1, s_band}
        sells = sells.withColumn(
            "s_band",
            F.explode(F.array(F.col("s_band"), F.col("s_band") - F.lit(1))),
        )
    buys = buys.withWatermark("buy_time", JOIN_WATERMARK)
    sells = sells.withWatermark("sell_time", JOIN_WATERMARK)
    cond = (
        (F.col("b_symbol") == F.col("s_symbol"))
        & (F.col("b_band") == F.col("s_band"))
        & (F.col("sell_time") >= F.col("buy_time"))
        & (
            F.col("sell_time")
            <= F.col("buy_time")
            + F.expr(f"INTERVAL {horizon_ns // 1000} MICROSECOND")
        )
    )
    if mirror:
        return sells.join(buys, cond, how)
    return buys.join(sells, cond, how)


def file_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (engine extension beyond the reference's
    streaming surface): buy ticks joined to sell ticks of the same symbol
    arriving within the next hour — the canonical watermarked interval join
    of Structured Streaming.

    Both sides carry watermarks and the join has an event-time range bound,
    so state is evictable and the plan runs on an unbounded stream; on
    bounded replay (availableNow) the appended output equals the batch
    interval join, which makes the whole stateful-join machinery
    oracle-checkable.

    The matched pairs are REDUCED INSIDE foreachBatch (per-symbol count +
    exact e6 fixed-point spread sum — additive partials merged into a
    |symbols|-row parquet accumulator), so no pair set is ever
    materialized driver-side: the r7 posture fix for the one streaming
    family whose memory-sink result grows with data (pair volume at
    sf0.1 is already millions of rows; at 100x the old sink is a driver
    OOM).  Fixed-pointing each spread BEFORE the sum also makes the
    average order-independent — float-sum determinism courtesy."""
    from marketstream_etl_spark.plans.trades_view import trades_from_events

    events = stream_events(spark, sf_dir)
    trades = trades_from_events(events).withColumn(
        "event_time", F.timestamp_micros(F.expr("timestamp div 1000"))
    )
    pairs = _interval_join(trades, "inner", join_horizon_ns(sf_dir))

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy(F.col("b_symbol").alias("symbol")).agg(
            F.count("*").alias("n_pairs"),
            _spread_sum_fp().alias("spread_sum_fp"),
        )

    acc = _accumulate_stream(
        spark, sf_dir, pairs, "join_acc", partial,
        ["n_pairs", "spread_sum_fp"],
    )
    return (
        acc.select(
            "symbol",
            "n_pairs",
            _avg_from_fp("spread_sum_fp", "n_pairs").alias("avg_spread"),
        )
        .orderBy("symbol")
    )


def _spread_sum_fp() -> F.Column:
    """Exact e6 fixed-point per-pair spread sum (order-independent;
    NULL sells from outer joins are skipped by sum's null semantics)."""
    return F.sum(
        F.floor(
            (F.col("sell_price") - F.col("buy_price")) * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long")
    )


def _avg_from_fp(sum_col: str, n_col: str) -> F.Column:
    return F.when(
        F.col(n_col) > 0,
        F.round(
            F.col(sum_col).cast("double")
            / F.col(n_col).cast("double")
            / F.lit(1e6),
            6,
        ),
    )


def _accumulate_stream(
    spark: SparkSession,
    sf_dir: str,
    stream_df: DataFrame,
    label: str,
    partial_fn,
    sum_cols: list[str],
) -> DataFrame:
    """foreachBatch additive accumulator: per-symbol partials written to
    per-batch_id subdirectories (idempotent replay) and SUMMED at drain —
    the production alternative to a memory sink whose row count grows
    with data (at sf0.1 the interval joins already emit millions of
    pairs; at 100x a driver-side sink is an OOM).  Thin wrapper over the
    generalized replay.accumulate_stream (r8) pinning the trade-domain
    shape: key = symbol, merge = cell-wise SUM."""
    from marketstream_etl_spark.streaming.replay import accumulate_stream

    return accumulate_stream(
        spark,
        sf_dir,
        stream_df,
        label,
        partial_fn,
        key_cols=["symbol"],
        merge_exprs=[F.sum(c).alias(c) for c in sum_cols],
    )


def socket_stream_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S5 NETWORK ingest parity: a localhost TCP emitter thread plays the
    reference's TickServer (src/feed/TickServer.hpp:144-265 — JSON frames
    over a socket), and `readStream.format("socket")` is the TickClient
    (TickClient.hpp:126-246): live wire → from_json → dead-letter split.

    Same deterministic corruption contract as file_stream_deadletter (every
    50th frame truncated to 10 bytes), so the final counts hash-match the
    same batch oracle.  The driver-side emitter buffer is a test-scale
    stand-in for a real feed (a production deployment points the same parse
    stage at Kafka — streaming/kafka.py); the ingest path under test — the
    socket source, JSON parse, error channel, stateful counts — is the real
    streaming machinery."""
    import socket as socketlib
    import threading

    payload = build_deadletter_payload(spark, sf_dir, "socket_stream_deadletter")
    n_expected = len(payload)

    server = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_STREAM)
    server.setsockopt(socketlib.SOL_SOCKET, socketlib.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    done = threading.Event()

    def serve() -> None:
        conn, _ = server.accept()
        try:
            send_lines_chunked(conn, payload)
            # keep the connection open until the reader has drained — the
            # socket source treats a close as stream end mid-read
            done.wait(timeout=120)
        finally:
            conn.close()
            server.close()

    threading.Thread(target=serve, daemon=True).start()

    return drain_deadletter_socket(
        spark, port, n_expected, done, "stream_socket", sf_dir
    )


def build_deadletter_payload(
    spark: SparkSession, sf_dir: str, caller: str
) -> list[str]:
    """Wire frames for the network-ingest queries: JSON ticks with every
    50th frame truncated to 10 bytes (the deterministic corruption
    contract the dead-letter oracle counts).

    The emitter buffer is driver-side by design (it IS the server
    stand-in), so its size is bounded explicitly: a future sf bump must
    fail with a clear message, never OOM the driver or silently truncate
    (the counts are oracle-compared, so a silent cap would be a wrong
    answer)."""
    from marketstream_etl_spark.plans.trades_view import trades_from_events
    from marketstream_etl_spark.sources.tables import load_table

    ticks = trades_from_events(load_table(spark, sf_dir, "events")).withColumn(
        "exchange", F.lit("WSS")
    )
    wire_json = F.to_json(F.struct(*[F.col(f.name) for f in TICK_SCHEMA.fields]))
    frames = ticks.select(
        F.when(F.col("trade_id") % 50 == 0, F.substring(wire_json, 1, 10))
        .otherwise(wire_json)
        .alias("value")
    )
    n_expected = frames.count()
    if n_expected > SOCKET_EMITTER_MAX_ROWS:
        raise EmitterCapExceeded(
            f"{caller} fixture: {n_expected} frames exceeds "
            f"the driver-side emitter cap of {SOCKET_EMITTER_MAX_ROWS}; "
            "point this query at a smaller sf_dir or raise the cap knowingly"
        )
    return [r.value for r in frames.collect()]


def send_lines_chunked(conn, lines: list[str], batch: int = 1000) -> None:
    """Emit lines over a socket in `batch`-sized newline-joined writes —
    never one giant wire buffer, never one syscall per line.  Shared by
    the plain-TCP emitter and the WebSocket bridge (the two feeds of
    drain_deadletter_socket)."""
    for i in range(0, len(lines), batch):
        conn.sendall(("\n".join(lines[i : i + batch]) + "\n").encode())


def drain_deadletter_socket(
    spark: SparkSession,
    port: int,
    n_expected: int,
    done,
    name_prefix: str,
    sf_dir: str,
    feed_error: list | None = None,
) -> DataFrame:
    """Shared ingest tail for the network dead-letter queries: socket
    source → JSON parse → error split → complete-mode counts, drained
    until every emitted frame is accounted for (fail loudly otherwise —
    the socket source is non-replayable, so a partial table is
    permanently wrong).

    `feed_error`: optional shared list a feeder thread appends its
    exception to; the poll loop checks it each tick and aborts with the
    ROOT cause immediately instead of stalling out the full deadline on
    a bogus count mismatch."""
    import time

    lines = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    parsed = parse_json_frames(lines)
    out = parsed.groupBy("parse_error").agg(
        F.count("*").alias("n_frames"),
        F.sum("volume").alias("total_volume"),
    )
    name = sink_name(name_prefix, sf_dir)
    ctx = single_parse_ingest(spark)
    ctx.__enter__()
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 120
        counted = None
        while time.time() < deadline:
            if feed_error:
                raise RuntimeError(
                    f"{name_prefix}: feeder thread failed"
                ) from feed_error[0]
            counted = spark.table(name).agg(F.sum("n_frames")).first()[0]
            if counted == n_expected:
                break
            time.sleep(0.5)
        q.processAllAvailable()
        counted = spark.table(name).agg(F.sum("n_frames")).first()[0]
        if counted != n_expected:
            raise RuntimeError(
                f"{name_prefix}: drained {counted} of "
                f"{n_expected} frames before the 120s deadline"
            )
    finally:
        q.stop()
        done.set()
        ctx.__exit__(None, None, None)
    return spark.table(name).orderBy("parse_error")


SESSION_GAP = "30 minutes"
SESSION_GAP_NS = 1_800_000_000_000


def file_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization via the native session_window (the
    merge-on-overlap generalization of the batch gaps-and-islands plan in
    plans/advanced.q_sessionization): per-user sessions with a 30-minute
    inactivity gap, computed by the streaming state store.

    A session window spans [first_ts, last_ts + gap), so the batch island
    duration is (end - start - gap).  On bounded replay the final state
    equals the batch islands (the two semantics differ only for gaps of
    EXACTLY 30 minutes, absent at µs resolution), so the oracle is the same
    SQL as the batch query.  Per-user stats are a batch step over the sink
    table — chaining a second stateful aggregation onto the session window
    is deliberately avoided."""
    events = stream_events(spark, sf_dir)
    with_ts = events.select(
        "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
    )
    sessions = with_ts.groupBy(
        F.session_window("event_time", SESSION_GAP), "user_id"
    ).agg(F.count("*").alias("n_events"))
    name = sink_name("stream_sessions", sf_dir)
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dur_s = (
        (
            F.unix_micros(F.col("session_window.end"))
            - F.unix_micros(F.col("session_window.start"))
        )
        * 1000
        - SESSION_GAP_NS
    ) / 1_000_000_000
    return (
        spark.table(name)
        .select("user_id", "n_events", dur_s.alias("dur_s"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.avg("dur_s"), 6).alias("avg_session_s"),
            F.round(F.max("dur_s"), 6).alias("max_session_s"),
        )
        .orderBy("user_id")
    )


def file_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication (the staging-table `ON CONFLICT DO NOTHING`
    pattern of README.md:78-82, as a stream): input rows are deliberately
    doubled, a stateful dropDuplicates on trade_id must emit each exactly
    once. Per-symbol counts of the deduped output therefore equal the
    plain batch counts — oracle-checkable."""
    from marketstream_etl_spark.plans.trades_view import trades_from_events

    events = stream_events(spark, sf_dir)
    trades = trades_from_events(events)
    doubled = trades.withColumn(
        "_copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("_copy")
    deduped = doubled.dropDuplicates(["trade_id"])

    # reduce inside foreachBatch — see file_stream_dedup_watermarked
    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("symbol").agg(F.count("*").alias("n_trades"))

    acc = _accumulate_stream(
        spark, sf_dir, deduped, "dedup_acc", partial, ["n_trades"]
    )
    return acc.select("symbol", "n_trades").orderBy("symbol")


def file_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dropDuplicatesWithinWatermark` — the state-BOUNDED streaming dedup.

    Plain streaming dropDuplicates keeps every key seen forever (state grows
    with the stream; untenable on an unbounded 100 TB feed).  The
    within-watermark form evicts keys once the event-time watermark passes
    them, so state is O(keys-per-watermark-window) — the variant a long-
    running deployment must use when duplicates arrive close together (the
    at-least-once-delivery case, which is exactly the retry shape).

    Same contract as file_stream_dedup_counts: deliberately doubled input
    (duplicates land inside one micro-batch, trivially within the 1h
    watermark), deduped per-symbol counts equal the plain batch counts."""
    from marketstream_etl_spark.plans.trades_view import trades_from_events

    events = stream_events(spark, sf_dir)
    trades = trades_from_events(events)
    doubled = trades.withColumn(
        "_copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("_copy")
    deduped = (
        doubled.withColumn(
            "event_time", F.timestamp_micros(F.expr("timestamp div 1000"))
        )
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark(["trade_id"])
    )
    # the deduped stream's ROW volume grows with data — reduce inside
    # foreachBatch (each unique row is emitted exactly once across
    # batches, so per-symbol counts merge additively) instead of
    # materializing the rows in a driver-side memory sink
    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("symbol").agg(F.count("*").alias("n_trades"))

    acc = _accumulate_stream(
        spark, sf_dir, deduped, "dedup_wm_acc", partial, ["n_trades"]
    )
    return acc.select("symbol", "n_trades").orderBy("symbol")


def file_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming z-score tripwire — the stream twin of q_price_outliers:
    per-symbol mean/stddev are trained BATCH-side (the model), broadcast
    into the stream, and every incoming tick is z-scored map-side; one
    streaming aggregate keeps the per-symbol anomaly counters live.
    The stream-static broadcast join is the standard model-serving shape:
    at 100 TB the stats frame stays symbol-sized however large the feed.

    Guarded for sd == 0 (a constant-price symbol must count zero
    anomalies, not abort the query under ANSI division)."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.plans.trades_view import (
        load_trades,
        trades_from_events,
    )

    batch = hot_path_filter(load_trades(spark, sf_dir, fan_out=True))
    stats = batch.groupBy("symbol").agg(
        F.avg("price").alias("mu"),
        F.stddev_samp("price").alias("sd"),
    )
    stream = hot_path_filter(trades_from_events(stream_events(spark, sf_dir)))
    abs_z = F.when(
        F.col("sd") > 0, F.abs((F.col("price") - F.col("mu")) / F.col("sd"))
    ).otherwise(F.lit(0.0))
    flagged = stream.join(F.broadcast(stats), "symbol").withColumn(
        "abs_z", abs_z
    )
    out = flagged.groupBy("symbol").agg(
        F.count("*").alias("n_ticks"),
        F.sum(F.when(F.col("abs_z") > 2.0, 1).otherwise(0))
        .cast("long")
        .alias("n_anomalies"),
        F.round(F.max("abs_z"), 4).alias("max_abs_z"),
    )
    name = sink_name("stream_anomaly", sf_dir)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("symbol")


def _sentineled_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trades stream unioned with the two-file far-future SENTINEL
    stream that drives watermark advancement for bounded outer-join
    replay (shared by the left- and full-outer variants): batch 1 drains
    the real data plus sentinel file 1 (advancing both sides' watermarks
    40 days past the real horizon), batch 2 processes sentinel file 2 and
    flushes every unmatched real row.  The sentinels themselves stay in
    state and are excluded from results by symbol."""
    import os

    from marketstream_etl_spark.plans.trades_view import trades_from_events
    from marketstream_etl_spark.sources.tables import (
        load_table,
        warehouse_path,
    )

    day_ns = 86_400_000_000_000
    sent_dir = warehouse_path(spark, "join_outer_sentinel", sf_dir)
    marker = os.path.join(sent_dir, "_done")
    if not os.path.exists(marker):
        import pyarrow as pa
        import pyarrow.parquet as pq

        # the batch max-ts scan is only needed to stamp the sentinel
        # files — it must not re-run on warm invocations.  Same scan also
        # guards the sentinel namespace: the result filter drops symbols
        # ZZB/ZZS, so a generated fixture that ever contains them as REAL
        # symbols would silently lose their rows — fail loudly instead.
        probe = (
            load_table(spark, sf_dir, "events")
            .agg(
                F.max("ts").alias("max_ts"),
                F.sum(
                    F.upper("event_type").isin("ZZB", "ZZS").cast("int")
                ).alias("n_sentinel_collisions"),
            )
            .collect()[0]
        )
        real_max_ns = probe["max_ts"]
        if (probe["n_sentinel_collisions"] or 0) > 0:
            raise ValueError(
                "events fixture contains symbol ZZB/ZZS — collides with "
                "the outer-join sentinel namespace; pick new sentinels"
            )
        os.makedirs(sent_dir, exist_ok=True)
        for i, ts in ((1, real_max_ns + 40 * day_ns),
                      (2, real_max_ns + 41 * day_ns)):
            tbl = pa.table(
                {
                    "symbol": ["ZZB", "ZZS"],
                    "price": pa.array([0.0, 0.0], pa.float64()),
                    "side": ["B", "S"],
                    "ts_ns": pa.array([ts, ts], pa.int64()),
                }
            )
            dst = os.path.join(sent_dir, f"sent{i}.parquet")
            pq.write_table(tbl, dst)
            # file-source order is by modification time, oldest first —
            # pin it so sent1 always rides batch 1
            os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
        open(marker, "w").close()
    sent = (
        spark.readStream.schema(
            "symbol string, price double, side string, ts_ns long"
        )
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "sent*.parquet")
        .parquet(sent_dir)
    )
    events = stream_events(spark, sf_dir)
    trades = trades_from_events(events).select(
        "symbol", "price", "side", F.col("timestamp").alias("ts_ns")
    )
    return trades.unionByName(sent).withColumn(
        "event_time", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )


def file_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join with watermark-driven state
    eviction — the semantics Structured Streaming adds on top of the inner
    join: a buy with no sell in its 1-hour horizon is emitted with NULL
    sell columns once the watermark passes buy_time + 1h.

    Outer rows only flush when a LATER microbatch runs with an advanced
    watermark, so a bounded single-batch replay would silently degrade to
    the inner join.  The fixture therefore unions a two-file SENTINEL
    stream (far-future B and S rows, maxFilesPerTrigger=1): batch 1 drains
    the real data plus sentinel file 1 (advancing both side's watermarks
    40 days past the real horizon), batch 2 processes sentinel file 2 and
    flushes every unmatched real buy.  The sentinels themselves stay in
    state (the watermark never passes their own horizon) and are excluded
    from the result.

    Scale: state is bounded by the watermark exactly as the inner join;
    the sentinel trick is test-harness plumbing for bounded replay, not a
    production requirement (a live stream always has a next batch)."""
    pairs = _interval_join(
        _sentineled_trades(spark, sf_dir), "leftOuter", join_horizon_ns(sf_dir)
    )

    def partial(batch: DataFrame) -> DataFrame:
        return (
            batch.filter(~F.col("b_symbol").isin("ZZB", "ZZS"))
            .groupBy(F.col("b_symbol").alias("symbol"))
            .agg(
                F.count("sell_price").alias("n_pairs"),
                (F.count("*") - F.count("sell_price")).alias("n_unmatched"),
                _spread_sum_fp().alias("spread_sum_fp"),
            )
        )

    acc = _accumulate_stream(
        spark, sf_dir, pairs, "join_outer_acc", partial,
        ["n_pairs", "n_unmatched", "spread_sum_fp"],
    )
    return (
        acc.select(
            "symbol",
            "n_pairs",
            "n_unmatched",
            _avg_from_fp("spread_sum_fp", "n_pairs").alias("avg_spread"),
        )
        .orderBy("symbol")
    )


def file_stream_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the outer-join
    family (inner: streaming_join; left: streaming_join_outer): unmatched
    BUYS flush with NULL sell columns AND unmatched SELLS flush with NULL
    buy columns, each once the opposing side's watermark clears its match
    horizon.  Same shared sentinel fixture advances both watermarks on
    bounded replay; sentinels never match real rows (their symbols are
    reserved) and are excluded from the report.

    Output per symbol: (symbol, n_pairs, n_buy_unmatched,
    n_sell_unmatched, avg_spread) — the two unmatched counts are exactly
    the rows only full-outer semantics can surface.

    Scale decomposition (r9): at scale the full outer runs as TWO
    mirrored banded LEFT OUTER stream-stream joins rather than one
    fullOuter — the banded join must explode its probe side, and an
    exploded side would emit its unmatched rows once per copy, so each
    leg keeps a different side unexploded: leg 1 preserves buys (pairs +
    buy-side unmatched + spread), leg 2 preserves sells (sell-side
    unmatched only).  Union of the legs = the fullOuter row set exactly;
    both legs are real watermark-evicted outer joins and share the
    sentinel fixture."""
    horizon = join_horizon_ns(sf_dir)
    buy_side = _interval_join(
        _sentineled_trades(spark, sf_dir), "leftOuter", horizon
    )

    def partial_buy(batch: DataFrame) -> DataFrame:
        return (
            batch.filter(~F.col("b_symbol").isin("ZZB", "ZZS"))
            .groupBy(F.col("b_symbol").alias("symbol"))
            .agg(
                F.count("sell_price").alias("n_pairs"),
                (F.count("*") - F.count("sell_price")).alias(
                    "n_buy_unmatched"
                ),
                _spread_sum_fp().alias("spread_sum_fp"),
            )
        )

    acc_buy = _accumulate_stream(
        spark, sf_dir, buy_side, "join_fo_buyleg_acc", partial_buy,
        ["n_pairs", "n_buy_unmatched", "spread_sum_fp"],
    )
    sell_side = _interval_join(
        _sentineled_trades(spark, sf_dir), "leftOuter", horizon, mirror=True
    )

    def partial_sell(batch: DataFrame) -> DataFrame:
        return (
            batch.filter(
                ~F.col("s_symbol").isin("ZZB", "ZZS")
                & F.col("buy_price").isNull()
            )
            .groupBy(F.col("s_symbol").alias("symbol"))
            .agg(F.count("*").alias("n_sell_unmatched"))
        )

    acc_sell = _accumulate_stream(
        spark, sf_dir, sell_side, "join_fo_sellleg_acc", partial_sell,
        ["n_sell_unmatched"],
    )
    return (
        acc_buy.join(acc_sell, "symbol", "full_outer")
        .select(
            "symbol",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_buy_unmatched", F.lit(0)).alias("n_buy_unmatched"),
            F.coalesce("n_sell_unmatched", F.lit(0)).alias(
                "n_sell_unmatched"
            ),
            _avg_from_fp("spread_sum_fp", "n_pairs").alias("avg_spread"),
        )
        .orderBy("symbol")
    )


def file_stream_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Benford first-digit monitor: the per-digit counts run as
    a real complete-mode streaming aggregation (bounded state — 9
    digits), and the chi-square report is computed from the drained
    final state through the SAME fixed-point core as the batch query
    (plans/advanced.benford_from_counts), so on bounded replay the
    streamed verdict is bit-identical to the batch one.  The streaming
    shape a live fraud/quality monitor uses: state is the 9-row digit
    histogram no matter how many orders stream through."""
    from marketstream_etl_spark.plans.advanced import (
        benford_digit_col,
        benford_from_counts,
    )
    from marketstream_etl_spark.sources.tables import ensure_engine_confs

    ensure_engine_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
    orders = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(sf_dir)
    )
    counts_stream = (
        orders.filter(F.col("o_totalprice") >= 1.0)
        .groupBy(benford_digit_col().alias("digit"))
        .agg(F.count("*").alias("n_obs"))
    )
    name = sink_name("stream_benford", sf_dir)
    q = (
        counts_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return benford_from_counts(spark, spark.table(name))


def file_stream_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PSI drift monitor: the (segment, bucket) histogram runs
    as a real complete-mode streaming aggregation (bounded state —
    2 segments × 10 buckets), and the PSI report is computed from the
    drained final state through the SAME fixed-point core as the batch
    query (plans/advanced.psi_from_counts), so on bounded replay the
    streamed statistic is bit-identical to the batch one.

    This is the serve-into-stream shape a production drift monitor uses:
    per-batch the sink holds current bucket occupancy; the PSI math reads
    the sink, not the stream."""
    from marketstream_etl_spark.plans.advanced import (
        psi_bucket_col,
        psi_from_counts,
    )

    events = stream_events(spark, sf_dir)
    seg_stream = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.col("event_type").alias("segment"),
            psi_bucket_col().alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    name = sink_name("stream_psi", sf_dir)
    q = (
        seg_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return psi_from_counts(spark, spark.table(name))


def file_stream_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KS drift monitor — the PSI twin's reject/accept
    companion: the SAME complete-mode (segment, bucket) histogram
    (bounded 2x10 state), drained into the shared exact-integer KS core
    (plans/advanced.ks_from_counts), so on bounded replay the streamed
    statistic and verdict are bit-identical to the batch ks_drift and
    the driver reuses its oracle."""
    from marketstream_etl_spark.plans.advanced import (
        ks_from_counts,
        psi_bucket_col,
    )

    events = stream_events(spark, sf_dir)
    seg_stream = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.col("event_type").alias("segment"),
            psi_bucket_col().alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    name = sink_name("stream_ks", sf_dir)
    q = (
        seg_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return ks_from_counts(spark, spark.table(name))


def file_stream_mwu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Mann-Whitney U drift monitor — third member of the
    streaming drift family (PSI magnitude, KS sup-gap, U rank order):
    the SAME complete-mode (segment, bucket) histogram (bounded 2x10
    state) drained into the shared exact-integer midrank core
    (plans/advanced.mannwhitney_from_counts), so on bounded replay the
    streamed statistic and verdict are bit-identical to the batch
    mannwhitney_drift and the driver reuses its oracle."""
    from marketstream_etl_spark.plans.advanced import (
        mannwhitney_from_counts,
        psi_bucket_col,
    )

    events = stream_events(spark, sf_dir)
    seg_stream = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.col("event_type").alias("segment"),
            psi_bucket_col().alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    name = sink_name("stream_mwu", sf_dir)
    q = (
        seg_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return mannwhitney_from_counts(spark, spark.table(name))


def file_stream_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming chi-square drift monitor — fourth member of the
    streaming drift family (PSI magnitude, KS sup-gap, U rank order,
    chi-square full-table shape): the SAME complete-mode (segment,
    bucket) histogram (bounded 2x10 state) drained into the shared
    exact-integer contingency core (plans/advanced.chi2_from_counts), so
    on bounded replay the streamed statistic and verdict are
    bit-identical to the batch chi2_drift and the driver reuses its
    oracle."""
    from marketstream_etl_spark.plans.advanced import (
        chi2_from_counts,
        psi_bucket_col,
    )

    events = stream_events(spark, sf_dir)
    seg_stream = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.col("event_type").alias("segment"),
            psi_bucket_col().alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    name = sink_name("stream_chi2", sf_dir)
    q = (
        seg_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return chi2_from_counts(spark, spark.table(name))
