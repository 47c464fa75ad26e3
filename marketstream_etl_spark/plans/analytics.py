"""Analytics query layer — the reference README's verification queries
(``/root/reference/README.md:226-252``) plus the trade ETL spine, expressed
as DataFrame plans over the canonical trades view.

Each function takes (spark, sf_dir) and returns a DataFrame whose column
names match the DuckDB oracle in ``__spark_entry__.oracle_sql`` exactly.
Double outputs are rounded to 6 decimals on BOTH sides so the driver's
order-insensitive value hash is stable across accumulation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketstream_etl_spark.operators.indicators import (
    compute_indicators,
    compute_rsi_wilder,
    rsi_signal,
)
from marketstream_etl_spark.operators.validation import split_valid, with_validation
from marketstream_etl_spark.plans.trades_view import load_trades

# computed_at stamp injected as a constant for deterministic oracle parity
# (the reference stamps wall-clock ns at save time, DatabaseLoader.cpp:314-316).
FIXED_COMPUTED_AT_NS = 1_698_208_500_000_000_000

# Session-scoped persisted valid-trades frames, keyed by (application id,
# sf_dir, source mtime).  The reference pipeline parses+validates once and
# serves every indicator query from the in-memory batch
# (PipelineExecutor.hpp:80-184); this is the engine's distributed analog —
# the JSON-bearing projection and the validation ladder run once per source
# generation, and the window/agg consumers (indicators, Wilder RSI, RSI
# signals) read the cache.  Regenerated testdata changes the mtime key, so
# stale entries are unpersisted and rebuilt, never served.
_VALID_TRADES_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _valid_trades_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from marketstream_etl_spark.sources.tables import source_key

    key = (spark.sparkContext.applicationId, sf_dir, source_key(sf_dir))
    df = _VALID_TRADES_CACHE.get(key)
    if df is None:
        # evict superseded generations of THIS (appId, sf_dir) and any
        # entry from a stopped session (different appId) — those hold
        # DataFrame handles bound to a dead SparkContext (r4 ADVICE)
        stale_keys = [
            k
            for k in list(_VALID_TRADES_CACHE)
            if k[:2] == key[:2] or k[0] != key[0]
        ]
        for stale in stale_keys:
            old = _VALID_TRADES_CACHE.pop(stale)
            try:
                old.unpersist()
            except Exception:
                pass  # context already gone; dropping the handle suffices
        valid, _ = split_valid(load_trades(spark, sf_dir, fan_out=True))
        df = valid.persist()
        df.count()  # materialize now: consumers must never race to build it
        _VALID_TRADES_CACHE[key] = df
    return df


def q_trades_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical trades mapping itself (scan + projection + JSON access)."""
    return load_trades(spark, sf_dir)


# The reference repo's 13-row CSV test fixture (sample_data.csv): 10 valid
# trades + 3 that each trip one validation rule — lowercase symbol (V1),
# negative price (V2), zero volume (V3).  Reproduced as data so the golden
# valid/reject split is driver-oracle-visible end to end through the REAL
# CSV source path (S1/S2 typed extraction + defaults).
SAMPLE_FIXTURE_CSV = """trade_id,order_id,timestamp,symbol,price,volume,side,type,is_pro
1000001,2000001,1698230400000000000,RELIANCE,2456.75,100,B,L,0
1000002,2000002,1698230400100000000,RELIANCE,2457.00,250,S,M,1
1000003,2000003,1698230400200000000,TCS,3567.50,75,B,L,0
1000004,2000004,1698230400300000000,INFY,1423.25,500,S,L,1
1000005,2000005,1698230400400000000,HDFC,1678.90,200,B,M,0
1000006,2000006,1698230400500000000,WIPRO,432.60,1000,S,L,0
1000007,2000007,1698230400600000000,RELIANCE,2458.00,150,B,M,1
1000008,2000008,1698230400700000000,TCS,3565.25,90,S,L,0
1000009,2000009,1698230400800000000,ICICIBANK,987.45,300,B,L,1
1000010,2000010,1698230400900000000,INFY,1424.00,450,B,M,0
9999991,8888881,1698230400950000000,reliance,1424.00,450,B,M,0
9999992,8888882,1698230400960000000,WIPRO,-50.00,200,B,L,0
9999993,8888883,1698230400970000000,HDFC,1678.90,0,B,M,0
"""


def _ensure_fixture_csv(
    spark: SparkSession, name: str, sf_dir: str, content: str
) -> str:
    """Write-once CSV fixture keyed by CONTENT hash as well as testdata
    mtime: editing the fixture constant lands at a fresh path instead of
    being served stale, and the temp-file + atomic-rename write means an
    interrupted run can never leave a torn file behind (r4 ADVICE)."""
    import hashlib
    import os
    import tempfile

    from marketstream_etl_spark.sources.tables import warehouse_path

    digest = hashlib.md5(content.encode()).hexdigest()[:8]
    path = warehouse_path(spark, f"{name}_{digest}", sf_dir)
    csv_file = os.path.join(path, f"{name}.csv")
    if not os.path.exists(csv_file):
        os.makedirs(path, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(content)
        os.replace(tmp, csv_file)
    return csv_file


def q_validate_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's sample_data.csv golden (10 valid / 3 rejects with
    first-failing reasons), run through the real CSV source + validator
    (/root/reference/sample_data.csv:12-14, TradeValidator.hpp:109-178)."""
    from marketstream_etl_spark.sources.csv_trades import read_trades_csv

    csv_file = _ensure_fixture_csv(
        spark, "sample_fixture_csv", sf_dir, SAMPLE_FIXTURE_CSV
    )
    trades = read_trades_csv(spark, csv_file)
    return with_validation(trades).select(
        "trade_id", "symbol", "price", "volume", "is_valid", "reject_reason"
    )


# S2-focused CSV fixture: every defaults rule of the reference parser
# (CsvParser.cpp:57-249) trips at least once — unparseable price → 0.0,
# missing volume/timestamp → 0, missing side/type → 'N'/'M', multi-char
# side/type cells → first byte, missing is_pro → false.  The parser never
# yields nulls; validation then rejects the zero defaults downstream.
DEFAULTS_FIXTURE_CSV = """trade_id,order_id,timestamp,symbol,price,volume,side,type,is_pro
2000001,3000001,1698230401000000000,RELIANCE,2456.75,100,B,L,0
2000002,3000002,1698230401100000000,TCS,3567.50,75,BUY,LIMIT,1
2000003,3000003,1698230401200000000,INFY,1423.25,500,,,
2000004,3000004,1698230401300000000,HDFC,abc,200,B,L,0
2000005,3000005,1698230401400000000,WIPRO,432.60,,S,L,1
2000006,3000006,1698230401500000000,,987.45,300,B,L,0
2000007,3000007,,TCS,3565.25,90,S,L,0
2000008,3000008,1698230401700000000,ICICIBANK,987.45,300,B,L,
"""


def q_csv_fixture_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 end-to-end: CSV scan + typed extraction with the reference
    parser's zero/'N'/'M' defaults and first-byte char fields
    (CsvParser.cpp:57-249), then validation — the post-defaults typed rows
    are the output, golden-checked against a VALUES oracle."""
    from marketstream_etl_spark.sources.csv_trades import read_trades_csv

    csv_file = _ensure_fixture_csv(
        spark, "defaults_fixture_csv", sf_dir, DEFAULTS_FIXTURE_CSV
    )
    trades = read_trades_csv(spark, csv_file)
    return with_validation(trades).select(
        "trade_id",
        "symbol",
        "price",
        "volume",
        "side",
        "type",
        "is_pro",
        "is_valid",
        "reject_reason",
    )


def q_parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/S12/X11 end-to-end: trades written through the real sink (snappy,
    partitioned by side, dated trades_YYYYMMDD_HHMMSS run naming —
    ParquetWriter.cpp:51-361), read back and aggregated; values must
    round-trip bit-exact vs. the direct oracle.  The run stamp is pinned so
    the X11 filename itself is part of the compared result."""
    import datetime as _dt
    import os

    from marketstream_etl_spark.sources.sinks import run_output_path, write_parquet
    from marketstream_etl_spark.sources.tables import warehouse_path

    base = warehouse_path(spark, "parquet_sink_roundtrip", sf_dir)
    run_ts = _dt.datetime(2023, 10, 25, 9, 15, 0, tzinfo=_dt.timezone.utc)
    out = run_output_path(base, run_ts)
    write_parquet(load_trades(spark, sf_dir), out, partition_by=["side"])
    back = spark.read.parquet(out)
    return (
        back.groupBy("side")
        .agg(
            F.count("*").alias("n_trades"),
            F.sum("volume").alias("total_volume"),
            F.round(F.sum(F.col("price") * F.col("volume")), 2).alias("notional"),
        )
        .withColumn("run_file", F.lit(os.path.basename(out)))
    )


def q_parallel_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 end-to-end: N-connection parallel relational load — the
    reference's ParallelLoader spreads the batch over N worker threads,
    each owning one COPY stream (ParallelLoader.hpp:71-275); here each
    trade is assigned a deterministic stream by h32(trade_id) mod 4 and
    repartitioned on it, so every stream's rows flow through exactly one
    executor-side JDBC connection into embedded Derby.  The readback
    aggregates per stream — counts/volumes must match the direct oracle,
    proving all N connections landed their slice exactly once.

    The stream stamp is an md5-derived hash (functions/hashing.h32), not
    spark_partition_id(), so the per-stream assignment itself is
    engine-independent and oracle-checkable."""
    from marketstream_etl_spark.functions.hashing import h32
    from marketstream_etl_spark.sources.tables import source_key
    from marketstream_etl_spark.streaming.jdbc_sink import (
        DERBY_DRIVER,
        _derby_url,
        _drop_if_exists,
        _read_jdbc,
    )

    n_streams = 4
    url = _derby_url(f"parallel_load_{source_key(sf_dir)}")
    table = "parallel_trades"
    _drop_if_exists(spark, url, [table])
    trades = load_trades(spark, sf_dir).select(
        "trade_id", "symbol", "price", "volume"
    )
    stamped = trades.withColumn(
        "stream_id",
        F.pmod(h32(F.col("trade_id").cast("string")), F.lit(n_streams)).cast(
            "int"
        ),
    )
    # repartition hashes the expression with murmur3 mod n — and for raw
    # stream_id 0..3 that mapping COLLIDES ({0,1,3} land in one partition,
    # measured), which would silently run the "4-connection" load on two
    # connections.  The *14 remap makes murmur3(x*14) mod 4 injective on
    # 0..3 (fixed Spark hash seed, so stable), pinning exactly one stream
    # per partition = one JDBC connection per stream, like the reference's
    # one COPY stream per worker thread.
    (
        stamped.repartition(
            n_streams, (F.col("stream_id") * 14).cast("int")
        )
        .write.mode("append")
        .option("batchsize", 10_000)
        .jdbc(url, table, properties={"driver": DERBY_DRIVER})
    )
    # retry-proof readback: trade_id dedups any transiently re-appended
    # partition (same contract as the streaming JDBC sink)
    back = _read_jdbc(spark, url, table).dropDuplicates(["trade_id"])
    return (
        back.groupBy("stream_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("volume").cast("long").alias("stream_volume"),
            F.round(F.sum(F.col("price") * F.col("volume")), 2).alias(
                "notional"
            ),
        )
    )


def q_validate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 annotate: every trade with is_valid + first-failing reject_reason."""
    # NOTE: no fan_out here — validation must stay a pure map-side pass
    # (zero shuffles at any scale); test_validation_is_shuffle_free guards it
    return with_validation(load_trades(spark, sf_dir)).select(
        "trade_id", "symbol", "price", "volume", "is_valid", "reject_reason"
    )


def q_validate_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 reject side: dead-letter rows with reasons."""
    _, rejects = split_valid(load_trades(spark, sf_dir))
    return rejects.select("trade_id", "symbol", "price", "volume", "reject_reason")


def q_validation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: total/valid/rejected counters."""
    from marketstream_etl_spark.operators.validation import validation_counts

    return validation_counts(load_trades(spark, sf_dir))


def q_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: validate → per-symbol SMA/RSI/VWAP snapshot (A1-A4)."""
    ind = compute_indicators(_valid_trades_cached(spark, sf_dir), period=5)
    return ind.select(
        "symbol",
        F.round("sma", 6).alias("sma"),
        F.round("rsi", 6).alias("rsi"),
        F.round("vwap", 6).alias("vwap"),
        "period",
    )


def q_rsi_wilder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension: Wilder-smoothed RSI per symbol (closed-form EMA
    weights — see operators/indicators.compute_rsi_wilder)."""
    out = compute_rsi_wilder(_valid_trades_cached(spark, sf_dir), period=14)
    return out.select(
        "symbol",
        "n_changes",
        F.round("rsi_wilder", 4).alias("rsi_wilder"),
        "signal",
    )


def q_trade_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: SELECT COUNT(*) FROM trades (README.md:229)."""
    return load_trades(spark, sf_dir).agg(F.count("*").alias("n_trades"))


def q_symbol_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/O3: per-symbol trade count + total volume, busiest first
    (README.md:232-235)."""
    return (
        load_trades(spark, sf_dir)
        .groupBy("symbol")
        .agg(F.count("*").alias("trades"), F.sum("volume").alias("total_volume"))
        .orderBy(F.desc("trades"), "symbol")
    )


def q_rsi_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/O2/X5: latest RSI signals with OVERBOUGHT/OVERSOLD/NEUTRAL label
    (README.md:238-245). computed_at is a fixed injected stamp."""
    ind = compute_indicators(
        _valid_trades_cached(spark, sf_dir), period=5,
        computed_at_ns=FIXED_COMPUTED_AT_NS,
    )
    return (
        ind.select(
            "symbol",
            F.round("rsi", 6).alias("rsi"),
            rsi_signal(F.col("rsi")).alias("signal"),
            # integer µs from the constant: ns/1000 in double would lose
            # precision above 2^53, so divide driver-side
            F.timestamp_micros(F.lit(FIXED_COMPUTED_AT_NS // 1000)).alias(
                "computed_ts"
            ),
        )
        .orderBy(F.desc("computed_ts"), "symbol")
        .limit(20)
    )


def q_symbol_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/F5: single-symbol time-range scan — WHERE symbol='PURCHASE' AND
    timestamp range, ordered (README.md:248-251). Partition-prunable shape."""
    trades = load_trades(spark, sf_dir)
    return (
        trades.filter(F.col("symbol") == "PURCHASE")
        .filter(F.col("timestamp") > 0)
        .select("trade_id", "symbol", F.round("price", 6).alias("price"), "timestamp")
        .orderBy("timestamp", "trade_id")
    )


def q_vwap_by_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 standalone: per-symbol VWAP over all valid trades."""
    valid, _ = split_valid(load_trades(spark, sf_dir, fan_out=True))
    return (
        valid.groupBy("symbol")
        .agg(
            F.round(
                F.sum(F.col("price") * F.col("volume"))
                / F.sum(F.col("volume").cast("double")),
                6,
            ).alias("vwap")
        )
    )


def _ohlc_aggs():
    """The struct-key OHLC aggregate block shared by time bars and volume
    bars: open/close are min/max of a (timestamp, trade_id, price) struct
    (lexicographic, trade_id unique so price never participates) — plain
    re-aggregable partials, no window sort."""
    key = F.struct("timestamp", "trade_id", "price")
    return [
        F.round(F.min(key).getField("price"), 4).alias("open"),
        F.round(F.max("price"), 4).alias("high"),
        F.round(F.min("price"), 4).alias("low"),
        F.round(F.max(key).getField("price"), 4).alias("close"),
        F.sum("volume").alias("bar_volume"),
        F.count("*").alias("n_trades"),
    ]


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute OHLCV bars per symbol — the time-series resample every
    market pipeline ships but the reference never built (its indicators
    fold the whole batch, SURVEY §2.4).

    Open/close are the first/last trade by (timestamp, trade_id) within
    the bar, taken as min/max of a (timestamp, trade_id, price) struct —
    lexicographic struct ordering makes them plain aggregates, so the
    whole bar is ONE hash aggregate with map-side partials: one shuffle
    on (symbol, bar), no window sort at all.  trade_id is unique, so the
    price field never participates in the comparison.  Bar state is
    bounded by the minute grid, never by trade count."""
    t = load_trades(spark, sf_dir, fan_out=True)
    # integer DIV — ns magnitudes exceed double's 2^53 mantissa, so a
    # float divide would misplace boundary trades by one bar
    bar = F.expr("timestamp DIV 60000000000")
    return (
        t.withColumn("bar", bar)
        .groupBy("symbol", "bar")
        .agg(*_ohlc_aggs())
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-symbol minute grid with forward-filled close — the
    resample-then-ffill step that turns sparse tick bars into an
    equally-spaced series (model-feature prerequisite; nothing in the
    reference fills gaps).

    grid = explode(sequence(min_bar, max_bar)) per symbol (bounded by the
    time span, not the trade count), left join the real bars, then
    last(close, ignorenulls) over an unbounded-preceding row frame carries
    the latest observation forward.  close-per-bar is a max-of-struct
    aggregate (no window sort, see q_ohlc_bars); the bar bounds come from
    a separate lightweight agg on the raw trades so the bars frame has
    exactly one consumer and is never recomputed."""
    from pyspark.sql import Window

    t = load_trades(spark, sf_dir, fan_out=True)
    bar = F.expr("timestamp DIV 60000000000")
    key = F.struct("timestamp", "trade_id", "price")
    bars = (
        t.withColumn("bar", bar)
        .groupBy("symbol", "bar")
        .agg(F.max(key).getField("price").alias("close"))
    )
    bounds = t.select("symbol", bar.alias("bar")).groupBy("symbol").agg(
        F.min("bar").alias("lo"), F.max("bar").alias("hi")
    )
    grid = bounds.select(
        "symbol", F.explode(F.sequence("lo", "hi")).alias("bar")
    )
    wf = (
        Window.partitionBy("symbol")
        .orderBy("bar")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = grid.join(bars, ["symbol", "bar"], "left").withColumn(
        "ffill", F.last("close", ignorenulls=True).over(wf)
    )
    return (
        filled.groupBy("symbol")
        .agg(
            F.count("*").alias("n_minutes"),
            F.sum(F.when(F.col("close").isNull(), 1).otherwise(0)).alias(
                "n_gaps"
            ),
            F.round(F.sum("ffill"), 2).alias("filled_sum"),
        )
    )


def _minute_closes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(symbol, minute-bar) close — shared input of the co-movement
    statistics below.  Same struct-max trick as q_ohlc_bars: one shuffle,
    no window sort.

    Nonpositive closes are excluded: they are parser-default artifacts
    (rejected rows carry price 0.0), meaningless in a return/drawdown
    series, and under ANSI mode a 0 close reaching lag-ratio or
    running-peak division aborts the job (hit at sf0.1, where 6 of 80k
    bars close at the 0.0 default).  Every consumer's oracle applies the
    identical price > 0 filter."""
    t = load_trades(spark, sf_dir, fan_out=True)
    bar = F.expr("timestamp DIV 60000000000")
    key = F.struct("timestamp", "trade_id", "price")
    return (
        t.withColumn("bar", bar)
        .groupBy("symbol", "bar")
        .agg(F.max(key).getField("price").alias("close"))
        .filter(F.col("close") > 0)
    )


def q_pairwise_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + covariance of minute closes for every symbol
    pair — the co-movement matrix behind pairs-trading screens.  The
    statistical aggregate surface (corr, covar_samp) the reference has no
    analog for.

    Scale: the self-join is on the minute bar (equi-join, both sides
    already aggregated to |symbols| x |minutes| rows); s1 < s2 keeps each
    unordered pair once.  corr/covar are single-pass co-moment aggregates
    with map-side partials."""
    closes = _minute_closes(spark, sf_dir)
    a = closes.alias("a")
    b = closes.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bar") == F.col("b.bar"))
        & (F.col("a.symbol") < F.col("b.symbol")),
    )
    return (
        pairs.groupBy(
            F.col("a.symbol").alias("symbol_a"),
            F.col("b.symbol").alias("symbol_b"),
        )
        .agg(
            F.count("*").alias("n_bars"),
            F.round(F.corr("a.close", "b.close"), 6).alias("corr_close"),
            F.round(F.covar_samp("a.close", "b.close"), 4).alias(
                "covar_close"
            ),
        )
    )


def q_symbol_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol beta to the equal-weight market index: regress each
    symbol's minute close on the cross-symbol mean close of that minute
    with the regr_* aggregate family (slope / intercept / r2) — single-pass
    co-moment aggregates, one broadcastable index join."""
    closes = _minute_closes(spark, sf_dir)
    index = closes.groupBy("bar").agg(F.avg("close").alias("index_close"))
    joined = closes.join(index, "bar")
    return (
        joined.groupBy("symbol")
        .agg(
            F.count("*").alias("n_bars"),
            F.round(F.regr_slope("close", "index_close"), 6).alias("beta"),
            F.round(F.regr_intercept("close", "index_close"), 4).alias(
                "alpha"
            ),
            F.round(F.regr_r2("close", "index_close"), 6).alias("r2"),
        )
    )


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per symbol over the minute-close series: the
    deepest relative drop from a running peak — the risk statistic every
    market engine reports, built from a cumulative-max window frame
    (unbounded preceding) the reference's hand-rolled trailing windows
    cannot express.

    Scale: one shuffle to the bars, one sort per symbol partition for the
    running max, then a tiny per-symbol aggregate."""
    from pyspark.sql import Window

    closes = _minute_closes(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = closes.withColumn("peak", F.max("close").over(w)).withColumn(
        "drawdown", (F.col("close") - F.col("peak")) / F.col("peak")
    )
    return (
        dd.groupBy("symbol")
        .agg(
            F.count("*").alias("n_bars"),
            F.round(F.max("peak"), 4).alias("peak_close"),
            F.round(F.min("drawdown"), 6).alias("max_drawdown"),
        )
    )


def q_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via the Observation API: data-quality
    counters (rows, invalid rows, distinct-symbol price sum) collected as
    a side effect of ONE pass over the validated trades — no second scan,
    no separate metrics query.  At 100 TB a monitoring re-scan is a real
    cost; `observe` rides the action the pipeline already runs.

    The observed metrics are returned as the result frame; the oracle
    recomputes them relationally."""
    from pyspark.sql import Observation

    t = with_validation(load_trades(spark, sf_dir))
    obs = Observation("etl_quality")
    observed = t.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~F.col("is_valid")).cast("long")).alias("n_invalid"),
        F.round(F.sum(F.when(F.col("is_valid"), F.col("price"))), 4).alias(
            "valid_price_sum"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()  # the one action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_invalid"], m["valid_price_sum"])],
        "n_rows long, n_invalid long, valid_price_sum double",
    )


def q_ewma_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the minute close, alpha =
    0.2, as a CLOSED-FORM weighted aggregate (the compute_rsi_wilder
    unrolling applied to the plain EWMA recursion): ordered close j of n
    contributes alpha*(1-alpha)^(n-j), the seed keeps (1-alpha)^(n-1).
    No iterative loop, no per-row state — one rank window plus one hash
    aggregate, fully parallel at any history length (old terms underflow
    to zero harmlessly)."""
    from pyspark.sql import Window

    alpha = 0.2
    closes = _minute_closes(spark, sf_dir)
    w_asc = Window.partitionBy("symbol").orderBy("bar")
    w_all = Window.partitionBy("symbol")
    ann = closes.select(
        "symbol",
        "close",
        F.row_number().over(w_asc).alias("j"),
        F.count("*").over(w_all).alias("n"),
    )
    decay = F.lit(1.0 - alpha)
    weight = F.when(
        F.col("j") == 1, F.pow(decay, F.col("n") - 1)
    ).otherwise(F.lit(alpha) * F.pow(decay, F.col("n") - F.col("j")))
    return (
        ann.groupBy("symbol")
        .agg(
            F.max("n").alias("n_bars"),
            F.round(F.sum(weight * F.col("close")), 4).alias("ewma_close"),
            F.round(F.max_by("close", "j"), 4).alias("last_close"),
        )
    )


def q_realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol realized volatility: stddev of log minute-close returns
    (lag window -> ln ratio -> stddev_samp), plus the mean return — the
    volatility input to any risk model, exercising lag + log + stddev over
    the shared minute-close series.  One extra sort per symbol partition
    for the lag; everything else is re-aggregable."""
    from pyspark.sql import Window

    closes = _minute_closes(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar")
    rets = closes.withColumn(
        "log_ret", F.log(F.col("close") / F.lag("close").over(w))
    ).filter(F.col("log_ret").isNotNull())
    return (
        rets.groupBy("symbol")
        .agg(
            F.count("*").alias("n_returns"),
            F.round(F.stddev_samp("log_ret"), 6).alias("volatility"),
            F.round(F.avg("log_ret"), 6).alias("mean_return"),
        )
    )


def q_order_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buy/sell order-flow imbalance per symbol: conditional aggregation
    over the side column, (buy_vol - sell_vol) / total_vol — the
    microstructure pressure metric, a single hash aggregate."""
    t = load_trades(spark, sf_dir, fan_out=True)
    buy_vol = F.sum(F.when(F.col("side") == "B", F.col("volume")).otherwise(0))
    sell_vol = F.sum(F.when(F.col("side") == "S", F.col("volume")).otherwise(0))
    return (
        t.groupBy("symbol")
        .agg(
            buy_vol.alias("buy_volume"),
            sell_vol.alias("sell_volume"),
            F.round(
                (buy_vol - sell_vol)
                / F.greatest(buy_vol + sell_vol, F.lit(1)).cast("double"),
                6,
            ).alias("imbalance"),
        )
    )


def q_dedup_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK semantics (S8's ON CONFLICT DO NOTHING analog): keep one row per
    trade_id — dropDuplicates on the key, then count as evidence."""
    trades = load_trades(spark, sf_dir)
    return trades.dropDuplicates(["trade_id"]).agg(
        F.count("*").alias("n_unique_trades")
    )


OUTLIER_Z = 2.0  # flag threshold; random-walk prices rarely exceed |z|>3


def q_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol price anomaly detection: z-score each trade against its
    symbol's mean/stddev and count |z| > 2 flags plus the worst excursion
    — the data-quality tripwire a feed pipeline runs continuously.

    Shape: one hash aggregate produces the 10-row stats frame, which
    broadcasts back onto the scan (map-side z), and a second hash
    aggregate reduces to per-symbol counters — no window over the fact
    table, so nothing ever sorts the corpus."""
    t = load_trades(spark, sf_dir, fan_out=True)
    stats = t.groupBy("symbol").agg(
        F.avg("price").alias("mu"),
        F.stddev_samp("price").alias("sd"),
    )
    # sd == 0 (constant-price symbol) counts zero anomalies instead of
    # aborting under ANSI division — same guard as streaming_anomaly
    z = F.when(
        F.col("sd") > 0,
        F.abs((F.col("price") - F.col("mu")) / F.col("sd")),
    ).otherwise(F.lit(0.0))
    return (
        t.join(F.broadcast(stats), "symbol")
        .withColumn("abs_z", z)
        .groupBy("symbol")
        .agg(
            F.count("*").alias("n_trades"),
            F.sum(
                F.when(F.col("abs_z") > OUTLIER_Z, 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.round(F.max("abs_z"), 4).alias("max_abs_z"),
        )
    )


def q_return_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol serial dependence of minute returns: Pearson
    autocorrelation at lags 1 and 2 over the shared minute-close log
    returns — the mean-reversion/momentum diagnostic next to
    realized_volatility.  Two lag columns from one window pass, then a
    single hash aggregate of corr() pairs; nothing beyond the per-symbol
    sort the return series already needs."""
    from pyspark.sql import Window

    closes = _minute_closes(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bar")
    rets = closes.withColumn(
        "log_ret", F.log(F.col("close") / F.lag("close").over(w))
    ).filter(F.col("log_ret").isNotNull())
    lagged = (
        rets.withColumn("lag1", F.lag("log_ret", 1).over(w))
        .withColumn("lag2", F.lag("log_ret", 2).over(w))
    )
    return (
        lagged.groupBy("symbol")
        .agg(
            F.count("*").alias("n_returns"),
            F.round(F.corr("log_ret", "lag1"), 6).alias("autocorr_lag1"),
            F.round(F.corr("log_ret", "lag2"), 6).alias("autocorr_lag2"),
        )
    )


def q_vwap_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execution-quality analytics: per-symbol slippage of each fill
    against the RUNNING VWAP at trade time — avg/max absolute deviation
    plus the trade count.  The post-trade TCA readout a desk runs per
    session; per symbol one ordered cumulative window (a single
    hashpartitioning(symbol) exchange shared with every other per-symbol
    stage at scale).

    Cross-engine determinism: cumulative price×volume mass uses INTEGER
    cents (floor(price·100 + 0.5) × volume) so the window sum is exact in
    both engines regardless of accumulation order; the per-row deviation
    is then plain IEEE arithmetic, fixed-pointed via floor(|dev|·1e6+0.5)
    so the per-symbol sum is order-independent."""
    from pyspark.sql import Window

    from marketstream_etl_spark.plans.trades_view import load_trades

    trades = load_trades(spark, sf_dir).filter(
        (F.col("price") > 0) & (F.col("volume") > 0)
    )
    cents = F.floor(F.col("price") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("symbol")
        .orderBy("timestamp", "trade_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_pv = F.sum(cents * F.col("volume")).over(w)
    cum_v = F.sum("volume").over(w)
    vwap = cum_pv.cast("double") / (cum_v.cast("double") * F.lit(100.0))
    dev_fp = F.floor(
        F.abs(F.col("price") - vwap) * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    per_row = trades.select("symbol", dev_fp.alias("dev_fp"))
    return (
        per_row.groupBy("symbol")
        .agg(
            F.count("*").alias("n_trades"),
            (
                F.floor(
                    F.sum("dev_fp").cast("double")
                    / F.count("*").cast("double")
                    + F.lit(0.5)
                ).cast("double")
                / F.lit(1e6)
            ).alias("avg_abs_dev"),
            (F.max("dev_fp").cast("double") / F.lit(1e6)).alias(
                "max_abs_dev"
            ),
        )
    )


def q_symbol_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between symbols: for every symbol pair, how
    many accounts traded BOTH, with the lift vs independence
    (n_both·n_accounts / (n_a·n_b)) — the co-trading structure readout
    behind cross-margin and correlated-flow monitoring.

    Scale shape: the classic pair-counting reduction of frequent-itemset
    mining — distinct (account, symbol) rows self-join per account, so
    work is Σ_u |symbols(u)|², bounded by the (small, fixed) symbol
    universe per account, never corpus-quadratic.  Counts are exact
    integers; lift is one deterministic division, fixed-point rounded."""
    from marketstream_etl_spark.plans.trades_view import load_trades

    trades = load_trades(spark, sf_dir).filter(
        (F.col("price") > 0) & (F.col("volume") > 0)
    )
    # localCheckpoint: `held` feeds four consumers (total, per-symbol,
    # both self-join sides) — without a materialization point the events
    # scan + distinct re-runs per consumer (the token_drift plan lesson).
    # The frame is (accounts × symbols-held) slim rows; blocks are freed
    # when the query's RDD is GC'd.
    held = (
        trades.select(F.col("order_id").alias("account"), "symbol")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # 1-row broadcast frame, not an eager .count(): the total stays inside
    # the lazy plan (no extra job per construction call)
    n_accounts = held.agg(
        F.countDistinct("account").alias("n_accounts")
    )
    per_sym = held.groupBy("symbol").agg(
        F.count("*").alias("n_sym")
    )
    a = held.select("account", F.col("symbol").alias("symbol_a"))
    b = held.select("account", F.col("symbol").alias("symbol_b"))
    pairs = (
        a.join(b, "account")
        .filter(F.col("symbol_a") < F.col("symbol_b"))
        .groupBy("symbol_a", "symbol_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = per_sym.select(
        F.col("symbol").alias("symbol_a"), F.col("n_sym").alias("n_a")
    )
    sb = per_sym.select(
        F.col("symbol").alias("symbol_b"), F.col("n_sym").alias("n_b")
    )
    lift = (
        F.floor(
            F.col("n_both").cast("double")
            * F.col("n_accounts").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("double")
        / F.lit(1e6)
    )
    return (
        pairs.join(sa, "symbol_a")
        .join(sb, "symbol_b")
        .crossJoin(F.broadcast(n_accounts))
        .select("symbol_a", "symbol_b", "n_both", lift.alias("lift"))
    )


BOLL_N = 20  # rolling window length (bars)


def q_bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band analytics per symbol: over the minute-close series,
    a rolling 20-bar mean ± 2σ band; count closes breaching above /
    below, and report the last full-window bar's mid / σ / %B — the
    mean-reversion channel readout every charting engine ships.

    Cross-engine determinism — the breach comparison is knife-edge on
    floats, so it is evaluated in EXACT INTEGERS: with cents c, window
    sums S = Σc, Q = Σc² (BIGINT, n = 20 full windows only),
        breach_above  ⟺  n·c − S > 0  ∧  (n−1)·(n·c−S)² > 4n·(nQ−S²)
    (the ±2σ test squared; both sides exact BIGINTs, |values| < 2⁵⁵).
    The reported mid/σ/%B are IEEE doubles derived from the same exact
    integers via identical expression trees in both engines (σ via the
    correctly-rounded sqrt), NULL %B on zero-variance windows (guarded by
    the INTEGER zero test, not a float compare).

    Scale: one hashpartitioning(symbol) exchange shared with the other
    per-symbol series, one in-partition sort, three window sums in one
    frame pass, then a tiny per-symbol aggregate."""
    from pyspark.sql import Window

    n = BOLL_N
    closes = _minute_closes(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("bar")
        .rowsBetween(-(n - 1), 0)
    )
    c = F.floor(F.col("close") * 100 + F.lit(0.5)).cast("long")
    ann = (
        closes.withColumn("c", c)
        .select(
            "symbol",
            "bar",
            "c",
            F.count("*").over(w).alias("m"),
            F.sum("c").over(w).alias("s"),
            F.sum(F.col("c") * F.col("c")).over(w).alias("q"),
        )
        .filter(F.col("m") == n)
    )
    d = F.col("c") * n - F.col("s")  # n·(c − mean), exact
    var_num = F.col("q") * n - F.col("s") * F.col("s")  # n²(n−1)/n · var
    beyond = (n - 1) * d * d > 4 * n * var_num
    sd_c = F.sqrt(var_num.cast("double") / F.lit(float(n * (n - 1))))
    pctb = F.when(
        var_num > 0,
        (
            (d.cast("double") / F.lit(float(n)))
            + F.lit(2.0) * sd_c
        )
        / (F.lit(4.0) * sd_c),
    )
    flagged = ann.select(
        "symbol",
        "bar",
        ((d > 0) & beyond).cast("long").alias("up"),
        ((d < 0) & beyond).cast("long").alias("down"),
        (F.col("s").cast("double") / F.lit(float(n) * 100.0)).alias("mid"),
        (sd_c / F.lit(100.0)).alias("sd"),
        pctb.alias("pctb"),
    )
    return (
        flagged.groupBy("symbol")
        .agg(
            F.count("*").alias("n_eval"),
            F.sum("up").alias("breach_above"),
            F.sum("down").alias("breach_below"),
            F.round(F.max_by("mid", "bar"), 4).alias("last_mid"),
            F.round(F.max_by("sd", "bar"), 6).alias("last_sd"),
            F.round(F.max_by("pctb", "bar"), 6).alias("last_pctb"),
        )
    )


# --- information-driven bars -------------------------------------------------

VOLUME_BAR_SIZE = 10_000  # shares per bar (~10 bars/symbol at sf0.01)


def q_volume_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume bars: per symbol, a new bar every VOLUME_BAR_SIZE shares of
    cumulative traded volume (López de Prado's information-driven
    sampling — equal-information bars instead of equal-time bars, so
    busy regimes get more bars and quiet ones fewer).

    bar_id = (running volume BEFORE the trade) DIV bar size — integer
    arithmetic end-to-end; open/close are struct min/max exactly like
    q_ohlc_bars (no window sort in the aggregate).

    Scale: ONE shuffle on symbol feeds the cumulative-volume window; the
    (symbol, bar) hash aggregate reuses the same partitioning map-side."""
    t = load_trades(spark, sf_dir, fan_out=True)
    cum = t.withColumn(
        "bar",
        F.expr(
            f"div(sum(volume) over (partition by symbol "
            f"order by timestamp, trade_id "
            f"rows between unbounded preceding and current row) - volume, "
            f"{VOLUME_BAR_SIZE})"
        ),
    )
    return (
        cum.groupBy("symbol", "bar")
        .agg(*_ohlc_aggs())
    )


# --- purged k-fold with embargo ----------------------------------------------

PURGE_K = 5
PURGE_BLOCK_NS = 86_400_000_000_000  # 1-day blocks; the embargo unit


def q_purged_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged k-fold with embargo for time-series CV (López de Prado):
    contiguous 1-day blocks are assigned round-robin to K folds; for each
    test fold, training rows in the ±1 ADJACENT block residues are
    EMBARGOED (dropped) so serially-correlated samples cannot leak across
    the train/test boundary.  Output per fold: test / embargoed / train
    row counts and the train fraction.

    Scale: fold membership is pure modular arithmetic on the timestamp —
    map-side, no shuffle; the report derives every fold's numbers from a
    K-row residue-count frame (one tiny hash aggregate), so the fact
    table is scanned exactly once."""
    t = load_trades(spark, sf_dir, fan_out=True)
    res = (
        t.groupBy(
            F.pmod(
                F.expr(f"div(timestamp, {PURGE_BLOCK_NS})"), F.lit(PURGE_K)
            ).alias("r")
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    spine = spark.range(PURGE_K).select(F.col("id").alias("fold"))

    def _res_as(alias: str, col: str) -> DataFrame:
        return res.select(F.col("r").alias(f"r_{alias}"),
                          F.col("n").alias(col))

    total = res.agg(F.sum("n").alias("n_total"))
    out = (
        spine.join(
            _res_as("t", "n_test"), F.col("r_t") == F.col("fold"), "left"
        )
        .join(
            _res_as("p", "n_prev"),
            F.col("r_p") == F.pmod(F.col("fold") + 1, F.lit(PURGE_K)),
            "left",
        )
        .join(
            _res_as("q", "n_next"),
            F.col("r_q")
            == F.pmod(F.col("fold") - 1 + PURGE_K, F.lit(PURGE_K)),
            "left",
        )
        .join(F.broadcast(total))
    )
    n_test = F.coalesce("n_test", F.lit(0))
    n_emb = F.coalesce("n_prev", F.lit(0)) + F.coalesce("n_next", F.lit(0))
    n_train = F.col("n_total") - n_test - n_emb
    return out.select(
        "fold",
        n_test.alias("n_test"),
        n_emb.alias("n_embargoed"),
        n_train.alias("n_train"),
        F.round(
            n_train.cast("double") / F.col("n_total").cast("double"), 6
        ).alias("train_frac"),
    )


# --- microstructure estimators -------------------------------------------------

def q_microstructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol market-microstructure estimator panel:

    - Roll (1984) effective spread: 2·sqrt(−cov(Δp_t, Δp_{t−1})) from the
      serial covariance of consecutive price changes (NULL when the
      covariance is nonnegative — the model's no-estimate case);
    - Kyle's lambda: price impact as regr_slope(Δp, signed volume), the
      tick-rule sign taken from the trade side;
    - Amihud illiquidity: avg(|Δp| / p_prev / volume), scaled 1e6.

    One shuffle on symbol: the lag window produces Δp and the lagged Δp,
    then every estimator folds in the SAME hash aggregate — three
    estimators, one pass.  Doubles are rounded; the sqrt/cov/regr
    moments are the shared IEEE expression tree both engines evaluate
    identically (symbol_beta precedent)."""
    from pyspark.sql import Window

    t = load_trades(spark, sf_dir, fan_out=True)
    w = Window.partitionBy("symbol").orderBy("timestamp", "trade_id")
    d = (
        t.select("symbol", "timestamp", "trade_id", "price", "volume", "side")
        .withColumn("p_prev", F.lag("price").over(w))
        .withColumn("dp", F.col("price") - F.col("p_prev"))
        .withColumn("dp_prev", F.lag("dp").over(w))
        .withColumn(
            "signed_vol",
            F.when(F.col("side") == "B", F.col("volume")).otherwise(
                -F.col("volume")
            ).cast("double"),
        )
        # parser-default 0.0 prices / volumes would hit ANSI division —
        # the same nonpositive-close guard the statistics series uses
        .filter(
            F.col("dp").isNotNull()
            & (F.col("p_prev") > 0)
            & (F.col("volume") > 0)
        )
    )
    cov = F.covar_samp("dp", "dp_prev")
    return (
        d.groupBy("symbol")
        .agg(
            F.count("*").alias("n_changes"),
            F.round(
                F.when(cov < 0, F.lit(2.0) * F.sqrt(-cov)), 6
            ).alias("roll_spread"),
            F.round(F.regr_slope("dp", "signed_vol") * F.lit(1e6), 6).alias(
                "kyle_lambda_x1e6"
            ),
            F.round(
                F.avg(
                    F.abs(F.col("dp"))
                    / F.col("p_prev")
                    / F.col("volume").cast("double")
                )
                * F.lit(1e6),
                6,
            ).alias("amihud_x1e6"),
        )
    )


# --- candlestick patterns ------------------------------------------------------
# Classic single- and two-bar candlestick classification over the shared
# 1-minute OHLC bars — the chartist screen every market terminal ships
# (and the reference's domain, though it never built bars at all).
#
# Determinism: all shape tests are IEEE comparisons on the round-4 OHLC
# values both engines already agree on (the ohlc_bars row is
# hash-matched), and the two-bar patterns use lag() over the canonical
# (symbol, bar) order, mirrored exactly in the oracle.

def q_candlestick_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol candlestick pattern census over 1-minute bars.

    Patterns: doji (body <= 10% of range), hammer (lower shadow >= 2x
    body, upper <= body), shooting star (mirror), bullish/bearish
    engulfing (current body engulfs the previous bar's opposite-sign
    body, consecutive EXISTING bars via lag).

    Output: (symbol, n_bars, n_doji, n_hammer, n_shooting_star,
    n_bull_engulf, n_bear_engulf).

    Scale: bars are ONE hash aggregate on (symbol, bar) (struct-key
    open/close, no window over trades); the pattern window runs over the
    minute-bounded bars frame partitioned by symbol — never the trade
    stream."""
    from pyspark.sql import Window

    t = load_trades(spark, sf_dir, fan_out=True)
    bars = (
        t.withColumn("bar", F.expr("timestamp DIV 60000000000"))
        .groupBy("symbol", "bar")
        .agg(*_ohlc_aggs())
    )
    w = Window.partitionBy("symbol").orderBy("bar")
    body = F.abs(F.col("close") - F.col("open"))
    rng = F.col("high") - F.col("low")
    upper = F.col("high") - F.greatest("open", "close")
    lower = F.least("open", "close") - F.col("low")
    flagged = bars.select(
        "symbol",
        "bar",
        "open",
        "close",
        ((rng > 0) & (body <= rng * F.lit(0.1))).cast("int").alias("doji"),
        ((body > 0) & (lower >= body * 2) & (upper <= body))
        .cast("int")
        .alias("hammer"),
        ((body > 0) & (upper >= body * 2) & (lower <= body))
        .cast("int")
        .alias("shooting_star"),
        F.lag("open").over(w).alias("p_open"),
        F.lag("close").over(w).alias("p_close"),
    )
    bull = (
        (F.col("p_close") < F.col("p_open"))  # previous bearish
        & (F.col("close") > F.col("open"))  # current bullish
        & (F.col("open") <= F.col("p_close"))
        & (F.col("close") >= F.col("p_open"))
    )
    bear = (
        (F.col("p_close") > F.col("p_open"))
        & (F.col("close") < F.col("open"))
        & (F.col("open") >= F.col("p_close"))
        & (F.col("close") <= F.col("p_open"))
    )
    return (
        flagged.groupBy("symbol")
        .agg(
            F.count("*").alias("n_bars"),
            F.sum("doji").alias("n_doji"),
            F.sum("hammer").alias("n_hammer"),
            F.sum("shooting_star").alias("n_shooting_star"),
            F.sum(F.coalesce(bull.cast("int"), F.lit(0))).alias(
                "n_bull_engulf"
            ),
            F.sum(F.coalesce(bear.cast("int"), F.lit(0))).alias(
                "n_bear_engulf"
            ),
        )
    )


def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point alarms per symbol (operators/changepoint.py):
    the batch applyInPandas escape hatch — the alarm-reset recursion is
    not prefix-sum decomposable, so each symbol's bounded bar series
    runs through an Arrow-batched pandas loop in exact int64 fixed-point
    and a DuckDB RECURSIVE CTE replays it bit-for-bit."""
    from marketstream_etl_spark.operators.changepoint import (
        cusum_changepoints,
    )

    return cusum_changepoints(load_trades(spark, sf_dir, fan_out=True))
