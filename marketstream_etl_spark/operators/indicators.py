"""Technical indicators — SMA / RSI / VWAP (A1-A4) with exact reference
semantics, plus rolling per-row variants.

Reference: ``/root/reference/src/indicators/TechnicalIndicators.hpp``.
`compute_all` (:79-138) groups by symbol and emits ONE row per symbol:

- effective_period = min(period, n_rows_of_symbol)            (:125)
- SMA  = mean of the LAST effective_period prices             (:204-224)
- RSI  over the last min(effective_period, n-1) price changes (:249-290):
    avg_gain = Σ max(change,0)/count ; avg_loss = Σ max(-change,0)/count
    n < 2 or effective_period <= 1 → 50.0 ; avg_loss == 0 → 100.0
    else 100 − 100/(1 + avg_gain/avg_loss)
- VWAP = Σ(price·volume)/Σ(volume) over ALL the symbol's rows (:310-330);
  zero total volume → 0.0

"Last" is by (timestamp, trade_id) — the intended canonical ordering
(Trade.hpp:36-37; generator timestamps are monotone).

Spark-first plan: one shuffle on `symbol`.  The window functions
(row_number desc, lag) and the final groupBy all share the same hash
partitioning on symbol, so Catalyst reuses a single exchange; partial
aggregation happens map-side.  No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PERIOD = 5


def _annotated(trades: DataFrame) -> DataFrame:
    """Per-row helpers shared by the indicator aggregates: descending row
    number, group size, and lag-diff (price change)."""
    w_desc = Window.partitionBy("symbol").orderBy(
        F.col("timestamp").desc(), F.col("trade_id").desc()
    )
    w_asc = Window.partitionBy("symbol").orderBy("timestamp", "trade_id")
    w_all = Window.partitionBy("symbol")
    return trades.select(
        "symbol",
        "price",
        "volume",
        F.row_number().over(w_desc).alias("_rn_desc"),
        F.count("*").over(w_all).alias("_n"),
        (F.col("price") - F.lag("price").over(w_asc)).alias("_change"),
    )


def compute_indicators(
    trades: DataFrame,
    period: int = DEFAULT_PERIOD,
    computed_at_ns: int | None = None,
) -> DataFrame:
    """One indicator row per symbol — exact `compute_all` parity.

    Returns columns: symbol, sma, rsi, vwap, period
    (+ computed_at when `computed_at_ns` is given, mirroring the save-time
    stamp at DatabaseLoader.cpp:314-316 — injected for deterministic tests).
    """
    ann = _annotated(trades)
    eff = F.least(F.lit(period), F.col("_n"))  # effective_period (:125)
    # number of RSI changes actually averaged = min(effective_period, n-1)
    n_changes = F.least(eff, F.col("_n") - 1)

    in_sma = F.col("_rn_desc") <= eff
    in_rsi = F.col("_rn_desc") <= n_changes  # last row has no defined change
    # at the first row (_rn_desc == _n) _change is NULL; in_rsi excludes it
    gain = F.when(in_rsi & (F.col("_change") > 0), F.col("_change")).otherwise(F.lit(0.0))
    loss = F.when(in_rsi & (F.col("_change") < 0), -F.col("_change")).otherwise(F.lit(0.0))

    agg = ann.groupBy("symbol").agg(
        F.max("_n").alias("_n"),
        F.avg(F.when(in_sma, F.col("price"))).alias("_sma"),
        F.sum(gain).alias("_gain_sum"),
        F.sum(loss).alias("_loss_sum"),
        F.sum(F.col("price") * F.col("volume")).alias("_pv"),
        F.sum(F.col("volume").cast("double")).alias("_v"),
    )

    n = F.col("_n")
    eff_out = F.least(F.lit(period), n)
    n_ch = F.least(eff_out, n - 1).cast("double")
    avg_gain = F.col("_gain_sum") / n_ch
    avg_loss = F.col("_loss_sum") / n_ch
    rsi = (
        F.when((n < 2) | (eff_out <= 1), F.lit(50.0))
        .when(avg_loss == 0.0, F.lit(100.0))
        .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss))
    )
    vwap = F.when(F.col("_v") == 0.0, F.lit(0.0)).otherwise(F.col("_pv") / F.col("_v"))

    out = agg.select(
        "symbol",
        F.col("_sma").alias("sma"),
        rsi.alias("rsi"),
        vwap.alias("vwap"),
        eff_out.cast("int").alias("period"),
    )
    if computed_at_ns is not None:
        out = out.withColumn("computed_at", F.lit(int(computed_at_ns)).cast("long"))
    return out


def compute_indicators_sums(trades: DataFrame) -> DataFrame:
    """Whole-history indicator snapshot in PURE codegen sums — the
    reference-speed lever documented in README's indicators-floor decision
    note.  One hash aggregate, no window, no second pass: measures at the
    ~170-213 ms scan floor on 1M rows (tests/test_indicator_floor.py),
    i.e. at par with the reference's 150 ms single-thread fold.

    SEMANTIC TRADE, stated plainly: `sma` here averages ALL of a symbol's
    trades (not the last N) and there is NO RSI column — RSI needs ordered
    price diffs, and any exact ordered-diff mechanism is precisely the
    ~0.5 s last-N tail cost this variant exists to avoid.  `vwap` is exact
    (it is whole-history by definition).  NOT the pipeline default; see
    the decision note for why exact last-N semantics win."""
    agg = trades.groupBy("symbol").agg(
        F.count("*").alias("n_trades"),
        F.avg("price").alias("sma_all"),
        F.sum(F.col("price") * F.col("volume")).alias("_pv"),
        F.sum(F.col("volume").cast("double")).alias("_v"),
    )
    vwap = F.when(F.col("_v") == 0.0, F.lit(0.0)).otherwise(
        F.col("_pv") / F.col("_v")
    )
    return agg.select("symbol", "n_trades", "sma_all", vwap.alias("vwap"))


def rsi_signal(rsi: Column) -> Column:
    """F4: RSI → OVERBOUGHT / OVERSOLD / NEUTRAL label
    (TechnicalIndicators.hpp:157-163, README.md:239-241)."""
    return (
        F.when(rsi >= 70, F.lit("OVERBOUGHT"))
        .when(rsi <= 30, F.lit("OVERSOLD"))
        .otherwise(F.lit("NEUTRAL"))
    )


def rolling_indicators(trades: DataFrame, period: int = DEFAULT_PERIOD) -> DataFrame:
    """Per-ROW rolling variants (the natural engine generalization of the
    reference's end-of-batch snapshot): trailing `period`-row SMA, trailing
    RSI, and running VWAP, per symbol ordered by (timestamp, trade_id).

    All three share one window partitioning → a single shuffle on symbol.
    """
    w = Window.partitionBy("symbol").orderBy("timestamp", "trade_id")
    w_sma = w.rowsBetween(-(period - 1), 0)
    w_rsi = w.rowsBetween(-(period - 1), 0)  # trailing `period` changes
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)

    change = F.col("price") - F.lag("price").over(w)
    df = trades.withColumn("_change", change)
    n_ch = F.count("_change").over(w_rsi)  # NULL first-change excluded
    avg_gain = F.sum(F.when(df["_change"] > 0, df["_change"]).otherwise(F.lit(0.0))).over(
        w_rsi
    ) / n_ch
    avg_loss = F.sum(
        F.when(df["_change"] < 0, -df["_change"]).otherwise(F.lit(0.0))
    ).over(w_rsi) / n_ch
    rsi = (
        F.when(n_ch < 1, F.lit(50.0))
        .when(avg_loss == 0.0, F.lit(100.0))
        .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss))
    )

    return (
        df.withColumn("sma", F.avg("price").over(w_sma))
        .withColumn("rsi", rsi)
        .withColumn(
            "vwap",
            F.sum(F.col("price") * F.col("volume")).over(w_run)
            / F.sum(F.col("volume").cast("double")).over(w_run),
        )
        .drop("_change")
    )


def compute_indicators_topk(
    trades: DataFrame,
    period: int = DEFAULT_PERIOD,
    computed_at_ns: int | None = None,
    n_salt: int = 32,
) -> DataFrame:
    """`compute_indicators` with the low-cardinality-key hazard removed.

    The window form partitions by symbol; with ~10 symbols (the reference's
    universe, DataGenerator.hpp:86-97) every row of a symbol lands on ONE
    reducer and the per-symbol sort serializes — fatal at 100 TB.  This
    variant never sorts the full history:

      1. VWAP + row count: plain groupBy(symbol) — map-side partial agg,
         parallelism independent of symbol count.
      2. last (period+1) rows per symbol: salted two-phase top-k
         (functions/topk.py) — every task's work is bounded by k·n_salt.
      3. SMA/RSI from the ≤(period+1)-row tail: array HOFs on a per-symbol
         array — O(period) per symbol.

    Output and semantics identical to `compute_indicators` (same clamps and
    edge cases, TechnicalIndicators.hpp:125,252-290).
    """
    from marketstream_etl_spark.functions.topk import top_k_per_key

    totals = trades.groupBy("symbol").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("price") * F.col("volume")).alias("_pv"),
        F.sum(F.col("volume").cast("double")).alias("_v"),
    )

    tail_rows = top_k_per_key(
        trades.select("symbol", "timestamp", "trade_id", "price"),
        key="symbol",
        order_by=[F.col("timestamp").desc(), F.col("trade_id").desc()],
        k=period + 1,
        salt_src="trade_id",
        n_salt=n_salt,
    )
    # rank 1 = most recent; array_sort on (rank, price) structs keeps the
    # most-recent-first order inside the collected array.
    tails = tail_rows.groupBy("symbol").agg(
        F.array_sort(F.collect_list(F.struct("rank", "price"))).alias("_t")
    )

    prices = F.col("_t").getField("price")  # most-recent-first
    # change between consecutive prices, most-recent change first:
    # changes[i] = prices[i] - prices[i+1]  (1-based element_at below)
    changes = F.expr(
        "transform(slice(_t.price, 1, size(_t.price) - 1),"
        " (p, i) -> p - element_at(_t.price, i + 2))"
    )

    joined = totals.join(tails, "symbol")
    n = F.col("_n")
    eff = F.least(F.lit(period), n)
    n_ch = F.least(eff, n - 1)

    sma_window = F.slice(prices, 1, eff)
    sma = F.aggregate(
        sma_window, F.lit(0.0), lambda acc, x: acc + x
    ) / eff.cast("double")

    used = F.slice(changes, 1, n_ch)
    gain_sum = F.aggregate(
        used, F.lit(0.0), lambda acc, x: acc + F.greatest(x, F.lit(0.0))
    )
    loss_sum = F.aggregate(
        used, F.lit(0.0), lambda acc, x: acc + F.greatest(-x, F.lit(0.0))
    )
    avg_gain = gain_sum / n_ch.cast("double")
    avg_loss = loss_sum / n_ch.cast("double")
    rsi = (
        F.when((n < 2) | (eff <= 1), F.lit(50.0))
        .when(avg_loss == 0.0, F.lit(100.0))
        .otherwise(
            F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss)
        )
    )
    vwap = F.when(F.col("_v") == 0.0, F.lit(0.0)).otherwise(
        F.col("_pv") / F.col("_v")
    )

    out = joined.select(
        "symbol",
        sma.alias("sma"),
        rsi.alias("rsi"),
        vwap.alias("vwap"),
        eff.cast("int").alias("period"),
    )
    if computed_at_ns is not None:
        out = out.withColumn(
            "computed_at", F.lit(int(computed_at_ns)).cast("long")
        )
    return out


def _tail_indicators(
    joined: DataFrame, period: int, computed_at_ns: int | None
) -> DataFrame:
    """Shared final step: given one row per symbol with `_n/_pv/_v` totals
    and `_tail` = last ≤(period+1) prices most-recent-first, emit the
    reference indicator row (same clamps/edge cases as compute_indicators,
    TechnicalIndicators.hpp:125,252-290)."""
    prices = F.col("_tail")
    # changes[i] = prices[i] - prices[i+1], most-recent change first
    changes = F.expr(
        "transform(slice(_tail, 1, size(_tail) - 1),"
        " (p, i) -> p - element_at(_tail, i + 2))"
    )
    n = F.col("_n")
    eff = F.least(F.lit(period), n)
    n_ch = F.least(eff, n - 1)

    sma = F.aggregate(
        F.slice(prices, 1, eff), F.lit(0.0), lambda acc, x: acc + x
    ) / eff.cast("double")
    used = F.slice(changes, 1, n_ch)
    gain_sum = F.aggregate(
        used, F.lit(0.0), lambda acc, x: acc + F.greatest(x, F.lit(0.0))
    )
    loss_sum = F.aggregate(
        used, F.lit(0.0), lambda acc, x: acc + F.greatest(-x, F.lit(0.0))
    )
    avg_gain = gain_sum / n_ch.cast("double")
    avg_loss = loss_sum / n_ch.cast("double")
    rsi = (
        F.when((n < 2) | (eff <= 1), F.lit(50.0))
        .when(avg_loss == 0.0, F.lit(100.0))
        .otherwise(
            F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss)
        )
    )
    vwap = F.when(F.col("_v") == 0.0, F.lit(0.0)).otherwise(
        F.col("_pv") / F.col("_v")
    )
    out = joined.select(
        "symbol",
        sma.alias("sma"),
        rsi.alias("rsi"),
        vwap.alias("vwap"),
        eff.cast("int").alias("period"),
    )
    if computed_at_ns is not None:
        out = out.withColumn(
            "computed_at", F.lit(int(computed_at_ns)).cast("long")
        )
    return out


def compute_indicators_fused(
    trades: DataFrame,
    period: int = DEFAULT_PERIOD,
    computed_at_ns: int | None = None,
) -> DataFrame:
    """Single-pass fused indicator aggregate — the scale plan.

    The window form sorts every row of a symbol on one reducer; the salted
    top-k form avoids the serialization but still SHUFFLES every row once.
    This variant shuffles almost nothing: group by (spark_partition_id,
    symbol) so each group is complete within its input partition — the
    "partial" aggregation IS the full group — computing count/Σpv/Σv plus a
    bounded last-(period+1) tail via array_sort+slice on the local rows.
    The exchange then moves only n_partitions × n_symbols tiny rows, and
    the final merge re-sorts ≤ n_partitions·(period+1) elements per symbol.

      map side : one pass, hash agg, O(rows·log(rows-per-group)) local sort
      shuffle  : n_partitions × n_symbols rows (~KBs at any input scale)
      reduce   : trivial

    Memory envelope: the local collect_list holds one input partition's rows
    for one symbol (≤ maxPartitionBytes worth) — bounded by the scan split
    size, independent of total table size, so the plan survives 100 TB with
    low-cardinality keys (the reference universe is ~10 symbols,
    DataGenerator.hpp:86-97).  Semantics identical to compute_indicators.
    """
    k = period + 1
    last_k = (  # last k elements of an ascending array, named `{col}`
        lambda col: f"slice({col}, greatest(size({col}) - {k} + 1, 1), {k})"
    )
    # ascending (timestamp, trade_id, price) structs; keep the LAST k
    local = (
        trades.groupBy(F.spark_partition_id().alias("_pid"), "symbol")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col("price") * F.col("volume")).alias("_pv"),
            F.sum(F.col("volume").cast("double")).alias("_v"),
            F.array_sort(
                F.collect_list(F.struct("timestamp", "trade_id", "price"))
            ).alias("_all"),
        )
        .select(
            "symbol", "_n", "_pv", "_v",
            F.expr(last_k("_all")).alias("_t"),
        )
    )
    merged = (
        local.groupBy("symbol")
        .agg(
            F.sum("_n").alias("_n"),
            F.sum("_pv").alias("_pv"),
            F.sum("_v").alias("_v"),
            F.array_sort(F.flatten(F.collect_list("_t"))).alias("_all"),
        )
        .select(
            "symbol", "_n", "_pv", "_v",
            # most-recent-first price tail
            F.expr(f"reverse(transform({last_k('_all')}, s -> s.price))").alias(
                "_tail"
            ),
        )
    )
    return _tail_indicators(merged, period, computed_at_ns)


def compute_rsi_wilder(
    trades: DataFrame, period: int = 14
) -> DataFrame:
    """Engine extension: Wilder-smoothed RSI (the industry-standard variant;
    the reference's RSI at TechnicalIndicators.hpp:249-290 uses a plain
    average over the trailing window instead).

    Wilder's recursion  avg_t = (avg_{t-1}·(period−1) + x_t) / period  with a
    simple-average seed over the first `period` changes is rewritten in
    CLOSED FORM so it stays a single shuffle with no iterative driver loop:
    with α = 1/period and m changes per symbol, change j (1-based, ordered by
    (timestamp, trade_id)) contributes weight

        m ≤ period : 1/m                      (seed regime — simple average)
        j ≤ period : (1−α)^(m−period) / period   (decayed seed share)
        else       : α · (1−α)^(m−j)             (recursion unrolled)

    avg_gain = Σ wⱼ·gainⱼ, avg_loss = Σ wⱼ·lossⱼ — exact, per-row weights,
    fully parallel partial aggregation.  At 100 TB this is the same plan
    shape as `compute_indicators`: one hash shuffle on symbol, no per-symbol
    sort of the full history in the aggregate itself (the lag/row_number
    window is the only sort, shared with every other indicator).

    Output: symbol, n_changes, rsi_wilder, signal — one row per symbol.
    """
    alpha = 1.0 / float(period)
    w_asc = Window.partitionBy("symbol").orderBy("timestamp", "trade_id")
    w_all = Window.partitionBy("symbol")

    ann = trades.select(
        "symbol",
        (F.col("price") - F.lag("price").over(w_asc)).alias("_change"),
        (F.row_number().over(w_asc) - F.lit(1)).alias("_j"),
        (F.count("*").over(w_all) - F.lit(1)).alias("_m"),
    ).filter(F.col("_change").isNotNull())

    m = F.col("_m").cast("double")
    j = F.col("_j").cast("double")
    decay = F.lit(1.0 - alpha)
    weight = (
        F.when(F.col("_m") <= period, F.lit(1.0) / m)
        .when(
            F.col("_j") <= period,
            F.pow(decay, m - F.lit(float(period))) / F.lit(float(period)),
        )
        .otherwise(F.lit(alpha) * F.pow(decay, m - j))
    )
    gain = F.greatest(F.col("_change"), F.lit(0.0))
    loss = F.greatest(-F.col("_change"), F.lit(0.0))

    agg = ann.groupBy("symbol").agg(
        F.max("_m").alias("n_changes"),
        F.sum(weight * gain).alias("_ag"),
        F.sum(weight * loss).alias("_al"),
    )
    rsi = (
        F.when(F.col("n_changes") < 1, F.lit(50.0))
        .when(F.col("_al") == 0.0, F.lit(100.0))
        .otherwise(
            F.lit(100.0)
            - F.lit(100.0) / (F.lit(1.0) + F.col("_ag") / F.col("_al"))
        )
    )
    return agg.select(
        "symbol",
        "n_changes",
        rsi.alias("rsi_wilder"),
    ).withColumn("signal", rsi_signal(F.col("rsi_wilder")))


def compute_indicators_auto(
    trades: DataFrame,
    period: int = DEFAULT_PERIOD,
    computed_at_ns: int | None = None,
    partition_threshold: int = 8,
) -> DataFrame:
    """Strategy dispatch: the window form wins on small inputs (one
    exchange, no join); the fused partial-aggregate form wins once
    per-symbol history outgrows a single reducer — it moves only
    n_partitions × n_symbols rows through the exchange, so it is the only
    shape whose shuffle volume is independent of input size (measured 1M
    floor study: tests/test_indicator_floor.py, README §performance).
    Input partition count is the cheap, statistics-free size proxy."""
    n_parts = trades.rdd.getNumPartitions()
    if n_parts >= partition_threshold:
        return compute_indicators_fused(
            trades, period=period, computed_at_ns=computed_at_ns
        )
    return compute_indicators(
        trades, period=period, computed_at_ns=computed_at_ns
    )
