"""As-of join: enrich each trade with the latest indicator row at or before
its timestamp (the reference's implied trades↔technical_indicators relation,
README.md:115 "what was RELIANCE RSI at 10:30 yesterday").

Spark has no native as-of join; the scalable composition is
union-and-window: tag both sides, union on (symbol, time), and carry the
last indicator forward with a window `last(..., ignorenulls=True)` — one
shuffle on symbol, no range explosion, no per-group Python.  (The
`pd.merge_asof`-in-applyInPandas alternative ships every group through
Arrow; keep it JVM-side instead.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_indicators(trades: DataFrame, indicators: DataFrame) -> DataFrame:
    """For each trade: the most recent indicator (computed_at <= timestamp).

    trades:     symbol, timestamp(ns), ... (passed through)
    indicators: symbol, computed_at(ns), sma, rsi, vwap
    """
    ind = indicators.select(
        "symbol",
        F.col("computed_at").alias("t"),
        F.lit(1).alias("_is_ind"),
        "sma",
        "rsi",
        "vwap",
        F.lit(None).cast("long").alias("trade_id"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("int").alias("volume"),
    )
    tr = trades.select(
        "symbol",
        F.col("timestamp").alias("t"),
        F.lit(0).alias("_is_ind"),
        F.lit(None).cast("double").alias("sma"),
        F.lit(None).cast("double").alias("rsi"),
        F.lit(None).cast("double").alias("vwap"),
        "trade_id",
        "price",
        "volume",
    )
    # indicators sort before trades at equal t (_is_ind desc) so an indicator
    # stamped exactly at the trade's timestamp is visible to it
    w = (
        Window.partitionBy("symbol")
        .orderBy(F.col("t"), F.col("_is_ind").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = ind.unionByName(tr).select(
        "*",
        F.last(F.when(F.col("_is_ind") == 1, F.col("sma")), ignorenulls=True)
        .over(w)
        .alias("asof_sma"),
        F.last(F.when(F.col("_is_ind") == 1, F.col("rsi")), ignorenulls=True)
        .over(w)
        .alias("asof_rsi"),
        F.last(F.when(F.col("_is_ind") == 1, F.col("vwap")), ignorenulls=True)
        .over(w)
        .alias("asof_vwap"),
    )
    return merged.filter(F.col("_is_ind") == 0).select(
        "trade_id",
        "symbol",
        F.col("t").alias("timestamp"),
        "price",
        "volume",
        "asof_sma",
        "asof_rsi",
        "asof_vwap",
    )
