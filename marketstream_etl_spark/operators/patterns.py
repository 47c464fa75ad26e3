"""Time-series pattern similarity search — find the windows most similar
to a query pattern across every symbol's minute-close series (the
subsequence-similarity-search shape of the streaming time-series
literature, e.g. EDBT'19 distributed similarity search).

Spark-first plan: minute closes are ONE hash aggregate (max-of-struct
close, no window sort); candidate windows come from a frame-bounded
collect_list (rows between current and p−1 following) — a single shuffle
on symbol; scoring is mean-centered Euclidean distance via array HOFs
(JVM codegen, no UDFs); the global top-k is a TakeOrdered, not a full
sort.  At 100 TB the per-symbol series fit the window operator because
the MINUTE GRID bounds rows (1440/day/symbol), not the trade count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PATTERN_LEN = 8
TOP_K = 5
MINUTE_NS = 60_000_000_000


def minute_closes(trades: DataFrame) -> DataFrame:
    """Per-(symbol, minute) close = price of the last trade by
    (timestamp, trade_id) — max-of-struct, one aggregate, no sort."""
    key = F.struct("timestamp", "trade_id", "price")
    return (
        trades.withColumn("bar", F.expr(f"timestamp DIV {MINUTE_NS}"))
        .groupBy("symbol", "bar")
        .agg(F.max(key).getField("price").alias("close"))
    )


def _centered(arr):
    mean = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.size(arr)
    return F.transform(arr, lambda x: x - mean)


def pattern_similarity(
    trades: DataFrame, p: int = PATTERN_LEN, top_k: int = TOP_K
) -> DataFrame:
    """Top-k windows most similar to the query pattern (the FIRST p-bar
    window of the lexicographically smallest symbol — a deterministic
    stand-in for a user-supplied pattern), mean-centered Euclidean.
    The query's own window is excluded.  Windows are p consecutive
    OBSERVED bars (gaps skip, as in gap-tolerant tick data)."""
    closes = minute_closes(trades)
    w = Window.partitionBy("symbol").orderBy("bar")
    # persist: consumed three times (query-symbol scalar, query row, scoring)
    # and bounded by the minute grid (1440/day/symbol), never trade count
    wins = closes.select(
        "symbol",
        "bar",
        F.collect_list("close").over(w.rowsBetween(0, p - 1)).alias("wv"),
    ).filter(F.size("wv") == p).localCheckpoint(eager=False)
    # localCheckpoint, not persist: a bare persist here pins one cached
    # copy per invocation for the session lifetime (bench repeats); the
    # checkpoint serves the same three consumers and frees on RDD GC.

    qsym = wins.agg(F.min("symbol")).first()[0]
    qrow = (
        wins.filter(F.col("symbol") == qsym)
        .orderBy("bar")
        .limit(1)
        .select(
            F.col("symbol").alias("qsym"),
            F.col("bar").alias("qbar"),
            _centered(F.col("wv")).alias("qv"),
        )
    )
    scored = (
        wins.crossJoin(F.broadcast(qrow))
        .filter(~((F.col("symbol") == F.col("qsym")) & (F.col("bar") == F.col("qbar"))))
        .select(
            "symbol",
            "bar",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        _centered(F.col("wv")),
                        F.col("qv"),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ).alias("dist"),
        )
    )
    # materialize the (≤ top_k)-row result eagerly so the cached window
    # blocks can be released before returning — otherwise `wins` leaks into
    # the memory budget of every later query in a long-lived session
    out = (
        scored.orderBy("dist", "symbol", "bar")
        .limit(top_k)
        .select("symbol", "bar", F.round("dist", 6).alias("dist"))
        .localCheckpoint()
    )
    wins.unpersist()
    return out


def pattern_similarity_sql(
    trades_cte: str, p: int = PATTERN_LEN, top_k: int = TOP_K
) -> str:
    """DuckDB twin (list window + list HOFs)."""
    return f"""
        WITH trades AS ({trades_cte}),
        closes AS (
            SELECT symbol, bar, close FROM (
                SELECT symbol, "timestamp" // {MINUTE_NS} AS bar, price AS close,
                       row_number() OVER (
                           PARTITION BY symbol, "timestamp" // {MINUTE_NS}
                           ORDER BY "timestamp" DESC, trade_id DESC) AS rn
                FROM trades
            ) WHERE rn = 1
        ),
        win AS (
            SELECT symbol, bar,
                   list(close) OVER (PARTITION BY symbol ORDER BY bar
                        ROWS BETWEEN CURRENT ROW AND {p - 1} FOLLOWING) AS wv
            FROM closes
        ),
        full_win AS (SELECT * FROM win WHERE len(wv) = {p}),
        cent AS (
            SELECT symbol, bar,
                   list_transform(wv, x -> x - list_avg(wv)) AS cv
            FROM full_win
        ),
        q AS (
            SELECT symbol AS qsym, bar AS qbar, cv AS qv FROM cent
            WHERE symbol = (SELECT min(symbol) FROM full_win)
            ORDER BY bar LIMIT 1
        ),
        scored AS (
            SELECT c.symbol, c.bar,
                   sqrt(list_sum(list_transform(range(1, {p} + 1),
                        i -> (c.cv[i] - q.qv[i]) * (c.cv[i] - q.qv[i]))))
                       AS dist
            FROM cent c, q
            WHERE NOT (c.symbol = q.qsym AND c.bar = q.qbar)
        )
        SELECT symbol, bar, round(dist, 6) AS dist
        FROM scored ORDER BY dist, symbol, bar LIMIT {top_k}
    """
