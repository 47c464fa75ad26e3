"""Count-min sketch heavy-hitter estimation — the "novel sketch" operator
class (custom operator beyond the reference's surface).

Why a sketch at 100 TB: exact per-token counts need a shuffle keyed by the
full vocabulary (unbounded, skewed); the CMS is a FIXED d×w grid of
counters that aggregates map-side (each row increments d counters), so the
shuffle moves at most d·w rows regardless of corpus size, and sketches from
different partitions/days merge by cell-wise addition (fully algebraic —
the same property the fused indicator aggregate exploits).

Estimate(token) = min over the d rows of its bucket counter; it
over-counts only (collisions add), with the classic bound
est − true ≤ e/w · N at probability 1 − e^−d.

Determinism: bucket hashes are md5-derived (functions/hashing.h32), so a
DuckDB replay produces the IDENTICAL sketch and estimates — the driver
hash-checks not just the exact counts but the sketch values themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketstream_etl_spark.functions.hashing import h32, h32_sql, tokens, tokens_sql

CMS_DEPTH = 4
CMS_WIDTH = 256
TOP_K = 20


def _bucket(tok_col: F.Column, row: int, width: int) -> F.Column:
    return h32(F.concat(F.lit(f"cms{row}|"), tok_col)) % width


def cms_heavy_hitters(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    top_k: int = TOP_K,
) -> DataFrame:
    """Exact top-k tokens with their CMS estimates and the error-bound flag.

    Plan shape: one explode pass feeds BOTH the d×w sketch (map-side
    partial agg, ≤ d·w rows shuffled) and the exact counts (the ground
    truth the demo compares against; a real 100 TB deployment keeps only
    the sketch).  The candidate join is a broadcast of k rows.
    """
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))

    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col("tok"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    sketch = cells.groupBy("c.row", "c.bucket").agg(F.count("*").alias("cnt"))

    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), "tok").limit(top_k)

    probes = top.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col("tok"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            sketch,
            (F.col("p.row") == F.col("row")) & (F.col("p.bucket") == F.col("bucket")),
        )
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    n_total = toks.count()  # scalar for the bound only (demo-side)
    bound = int(2.718281828459045 / width * n_total) + 1
    return est.select(
        "tok",
        "exact_n",
        "est_n",
        (
            (F.col("est_n") >= F.col("exact_n"))
            & (F.col("est_n") - F.col("exact_n") <= F.lit(bound))
        ).alias("within_bound"),
    ).orderBy(F.desc("exact_n"), "tok")


def streaming_cms_heavy_hitters(spark, sf_dir: str) -> DataFrame:
    """The CMS as a STREAMING aggregate: because the sketch is algebraic
    (cell-wise addition), the unmodified groupBy((row, bucket)).count()
    runs incrementally in streaming state — ≤ d·w state entries total, the
    textbook bounded-state streaming summary.  On bounded replay the final
    sketch equals the batch sketch, so estimates are checked by the SAME
    oracle as the batch query."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.sources.tables import (
        ensure_engine_confs,
        load_table,
    )

    ensure_engine_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col("tok"), r, CMS_WIDTH).alias("bucket"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("c")
    )
    sketch_stream = cells.groupBy("c.row", "c.bucket").agg(
        F.count("*").alias("cnt")
    )
    name = f"stream_cms_{abs(hash(sf_dir)) % 100000}"
    q = (
        sketch_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sketch = spark.table(name)

    # present the same report as the batch query, probing the streamed sketch
    batch_docs = load_table(spark, sf_dir, "documents")
    toks_b = batch_docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    exact = toks_b.groupBy("tok").agg(F.count("*").alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), "tok").limit(TOP_K)
    probes = top.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col("tok"), r, CMS_WIDTH).alias("bucket"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            sketch,
            (F.col("p.row") == F.col("row"))
            & (F.col("p.bucket") == F.col("bucket")),
        )
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
    )
    n_total = toks_b.count()
    bound = int(2.718281828459045 / CMS_WIDTH * n_total) + 1
    return est.select(
        "tok",
        "exact_n",
        "est_n",
        (
            (F.col("est_n") >= F.col("exact_n"))
            & (F.col("est_n") - F.col("exact_n") <= F.lit(bound))
        ).alias("within_bound"),
    ).orderBy(F.desc("exact_n"), "tok")


def cms_heavy_hitters_sql(
    depth: int = CMS_DEPTH, width: int = CMS_WIDTH, top_k: int = TOP_K
) -> str:
    """DuckDB twin: identical md5 buckets → identical sketch → identical
    estimates.  The bound flag is TRUE by the CMS guarantee (and would
    hash-mismatch if the Spark side ever violated it)."""
    rows = ", ".join(str(r) for r in range(depth))
    bucket = h32_sql("('cms' || r || '|' || tok)") + f" % {width}"
    return f"""
        WITH toks AS (
            SELECT unnest({tokens_sql('text')}) AS tok FROM documents
        ),
        cells AS (
            SELECT r, {bucket} AS bucket
            FROM toks, (SELECT unnest([{rows}]) AS r)
        ),
        sketch AS (
            SELECT r, bucket, count(*) AS cnt FROM cells GROUP BY r, bucket
        ),
        exact AS (SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok),
        top AS (
            SELECT tok, exact_n FROM exact
            ORDER BY exact_n DESC, tok LIMIT {top_k}
        ),
        probes AS (
            SELECT tok, exact_n, r, {bucket} AS bucket
            FROM top, (SELECT unnest([{rows}]) AS r)
        ),
        est AS (
            SELECT p.tok, p.exact_n, min(s.cnt) AS est_n
            FROM probes p JOIN sketch s
              ON s.r = p.r AND s.bucket = p.bucket
            GROUP BY p.tok, p.exact_n
        )
        SELECT tok, exact_n, est_n,
               (est_n >= exact_n AND est_n - exact_n <=
                CAST(floor(2.718281828459045 / {width}
                     * (SELECT count(*) FROM toks)) AS BIGINT) + 1)
                   AS within_bound
        FROM est ORDER BY exact_n DESC, tok
    """
