"""Sinks (S7-S12): parquet writer, run-partitioned output naming, JDBC bulk
load orchestration, and the concurrent dual-sink pattern.

Reference mapping (SURVEY §2.1):
- S11 ParquetWriter → `df.write.parquet` (snappy + dictionary + footer
  stats are the Spark/parquet defaults; the reference hand-builds all
  three, ParquetWriter.cpp:89-361).
- S12 run-partitioned naming → timestamped subdirectory per run.
- S8/S9 PostgreSQL COPY → `df.write.jdbc` with `numPartitions` N ≈ N
  parallel COPY streams (ParallelLoader.hpp:71-275); `truncate` option ≈
  prepare_for_parallel_load's TRUNCATE (DatabaseLoader.cpp:377-404).
  Drop/rebuild-index DDL has no Spark analog — issued driver-side around
  the write when a live connection exists.  Everything JDBC is gated so
  tests never need a database.
- PipelineExecutor's concurrent trades ∥ indicators write
  (PipelineExecutor.hpp:80-184) → persist + two writes from two driver
  threads; the scheduler overlaps them.
"""

from __future__ import annotations

import datetime as _dt
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S11: snappy parquet (dictionary encoding + min/max stats automatic)."""
    writer = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def run_output_path(base_dir: str, run_ts: _dt.datetime | None = None) -> str:
    """S12: trades_YYYYMMDD_HHMMSS naming (ParquetWriter.cpp:51-75)."""
    ts = run_ts or _dt.datetime.now(tz=_dt.timezone.utc)
    return f"{base_dir}/trades_{ts.strftime('%Y%m%d_%H%M%S')}.parquet"


def write_jdbc_bulk(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    num_streams: int = 4,
    truncate: bool = True,
) -> None:
    """S9: N-way parallel relational load — one JDBC connection per
    partition is exactly the reference's N parallel COPY streams."""
    (
        df.repartition(num_streams)
        .write.mode("overwrite" if truncate else "append")
        .option("truncate", str(truncate).lower())
        .option("batchsize", 10_000)
        .jdbc(url, table, properties=properties)
    )


def write_dual_sinks(
    trades: DataFrame,
    indicators: DataFrame,
    trades_path: str,
    indicators_path: str,
) -> None:
    """Concurrent independent sinks (~1.87× in the reference, README.md:101):
    two driver threads submit both writes; Spark's scheduler overlaps them.

    Each input is scanned exactly once here, so no extra persist — callers
    that reuse `trades` for other consumers (e.g. run_pipeline) hold their
    own cache."""
    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(write_parquet, trades, trades_path)
        f2 = pool.submit(write_parquet, indicators, indicators_path)
        f1.result()
        f2.result()


def _jdbc_exec(spark, url: str, statements: list[str]) -> None:
    """Run DDL statements over a driver-side JDBC connection (py4j into the
    JVM's DriverManager — the same classpath the executors' writers use)."""
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for sql in statements:
            st.execute(sql)
        st.close()
    finally:
        conn.close()


def bulk_load_with_index_ddl(
    spark,
    df: DataFrame,
    url: str,
    table: str,
    index_name: str,
    index_cols: list[str],
    properties: dict[str, str],
    num_streams: int = 4,
) -> None:
    """S8's adopted design (README.md:73-93, 10.6× on the reference): drop
    the index, stream the rows over `num_streams` parallel connections,
    rebuild the index once at the end — per-row B-tree maintenance becomes
    one bulk sort.  The DDL runs driver-side around the distributed write,
    exactly like DatabaseLoader.cpp:176-185/500-537 wraps its COPY."""
    _jdbc_exec(
        spark,
        url,
        [f"DROP INDEX {index_name}"],
    )
    try:
        (
            df.repartition(num_streams)
            .write.mode("append")
            .option("batchsize", 10_000)
            .jdbc(url, table, properties=properties)
        )
    finally:
        # Spark's JDBC writer quotes column identifiers (case-sensitive in
        # Derby/Postgres), so the DDL must quote them too
        cols = ", ".join(f'"{c}"' for c in index_cols)
        _jdbc_exec(
            spark,
            url,
            [f"CREATE INDEX {index_name} ON {table} ({cols})"],
        )
