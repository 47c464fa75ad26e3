"""Data-layout helpers — the lakehouse analog of the reference's composite
B-tree index `(symbol, timestamp)` (DatabaseLoader.cpp:117-125, SURVEY §4):

- `write_partitioned_sorted`: hive-partition by the equality key and sort
  files by the range key → `WHERE symbol='X' AND ts BETWEEN a AND b` becomes
  partition pruning + parquet min/max row-group skipping.  That is the F5
  "key lookup" query served without any index structure.
- `write_bucketed_table`: pre-shuffle a fact table into N buckets on the
  join key so repeated joins on that key are co-located — no exchange at
  query time (the managed-table analog of the reference's one-off index
  rebuild amortized over many queries).
- `fan_out_small_scan`: give expression-heavy operators full parallelism
  when the source scan has fewer splits than cores (small single-row-group
  files — a test-scale artifact; at production scale scans split naturally
  and this is a no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_col: str,
    sort_cols: list[str],
    target_file_partitions: int | None = None,
) -> None:
    """Partition by `partition_col`, one sorted parquet file per partition
    (sortWithinPartitions → parquet writes monotone min/max page stats)."""
    n = target_file_partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartition(n, partition_col)
        .sortWithinPartitions(partition_col, *sort_cols)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_pruned(
    spark: SparkSession, path: str, partition_col: str, value
) -> DataFrame:
    """Partition-pruned scan: only the matching hive partition is read."""
    df = spark.read.parquet(path)
    return df.filter(df[partition_col] == value)


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism when the scan has fewer
    splits than cores.

    Parquet scans split by byte range (`spark.sql.files.maxPartitionBytes`),
    but a file with a single row group yields exactly one task no matter the
    setting, so downstream regex/window/JSON work would serialize on one
    core.  The shuffle moves only the scan's raw bytes (small by premise);
    callers apply it BEFORE expensive projections so those run wide.  When
    the scan already has enough splits this returns the input unchanged."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism)
