"""Hive-partitioned table layout + partition pruning.

The reference serves ``WHERE symbol='X' AND timestamp BETWEEN a AND b``
with a composite B-tree index (DatabaseLoader.cpp:117-125).  The lakehouse
analog is directory partitioning: ``partitionBy(col)`` at write time turns
the predicate into PartitionFilters at plan time, so a selective query
never opens the other partitions' files at all.  At 100 TB this is the
difference between scanning everything and scanning one directory — the
single most important layout decision for a repeated-filter workload.

Write-once per (sf_dir), keyed like sources/bucketed.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from marketstream_etl_spark.sources.bucketed import _clear_table
from marketstream_etl_spark.sources.tables import load_table

PARTITION_COL = "l_returnflag"  # 3 values -> 3 directories


def ensure_partitioned_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem partitioned by l_returnflag as a managed table — once
    per source dir.  Repeat calls find the catalog entry and skip the
    rewrite (the layout cost is paid at write time only)."""
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"part_lineitem_{sfx}"
    if not spark.catalog.tableExists(tbl):
        _clear_table(spark, tbl)
        (
            load_table(spark, sf_dir, "lineitem")
            .write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .format("parquet")
            .saveAsTable(tbl)
        )
    return tbl


def pruned_scan(spark: SparkSession, tbl: str, flag: str) -> DataFrame:
    """Scan exactly one partition directory.  The filter is a metadata
    operation (PartitionFilters in the plan), not a data filter — no row of
    any other partition is read.  test_layout asserts both the plan shape
    and that inputFiles() stays inside the one directory."""
    df = spark.table(tbl)
    return df.filter(df[PARTITION_COL] == flag)
