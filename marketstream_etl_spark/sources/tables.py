"""Parquet table loaders for the driver testdata (TESTDATA.md).

Thin wrappers over ``spark.read.parquet`` — the vectorized Parquet reader
gives predicate pushdown, column pruning and row-group skipping for free, so
there is nothing to hand-build here (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from marketstream_etl_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def warehouse_path(spark: SparkSession, name: str, sf_dir: str) -> str:
    """Canonical cache path for a derived dataset: one directory per
    (artifact name, source dir) under the session warehouse.  Every
    write-once fixture (ORC/XML/JSONL copies, z-order layout, compaction)
    keys through here so the keying scheme has a single definition."""
    import hashlib
    from urllib.parse import urlparse

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    return os.path.join(warehouse, f"{name}_{sfx}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores ts as INT64 TIMESTAMP(NANOS); a vanilla session
    # (e.g. an external driver's) raises PARQUET_TYPE_ILLEGAL without this
    # runtime conf, which maps it to BIGINT nanoseconds.  Idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql plans."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
