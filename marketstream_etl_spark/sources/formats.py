"""Alternate columnar format round-trip (ORC) — source/sink breadth beyond
the reference's CSV-in/Parquet-out (S1/S11).

ORC is Spark's second built-in columnar format; like Parquet it carries
dictionary encoding, stripe-level min/max statistics and predicate
pushdown, so the same layout reasoning applies.  Write-once per source dir
(keyed like sources/bucketed.py); the round-trip query proves the
write+read path preserves values exactly against the flat-parquet oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from marketstream_etl_spark.sources.bucketed import _clear_table
from marketstream_etl_spark.sources.tables import load_table


def ensure_orc_orders(spark: SparkSession, sf_dir: str) -> str:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"orc_orders_{sfx}"
    if not spark.catalog.tableExists(tbl):
        _clear_table(spark, tbl)
        (
            load_table(spark, sf_dir, "orders")
            .write.mode("overwrite")
            .format("orc")
            .option("compression", "snappy")
            .saveAsTable(tbl)
        )
    return tbl


def orc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.table(ensure_orc_orders(spark, sf_dir))


def ensure_xml_nation(spark: SparkSession, sf_dir: str) -> str:
    """nation as XML files under the warehouse dir (tiny table — XML is a
    row-expensive interchange format, not an analytics layout; the round
    trip proves the reader/writer, nothing more)."""
    import os
    from urllib.parse import urlparse

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    path = os.path.join(warehouse, f"xml_nation_{sfx}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "nation")
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "nations")
            .option("rowTag", "nation")
            .save(path)
        )
    return path


def xml_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_xml_nation(spark, sf_dir)
    return spark.read.format("xml").option("rowTag", "nation").load(path)
