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
from marketstream_etl_spark.sources.tables import load_table, source_key, warehouse_path


def ensure_orc_orders(spark: SparkSession, sf_dir: str) -> str:
    sfx = source_key(sf_dir)
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

    path = warehouse_path(spark, "xml_nation", sf_dir)
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


def ensure_jsonl_supplier(spark: SparkSession, sf_dir: str) -> str:
    """supplier as JSON-lines files — the interchange format of the
    streaming path (S6 TickMessage to_json/from_json) applied at rest.
    Doubles survive via Spark's round-trippable JSON float formatting."""
    import os

    path = warehouse_path(spark, "jsonl_supplier", sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "supplier")
            .write.mode("overwrite")
            .json(path)
        )
    return path


def jsonl_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-pinned read (inference would widen ints and reorder cols)."""
    path = ensure_jsonl_supplier(spark, sf_dir)
    return spark.read.schema(
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    ).json(path)


def ensure_evolving_orders(spark: SparkSession, sf_dir: str) -> str:
    """Two parquet writer generations under one dataset root: v1 lacks the
    o_orderstatus column, v2 carries it.  mergeSchema unifies them at read
    time with nulls for the missing column — additive schema evolution, the
    lakehouse answer to ALTER TABLE on a 100 TB table (no rewrite)."""
    import os

    path = warehouse_path(spark, "evolve_orders", sf_dir)
    if not os.path.exists(os.path.join(path, "v2", "_SUCCESS")):
        orders = load_table(spark, sf_dir, "orders")
        v1 = orders.filter("o_orderkey % 2 = 0").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        v2 = orders.filter("o_orderkey % 2 = 1").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
        )
        v1.write.mode("overwrite").parquet(os.path.join(path, "v1"))
        v2.write.mode("overwrite").parquet(os.path.join(path, "v2"))
    return path


def evolving_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_evolving_orders(spark, sf_dir)
    return spark.read.option("mergeSchema", "true").parquet(
        f"{path}/v1", f"{path}/v2"
    )
