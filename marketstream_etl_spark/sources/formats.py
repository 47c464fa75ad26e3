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
from pyspark.sql import functions as F

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


# --- corrupt-record quarantine (PERMISSIVE JSON) -----------------------------

# Every PERMISSIVE outcome class trips at least once: clean parse,
# non-JSON garbage, wrong-typed field (partial parse + flagged),
# truncated JSON (all-null + flagged), missing field (null, NOT flagged).
CORRUPT_JSONL_FIXTURE = "\n".join([
    '{"id": 1, "sym": "AAA", "px": 10.5}',
    "not json at all",
    '{"id": 2, "sym": "BBB", "px": "oops"}',
    '{"id": 3, "sym": "CCC"',
    '{"id": 4, "px": 7.25}',
    '{"id": 6, "sym": "FFF", "px": -0.5}',
]) + "\n"


def ensure_corrupt_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Write-once corrupt-lines fixture, content-hash keyed + atomic
    rename (same torn-write-proof contract as the CSV fixtures)."""
    import hashlib
    import os
    import tempfile

    digest = hashlib.md5(CORRUPT_JSONL_FIXTURE.encode()).hexdigest()[:8]
    path = warehouse_path(spark, f"corrupt_jsonl_{digest}", sf_dir)
    dest = os.path.join(path, "data.jsonl")
    if not os.path.exists(dest):
        os.makedirs(path, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(CORRUPT_JSONL_FIXTURE)
        os.replace(tmp, dest)
    return dest


def json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-side bad-record quarantine — the batch twin of the streaming
    dead-letter path (F2): PERMISSIVE JSON parsing surfaces every
    malformed line in a corrupt-record column instead of failing the job
    or silently dropping rows.  The semantics the golden pins: non-JSON
    and truncated lines come back all-null + flagged; a wrong-typed
    FIELD nulls just that field, keeps the rest, and still flags the raw
    line; a merely missing field is null and NOT flagged.  At 100 TB
    this is how a crawl ingest keeps one writer-side error from
    poisoning a partition."""
    path = ensure_corrupt_jsonl(spark, sf_dir)
    df = (
        spark.read.schema("id bigint, sym string, px double, _bad string")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
    )
    return df.select(
        "id",
        "sym",
        "px",
        F.col("_bad").alias("bad_payload"),
        F.col("_bad").isNotNull().alias("quarantined"),
    )


def json_corrupt_records_sql() -> str:
    """Golden oracle: the fixture is a constant, so the expected
    PERMISSIVE outcomes are stated as literals (pinned empirically and by
    tests)."""
    return """
        SELECT CAST(id AS BIGINT) AS id, sym,
               CAST(px AS DOUBLE) AS px, bad_payload, quarantined
        FROM (VALUES
            (NULL, NULL, NULL, 'not json at all', true),
            (NULL, NULL, NULL, '{"id": 3, "sym": "CCC"', true),
            (1, 'AAA', 10.5, NULL, false),
            (2, 'BBB', NULL, '{"id": 2, "sym": "BBB", "px": "oops"}', true),
            (4, NULL, 7.25, NULL, false),
            (6, 'FFF', -0.5, NULL, false)
        ) AS t(id, sym, px, bad_payload, quarantined)
        ORDER BY coalesce(id, -1), coalesce(bad_payload, '')
    """
