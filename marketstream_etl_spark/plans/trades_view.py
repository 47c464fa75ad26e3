"""Canonical `trades` view derived from the driver's `events` table.

The driver testdata has no trades table, so the engine's trade-domain
operators (validation V1-V6, indicators A1-A4, analytics A7-A8/O2-O4) run
over a deterministic mapping of `events` onto the reference Trade schema
(/root/reference/src/model/Trade.hpp:16-38):

    trade_id  = event_id
    order_id  = user_id
    timestamp = epoch nanoseconds of ts          (reference keeps int64 ns)
    symbol    = upper(event_type)                 (low-cardinality key)
    price     = value
    volume    = props->'k'                        (JSON scalar access, X12)
    side      = 'B'/'S' by event_id parity
    type      = 'M'/'L'/'I' by event_id mod 10 (30/60/10 mix mirrors the
                generator weights, src/tools/DataGenerator.hpp:111-113)
    is_pro    = event_id % 5 == 0 (~20%, DataGenerator.hpp:116)

The identical mapping is exposed as a DuckDB CTE (``TRADES_CTE``) so every
trade-domain query has an exact SQL oracle.  `volume` can be 0 in the data,
so validation rule V3 rejects real rows — the valid/reject split is
exercised end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketstream_etl_spark.sources.tables import load_table

# DuckDB-dialect CTE body; keep in lockstep with trades_from_events().
TRADES_CTE = """
    SELECT
        event_id                                   AS trade_id,
        user_id                                    AS order_id,
        epoch_us(ts) * 1000                        AS timestamp,
        upper(event_type)                          AS symbol,
        value                                      AS price,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS volume,
        CASE WHEN event_id % 2 = 0 THEN 'B' ELSE 'S' END   AS side,
        CASE WHEN event_id % 10 < 3 THEN 'M'
             WHEN event_id % 10 < 9 THEN 'L'
             ELSE 'I' END                          AS type,
        (event_id % 5 = 0)                         AS is_pro
    FROM events
"""


def trades_from_events(events: DataFrame) -> DataFrame:
    """Map the events table onto the canonical Trade schema (see module doc)."""
    return events.select(
        F.col("event_id").alias("trade_id"),
        F.col("user_id").alias("order_id"),
        # ts arrives as int64 ns (nanosAsLong). Truncate to µs resolution so
        # the value equals DuckDB's epoch_us(ts)*1000 oracle exactly (DuckDB
        # reads the NANOS column at µs precision). Integer ops only — ns
        # magnitudes exceed double's 2^53 mantissa.
        (F.col("ts") - F.col("ts") % 1000).alias("timestamp"),
        F.upper("event_type").alias("symbol"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("int").alias("volume"),
        F.when(F.col("event_id") % 2 == 0, F.lit("B")).otherwise(F.lit("S")).alias("side"),
        F.when(F.col("event_id") % 10 < 3, F.lit("M"))
        .when(F.col("event_id") % 10 < 9, F.lit("L"))
        .otherwise(F.lit("I"))
        .alias("type"),
        (F.col("event_id") % 5 == 0).alias("is_pro"),
    )


def load_trades(
    spark: SparkSession, sf_dir: str, fan_out: bool = False
) -> DataFrame:
    """`fan_out=True` repartitions the raw events scan to full parallelism
    BEFORE the JSON/regex-bearing projection — for validation/window-heavy
    consumers when the source is a single-row-group file (test-scale
    artifact; a no-op once the scan splits naturally)."""
    events = load_table(spark, sf_dir, "events")
    if fan_out:
        import os

        from marketstream_etl_spark.sources.layout import fan_out_small_scan

        try:
            nbytes = os.path.getsize(os.path.join(sf_dir, "events.parquet"))
        except OSError:
            nbytes = None  # non-file layout: legacy RDD-probe path
        events = fan_out_small_scan(events, input_bytes=nbytes)
    return trades_from_events(events)
