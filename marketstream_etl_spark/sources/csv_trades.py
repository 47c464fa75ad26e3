"""Trade CSV source (S1/S2) with the reference parser's defaults-then-reject
semantics (/root/reference/src/parser/CsvParser.cpp:57-249, SURVEY §1.3):

- fixed column order, header skipped, CRLF tolerated (Spark CSV handles both)
- unparseable/missing numerics stay 0 (zero-init + from_chars-failure)
- missing side → 'N', missing type → 'M'
- is_pro parsed as int 0/1 → boolean
- the parser NEVER yields nulls; validation later rejects the zero defaults

Spark: permissive schema read, then coalesce/when to reproduce the defaults
— a map-only projection fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketstream_etl_spark.schemas import TRADE_CSV_RAW_SCHEMA


def read_trades_csv(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.csv(
        path, header=True, schema=TRADE_CSV_RAW_SCHEMA, mode="PERMISSIVE"
    )
    return raw.select(
        F.coalesce("trade_id", F.lit(0)).alias("trade_id"),
        F.coalesce("order_id", F.lit(0)).alias("order_id"),
        F.coalesce("timestamp", F.lit(0)).alias("timestamp"),
        F.coalesce("symbol", F.lit("")).alias("symbol"),
        F.coalesce("price", F.lit(0.0)).alias("price"),
        F.coalesce("volume", F.lit(0)).alias("volume"),
        # char fields take the FIRST byte of the cell (CsvParser.cpp:231,237)
        F.coalesce(F.substring("side", 1, 1), F.lit("N")).alias("side"),
        F.coalesce(F.substring("type", 1, 1), F.lit("M")).alias("type"),
        F.coalesce(F.col("is_pro") != 0, F.lit(False)).alias("is_pro"),
    )
