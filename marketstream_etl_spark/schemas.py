"""Canonical schemas (reference parity).

Trade schema mirrors ``/root/reference/src/model/Trade.hpp:16-38`` and the
DDL at ``/root/reference/src/database/DatabaseLoader.cpp:100-111``; the tick
wire DTO mirrors ``src/feed/TickMessage.hpp:43-54``; the indicator record
mirrors ``src/indicators/TechnicalIndicators.hpp:49-56``.

Timestamps are raw int64 **nanoseconds since epoch** (LongType), the
reference's source of truth; TimestampType (µs) columns are derived only at
window/formatting boundaries.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Reference Trade struct (src/model/Trade.hpp:16-38). `exchange` is only set
# by the stream path (TickMessage.hpp:164) so it is not part of the batch CSV.
TRADE_SCHEMA = T.StructType(
    [
        T.StructField("trade_id", T.LongType(), False),
        T.StructField("order_id", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), False),  # ns since epoch
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("volume", T.IntegerType(), False),
        T.StructField("side", T.StringType(), False),  # 'B'/'S'/'N'
        T.StructField("type", T.StringType(), False),  # 'M'/'L'/'I'
        T.StructField("is_pro", T.BooleanType(), False),
    ]
)

# CSV column order is fixed (src/parser/CsvParser.cpp:167). Raw read schema:
# everything nullable, is_pro as int 0/1 — defaults are applied afterwards
# (defaults-then-reject semantics, see sources/csv_trades.py).
TRADE_CSV_RAW_SCHEMA = T.StructType(
    [
        T.StructField("trade_id", T.LongType(), True),
        T.StructField("order_id", T.LongType(), True),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("volume", T.IntegerType(), True),
        T.StructField("side", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("is_pro", T.IntegerType(), True),
    ]
)

# Wire DTO (src/feed/TickMessage.hpp:43-54): same fields plus `exchange`.
TICK_SCHEMA = T.StructType(
    TRADE_SCHEMA.fields + [T.StructField("exchange", T.StringType(), True)]
)

# Indicator record (src/indicators/TechnicalIndicators.hpp:49-56 + DDL
# src/database/DatabaseLoader.cpp:133-143). computed_at is stamped at save
# time (DatabaseLoader.cpp:314-316).
INDICATOR_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("computed_at", T.LongType(), False),  # ns since epoch
        T.StructField("sma", T.DoubleType(), False),
        T.StructField("rsi", T.DoubleType(), False),
        T.StructField("vwap", T.DoubleType(), False),
        T.StructField("period", T.IntegerType(), False),
    ]
)

# Driver testdata table names (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
