"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) — the
source-side extension point, complementing the UDF/UDAF/UDTF triple.

The reference's generator (DataGenerator.hpp:49-228) is a sequential
seeded loop; sources/generator.py re-expresses it with Spark built-ins.
This module shows the third option: a first-class pluggable *source* that
the engine schedules like any other scan — `partitions()` declares the
split points, `read(partition)` runs partition-parallel in Python workers,
and everything downstream (pruning, agg pushdown ... ) is normal Spark.

Determinism is the design point: every field derives from md5(row index),
NOT a stateful RNG, so (a) any partition can be generated independently at
any parallelism — the 100 TB posture, no sequential dependence — and (b)
the DuckDB oracle reproduces the rows bit-for-bit from the same formulas
(functions/hashing.py convention).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EPOCH_NS = 1_698_208_500_000_000_000  # DataGenerator.hpp:151
N_ROWS_DEFAULT = 50_000  # shared by q_python_datasource and its oracle CTE
GAP_NS = 27_500  # midpoint of the reference's U[5us, 50us] tick gap
SYMBOLS = [  # 16-entry weighted pick table, DataGenerator.hpp:86-97
    "RELIANCE", "RELIANCE", "RELIANCE", "TCS", "TCS", "TCS",
    "INFY", "INFY", "HDFC", "HDFC", "WIPRO", "ICICIBANK",
    "BAJFINANCE", "HCLTECH", "AXISBANK", "SBIN",
]


@dataclass
class RangePartition(InputPartition):
    start: int
    end: int


def row_of(i: int) -> tuple:
    """One trade from the md5 of its index — pure, order-free, and
    mirrored 1:1 in the oracle SQL (tradegen_oracle_cte)."""
    h = hashlib.md5(f"t{i}".encode()).hexdigest()
    a = int(h[0:8], 16)  # symbol pick
    b = int(h[8:16], 16)  # volume
    c = int(h[16:24], 16)  # side + type
    d = int(h[24:32], 16)  # price
    side = "B" if c % 2 == 0 else "S"
    t = (c // 2) % 100
    typ = "M" if t < 30 else ("L" if t < 90 else "I")
    return (
        1_000_000 + i,
        SYMBOLS[a % 16],
        (d % 9_500_000) / 100.0 + 50.0,
        10 + b % 4991,
        side,
        typ,
        EPOCH_NS + i * GAP_NS,
    )


class TradeGenReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):  # noqa: D102 - DataSourceReader contract
        if self.n <= 0:  # empty scan, not a range() crash
            return [RangePartition(0, 0)]
        step = -(-self.n // self.num_partitions)
        return [
            RangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: RangePartition):  # noqa: D102
        for i in range(partition.start, partition.end):
            yield row_of(i)


class TradeGenDataSource(DataSource):
    """`spark.read.format("tradegen").option("n", N)` after registration."""

    @classmethod
    def name(cls) -> str:
        return "tradegen"

    def schema(self) -> str:
        return (
            "trade_id bigint, symbol string, price double, volume int, "
            "side string, type string, ts_ns bigint"
        )

    def reader(self, schema) -> TradeGenReader:  # noqa: D102
        return TradeGenReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TradeGenDataSource)


def tradegen_oracle_cte(n: int) -> str:
    """DuckDB CTE producing the identical rows (md5 mirror of row_of)."""
    syms = ", ".join(f"'{s}'" for s in SYMBOLS)
    return f"""
        SELECT 1000000 + i AS trade_id,
               [{syms}][1 + CAST(('0x' || substr(md5('t' || i), 1, 8))
                                 AS BIGINT) % 16] AS symbol,
               (CAST(('0x' || substr(md5('t' || i), 25, 8)) AS BIGINT)
                    % 9500000) / 100.0 + 50.0 AS price,
               CAST(10 + CAST(('0x' || substr(md5('t' || i), 9, 8))
                              AS BIGINT) % 4991 AS INTEGER) AS volume,
               CASE WHEN CAST(('0x' || substr(md5('t' || i), 17, 8))
                              AS BIGINT) % 2 = 0
                    THEN 'B' ELSE 'S' END AS side,
               CASE WHEN (CAST(('0x' || substr(md5('t' || i), 17, 8))
                               AS BIGINT) // 2) % 100 < 30 THEN 'M'
                    WHEN (CAST(('0x' || substr(md5('t' || i), 17, 8))
                               AS BIGINT) // 2) % 100 < 90 THEN 'L'
                    ELSE 'I' END AS type,
               {EPOCH_NS} + i * {GAP_NS} AS ts_ns
        FROM generate_series(0, {n - 1}) AS t(i)
    """


# --- streaming reader: the same plugin, as a Structured Streaming source ----
# Spark 4's DataSourceStreamReader contract: offsets are JSON dicts, the
# engine asks for latestOffset() per micro-batch and schedules
# partitions(start, end) like any other scan.  The md5-derived rows make
# replay trivially exactly-once: any offset range regenerates identical
# rows on any worker, with no state to snapshot (the property a real
# replayable source gets from a log; here it falls out of determinism).

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class TradeGenStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.num_partitions = int(options.get("partitions", 8))

    def initialOffset(self) -> dict:  # noqa: D102 - stream contract
        return {"i": 0}

    def latestOffset(self) -> dict:  # noqa: D102
        # the full row range is available immediately; availableNow
        # captures this once and drains it in a single micro-batch (an
        # unbounded deployment would return its ingest watermark here)
        return {"i": self.n}

    def partitions(self, start: dict, end: dict):  # noqa: D102
        s, e = int(start["i"]), int(end["i"])
        if e <= s:
            return [RangePartition(0, 0)]
        step = -(-(e - s) // self.num_partitions)
        return [
            RangePartition(p, min(p + step, e)) for p in range(s, e, step)
        ]

    def read(self, partition: RangePartition):  # noqa: D102
        for i in range(partition.start, partition.end):
            yield row_of(i)

    def commit(self, end: dict) -> None:  # noqa: D102
        pass  # nothing to clean up: rows regenerate from the offset alone


def _stream_reader(self, schema):  # noqa: D103
    return TradeGenStreamReader(self.options)


TradeGenDataSource.streamReader = _stream_reader
