"""Validator fixtures mirroring /root/reference/sample_data.csv (13 rows:
10 valid + lowercase symbol + negative price + zero volume) plus one row per
remaining rule (side/type/timestamp) — reference rules
TradeValidator.hpp:97-182."""

from __future__ import annotations

from pyspark.sql import Row

from marketstream_etl_spark.operators.validation import (
    split_valid,
    validation_counts,
    with_validation,
)
from marketstream_etl_spark.schemas import TRADE_SCHEMA


def mk(i, **kw):
    base = dict(
        trade_id=1000 + i,
        order_id=2000 + i,
        timestamp=1_698_208_500_000_000_000 + i * 10_000,
        symbol="RELIANCE",
        price=2456.75,
        volume=100,
        side="B",
        type="M",
        is_pro=False,
    )
    base.update(kw)
    return Row(**base)


def sample13(spark):
    rows = [mk(i) for i in range(10)]
    rows.append(mk(10, symbol="reliance"))  # V1, sample_data.csv:12
    rows.append(mk(11, price=-50.0))  # V2, sample_data.csv:13
    rows.append(mk(12, volume=0))  # V3, sample_data.csv:14
    return spark.createDataFrame(rows, schema=TRADE_SCHEMA)


def test_sample13_split(spark):
    valid, rejects = split_valid(sample13(spark))
    assert valid.count() == 10
    got = {
        r["trade_id"]: r["reject_reason"] for r in rejects.collect()
    }
    assert got == {
        1010: "invalid symbol",
        1011: "invalid price",
        1012: "invalid volume",
    }


def test_all_six_rules_first_failure_wins(spark):
    rows = [
        mk(0, symbol="X" * 11),  # V1: too long
        mk(1, price=1_000_000.0),  # V2: upper bound is exclusive
        mk(2, volume=0),  # V3
        mk(3, side="X"),  # V4
        mk(4, type="Q"),  # V5
        mk(5, timestamp=0),  # V6
        mk(6, symbol="bad", price=-1.0),  # V1 fires first (rule order)
        mk(7),
    ]
    df = spark.createDataFrame(rows, schema=TRADE_SCHEMA)
    got = {r["trade_id"]: r["reject_reason"] for r in with_validation(df).collect()}
    assert got[1000] == "invalid symbol"
    assert got[1001] == "invalid price"
    assert got[1002] == "invalid volume"
    assert got[1003] == "invalid side"
    assert got[1004] == "invalid type"
    assert got[1005] == "invalid timestamp"
    assert got[1006] == "invalid symbol"
    assert got[1007] is None


def test_counts(spark):
    row = validation_counts(sample13(spark)).collect()[0]
    assert (row["total"], row["valid"], row["rejected"]) == (13, 10, 3)
