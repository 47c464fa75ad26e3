"""As-of join semantics: latest indicator at-or-before each trade."""

from __future__ import annotations

from pyspark.sql import Row

from marketstream_etl_spark.operators.asof import asof_join_indicators


def test_asof_picks_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [
            Row(trade_id=1, symbol="A", timestamp=100, price=10.0, volume=1),
            Row(trade_id=2, symbol="A", timestamp=200, price=11.0, volume=1),
            Row(trade_id=3, symbol="A", timestamp=250, price=12.0, volume=1),
            Row(trade_id=4, symbol="B", timestamp=150, price=20.0, volume=1),
            Row(trade_id=5, symbol="B", timestamp=90, price=21.0, volume=1),
        ]
    )
    ind = spark.createDataFrame(
        [
            Row(symbol="A", computed_at=100, sma=1.0, rsi=50.0, vwap=1.0),
            Row(symbol="A", computed_at=240, sma=2.0, rsi=60.0, vwap=2.0),
            Row(symbol="B", computed_at=100, sma=3.0, rsi=70.0, vwap=3.0),
        ]
    )
    got = {r["trade_id"]: r for r in asof_join_indicators(trades, ind).collect()}
    assert got[1]["asof_sma"] == 1.0  # computed_at == timestamp is visible
    assert got[2]["asof_sma"] == 1.0  # 240 not yet at t=200
    assert got[3]["asof_sma"] == 2.0
    assert got[4]["asof_sma"] == 3.0
    assert got[5]["asof_sma"] is None  # nothing computed yet at t=90
    assert len(got) == 5
