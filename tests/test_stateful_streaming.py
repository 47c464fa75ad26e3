"""Stateful streaming indicators: state carries across micro-batches and the
final per-symbol values equal the batch implementation over the full input."""

from __future__ import annotations

import tempfile

import pytest

from marketstream_etl_spark.operators.indicators import compute_indicators
from marketstream_etl_spark.sources.generator import generate_trades
from marketstream_etl_spark.streaming.stateful import streaming_indicators


def test_streaming_indicators_match_batch(spark):
    trades = generate_trades(spark, 600).orderBy("timestamp").cache()
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        # two files → availableNow processes multiple micro-batches with
        # maxFilesPerTrigger=1, so state must survive batch boundaries
        trades.filter("trade_id < 1000300").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/p1")
        trades.filter("trade_id >= 1000300").coalesce(1).write.mode(
            "append"
        ).parquet(f"{src}/p2")

        stream = (
            spark.readStream.schema(trades.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/p*")
        )
        q = (
            streaming_indicators(stream, period=5)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("stream_ind")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # last emitted row per symbol = final state
        got = {
            r["symbol"]: r
            for r in spark.sql(
                """
                SELECT * FROM (
                  SELECT *, row_number() OVER (PARTITION BY symbol
                      ORDER BY n_trades DESC) rn FROM stream_ind
                ) WHERE rn = 1
                """
            ).collect()
        }

    expected = {
        r["symbol"]: r for r in compute_indicators(trades, period=5).collect()
    }
    assert set(got) == set(expected)
    total_seen = sum(r["n_trades"] for r in got.values())
    assert total_seen == 600
    for sym, exp in expected.items():
        assert got[sym]["sma"] == pytest.approx(exp["sma"], rel=1e-9), sym
        assert got[sym]["rsi"] == pytest.approx(exp["rsi"], rel=1e-9), sym
        assert got[sym]["vwap"] == pytest.approx(exp["vwap"], rel=1e-9), sym
        assert got[sym]["period"] == exp["period"]
    trades.unpersist()


def test_file_stream_stateful_equals_batch(spark, sf_dir):
    """Bounded replay through the stateful operator must end in the same
    per-symbol state as the batch last-N snapshot."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.indicators import compute_indicators
    from marketstream_etl_spark.operators.validation import split_valid
    from marketstream_etl_spark.plans.trades_view import load_trades
    from marketstream_etl_spark.streaming.stateful import (
        file_stream_stateful_indicators,
    )

    streamed = {
        r["symbol"]: (r["n_trades"], r["sma"], r["rsi"], r["vwap"], r["period"])
        for r in file_stream_stateful_indicators(spark, sf_dir).collect()
    }
    valid, _ = split_valid(load_trades(spark, sf_dir))
    batch = {
        r["symbol"]: (
            r["n"],
            round(r["sma"], 6),
            round(r["rsi"], 6),
            round(r["vwap"], 6),
            r["period"],
        )
        for r in compute_indicators(valid, period=5)
        .join(valid.groupBy("symbol").agg(F.count("*").alias("n")), "symbol")
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


class _FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state


def test_tws_processor_fold_matches_stateful_update_fn():
    """The transformWithState processor and the applyInPandasWithState
    update fn must fold identical state from identical micro-batches —
    checked without Spark (the gRPC runtime is absent in this container)."""
    import pandas as pd

    from marketstream_etl_spark.streaming.stateful import make_update_fn
    from marketstream_etl_spark.streaming.tws import IndicatorProcessor

    batches = [
        pd.DataFrame(
            {
                "price": [100.0, 102.0, 101.0],
                "volume": [10, 20, 30],
                "timestamp": [3, 1, 2],
                "trade_id": [3, 1, 2],
            }
        ),
        pd.DataFrame(
            {
                "price": [103.0, 105.0, 104.0, 107.0],
                "volume": [5, 5, 5, 5],
                "timestamp": [4, 6, 5, 7],
                "trade_id": [4, 6, 5, 7],
            }
        ),
    ]

    proc = IndicatorProcessor(period=5)
    proc.init(_FakeHandle())
    for b in batches:
        (tws_out,) = list(proc.handleInputRows(("SYM",), iter([b]), None))

    class _LegacyState:
        exists = False
        get = None

        def update(self, v):
            self.get = v
            self.exists = True

    legacy = _LegacyState()
    fn = make_update_fn(period=5)
    for b in batches:
        (legacy_out,) = list(fn(("SYM",), iter([b]), legacy))

    pd.testing.assert_frame_equal(tws_out, legacy_out)
    assert tws_out["n_trades"].iloc[0] == 7


def test_file_stream_tws_equals_batch(spark, sf_dir):
    """End-to-end transformWithState replay == batch snapshot — runs only
    where the gRPC state-server runtime (grpcio+protobuf) is available."""
    import pytest

    from marketstream_etl_spark.streaming.tws import HAS_TWS_RUNTIME

    if not HAS_TWS_RUNTIME:
        pytest.skip("transformWithState needs grpcio+protobuf")

    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.indicators import compute_indicators
    from marketstream_etl_spark.operators.validation import split_valid
    from marketstream_etl_spark.plans.trades_view import load_trades
    from marketstream_etl_spark.streaming.tws import file_stream_tws_indicators

    streamed = {
        r["symbol"]: (r["n_trades"], r["sma"], r["rsi"], r["vwap"], r["period"])
        for r in file_stream_tws_indicators(spark, sf_dir).collect()
    }
    valid, _ = split_valid(load_trades(spark, sf_dir))
    batch = {
        r["symbol"]: (
            r["n"],
            round(r["sma"], 6),
            round(r["rsi"], 6),
            round(r["vwap"], 6),
            r["period"],
        )
        for r in compute_indicators(valid, period=5)
        .join(valid.groupBy("symbol").agg(F.count("*").alias("n")), "symbol")
        .collect()
    }
    assert streamed == batch and len(streamed) > 0
