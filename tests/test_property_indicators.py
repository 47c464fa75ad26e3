"""Property-based check: the Spark indicator operator equals a pure-Python
transcription of the reference algorithms on arbitrary inputs
(TechnicalIndicators.hpp:204-330), not just the hand goldens."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from marketstream_etl_spark.operators.indicators import compute_indicators


def model_sma(prices: list[float], period: int) -> float:
    if not prices or period <= 0:
        return 0.0
    return sum(prices[-period:]) / period


def model_rsi(prices: list[float], period: int) -> float:
    if len(prices) < 2 or period <= 1:
        return 50.0
    start = max(0, len(prices) - period - 1)
    gains = losses = 0.0
    count = 0
    for i in range(start + 1, len(prices)):
        c = prices[i] - prices[i - 1]
        if c > 0:
            gains += c
        else:
            losses += -c
        count += 1
    if count == 0:
        return 50.0
    ag, al = gains / count, losses / count
    if al == 0.0:
        return 100.0
    return 100.0 - 100.0 / (1.0 + ag / al)


def model_vwap(prices: list[float], volumes: list[int]) -> float:
    tv = sum(volumes)
    if not prices or tv == 0:
        return 0.0
    return sum(p * v for p, v in zip(prices, volumes)) / tv


series_strategy = st.dictionaries(
    keys=st.sampled_from(["AAA", "BBB", "CCC"]),
    values=st.lists(
        st.tuples(
            st.floats(min_value=1.0, max_value=10_000.0, allow_nan=False),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(series=series_strategy, period=st.integers(min_value=1, max_value=7))
def test_indicators_match_reference_model(spark_prop, series, period):
    rows, i = [], 0
    for sym, pvs in series.items():
        for price, volume in pvs:
            rows.append(
                Row(
                    trade_id=i,
                    symbol=sym,
                    timestamp=1_000_000 + i,
                    price=float(price),
                    volume=int(volume),
                )
            )
            i += 1
    df = spark_prop.createDataFrame(rows)
    got = {r["symbol"]: r for r in compute_indicators(df, period=period).collect()}
    assert set(got) == set(series)
    for sym, pvs in series.items():
        prices = [p for p, _ in pvs]
        volumes = [v for _, v in pvs]
        eff = min(period, len(prices))
        assert got[sym]["period"] == eff
        assert got[sym]["sma"] == pytest.approx(
            model_sma(prices, eff), rel=1e-9, abs=1e-9
        )
        rsi = got[sym]["rsi"]
        assert rsi == pytest.approx(model_rsi(prices, eff), rel=1e-9, abs=1e-9)
        assert 0.0 <= rsi <= 100.0 and math.isfinite(rsi)
        assert got[sym]["vwap"] == pytest.approx(
            model_vwap(prices, volumes), rel=1e-9
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    prices=st.lists(
        st.floats(min_value=1.0, max_value=10_000.0, allow_nan=False),
        min_size=2,
        max_size=40,
    ),
    period=st.integers(min_value=2, max_value=14),
)
def test_wilder_closed_form_property(spark_prop, prices, period):
    """Closed-form weight unrolling == literal Wilder recursion for any
    price path and period (the seed regime, the boundary m == period, and
    the decayed-recursion regime are all reachable here)."""
    from marketstream_etl_spark.operators.indicators import compute_rsi_wilder
    from tests.test_indicators import _wilder_rsi_recursive

    rows = [
        Row(trade_id=i, symbol="A", timestamp=1_000_000 + i, price=float(p), volume=1)
        for i, p in enumerate(prices)
    ]
    df = spark_prop.createDataFrame(rows)
    got = {r["symbol"]: r for r in compute_rsi_wilder(df, period=period).collect()}
    want = _wilder_rsi_recursive(prices, period)
    assert got["A"]["rsi_wilder"] == pytest.approx(want, rel=1e-9, abs=1e-9)
    assert 0.0 <= got["A"]["rsi_wilder"] <= 100.0
