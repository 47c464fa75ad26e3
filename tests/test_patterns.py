"""Time-series pattern similarity search (operators/patterns.py)."""

from __future__ import annotations

from marketstream_etl_spark.operators.patterns import (
    PATTERN_LEN,
    minute_closes,
    pattern_similarity,
)
from marketstream_etl_spark.plans.trades_view import load_trades


def test_pattern_similarity_topk(spark, sf_dir):
    trades = load_trades(spark, sf_dir)
    out = pattern_similarity(trades).collect()
    assert len(out) == 5
    # ranked ascending by distance, no negative distances
    dists = [r.dist for r in out]
    assert dists == sorted(dists)
    assert all(d >= 0 for d in dists)
    # the query window itself (distance 0 to itself) must be excluded:
    # a zero distance can only come from a genuinely identical other window
    qsym = min(r.symbol for r in minute_closes(trades).select("symbol").collect())
    first = out[0]
    if first.dist == 0.0:
        assert not (first.symbol == qsym)


def test_minute_closes_one_row_per_bar(spark, sf_dir):
    trades = load_trades(spark, sf_dir)
    mc = minute_closes(trades)
    assert mc.groupBy("symbol", "bar").count().filter("count > 1").count() == 0
    assert mc.count() >= PATTERN_LEN
