"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"symbol", "sma", "rsi", "vwap", "period"}
    for r in rows:
        assert 0.0 <= r["rsi"] <= 100.0
        assert r["vwap"] > 0


def test_every_query_has_matching_oracle_or_is_marked():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)


def test_queries_run_on_sf0001(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
