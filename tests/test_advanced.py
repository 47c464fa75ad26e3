"""Advanced-surface checks not covered by the DuckDB oracle."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from marketstream_etl_spark.plans import advanced


def test_approx_aggs_error_bounds(spark, sf_dir):
    # the query now asserts the sketch bounds itself (oracle-visible
    # booleans); the test checks they hold and the exact values are sane
    r = advanced.q_approx_aggs(spark, sf_dir).collect()[0]
    assert r["parts_within_3pct"]
    assert r["p50_within_1pct"]
    assert r["exact_parts"] > 0 and r["exact_p50"] > 0


def test_sessionization_sane(spark, sf_dir):
    rows = advanced.q_sessionization(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_sessions"] >= 1
        assert r["n_events"] >= r["n_sessions"]
        assert r["max_session_s"] >= 0.0


def test_asof_enrich_covers_all_valid_trades(spark, sf_dir):
    out = advanced.q_asof_enrich(spark, sf_dir)
    n = out.count()
    assert n > 0
    # early trades (before the first sampled indicator) carry NULLs; later
    # ones must be enriched
    enriched = out.filter(out.asof_sma.isNotNull()).count()
    assert 0 < enriched <= n
