"""End-to-end flagship pipeline test (SURVEY §3.1 parity)."""

from __future__ import annotations

import tempfile

from marketstream_etl_spark.plans.pipeline import (
    init_schema,
    pipeline_results,
    run_pipeline,
)
from marketstream_etl_spark.sources.generator import generate_trades


def test_pipeline_end_to_end(spark):
    with tempfile.TemporaryDirectory() as d:
        # generate a CSV the way the reference's generate_data tool would
        trades = generate_trades(spark, 3000)
        trades.selectExpr(
            "trade_id", "order_id", "timestamp", "symbol", "price",
            "volume", "side", "type", "cast(is_pro as int) as is_pro",
        ).coalesce(1).write.mode("overwrite").option("header", True).csv(
            f"{d}/csv"
        )

        report = run_pipeline(spark, f"{d}/csv", f"{d}/out", period=5)
        assert report.n_input == 3000
        assert report.n_rejected == 0  # generator output is all-valid
        assert report.n_valid == 3000
        assert 8 <= report.n_symbols <= 10

        out = pipeline_results(spark, f"{d}/out")
        assert out["trades"].count() == 3000
        ind = {r["symbol"]: r for r in out["indicators"].collect()}
        assert len(ind) == report.n_symbols
        for r in ind.values():
            assert 0.0 <= r["rsi"] <= 100.0
            assert r["vwap"] > 0 and r["period"] == 5
        lb = out["leaderboard"].collect()
        assert sum(r["trades"] for r in lb) == 3000


def test_init_schema_idempotent(spark):
    init_schema(spark)
    init_schema(spark)
    tables = {t.name for t in spark.catalog.listTables()}
    assert {"trades", "technical_indicators"} <= tables
    spark.sql("DROP TABLE IF EXISTS trades")
    spark.sql("DROP TABLE IF EXISTS technical_indicators")
