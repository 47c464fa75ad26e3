"""The flagship ETL pipeline — Spark re-expression of the reference's
`etl_pipeline` (/root/reference/src/main.cpp:13-145, SURVEY §3.1):

  CSV → validate (V1-V6 split) → indicators (SMA/RSI/VWAP, period=5)
      → [DDL] → load (parallel sink) → parquet

The eager stage-by-stage materialization disappears: Spark fuses
scan→project→filter into one codegen stage, the indicator aggregation is the
only shuffle, and the two sinks (trades ∥ indicators) overlap via two driver
threads (PipelineExecutor parity, src/threading/PipelineExecutor.hpp:80-184).

`run_pipeline` returns per-stage timings in the shape of the reference's
benchmark report (Benchmarker.hpp:36-71) — note that Spark stages are lazy,
so "stage" timings are action-bounded: parse+validate is one fused scan.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketstream_etl_spark.operators.indicators import compute_indicators_auto
from marketstream_etl_spark.operators.validation import with_validation
from marketstream_etl_spark.sources.csv_trades import read_trades_csv
from marketstream_etl_spark.sources.sinks import write_dual_sinks


@dataclass
class PipelineReport:
    n_input: int = 0
    n_valid: int = 0
    n_rejected: int = 0
    n_symbols: int = 0
    stage_seconds: dict[str, float] = field(default_factory=dict)

    def items_per_second(self, stage: str) -> float:
        s = self.stage_seconds.get(stage, 0.0)
        return self.n_input / s if s else 0.0


def init_schema(spark: SparkSession) -> None:
    """S7 DDL parity (DatabaseLoader.cpp:88-160): managed-table DDL on the
    session catalog. CHECK constraints live in the validator (V1-V6)."""
    spark.sql(
        """
        CREATE TABLE IF NOT EXISTS trades (
            trade_id BIGINT, order_id BIGINT, timestamp BIGINT,
            symbol STRING, price DOUBLE, volume INT,
            side STRING, type STRING, is_pro BOOLEAN
        ) USING parquet
        """
    )
    spark.sql(
        """
        CREATE TABLE IF NOT EXISTS technical_indicators (
            symbol STRING, computed_at BIGINT, sma DOUBLE, rsi DOUBLE,
            vwap DOUBLE, period INT
        ) USING parquet
        """
    )


def run_pipeline(
    spark: SparkSession,
    csv_path: str,
    out_dir: str,
    period: int = 5,
    computed_at_ns: int | None = None,
) -> PipelineReport:
    report = PipelineReport()

    t0 = time.perf_counter()
    raw = read_trades_csv(spark, csv_path)
    # ONE scan parses, validates, and caches; valid/reject counts come from
    # a single aggregate over the cached frame (the reference re-walks the
    # batch per stage — here the CSV is parsed exactly once).
    annotated = with_validation(raw).persist()
    counts = annotated.agg(
        F.sum(F.col("is_valid").cast("long")),
        F.sum((~F.col("is_valid")).cast("long")),
    ).first()
    report.n_valid = counts[0] or 0
    report.stage_seconds["parse_validate"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    # reject channel (dead-letter view) — rows already in cache, no re-parse
    valid = annotated.filter(F.col("is_valid")).drop("reject_reason", "is_valid")
    report.n_rejected = counts[1] or 0
    report.n_input = report.n_valid + report.n_rejected
    report.stage_seconds["reject_channel"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    indicators = compute_indicators_auto(
        valid,
        period=period,
        computed_at_ns=computed_at_ns or time.time_ns(),
    ).persist()
    report.n_symbols = indicators.count()
    report.stage_seconds["indicators"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    write_dual_sinks(
        valid, indicators, f"{out_dir}/trades", f"{out_dir}/technical_indicators"
    )
    report.stage_seconds["dual_sink_parquet"] = time.perf_counter() - t0

    annotated.unpersist()
    indicators.unpersist()
    return report


def pipeline_results(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Read back what the pipeline wrote (the README verification queries
    run over these)."""
    trades = spark.read.parquet(f"{out_dir}/trades")
    ind = spark.read.parquet(f"{out_dir}/technical_indicators")
    return {
        "trades": trades,
        "indicators": ind,
        "leaderboard": trades.groupBy("symbol")
        .agg(F.count("*").alias("trades"), F.sum("volume").alias("total_volume"))
        .orderBy(F.desc("trades")),
    }
