"""Cross-validation: Spark's built-in session_window agrees with the
lag+cumsum sessionization on session counts (same 30-min gap rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketstream_etl_spark.plans.advanced import q_sessionization
from marketstream_etl_spark.sources.tables import load_table


def test_session_window_agrees_with_lag_cumsum(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    sw = (
        ev.groupBy(
            F.session_window("event_time", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    built_in = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in sw.collect()}
    ours = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_sessionization(spark, sf_dir).collect()
    }
    # session_window closes at gap >= 30min (exclusive end) while the
    # lag-rule opens a new session only when gap > 30min — identical unless
    # a gap is exactly 30:00.000000, which the generator never emits.
    assert built_in == ours
