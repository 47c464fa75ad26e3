"""Streaming semantics (SURVEY §2.8): JSON ingest + dead-letter, stateful
per-symbol counts equal batch counts on the same data, windowed stats,
rate-source tick stream runs.
"""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from marketstream_etl_spark.streaming.ticks import (
    hot_path_filter,
    parse_json_frames,
    run_demo_batch,
    symbol_counts,
    tick_stream,
    to_json_frames,
    windowed_symbol_stats,
)


def make_frames(spark, n=50, corrupt=3):
    rows = []
    for i in range(n):
        rows.append(
            Row(
                value=json.dumps(
                    {
                        "trade_id": i,
                        "order_id": 10_000 + i,
                        "timestamp": 1_698_208_500_000_000_000 + i * 10_000,
                        "symbol": ["RELIANCE", "TCS", "INFY"][i % 3],
                        "price": 100.0 + i,
                        "volume": 10 + i,
                        "side": "B" if i % 2 == 0 else "S",
                        "type": "M",
                        "is_pro": False,
                        "exchange": "WSS",
                    }
                )
            )
        )
    for i in range(corrupt):
        rows.append(Row(value=f"{{not valid json {i}"))
    return spark.createDataFrame(rows)


def test_parse_and_dead_letter_split(spark):
    frames = make_frames(spark, n=30, corrupt=4)
    out = run_demo_batch(spark, frames)
    assert out["dead_letter"].count() == 4
    counts = {r["symbol"]: r["n_ticks"] for r in out["counts"].collect()}
    assert sum(counts.values()) == 30
    assert counts == {"RELIANCE": 10, "TCS": 10, "INFY": 10}


def test_json_roundtrip(spark):
    frames = make_frames(spark, n=12, corrupt=0)
    parsed = parse_json_frames(frames)
    back = to_json_frames(parsed.drop("raw_frame", "parse_error"))
    reparsed = parse_json_frames(back)
    assert reparsed.filter(F.col("parse_error")).count() == 0
    assert reparsed.count() == 12


def test_streaming_counts_equal_batch_counts(spark):
    """ST3: run the same frames through a real streaming query (availableNow
    over a memory-backed source) and as a batch; counts must agree."""
    import tempfile

    frames = make_frames(spark, n=60, corrupt=0)
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        frames.write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("value string").parquet(src)
        )
        ticks = hot_path_filter(
            parse_json_frames(stream).filter(~F.col("parse_error"))
        )
        q = (
            symbol_counts(ticks)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("sym_counts")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["symbol"]: r["n_ticks"]
            for r in spark.sql("SELECT * FROM sym_counts").collect()
        }
    batch = {
        r["symbol"]: r["n_ticks"]
        for r in symbol_counts(
            hot_path_filter(
                parse_json_frames(frames).filter(~F.col("parse_error"))
            )
        ).collect()
    }
    assert got == batch and sum(got.values()) == 60


def test_windowed_stats_watermark_plan(spark):
    """ST4: windowed agg with watermark compiles and computes on a batch."""
    frames = make_frames(spark, n=40, corrupt=0)
    ticks = parse_json_frames(frames).filter(~F.col("parse_error"))
    out = windowed_symbol_stats(ticks, window="1 minute").collect()
    assert len(out) >= 1
    for r in out:
        assert r["vwap"] > 0 and r["n_ticks"] > 0


def test_rate_source_tick_stream_runs(spark):
    """S4: the rate-source stream produces schema-correct ticks."""
    ticks = tick_stream(spark, rows_per_second=1000)
    assert ticks.isStreaming
    q = (
        ticks.writeStream.format("memory")
        .queryName("ticks_smoke")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM ticks_smoke").collect()[0]["c"]
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
        row = spark.sql("SELECT * FROM ticks_smoke LIMIT 1").collect()[0]
        assert row["exchange"] == "WSS"
        assert row["symbol"] in {"RELIANCE", "TCS", "INFY", "HDFC", "WIPRO"}
        assert row["price"] > 0 and row["volume"] >= 10
    finally:
        q.stop()


def test_file_stream_counts_equals_batch(spark, sf_dir):
    """ST3/ST5 via the file source: the availableNow streaming aggregation
    must equal the plain batch groupBy on the same parquet data."""
    from marketstream_etl_spark.plans.trades_view import load_trades
    from marketstream_etl_spark.streaming.ticks import (
        file_stream_counts,
        hot_path_filter,
        symbol_counts,
    )

    streamed = {
        r["symbol"]: (r["n_ticks"], r["total_volume"])
        for r in file_stream_counts(spark, sf_dir).collect()
    }
    batch = {
        r["symbol"]: (r["n_ticks"], r["total_volume"])
        for r in symbol_counts(
            hot_path_filter(load_trades(spark, sf_dir))
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_file_stream_join_equals_batch(spark, sf_dir):
    """Stream-stream interval join on bounded replay must equal the batch
    range join (same symbol, sell within 1h after buy), per symbol."""
    from marketstream_etl_spark.plans.trades_view import load_trades
    from marketstream_etl_spark.streaming.ticks import file_stream_join

    streamed = {
        r["symbol"]: (r["n_pairs"], r["avg_spread"])
        for r in file_stream_join(spark, sf_dir).collect()
    }

    t = load_trades(spark, sf_dir)
    buys = t.filter(F.col("side") == "B").select(
        F.col("symbol").alias("b_symbol"),
        F.col("price").alias("buy_price"),
        F.col("timestamp").alias("buy_ts"),
    )
    sells = t.filter(F.col("side") == "S").select(
        F.col("symbol").alias("s_symbol"),
        F.col("price").alias("sell_price"),
        F.col("timestamp").alias("sell_ts"),
    )
    batch = {
        r["symbol"]: (r["n_pairs"], r["avg_spread"])
        for r in buys.join(
            sells,
            (F.col("b_symbol") == F.col("s_symbol"))
            & (F.col("sell_ts") >= F.col("buy_ts"))
            & (F.col("sell_ts") <= F.col("buy_ts") + 3_600_000_000_000),
        )
        .groupBy(F.col("b_symbol").alias("symbol"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg(F.col("sell_price") - F.col("buy_price")), 6).alias(
                "avg_spread"
            ),
        )
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_file_stream_sessions_equals_batch(spark, sf_dir):
    """Streaming session_window final state must equal the batch
    gaps-and-islands sessionization on the same data."""
    from marketstream_etl_spark.plans.advanced import q_sessionization
    from marketstream_etl_spark.streaming.ticks import file_stream_sessions

    streamed = {
        r["user_id"]: (
            r["n_sessions"],
            r["n_events"],
            r["avg_session_s"],
            r["max_session_s"],
        )
        for r in file_stream_sessions(spark, sf_dir).collect()
    }
    batch = {
        r["user_id"]: (
            r["n_sessions"],
            r["n_events"],
            r["avg_session_s"],
            r["max_session_s"],
        )
        for r in q_sessionization(spark, sf_dir).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_socket_emitter_cap_fails_loudly(spark, monkeypatch):
    """The socket fixture's driver-side buffer is bounded: exceeding
    SOCKET_EMITTER_MAX_ROWS must raise before any collect, not OOM or
    silently truncate (counts are oracle-compared)."""
    import pytest

    from marketstream_etl_spark.streaming import ticks as ticksmod

    monkeypatch.setattr(ticksmod, "SOCKET_EMITTER_MAX_ROWS", 5)
    with pytest.raises(RuntimeError, match="emitter cap"):
        ticksmod.socket_stream_deadletter(spark, "/root/testdata/sf0.001")


def test_stream_anomaly_matches_batch_zscore(spark, sf_dir):
    """The streaming tripwire's final state equals the batch z-score pass
    over the same hot-filtered trades."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.plans.trades_view import load_trades
    from marketstream_etl_spark.streaming.ticks import (
        file_stream_anomaly,
        hot_path_filter,
    )

    streamed = [tuple(r) for r in file_stream_anomaly(spark, sf_dir).collect()]
    hot = hot_path_filter(load_trades(spark, sf_dir, fan_out=True))
    stats = hot.groupBy("symbol").agg(
        F.avg("price").alias("mu"), F.stddev_samp("price").alias("sd")
    )
    abs_z = F.when(
        F.col("sd") > 0, F.abs((F.col("price") - F.col("mu")) / F.col("sd"))
    ).otherwise(F.lit(0.0))
    batch = [
        tuple(r)
        for r in hot.join(F.broadcast(stats), "symbol")
        .withColumn("abs_z", abs_z)
        .groupBy("symbol")
        .agg(
            F.count("*").alias("n_ticks"),
            F.sum(F.when(F.col("abs_z") > 2.0, 1).otherwise(0))
            .cast("long")
            .alias("n_anomalies"),
            F.round(F.max("abs_z"), 4).alias("max_abs_z"),
        )
        .orderBy("symbol")
        .collect()
    ]
    assert streamed == batch


def test_file_stream_join_outer_equals_batch_left_join(spark, sf_dir):
    """LEFT OUTER watermarked join on bounded replay: matched pairs equal
    the batch interval join; every buy with no in-horizon sell must be
    flushed exactly once by the sentinel-advanced watermark."""
    from marketstream_etl_spark.plans.trades_view import load_trades
    from marketstream_etl_spark.streaming.ticks import file_stream_join_outer

    streamed = {
        r["symbol"]: (r["n_pairs"], r["n_unmatched"], r["avg_spread"])
        for r in file_stream_join_outer(spark, sf_dir).collect()
    }

    t = load_trades(spark, sf_dir)
    buys = t.filter(F.col("side") == "B").select(
        F.col("symbol").alias("b_symbol"),
        F.col("price").alias("buy_price"),
        F.col("timestamp").alias("buy_ts"),
    )
    sells = t.filter(F.col("side") == "S").select(
        F.col("symbol").alias("s_symbol"),
        F.col("price").alias("sell_price"),
        F.col("timestamp").alias("sell_ts"),
    )
    batch = {
        r["symbol"]: (r["n_pairs"], r["n_unmatched"], r["avg_spread"])
        for r in buys.join(
            sells,
            (F.col("b_symbol") == F.col("s_symbol"))
            & (F.col("sell_ts") >= F.col("buy_ts"))
            & (F.col("sell_ts") <= F.col("buy_ts") + 3_600_000_000_000),
            "left",
        )
        .groupBy(F.col("b_symbol").alias("symbol"))
        .agg(
            F.count("sell_price").alias("n_pairs"),
            (F.count("*") - F.count("sell_price")).alias("n_unmatched"),
            F.round(F.avg(F.col("sell_price") - F.col("buy_price")), 6).alias(
                "avg_spread"
            ),
        )
        .collect()
    }
    assert streamed == batch and len(streamed) > 0
    assert sum(v[1] for v in streamed.values()) > 0  # outer rows exercised


def test_file_stream_psi_equals_batch(spark, sf_dir):
    """Streaming complete-mode histogram + shared PSI core must be
    bit-identical to the batch psi_drift on bounded replay."""
    from marketstream_etl_spark.plans.advanced import q_psi_drift
    from marketstream_etl_spark.streaming.ticks import file_stream_psi

    streamed = [tuple(r) for r in file_stream_psi(spark, sf_dir).collect()]
    batch = [tuple(r) for r in q_psi_drift(spark, sf_dir).collect()]
    assert streamed == batch and len(streamed) == 10


def test_accumulate_stream_replay_is_idempotent(spark, tmp_path):
    """The foreachBatch accumulator's exactly-once contract (r8): a
    re-executed micro-batch overwrites its OWN batch_id subdirectory, so
    the drained merge never double-counts — simulated here by writing
    the same batch partial twice (what a foreachBatch retry does) plus a
    second distinct batch, then running the drain-time merge."""
    from pyspark.sql import functions as F

    acc_dir = str(tmp_path / "acc")
    b0 = spark.createDataFrame(
        [("A", 2), ("B", 3)], "symbol string, n long"
    ).groupBy("symbol").agg(F.sum("n").alias("n"))
    b1 = spark.createDataFrame(
        [("A", 5)], "symbol string, n long"
    ).groupBy("symbol").agg(F.sum("n").alias("n"))

    # batch 0 executes, then is REPLAYED (same bid), then batch 1 runs —
    # the accumulate_stream agg_batch body, verbatim
    for bid, part in ((0, b0), (0, b0), (1, b1)):
        part.write.mode("overwrite").parquet(f"{acc_dir}/batch_id={bid}")

    merged = {
        r["symbol"]: r["n"]
        for r in spark.read.parquet(acc_dir)
        .groupBy("symbol")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert merged == {"A": 7, "B": 3}  # replay did NOT double-count


def test_join_horizon_density_adaptive(tmp_path):
    """Interval-join horizon holds 1 HOUR through every driver/bench SF
    (rows <= 100K) and shrinks with the SQUARE of the density ratio
    beyond it, pinning expected pair volume at its sf0.1 level (pair
    volume ~ rows^2 x horizon)."""
    from marketstream_etl_spark.streaming.ticks import (
        JOIN_HORIZON_NS,
        join_horizon_ns,
    )

    assert join_horizon_ns("/root/testdata/sf0.001") == JOIN_HORIZON_NS
    assert join_horizon_ns("/root/testdata/sf0.01") == JOIN_HORIZON_NS
    assert join_horizon_ns("/root/testdata/sf0.1") == JOIN_HORIZON_NS
    # missing table -> reference horizon, never a crash
    assert join_horizon_ns(str(tmp_path)) == JOIN_HORIZON_NS


def test_accumulate_stream_empty_source_yields_empty_frame(spark, tmp_path):
    """Zero micro-batches (empty source dir): foreachBatch never runs, so
    no partials exist — accumulate_stream must return an empty frame with
    the merged schema, not throw AnalysisException reading a nonexistent
    accumulator directory (r8 ADVICE)."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.streaming.replay import accumulate_stream

    src = tmp_path / "empty_src"
    src.mkdir()
    stream = spark.readStream.schema("symbol string, n long").parquet(
        str(src)
    )
    out = accumulate_stream(
        spark,
        str(tmp_path),
        stream,
        "empty_acc_probe",
        partial_fn=lambda b: b.groupBy("symbol").agg(F.sum("n").alias("n")),
        key_cols=["symbol"],
        merge_exprs=[F.sum("n").alias("n")],
    )
    assert out.columns == ["symbol", "n"]
    assert out.count() == 0


def test_single_parse_ingest_scopes_and_restores_conf(spark):
    from marketstream_etl_spark.streaming.ticks import (
        _PUSHDOWN_RULE,
        single_parse_ingest,
    )

    key = "spark.sql.optimizer.excludedRules"
    spark.conf.set(key, "some.Other.Rule")
    try:
        with single_parse_ingest(spark):
            assert spark.conf.get(key) == _PUSHDOWN_RULE
        assert spark.conf.get(key) == "some.Other.Rule"
    finally:
        spark.conf.unset(key)
    # unset baseline: restored to unset, even on error inside the scope
    try:
        with single_parse_ingest(spark):
            assert spark.conf.get(key) == _PUSHDOWN_RULE
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    # excludedRules has a None default, so "restored to unset" reads back
    # as None rather than raising
    assert spark.conf.get(key) in (None, "<undefined>")
