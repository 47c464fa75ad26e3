"""Kafka-source plumbing without a broker: the parser is pure column logic
over the Kafka wire shape (key/value binary + topic/partition/offset), so a
Kafka-SHAPED stream exercises everything but the connector itself."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from marketstream_etl_spark.sources.generator import generate_trades
from marketstream_etl_spark.streaming.kafka import parse_kafka_ticks
from marketstream_etl_spark.streaming.ticks import symbol_counts, to_json_frames


def kafka_shaped(df):
    """JSON frames → the columns the Kafka source delivers."""
    return df.select(
        F.lit(None).cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("ticks").alias("topic"),
        F.spark_partition_id().alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
    )


def test_parse_kafka_ticks_roundtrip(spark):
    trades = generate_trades(spark, 300).withColumn("exchange", F.lit("WSS"))
    raw = kafka_shaped(to_json_frames(trades))
    parsed = parse_kafka_ticks(raw)
    ok = parsed.filter(~F.col("parse_error"))
    assert ok.count() == 300
    # payloads survive the binary round-trip intact
    assert (
        ok.agg(F.sum("volume")).collect()[0][0]
        == trades.agg(F.sum("volume")).collect()[0][0]
    )
    # source coordinates ride along for idempotent sinks
    assert {"topic", "partition", "offset"} <= set(parsed.columns)
    assert ok.select("offset").distinct().count() == 300


def test_parse_kafka_ticks_dead_letter(spark):
    good = kafka_shaped(
        to_json_frames(generate_trades(spark, 5).withColumn("exchange", F.lit("WSS")))
    )
    bad = spark.createDataFrame(
        [("{not json",), ("",)], "value string"
    ).select(
        F.lit(None).cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("ticks").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(999).cast("long").alias("offset"),
    )
    parsed = parse_kafka_ticks(good.unionByName(bad))
    assert parsed.filter(F.col("parse_error")).count() == 2
    assert parsed.filter(~F.col("parse_error")).count() == 5


def test_kafka_shaped_stream_counts(spark):
    """End-to-end: Kafka-shaped records through a REAL streaming query →
    per-symbol counts equal the batch aggregation."""
    trades = generate_trades(spark, 400).withColumn("exchange", F.lit("WSS"))
    raw = kafka_shaped(to_json_frames(trades))
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/kafka_shaped"
        raw.coalesce(2).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(raw.schema).parquet(src)
        counts = symbol_counts(
            parse_kafka_ticks(stream).filter(~F.col("parse_error"))
        )
        q = (
            counts.writeStream.format("memory")
            .queryName("kafka_shape_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["symbol"]: (r["n_ticks"], r["total_volume"])
            for r in spark.table("kafka_shape_counts").collect()
        }
    want = {
        r["symbol"]: (r["n"], r["vol"])
        for r in trades.groupBy("symbol")
        .agg(F.count("*").alias("n"), F.sum("volume").alias("vol"))
        .collect()
    }
    assert got == want and len(got) > 0
