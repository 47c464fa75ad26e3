"""Kafka tick ingestion — the north-star source path ("Structured Streaming
+ Kafka source for market data ingestion", BASELINE.json).

A Kafka record reaches Spark as (key BINARY, value BINARY, topic, partition,
offset, timestamp, timestampType).  `parse_kafka_ticks` maps that wire shape
onto the existing JSON tick parser (streaming/ticks.py — S5/S6/ST6
semantics: typed tick columns + dead-letter flag), carrying
(topic, partition, offset) through for sink-side idempotence bookkeeping.
It is pure column logic, so it is fully testable against Kafka-SHAPED
frames without a broker; `kafka_tick_stream` builds the real source and is
gated on the spark-sql-kafka connector, which cluster images ship but this
container does not.

Backpressure (the reference's SPSC ring, ST2) maps to
`maxOffsetsPerTrigger`: the engine bounds each micro-batch instead of the
producer blocking on a full ring — same lossless contract
(SPSCQueue.hpp:200-256), no user-visible queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketstream_etl_spark.streaming.ticks import parse_json_frames

KAFKA_FORMAT = "kafka"


def parse_kafka_ticks(raw: DataFrame) -> DataFrame:
    """Kafka wire records → typed ticks + dead-letter flag.

    `value` is UTF-8 JSON (the reference's WebSocket frame format,
    TickMessage.hpp:87-142); corrupt payloads set `parse_error` and keep
    `raw_frame`, exactly the TickClient `parse_errors` channel.  The source
    coordinates (topic, partition, offset) ride along so a downstream sink
    can dedup on them (offsets are the stream's primary key)."""
    frames = raw.select(
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
    )
    return parse_json_frames(frames, passthrough=("topic", "partition", "offset"))


def kafka_tick_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """The real Kafka source (requires the spark-sql-kafka-0-10 connector
    on the classpath — standard on cluster images, absent here)."""
    reader = (
        spark.readStream.format(KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    try:
        raw = reader.load()
    except Exception as exc:  # connector jar missing → actionable message
        raise NotImplementedError(
            "Kafka source needs the spark-sql-kafka-0-10 connector jar "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>). "
            "parse_kafka_ticks itself is connector-independent."
        ) from exc
    return parse_kafka_ticks(raw)
