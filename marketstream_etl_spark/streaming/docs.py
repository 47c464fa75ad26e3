"""Streaming document pipelines — the STREAM-STATIC join axis of
Structured Streaming (every other streaming query here is stream-only or
stream-stream): documents replay as a bounded file-source stream and join
a STATIC broadcast side built batch-side from the same corpus generation.

The flagship is streaming contamination: the benchmark shingle set is
static (benchmarks change rarely); the corpus streams in as crawled.  At
100 TB the static side stays a broadcast of the (tiny) benchmark n-grams
and each micro-batch's overlap join is map-side — the same shape as the
batch operator, incrementalized for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketstream_etl_spark.functions.hashing import h32, shingles, tokens


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a bounded file-source stream (same replay
    contract as streaming.ticks.stream_events)."""
    from marketstream_etl_spark.sources.tables import ensure_engine_confs

    ensure_engine_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def file_stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of plans.training_data.q_contamination: corpus docs
    STREAM in, the benchmark shingle set is a STATIC broadcast built from
    the same table batch-side (dedup.shingle_pairs_cached — shared with
    the whole dedup family), and the overlap join + per-doc count run
    incrementally.  The final snapshot must equal the batch operator's
    output exactly, so the driver reuses the contamination oracle.

    No watermark: the per-doc aggregate state is the active-document set
    of the bounded replay; a production deployment over an unbounded crawl
    would key the aggregation by (crawl batch, doc_id) and expire finished
    batches.
    """
    from marketstream_etl_spark.operators.dedup import (
        SHINGLE_K,
        shingle_pairs_cached,
    )
    from marketstream_etl_spark.sources.tables import load_table
    from marketstream_etl_spark.streaming.replay import drain_to_memory

    is_bench = h32(F.col("doc_id").cast("string")) % 20 == 0

    # STATIC side: benchmark shingles from the shared batch pairs frame
    static_docs = load_table(spark, sf_dir, "documents")
    bench_shingles = (
        shingle_pairs_cached(static_docs)
        .filter(is_bench)
        .select("shingle")
        .distinct()
    )

    # STREAM side: non-benchmark docs, shingled per-row (map-side)
    docs = stream_documents(spark, sf_dir)
    corpus = (
        docs.filter(~is_bench)
        .select(
            "doc_id",
            F.array_distinct(
                shingles(tokens(F.col("text")), k=SHINGLE_K)
            ).alias("_sh"),
        )
        .select(
            "doc_id",
            F.size("_sh").alias("n_shingles"),
            F.explode("_sh").alias("shingle"),
        )
    )
    overlap = (
        corpus.join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_overlap"))
    )
    emitted = drain_to_memory(
        overlap, "stream_contamination", sf_dir, output_mode="update"
    )
    # final snapshot: the last (max) overlap count per doc — counts grow
    # monotonically across replayed batches
    return (
        emitted.groupBy("doc_id", "n_shingles")
        .agg(F.max("n_overlap").alias("n_overlap"))
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            F.round(
                F.col("n_overlap") / F.col("n_shingles").cast("double"), 4
            ).alias("contamination"),
        )
        .orderBy("doc_id")
    )
