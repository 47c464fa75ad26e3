"""Stream-static join: the streaming contamination pipeline must converge
to the batch operator's exact output on a bounded replay."""

from __future__ import annotations

from marketstream_etl_spark.functions import cachegen
from marketstream_etl_spark.plans import training_data
from marketstream_etl_spark.streaming.docs import file_stream_contamination


def test_streaming_contamination_equals_batch(spark, sf_dir):
    streamed = sorted(
        map(tuple, file_stream_contamination(spark, sf_dir).collect())
    )
    batch = sorted(
        map(tuple, training_data.q_contamination(spark, sf_dir).collect())
    )
    assert streamed == batch
    assert streamed  # content-bearing at sf0.001
    cachegen.clear()


def test_stream_ivf_assign_matches_batch_final_state(spark, sf_dir):
    """The streaming bucket-occupancy final state must equal the same
    aggregation computed batch-side with the identical literal codebook."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.similarity import _assign, _dvec
    from marketstream_etl_spark.sources.tables import load_table
    from marketstream_etl_spark.streaming.docs import file_stream_ivf_assign

    streamed = file_stream_ivf_assign(spark, sf_dir).collect()

    static = load_table(spark, sf_dir, "embeddings")
    cents = {
        int(r["vec_id"]): list(r["v"])
        for r in static.filter(F.col("vec_id") < 16)
        .select("vec_id", _dvec(F.col("embedding")).alias("v"))
        .collect()
    }
    batch = (
        _assign(
            static.select("vec_id", _dvec(F.col("embedding")).alias("v")),
            cents,
        )
        .groupBy(F.col("cid").alias("bucket"))
        .agg(
            F.count("*").alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.round(F.sum("dist"), 4).alias("inertia"),
        )
        .orderBy("bucket")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_stream_calibration_matches_batch(spark):
    """Bounded replay of the streaming calibration monitor must equal the
    batch calibration_ece report row-for-row (shared integer core +
    stream-safe scorer bit-identity)."""
    from marketstream_etl_spark.plans.training_data import q_calibration_ece
    from marketstream_etl_spark.streaming.docs import file_stream_calibration

    sf = "/root/testdata/sf0.001"
    streamed = [tuple(r) for r in file_stream_calibration(spark, sf).collect()]
    batch = [tuple(r) for r in q_calibration_ece(spark, sf).collect()]
    assert sorted(streamed, key=str) == sorted(batch, key=str)
    assert len(streamed) == 10


def test_stream_embedding_drift_matches_batch(spark):
    """Bounded replay of the streaming embedding-drift monitor equals
    the batch per-dim PSI report row-for-row (shared fixed-point core)."""
    from marketstream_etl_spark.plans.training_data import q_embedding_drift
    from marketstream_etl_spark.streaming.docs import (
        file_stream_embedding_drift,
    )

    sf = "/root/testdata/sf0.001"
    s = [tuple(r) for r in file_stream_embedding_drift(spark, sf).collect()]
    b = [tuple(r) for r in q_embedding_drift(spark, sf).collect()]
    assert sorted(s) == sorted(b)
    assert len(s) == 64


def test_stream_iv_matches_batch(spark):
    """Bounded replay of the streaming IV monitor equals the batch
    information_value report row-for-row (shared clamped-share core)."""
    from marketstream_etl_spark.plans.training_data import (
        q_information_value,
    )
    from marketstream_etl_spark.streaming.docs import file_stream_iv

    sf = "/root/testdata/sf0.001"
    s = [tuple(r) for r in file_stream_iv(spark, sf).collect()]
    b = [tuple(r) for r in q_information_value(spark, sf).collect()]
    assert sorted(s, key=str) == sorted(b, key=str)
    assert len(s) == 10
