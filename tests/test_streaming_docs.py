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
