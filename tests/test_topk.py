"""Two-phase top-k equals the single-window form on arbitrary data."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from marketstream_etl_spark.functions.topk import top_k_per_key


def test_two_phase_topk_equals_single_window(spark):
    df = spark.range(5000).select(
        (F.col("id") % 7).alias("key"),
        F.col("id").alias("item"),
        # scores with deliberate ties to exercise the tie-break
        (F.col("id") % 50).cast("double").alias("score"),
    )
    order = [F.desc("score"), F.col("item")]
    two_phase = top_k_per_key(
        df, "key", order, k=10, salt_src="item", n_salt=8
    ).select("key", "item", "rank")
    w = Window.partitionBy("key").orderBy(*order)
    single = (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("key", "item", "rank")
    )
    assert sorted(map(tuple, two_phase.collect())) == sorted(
        map(tuple, single.collect())
    )


def test_topk_with_k_larger_than_group(spark):
    df = spark.range(5).select(
        F.lit(1).alias("key"), F.col("id").alias("item"),
        F.col("id").cast("double").alias("score"),
    )
    out = top_k_per_key(
        df, "key", [F.desc("score"), F.col("item")], k=10, salt_src="item"
    )
    assert out.count() == 5
