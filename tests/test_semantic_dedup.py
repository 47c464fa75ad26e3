"""SemDeDup properties (operators/similarity.py::semantic_dedup)."""
from pyspark.sql import Row
from pyspark.sql import functions as F

from marketstream_etl_spark.operators.similarity import (
    NEARDUP_COSINE,
    cosine,
    _dvec,
    semantic_dedup,
)
from marketstream_etl_spark.sources.tables import load_table


def test_duplicate_direction_collapses(spark):
    """Colinear vectors (cos = 1) form a dup group; exactly the lowest
    vec_id survives it (equal centroid-sim -> id tie-break), while the
    orthogonal vector is untouched."""
    dim = 8
    v = [1.0] + [0.0] * (dim - 1)
    v_scaled = [0.9] + [0.0] * (dim - 1)
    w = [0.0, 1.0] + [0.0] * (dim - 2)
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=v),
            Row(vec_id=1, embedding=v_scaled),
            Row(vec_id=2, embedding=w),
        ]
    )
    out = {r["vec_id"]: r for r in semantic_dedup(emb).collect()}
    assert len(out) == 3
    assert out[0]["kept"] and out[0]["n_dominating"] == 0
    assert not out[1]["kept"] and out[1]["n_dominating"] == 1
    assert out[2]["kept"]


def test_no_kept_near_dup_pair_survives(spark, sf_dir):
    """The greedy guarantee: every within-bucket near-dup pair loses at
    least one member, so all same-bucket KEPT pairs are below threshold."""
    from marketstream_etl_spark.sources.tables import table_row_count

    emb = load_table(spark, sf_dir, "embeddings")
    verdicts = semantic_dedup(
        emb, approx_rows=table_row_count(sf_dir, "embeddings")
    )
    assert verdicts.count() == emb.count()
    kept = (
        verdicts.filter("kept")
        .join(emb, "vec_id")
        .select("vec_id", "bucket", _dvec(F.col("embedding")).alias("vec"))
    )
    a = kept.select(
        F.col("vec_id").alias("ia"), "bucket", F.col("vec").alias("va")
    )
    b = kept.select(
        F.col("vec_id").alias("ib"), "bucket", F.col("vec").alias("vb")
    )
    survivors_above = (
        a.join(b, "bucket")
        .filter(F.col("ia") < F.col("ib"))
        .filter(
            F.round(cosine(F.col("va"), F.col("vb")), 6)
            >= F.lit(NEARDUP_COSINE)
        )
        .count()
    )
    assert survivors_above == 0
    dropped_bad = verdicts.filter(
        "NOT kept AND n_dominating < 1"
    ).count()
    assert dropped_bad == 0
