"""Count-min sketch heavy hitters (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketstream_etl_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_heavy_hitters,
)
from marketstream_etl_spark.sources.tables import load_table


def test_cms_overestimates_within_bound(spark, sf_dir):
    rows = cms_heavy_hitters(load_table(spark, sf_dir, "documents")).collect()
    assert len(rows) == 20
    for r in rows:
        # CMS never undercounts, and the demo asserts the e/w bound
        assert r.est_n >= r.exact_n, r.tok
        assert r.within_bound, r.tok


def test_cms_sketch_is_fixed_size(spark, sf_dir):
    """The scale claim: the sketch aggregate carries at most depth*width
    rows through the shuffle regardless of corpus size."""
    from marketstream_etl_spark.functions.hashing import h32, tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    cells = toks.select(
        *[
            (h32(F.concat(F.lit(f"cms{r}|"), F.col("tok"))) % CMS_WIDTH).alias(
                f"b{r}"
            )
            for r in range(CMS_DEPTH)
        ]
    )
    n_cells = (
        sum(
            cells.groupBy(f"b{r}").count().count()
            for r in range(CMS_DEPTH)
        )
    )
    assert n_cells <= CMS_DEPTH * CMS_WIDTH
