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


# ----------------------------------------------------------- hyperloglog
def _hll_docs(spark, rows):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t))
            for i, (s, t) in enumerate(rows)
        ]
    )


def test_hll_exact_audit_and_merge_monotonicity(spark):
    """The exact audit column is right, and the cell-wise-MAX merged
    sketch never estimates below any component sketch (T_all <= T_src)."""
    from marketstream_etl_spark.operators.sketch import hll_cardinality

    docs = _hll_docs(
        spark,
        [
            ("a", "one two three four five"),
            ("a", "one two three four five"),  # dup doc: no new shingles
            ("b", "six seven eight nine ten"),
        ],
    )
    out = {r["scope"]: r for r in hll_cardinality(docs).collect()}
    assert set(out) == {"a", "b", "__all__"}
    assert out["a"]["exact_distinct"] == 3
    assert out["b"]["exact_distinct"] == 3
    assert out["__all__"]["exact_distinct"] == 6
    for scope in ("a", "b"):
        assert out["__all__"]["estimate_e4"] >= out[scope]["estimate_e4"]
        assert out["__all__"]["t_scaled"] <= out[scope]["t_scaled"]
    for r in out.values():
        assert r["filled_registers"] + r["zero_registers"] == 1024
        assert r["estimate_e4"] > 0


def test_hll_error_in_raw_regime(spark, sf_dir):
    """On the driver corpus: when the cardinality is in the raw-HLL
    regime (> 3m), the sketch lands within ~4 standard errors."""
    from marketstream_etl_spark.operators.sketch import hll_cardinality
    from marketstream_etl_spark.sources.tables import load_table

    out = {
        r["scope"]: r
        for r in hll_cardinality(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    r = out["__all__"]
    if r["exact_distinct"] > 3 * 1024:
        assert r["err_ppm"] < 140_000  # 4 x 3.25% standard error


# ------------------------------------------------------------ bloom filter
def test_bloom_no_false_negatives_and_audit(spark, sf_dir):
    """Every exact benchmark overlap is bloom-flagged (no false
    negatives), false_hits is the audit delta, and per-doc counts bound
    each other correctly."""
    from marketstream_etl_spark.operators.sketch import bloom_contamination
    from marketstream_etl_spark.sources.tables import load_table

    rows = bloom_contamination(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert rows, "driver corpus has contaminated docs"
    for r in rows:
        assert r["bloom_hits"] >= r["exact_hits"]
        assert r["false_hits"] == r["bloom_hits"] - r["exact_hits"]
        assert r["bloom_hits"] <= r["n_shingles"]


def test_bloom_matches_exact_contamination_docs(spark, sf_dir):
    """Docs with exact_hits > 0 here are exactly the contamination op's
    flagged docs (same benchmark slice, same shingles)."""
    from marketstream_etl_spark.operators.sketch import bloom_contamination
    from marketstream_etl_spark.plans.training_data import q_contamination
    from marketstream_etl_spark.sources.tables import load_table

    bl = {
        r["doc_id"]: r["exact_hits"]
        for r in bloom_contamination(
            load_table(spark, sf_dir, "documents")
        ).collect()
        if r["exact_hits"] > 0
    }
    ex = {
        r["doc_id"]: r["n_overlap"]
        for r in q_contamination(spark, sf_dir).collect()
    }
    assert bl == ex


def test_streaming_hll_equals_batch(spark, sf_dir):
    """Bounded replay: the streamed register snapshot reproduces the batch
    report row-for-row (algebraic MAX merge => stream state == batch)."""
    from marketstream_etl_spark.operators.sketch import (
        hll_cardinality,
        streaming_hll_cardinality,
    )
    from marketstream_etl_spark.sources.tables import load_table

    batch = sorted(
        map(tuple, hll_cardinality(load_table(spark, sf_dir, "documents")).collect())
    )
    streamed = sorted(
        map(tuple, streaming_hll_cardinality(spark, sf_dir).collect())
    )
    assert streamed == batch


# --------------------------------------------------------- hdr quantiles
def test_hdr_bucket_bounds_and_audit(spark, sf_dir):
    """Every quantile row brackets its target rank exactly (the audit
    invariant) and bucket relative width respects the 1/32 design bound."""
    from marketstream_etl_spark.operators.sketch import hdr_quantiles
    from marketstream_etl_spark.sources.tables import load_table

    rows = sorted(
        hdr_quantiles(load_table(spark, sf_dir, "lineitem")).collect(),
        key=lambda r: r["q_ppm"],
    )  # output order is unspecified (r13: presentational sort removed)
    assert [r["q_ppm"] for r in rows] == [500000, 900000, 990000, 999000]
    for r in rows:
        assert r["within"]
        assert r["exact_rank_lo"] < r["target_rank"] <= r["exact_rank_hi"]
        assert r["est_lo_cents"] <= r["est_mid_cents"] <= r["est_hi_cents"]
        # 1/32 relative width plus integer rounding slack
        assert r["rel_width_ppm"] <= 1_000_000 // 32 + 1000


def test_hdr_bucketing_is_monotone_and_exact_tiny(spark):
    """bid/lo/hi are monotone in v, tiny values (< 32 cents) are exact
    singleton buckets, and lo <= v <= hi always."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.sketch import (
        _hdr_bid_expr,
        _hdr_bounds_exprs,
    )

    vals = list(range(0, 40)) + [63, 64, 65, 1000, 12345, 10**6, 10**9]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    bid = _hdr_bid_expr("v", "shiftright({x}, {n})")
    lo, hi = _hdr_bounds_exprs(f"({bid})", "shiftleft({x}, {n})", "DIV")
    out = df.select(
        "v",
        F.expr(bid).alias("bid"),
        F.expr(lo).alias("lo"),
        F.expr(hi).alias("hi"),
    ).orderBy("v").collect()
    prev_bid = -1
    for r in out:
        assert r["lo"] <= r["v"] <= r["hi"], r
        assert r["bid"] >= prev_bid
        prev_bid = r["bid"]
        if r["v"] < 32:
            assert r["lo"] == r["hi"] == r["v"] == r["bid"]


def test_hdr_grouped_brackets_every_group(spark, sf_dir):
    """Each (flag, quantile) row brackets its per-group target rank, and
    every group reports all four quantiles."""
    from marketstream_etl_spark.operators.sketch import hdr_quantiles_grouped
    from marketstream_etl_spark.sources.tables import load_table

    rows = hdr_quantiles_grouped(
        load_table(spark, sf_dir, "lineitem")
    ).collect()
    by_flag = {}
    for r in rows:
        assert r["within"]
        assert r["exact_rank_lo"] < r["target_rank"] <= r["exact_rank_hi"]
        by_flag.setdefault(r["flag"], []).append(r["q_ppm"])
    for flag, qs in by_flag.items():
        assert sorted(qs) == [500000, 900000, 990000, 999000], flag
    assert len(by_flag) >= 2


def test_hll_set_ops_identical_and_disjoint_sources(spark):
    """Two sources with the SAME text share every shingle: exact Jaccard
    1, estimated Jaccard 1 (register-max union == each sketch), err 0.
    A disjoint third source: exact_inter 0 with every other."""
    from pyspark.sql import Row

    from marketstream_etl_spark.operators.sketch import hll_set_ops

    same = "alpha beta gamma delta epsilon zeta"
    other = "one two three four five six seven"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=same, source="s1"),
            Row(doc_id=2, text=same, source="s2"),
            Row(doc_id=3, text=other, source="s3"),
        ]
    )
    out = {(r.source_a, r.source_b): r for r in hll_set_ops(docs).collect()}
    twin = out[("s1", "s2")]
    assert twin.jacc_exact == 1.0 and twin.jacc_est == 1.0
    # (no err_ppm bound here: the raw estimator is biased on near-empty
    # registers; the sf0.01 oracle run audits err at realistic fill)
    for pair in [("s1", "s3"), ("s2", "s3")]:
        assert out[pair].exact_inter == 0
        assert out[pair].jacc_exact == 0.0
