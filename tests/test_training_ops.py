"""Semantics pins for the round-5 training-data ops (BPE merge counting,
sentence-level dedup).  The DuckDB oracle checks cross-engine agreement;
these tests pin the intended MATH on constructed inputs, so a shared
misunderstanding on both engine sides cannot pass silently.
"""

from __future__ import annotations

from conftest import write_docs_parquet as _write_docs

from marketstream_etl_spark.plans import training_data




def test_bpe_pair_counts_are_frequency_weighted(spark, tmp_path):
    # vocabulary: "aba" x3 occurrences, "bb" x1
    # pairs: "aba" -> (a,b) + (b,a) each weighted 3; "bb" -> (b,b) x1
    _write_docs(
        str(tmp_path), {1: "aba aba bb", 2: "aba"}
    )
    rows = {
        (r.left_sym, r.right_sym): r.pair_count
        for r in training_data.q_bpe_merge_candidates(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows == {("a", "b"): 3, ("b", "a"): 3, ("b", "b"): 1}


def test_sentence_dedup_finds_injected_boilerplate(spark, tmp_path):
    # doc_ids 7 and 14 receive the newsletter banner; 11 the copyright
    # footer; 1 and 2 receive nothing.  Expect exactly two duplicate
    # fingerprints: newsletter (2 docs) first, nothing for the copyright
    # footer (one occurrence only).
    _write_docs(
        str(tmp_path),
        {
            1: "alpha beta gamma delta body text one",
            2: "epsilon zeta eta theta body text two",
            7: "first newsletter receiving document body",
            11: "copyright receiving document body here",
            14: "second newsletter receiving document body",
        },
    )
    out = training_data.q_sentence_dedup(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_occurrences == 2 and row.n_docs == 2
    assert "newsletter" in row.sample_sentence


def test_weighted_reservoir_favors_heavy_docs(spark, sf_dir):
    """A-Res sanity: the exact-k sample is deterministic across calls,
    keys are valid probabilities, and the selected docs' mean weight
    exceeds the corpus mean (heavier docs proportionally likelier)."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.plans.training_data import (
        q_weighted_reservoir,
    )
    from marketstream_etl_spark.sources.tables import load_table

    a = [tuple(r) for r in q_weighted_reservoir(spark, sf_dir).collect()]
    b = [tuple(r) for r in q_weighted_reservoir(spark, sf_dir).collect()]
    assert a == b and len(a) == 20
    assert all(0.0 < r[3] <= 1.0 for r in a)
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r[2] for r in a) / len(a)
    assert sample_mean > corpus_mean


def test_quality_percentile_filter_keeps_top_share_per_source(spark, sf_dir):
    """Relative gating contract: each source keeps ~60% of its docs
    (percent_rank >= 0.4 over unique ranks), and kept minima respect the
    per-source threshold (every dropped doc scores <= every kept doc)."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.text import quality_features
    from marketstream_etl_spark.plans.training_data import (
        q_quality_percentile_filter,
    )
    from marketstream_etl_spark.sources.tables import load_table

    out = {r["source"]: r for r in
           q_quality_percentile_filter(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(out) == set(totals)
    for src, row in out.items():
        n = totals[src]
        # percent_rank >= 0.4 keeps the top ceil(0.6*(n-1))+1-ish share
        assert 0.55 * n <= row["n_kept"] <= 0.65 * n + 1
        assert 0.0 <= row["min_kept_score"] <= row["avg_kept_score"] <= 1.0
