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


# --- r6 additions: drift / agreement / cluster-profile ---------------------


def test_token_drift_identical_sources_near_zero(spark, tmp_path):
    """Two sources with IDENTICAL token distributions must show (near-)zero
    chi-square; a third with disjoint vocabulary must dominate."""
    from marketstream_etl_spark.plans.training_data import q_token_drift

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    # conftest.write_docs_parquet pins source='src0'; this test needs
    # per-source control, so it builds the table directly
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_src = (
        [("same_a", base)] * 10
        + [("same_b", base)] * 10
        + [("shifted", "omega psi chi phi upsilon tau sigma rho " * 4)] * 10
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows_src)), pa.int64()),
                "text": pa.array([t for _, t in rows_src], pa.string()),
                "lang": pa.array(["en"] * len(rows_src), pa.string()),
                "source": pa.array([s for s, _ in rows_src], pa.string()),
                "n_chars": pa.array(
                    [len(t) for _, t in rows_src], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = {
        r["source"]: r
        for r in q_token_drift(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"same_a", "same_b", "shifted"}
    # identical-to-each-other sources are NOT identical to the corpus
    # (the corpus includes 'shifted'), but they must tie exactly...
    assert out["same_a"]["chi2"] == out["same_b"]["chi2"]
    # ...and the disjoint-vocabulary source must dominate both
    assert out["shifted"]["chi2"] > out["same_a"]["chi2"]
    assert all(r["chi2"] >= 0.0 for r in out.values())


def test_dedup_family_agreement_partition(spark, sf_dir):
    from marketstream_etl_spark.plans.training_data import (
        q_dedup_family_agreement,
    )

    rows = q_dedup_family_agreement(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_union"] == (
        r["n_both"] + r["n_minhash_only"] + r["n_simhash_only"]
    )
    assert 0.0 <= r["pair_jaccard"] <= 1.0


def test_cluster_profile_partitions_all_vectors(spark, sf_dir):
    from marketstream_etl_spark.operators.similarity import KMEANS_K
    from marketstream_etl_spark.plans.training_data import q_cluster_profile
    from marketstream_etl_spark.sources.tables import load_table

    prof = q_cluster_profile(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert 1 <= len(prof) <= KMEANS_K
    assert sum(r["n_vectors"] for r in prof) == n_emb  # a true partition
    for r in prof:
        assert r["majority_label"] in labels
        assert 0.0 < r["purity"] <= 1.0
        # purity can never be below the uniform floor 1/n_labels... only
        # for the majority pick: majority count >= ceil(n/|labels|)
        assert r["purity"] >= 1.0 / max(len(labels), 1) - 1e-9


def test_ann_truncated_recall_monotone(spark, sf_dir):
    """More dims can only help (statistically): recall_d32 should be >=
    recall_d16 on average, and both live in [0, 1]."""
    from marketstream_etl_spark.plans.training_data import (
        q_ann_truncated_recall,
    )

    rows = q_ann_truncated_recall(spark, sf_dir).collect()
    assert rows, "query set must be non-empty"
    for r in rows:
        assert 0.0 <= r["recall_d16"] <= 1.0
        assert 0.0 <= r["recall_d32"] <= 1.0
    mean16 = sum(r["recall_d16"] for r in rows) / len(rows)
    mean32 = sum(r["recall_d32"] for r in rows) / len(rows)
    assert mean32 >= mean16 - 1e-9


def test_contamination_verbatim_catches_copied_span(spark, tmp_path):
    """A corpus doc that copies a 13-token span from a benchmark doc must
    be flagged; an unrelated doc must not."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from marketstream_etl_spark.plans.training_data import (
        q_contamination_verbatim,
    )

    def is_bench(doc_id: int) -> bool:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 20 == 0

    bench_id = next(i for i in range(1000) if is_bench(i))
    clean_ids = [i for i in range(1000) if not is_bench(i)][:2]
    span = " ".join(f"tok{i}" for i in range(20))  # 20-token span
    texts = {
        bench_id: "benchmark preamble " + span + " benchmark coda",
        clean_ids[0]: "copied lead-in " + span + " copied tail words",
        clean_ids[1]: "totally different content with no shared spans at "
        "all just filler words repeated filler words repeated",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array(
                    [texts[i] for i in sorted(texts)], pa.string()
                ),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["src0"] * 3, pa.string()),
                "n_chars": pa.array(
                    [len(texts[i]) for i in sorted(texts)], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    # both execution paths must agree: the tiny fixture takes the
    # single-pass form by default; forcing the threshold to 0 exercises
    # the hashed-candidate prefilter on the same data
    import marketstream_etl_spark.plans.training_data as td

    for thresh in (td._VERBATIM_PREFILTER_MIN_BYTES, 0):
        orig = td._VERBATIM_PREFILTER_MIN_BYTES
        td._VERBATIM_PREFILTER_MIN_BYTES = thresh
        try:
            rows = q_contamination_verbatim(spark, str(tmp_path)).collect()
        finally:
            td._VERBATIM_PREFILTER_MIN_BYTES = orig
        assert [r["doc_id"] for r in rows] == [clean_ids[0]], thresh
        r = rows[0]
        # the copied 20-token span yields 20-13+1 = 8 shared 13-grams
        assert r["n_hits"] == 8
        assert 0.0 < r["verbatim_frac"] <= 1.0


def test_verbatim_gram_hash_kernel_window_exactness():
    """The rolling-hash kernel behind q_contamination_verbatim's candidate
    prefilter: equal 13-token windows must hash equal (no false negatives
    — the exactness contract), window extraction must respect doc
    boundaries, and docs shorter than 13 tokens emit nothing."""
    import numpy as np
    import pyarrow as pa

    from marketstream_etl_spark.plans.training_data import (
        _VERBATIM_K,
        _verbatim_gram_hashes,
    )

    # doc 7: tokens 0..19 (8 grams); doc 8: SAME window 3..15 embedded at
    # a different position after a distinct prefix; doc 9: only 12 tokens
    # (no grams); doc 10: empty
    d7 = list(range(100, 120))
    d8 = [555, 666] + list(range(103, 116)) + [777]
    d9 = list(range(900, 912))
    th = pa.array([d7, d8, d9, []], type=pa.list_(pa.int64()))
    ids = pa.array([7, 8, 9, 10], type=pa.int64())
    gdoc, h = _verbatim_gram_hashes(ids, th)
    n7 = len(d7) - _VERBATIM_K + 1
    n8 = len(d8) - _VERBATIM_K + 1
    assert list(gdoc) == [7] * n7 + [8] * n8
    # doc 8's embedded window == doc 7's window starting at token 103
    h7 = {tuple(d7[i : i + _VERBATIM_K]): h[i] for i in range(n7)}
    h8 = h[n7 + 2]  # doc 8 gram starting at its index 2 = tokens 103..115
    assert h8 == h7[tuple(range(103, 116))]
    # distinct windows hash distinct here (sanity, not a guarantee)
    assert len(np.unique(h)) == len(h) - 1  # exactly the one shared window


def test_langid_confusion_row_shares_sum_to_one(spark, sf_dir):
    from collections import defaultdict

    from marketstream_etl_spark.plans.training_data import q_langid_confusion

    rows = q_langid_confusion(spark, sf_dir).collect()
    by_lang = defaultdict(float)
    for r in rows:
        assert r["n"] > 0 and 0.0 < r["row_share"] <= 1.0
        by_lang[r["lang"]] += r["row_share"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_split_leakage_only_cross_split_pairs(spark, sf_dir):
    from marketstream_etl_spark.plans.training_data import q_split_leakage

    rows = q_split_leakage(spark, sf_dir).collect()
    for r in rows:
        assert r["split_a"] != r["split_b"]
        assert r["split_a"] < r["split_b"]  # canonical order
        assert r["n_leaked_pairs"] > 0
        assert 0.0 < r["max_jaccard"] <= 1.0


def test_snapshot_diff_identity_and_partition(spark):
    """Diffing the baseline against itself: everything identical, nothing
    added/removed/changed; counts partition the union."""
    from marketstream_etl_spark.plans.training_data import q_snapshot_diff

    r = q_snapshot_diff(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_added"] == r["n_removed"] == r["n_changed"] == 0
    assert r["n_identical"] == r["n_union"] > 0
    # and against a different snapshot the counts still partition
    r2 = q_snapshot_diff(spark, "/root/testdata/sf0.01").collect()[0]
    assert (
        r2["n_added"] + r2["n_removed"] + r2["n_changed"] + r2["n_identical"]
        == r2["n_union"]
    )


# --- ROC-AUC + calibration --------------------------------------------------


def _scored_frame(spark, rows):
    """(doc_id, score_e6, pos) rows for monkeypatching _quality_scored."""
    return spark.createDataFrame(rows, ["doc_id", "score_e6", "pos"])


def test_roc_auc_perfect_separation(spark, monkeypatch):
    from marketstream_etl_spark.plans import training_data as td

    rows = [(i, 900_000, 1) for i in range(6)] + [
        (10 + i, 100_000, 0) for i in range(4)
    ]
    monkeypatch.setattr(
        td, "_quality_scored", lambda sp, sf: _scored_frame(sp, rows)
    )
    r = td.q_roc_auc(spark, "x").collect()[0]
    assert r["n_pos"] == 6 and r["n_neg"] == 4
    assert r["auc"] == 1.0 and r["gini"] == 1.0


def test_roc_auc_all_tied_is_chance(spark, monkeypatch):
    """Every score identical: AUC = 0.5 by midrank tie handling."""
    from marketstream_etl_spark.plans import training_data as td

    rows = [(i, 500_000, i % 2) for i in range(10)]
    monkeypatch.setattr(
        td, "_quality_scored", lambda sp, sf: _scored_frame(sp, rows)
    )
    r = td.q_roc_auc(spark, "x").collect()[0]
    assert r["auc"] == 0.5 and r["gini"] == 0.0


def test_roc_auc_matches_pair_counting(spark, monkeypatch):
    """Mixed overlap cross-checked against from-scratch pair counting:
    AUC = (wins + 0.5*ties) / (n_pos*n_neg) on the binned scores."""
    from marketstream_etl_spark.plans import training_data as td

    pos = [100_000, 400_000, 400_000, 700_000, 900_000]
    neg = [100_000, 200_000, 400_000, 600_000]
    rows = [(i, s, 1) for i, s in enumerate(pos)] + [
        (100 + i, s, 0) for i, s in enumerate(neg)
    ]
    monkeypatch.setattr(
        td, "_quality_scored", lambda sp, sf: _scored_frame(sp, rows)
    )
    r = td.q_roc_auc(spark, "x").collect()[0]
    pb = [s // 1000 for s in pos]
    nb = [s // 1000 for s in neg]
    wins = sum(1 for p in pb for q in nb if p > q)
    ties = sum(1 for p in pb for q in nb if p == q)
    auc = (wins + 0.5 * ties) / (len(pb) * len(nb))
    assert abs(r["auc"] - auc) < 1e-6
    assert abs(r["gini"] - (2 * auc - 1)) < 1e-6


def test_roc_auc_degenerate_single_class(spark, monkeypatch):
    from marketstream_etl_spark.plans import training_data as td

    rows = [(i, 500_000, 1) for i in range(5)]
    monkeypatch.setattr(
        td, "_quality_scored", lambda sp, sf: _scored_frame(sp, rows)
    )
    r = td.q_roc_auc(spark, "x").collect()[0]
    assert r["n_pos"] == 5 and r["n_neg"] == 0
    assert r["auc"] is None and r["gini"] is None


def test_calibration_perfectly_calibrated_bin(spark, monkeypatch):
    """A bin whose mean prediction equals its positive rate contributes
    zero gap; ECE over only such bins is 0 -> well_calibrated."""
    from marketstream_etl_spark.plans import training_data as td

    # bin 2 (0.2-0.3): 4 docs at 0.25, exactly 1 positive -> conf == acc
    rows = [
        (0, 250_000, 1),
        (1, 250_000, 0),
        (2, 250_000, 0),
        (3, 250_000, 0),
    ]
    monkeypatch.setattr(
        td, "_quality_scored", lambda sp, sf: _scored_frame(sp, rows)
    )
    out = td.q_calibration_ece(spark, "x").collect()
    assert len(out) == td.CAL_N_BINS
    b2 = [r for r in out if r["bin"] == 2][0]
    assert b2["n"] == 4 and b2["confidence"] == 0.25 and b2["accuracy"] == 0.25
    assert b2["bin_gap"] == 0.0
    assert b2["ece"] == 0.0 and b2["well_calibrated"] is True


def test_calibration_matches_hand_computed_ece(spark, monkeypatch):
    from marketstream_etl_spark.plans import training_data as td

    # bin 1: two docs at 0.15, both positive (conf 0.15, acc 1.0)
    # bin 8: two docs at 0.85, none positive (conf 0.85, acc 0.0)
    rows = [
        (0, 150_000, 1),
        (1, 150_000, 1),
        (2, 850_000, 0),
        (3, 850_000, 0),
    ]
    monkeypatch.setattr(
        td, "_quality_scored", lambda sp, sf: _scored_frame(sp, rows)
    )
    out = td.q_calibration_ece(spark, "x").collect()
    ece = 0.5 * abs(1.0 - 0.15) + 0.5 * abs(0.0 - 0.85)
    r = out[0]
    assert abs(r["ece"] - ece) < 1e-6
    assert abs(r["mce"] - 0.85) < 1e-6
    assert r["well_calibrated"] is False
    b1 = [x for x in out if x["bin"] == 1][0]
    assert b1["accuracy"] == 1.0 and b1["confidence"] == 0.15
    empty = [x for x in out if x["n"] == 0]
    assert all(
        x["confidence"] is None and x["bin_gap"] is None for x in empty
    )


def test_information_value_separating_feature_is_strong(spark, monkeypatch):
    """Classes concentrated in disjoint bins -> large IV, 'strong' band;
    WoE positive where positives concentrate, negative where negatives
    do."""
    from marketstream_etl_spark.plans import training_data as td

    rows = [(i, 150_000, 1) for i in range(20)] + [
        (100 + i, 850_000, 0) for i in range(20)
    ]
    monkeypatch.setattr(
        td, "_quality_scored", lambda sp, sf: _scored_frame(sp, rows)
    )
    out = td.q_information_value(spark, "x").collect()
    assert len(out) == td.CAL_N_BINS
    by_bin = {r["bin"]: r for r in out}
    assert by_bin[1]["woe"] > 0 and by_bin[8]["woe"] < 0
    assert out[0]["predictiveness"] == "strong"
    assert out[0]["iv_total"] > 0.3


def test_information_value_identical_distributions_useless(
    spark, monkeypatch
):
    """Same score mix in both classes -> every WoE 0, IV 0, 'useless'."""
    from marketstream_etl_spark.plans import training_data as td

    rows = []
    for i, s in enumerate([150_000, 450_000, 750_000] * 4):
        rows.append((i, s, i % 2))
    monkeypatch.setattr(
        td, "_quality_scored", lambda sp, sf: _scored_frame(sp, rows)
    )
    out = td.q_information_value(spark, "x").collect()
    assert all(r["iv_total"] == 0.0 for r in out)
    assert out[0]["predictiveness"] == "useless"
    nonempty = [r for r in out if r["share_pos"] > td.IV_CLAMP]
    assert all(r["woe"] == 0.0 for r in nonempty)


def test_stream_roc_matches_batch(spark):
    """Bounded replay of the streaming ROC monitor equals batch roc_auc
    (shared midrank core + stream-safe scorer bit-identity)."""
    from marketstream_etl_spark.plans.training_data import q_roc_auc
    from marketstream_etl_spark.streaming.docs import file_stream_roc

    sf = "/root/testdata/sf0.001"
    s = [tuple(r) for r in file_stream_roc(spark, sf).collect()]
    b = [tuple(r) for r in q_roc_auc(spark, sf).collect()]
    assert s == b and len(s) == 1


# --- embedding drift ----------------------------------------------------------


def _emb_frame(spark, vecs):
    return spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        ["vec_id", "embedding", "label"],
    )


def test_embedding_drift_identical_snapshots_quiet(spark, monkeypatch):
    """Even/odd snapshots drawn identically -> every per-dim PSI 0."""
    from marketstream_etl_spark.plans import training_data as td

    v = [0.05, -0.2, 0.4]
    vecs = [v] * 8  # both snapshots identical
    monkeypatch.setattr(
        td, "load_table", lambda sp, sf, name: _emb_frame(sp, vecs)
    )
    out = td.q_embedding_drift(spark, "x").collect()
    assert len(out) == 3
    assert all(r["psi"] == 0.0 and r["dim_drifted"] is False for r in out)
    assert out[0]["max_psi"] == 0.0 and out[0]["n_drifted_dims"] == 0


def test_embedding_drift_localizes_shifted_dimension(spark, monkeypatch):
    """Dim 1 shifts bucket between snapshots; dims 0/2 stay put -> only
    dim 1 crosses the drift line."""
    from marketstream_etl_spark.plans import training_data as td

    base = [0.05, -0.2, 0.4]
    moved = [0.05, 0.3, 0.4]  # dim 1: bucket 3 -> bucket 8
    # even vec_ids (snap 0) get base, odd (snap 1) get moved
    vecs = [base if i % 2 == 0 else moved for i in range(12)]
    monkeypatch.setattr(
        td, "load_table", lambda sp, sf, name: _emb_frame(sp, vecs)
    )
    out = td.q_embedding_drift(spark, "x").collect()
    by_dim = {r["dim"]: r for r in out}
    assert by_dim[0]["psi"] == 0.0 and by_dim[2]["psi"] == 0.0
    assert by_dim[1]["dim_drifted"] is True
    assert out[0]["n_drifted_dims"] == 1
    assert out[0]["max_psi"] == by_dim[1]["psi"] > 0.25


def test_embedding_drift_empty_snapshot_max_drift(spark, monkeypatch):
    """Only odd vec_ids exist (candidate snapshot empty on the other
    side): every baseline share compares against the clamp floor, so all
    dims report drift — deterministic, no nulls/crash (the 'first
    snapshot of a new index' corner)."""
    from marketstream_etl_spark.plans import training_data as td

    vecs = [(2 * i + 1, [0.05, -0.2], 0) for i in range(6)]  # snap 1 only
    monkeypatch.setattr(
        td,
        "load_table",
        lambda sp, sf, name: sp.createDataFrame(
            vecs, ["vec_id", "embedding", "label"]
        ),
    )
    out = td.q_embedding_drift(spark, "x").collect()
    assert len(out) == 2
    assert all(r["dim_drifted"] is True and r["psi"] > 1.0 for r in out)
    assert out[0]["n_drifted_dims"] == 2
