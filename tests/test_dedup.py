"""Dedup operator semantics on small hand-built corpora."""

from __future__ import annotations

from pyspark.sql import Row

from marketstream_etl_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank today"
DOC_B = "the quick brown fox jumps over the lazy dog near the river bank tonight"
DOC_C = "completely different content about spark query engines and shuffles"


def docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_exact_dedup_normalizes_punctuation_and_case(spark):
    df = docs_df(
        spark,
        ["Hello, World!", "hello world", "HELLO   world.", "other doc entirely"],
    )
    groups = {r["keep_doc_id"]: r["n_docs"] for r in exact_dedup_groups(df).collect()}
    assert groups == {0: 3, 3: 1}


def test_jaccard_identical_docs_pair_at_1(spark):
    df = docs_df(spark, [DOC_A, DOC_A, DOC_C])
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(df, threshold=0.5).collect()}
    assert pairs == {(0, 1): 1.0}


def test_jaccard_near_dup_above_threshold(spark):
    df = docs_df(spark, [DOC_A, DOC_B, DOC_C])
    pairs = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 1)]
    assert 0.5 <= pairs[0]["jaccard"] < 1.0


def test_minhash_identical_signatures_for_identical_docs(spark):
    df = docs_df(spark, [DOC_A, DOC_A, DOC_C])
    sigs = {r["doc_id"]: tuple(v for k, v in r.asDict().items() if k != "doc_id")
            for r in minhash_signatures(df).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]


def test_minhash_lsh_finds_near_dups(spark):
    df = docs_df(spark, [DOC_A, DOC_B, DOC_C])
    pairs = [(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(df).collect()]
    assert pairs == [(0, 1)]


def test_simhash_identical_docs_equal_and_near_pairs(spark):
    df = docs_df(spark, [DOC_A, DOC_A, DOC_C])
    sims = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert sims[0] == sims[1]
    near = [(r["doc_a"], r["doc_b"], r["hamming"]) for r in
            simhash_near_pairs(df).collect()]
    assert (0, 1, 0) in near
    assert all(h <= 3 for _, _, h in near)
    assert 0 <= sims[0] < (1 << 32)


def test_duplicate_clusters_transitive(spark):
    """a-b, b-c chain merges into one cluster labeled min(id); disjoint
    pair stays its own cluster; convergence needs >1 propagation round."""
    from marketstream_etl_spark.operators.dedup import (
        cluster_report,
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (9, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    comp = {
        r["id"]: r["cluster_rep"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert comp == {1: 1, 5: 1, 9: 1, 12: 1, 20: 20, 21: 20}
    rep = {
        r["cluster_rep"]: (r["n_docs"], r["max_doc"])
        for r in cluster_report(pairs).collect()
    }
    assert rep == {1: (4, 12), 20: (2, 21)}


def test_duplicate_clusters_random_graphs_match_union_find(spark):
    """Property check: on random sparse graphs, min-label propagation must
    produce exactly the components a reference union-find produces."""
    import random

    from marketstream_etl_spark.operators.dedup import duplicate_clusters

    rng = random.Random(42)
    for trial in range(3):
        n_nodes, n_edges = 40, 30
        edges = set()
        while len(edges) < n_edges:
            a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        expected = {v: find(v) for v in touched}

        pairs = spark.createDataFrame(
            sorted(edges), "doc_a long, doc_b long"
        )
        got = {
            r["id"]: r["cluster_rep"]
            for r in duplicate_clusters(pairs).collect()
        }
        assert got == expected, f"trial {trial}"


def test_collapse_weighted_preserves_mass_and_reps(spark):
    """Hand graph: {1,2,3} one cluster, {5,6} another, 4 isolated →
    representatives are cluster minima, weights are cluster sizes, and
    total weight equals the corpus size (mass preserved)."""
    from pyspark.sql import Row

    from marketstream_etl_spark.operators.dedup import collapse_weighted

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}", source=f"s{i % 2}") for i in range(1, 7)]
    )
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=5, doc_b=6)]
    )
    out = {r["doc_id"]: r["dup_weight"] for r in collapse_weighted(docs, pairs).collect()}
    assert out == {1: 3, 4: 1, 5: 2}
    assert sum(out.values()) == 6


# --- containment ---------------------------------------------------------------

def test_containment_catches_excerpt_jaccard_misses(spark):
    """A 4-token quote inside a 40-token host doc: containment fires,
    Jaccard at the same corpus stays silent for that pair."""
    from pyspark.sql import Row
    from marketstream_etl_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "alpha bravo charlie delta echo foxtrot"
    host = quote + " " + " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(20))
    docs = spark.createDataFrame([
        Row(doc_id=0, text=quote),
        Row(doc_id=1, text=host),
        Row(doc_id=2, text=other),
    ])
    cont = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(docs).collect()}
    assert cont[(0, 1)] == 1.0          # every quote shingle is in host
    jac = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(docs).collect()}
    assert (0, 1) not in jac            # symmetric measure misses it


def test_containment_threshold_is_exact_integer(spark):
    """10 shingles, 7 shared -> containment 0.7 passes (>=); 6 shared
    fails — the integer cross-multiplication boundary."""
    from pyspark.sql import Row
    from marketstream_etl_spark.operators.dedup import containment_pairs

    # doc 0: tokens t0..t11 -> 10 shingles; doc 1 shares first 9 tokens
    # (7 shingles) plus disjoint tail
    base = [f"t{i}" for i in range(12)]
    shared7 = base[:9] + [f"u{i}" for i in range(30)]
    shared6 = base[:8] + [f"v{i}" for i in range(30)]
    docs = spark.createDataFrame([
        Row(doc_id=0, text=" ".join(base)),
        Row(doc_id=1, text=" ".join(shared7)),
        Row(doc_id=2, text=" ".join(shared6)),
    ])
    got = {(r["doc_a"], r["doc_b"]): r["containment"]
           for r in containment_pairs(docs).collect()}
    assert got.get((0, 1)) == 0.7
    assert (0, 2) not in got


# --- sorted-neighborhood method ----------------------------------------------


def _snm_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_snm_finds_adjacent_near_dups(spark):
    """Two near-identical leads adjacent in the sort order pair up; an
    unrelated doc far away in the order does not."""
    from marketstream_etl_spark.operators.dedup import snm_pairs

    docs = _snm_docs(spark, [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zets",  # 1 edit from doc 0
        "zzz completely different tail text",
    ])
    out = snm_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(0, 1)]
    assert out[0]["edit_dist"] == 1 and out[0]["pos_gap"] == 1


def test_snm_crosses_block_boundary(spark):
    """Docs whose 2-char prefix blocks DIFFER but that sit adjacently in
    the global sort order still pair — the two-level global-position
    construction (block offsets + in-block rank) is exact, not
    block-local."""
    from marketstream_etl_spark.operators.dedup import snm_pairs

    docs = _snm_docs(spark, [
        "az near identical lead text here",
        "bz near identical lead text here",  # block 'bz' vs 'az', 1 edit
    ])
    out = snm_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(0, 1)]
    assert out[0]["edit_dist"] == 1


def test_snm_window_and_verify_bounds(spark):
    """Every emitted pair respects the window gap and the edit bar; a
    doc > w-1 positions away never pairs even if identical-ish."""
    from marketstream_etl_spark.operators.dedup import (
        SNM_MAX_DIST,
        SNM_WINDOW,
        snm_pairs,
    )

    # 12 docs sharing a prefix so they sort contiguously; doc 0 and doc 11
    # are 11 positions apart -> outside the window even though similar
    texts = [f"common prefix shared by all {i:02d}" for i in range(12)]
    out = snm_pairs(_snm_docs(spark, texts)).collect()
    assert out, "contiguous near-dups must produce pairs"
    for r in out:
        assert 1 <= r["pos_gap"] <= SNM_WINDOW - 1
        assert r["edit_dist"] <= SNM_MAX_DIST
        assert r["doc_a"] < r["doc_b"]
    assert (0, 11) not in {(r["doc_a"], r["doc_b"]) for r in out}
