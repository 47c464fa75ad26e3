"""Property-based dedup invariants + LSH recall quality.

1. Exact-duplicate invariant (hypothesis): appending a verbatim copy of
   any document must be detected by every dedup family — same exact
   fingerprint group, jaccard-1.0 pair in both the inverted-index and the
   LSH path, identical simhash signature.
2. LSH recall: against a constructed corpus with known high-overlap pairs,
   banded LSH (16 perm / 8 bands, r=2) must recover >= 80% of the pairs
   the exact Jaccard operator finds at the same threshold — the s-curve
   predicts ~0.90 candidate probability at s = 0.5, higher above.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marketstream_etl_spark.functions import cachegen
from marketstream_etl_spark.operators import dedup

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon",
]


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(st.sampled_from(WORDS), min_size=6, max_size=30),
    n_others=st.integers(min_value=1, max_value=3),
)
def test_exact_duplicate_found_by_every_family(spark_prop, words, n_others):
    spark = spark_prop
    cachegen.clear()
    dup_text = " ".join(words)
    others = [
        " ".join(WORDS[(j * 7 + k) % len(WORDS)] for k in range(8))
        for j in range(n_others)
    ]
    # doc 1 and its verbatim copy (last doc_id), plus unrelated filler
    texts = [dup_text] + others + [dup_text]
    docs = _mkdocs(spark, texts)
    dup_id = len(texts)

    groups = {
        r.keep_doc_id: r.n_docs for r in dedup.exact_dedup_groups(docs).collect()
    }
    assert groups.get(1) >= 2  # the copy collapsed into doc 1's group

    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    assert jac.get((1, dup_id)) == 1.0

    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    assert lsh.get((1, dup_id)) == 1.0

    sims = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert sims[1] == sims[dup_id]
    cachegen.clear()


def test_lsh_recall_vs_exact_jaccard(spark):
    """Constructed corpus: 30 base docs of 20 words; each base doc gets a
    mutated twin sharing most of its tokens (high but sub-1.0 jaccard).
    LSH must recover >= 80% of the exact-threshold pair set."""
    cachegen.clear()
    texts = []
    for j in range(30):
        base = [WORDS[(j * 3 + k) % len(WORDS)] for k in range(20)]
        texts.append(" ".join(base))
        mutated = list(base)
        mutated[5] = WORDS[(j + 11) % len(WORDS)]  # swap one word
        texts.append(" ".join(mutated))
    docs = _mkdocs(spark, texts)

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert exact, "constructed corpus must contain exact-threshold pairs"
    # LSH verifies candidates with the exact jaccard, so found ⊆ exact...
    assert found <= exact
    # ...and the banded candidate generation recovers the bulk of them
    recall = len(found) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} below bound"
    cachegen.clear()
