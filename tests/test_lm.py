"""Bigram-LM perplexity semantics on constructed corpora."""

from __future__ import annotations

from pyspark.sql import Row

from marketstream_etl_spark.operators.lm import lm_perplexity


def docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_repetitive_doc_scores_lower_perplexity(spark):
    """A doc made of the corpus's dominant bigram is maximally
    predictable; a doc of one-off bigrams lands in the tail."""
    corpus = docs_df(spark, [
        "the cat " * 20,          # dominant bigrams
        "the cat sat on the cat", # mostly dominant
        "zig quux blorp wibble",  # one-off bigrams
    ])
    out = {r["doc_id"]: r["perplexity"] for r in lm_perplexity(corpus).collect()}
    assert out[0] < out[1] < out[2]


def test_short_docs_excluded_and_counts_exact(spark):
    corpus = docs_df(spark, ["solo", "", "a b c"])
    rows = lm_perplexity(corpus).collect()
    assert [r["doc_id"] for r in rows] == [2]   # <2 tokens → no score
    assert rows[0]["n_bigrams"] == 2            # (a,b), (b,c)


def test_perplexity_matches_hand_computation(spark):
    """Two-doc corpus small enough to check by hand: 'x x' in a corpus
    where c(x x)=1, c(x)=2, V=1 → p = (1+1)/(2+1) = 2/3."""
    import math

    corpus = docs_df(spark, ["x x"])
    r = lm_perplexity(corpus).collect()[0]
    expect_lp = round(math.log(2.0 / 3.0), 6)
    assert r["avg_logprob"] == expect_lp
    assert r["perplexity"] == round(math.exp(-expect_lp), 4)


def test_pmi_surfaces_injected_collocation(spark):
    """A bigram that always co-occurs ('neural networks') must outrank a
    bigram of two independently common words."""
    from marketstream_etl_spark.operators.lm import top_pmi_bigrams

    base = "the data is the data with more the data here"
    corpus = docs_df(spark, [
        base + " neural networks " + base,
        "neural networks " + base,
        base + " neural networks",
        "the with here more is data the with here",
        "the with here more is data data the",
        "neural networks again neural networks",
    ])
    out = top_pmi_bigrams(corpus, min_count=3, k=5).collect()
    assert out[0]["w1"] == "neural" and out[0]["w2"] == "networks"
    pmis = {(r["w1"], r["w2"]): r["pmi"] for r in out}
    assert all(pmis[("neural", "networks")] >= p for p in pmis.values())
