"""BM25 semantics on constructed corpora: exact-match ranking, idf
discrimination, length normalization."""

from __future__ import annotations

from pyspark.sql import Row

from marketstream_etl_spark.operators.relevance import bm25_search


def docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_rare_term_match_outranks_common_term_match(spark):
    """Query doc 0 contains a rare term ('zebra') and a common one
    ('data'); the doc sharing the rare term must outrank docs sharing
    only the ubiquitous term."""
    corpus = docs_df(spark, [
        "zebra data",            # query
        "zebra stripes run",     # rare-term match
        "data data table",       # common-term match
        "data row scan",
        "data value key",
    ])
    out = bm25_search(corpus, n_queries=1, k=4).collect()
    assert out[0]["doc_id"] == 1


def test_self_excluded_and_only_term_sharers_returned(spark):
    corpus = docs_df(spark, [
        "alpha beta",
        "alpha gamma",
        "delta epsilon",  # shares no term with query 0
    ])
    out = bm25_search(corpus, n_queries=1, k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 0 not in ids          # self excluded
    assert 2 not in ids          # no shared term -> never scored
    assert ids == [1]


def test_length_normalization_prefers_shorter_doc(spark):
    """Same tf of the query term: the shorter document scores higher
    (the b·dl/avgdl penalty)."""
    corpus = docs_df(spark, [
        "quark",
        "quark lattice",
        "quark lattice spin charm strange bottom top gluon photon",
    ])
    out = bm25_search(corpus, n_queries=1, k=2).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["bm25"] > out[1]["bm25"]

# --- TF-IDF keyword extraction ----------------------------------------------

from marketstream_etl_spark.operators.relevance import tfidf_keywords  # noqa: E402
import math  # noqa: E402


def test_tfidf_rare_term_is_top_keyword(spark):
    """At equal tf, a term unique to one doc must beat a corpus-wide
    term on idf."""
    corpus = docs_df(spark, [
        "common xylophone",
        "common filler words",
        "common more filler",
    ])
    out = tfidf_keywords(corpus, k=1).collect()
    top0 = {r["doc_id"]: r["term"] for r in out}
    assert top0[0] == "xylophone"


def test_tfidf_value_matches_closed_form(spark):
    """doc 0 = 'a a b': tf(a)=2/3, tf(b)=1/3; df(a)=2, df(b)=1, N=2."""
    corpus = docs_df(spark, ["a a b", "a c"])
    out = {(r["doc_id"], r["term"]): r["tfidf"]
           for r in tfidf_keywords(corpus, k=10).collect()}
    n = 2.0
    idf_a = math.log((1.0 + n) / (1.0 + 2.0)) + 1.0
    idf_b = math.log((1.0 + n) / (1.0 + 1.0)) + 1.0
    assert out[(0, "a")] == round((2.0 / 3.0) * idf_a, 6)
    assert out[(0, "b")] == round((1.0 / 3.0) * idf_b, 6)


def test_tfidf_rank_is_dense_per_doc_and_capped(spark):
    corpus = docs_df(spark, [
        "one two three four five six seven",
        "one two alpha",
    ])
    out = tfidf_keywords(corpus, k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in by_doc.values():
        assert ranks == sorted(ranks) and ranks[0] == 1
        assert len(ranks) <= 3


def test_bm25_index_statistics_cached_per_generation(spark):
    """r13: the generation cache holds the FULL lexical index — postings
    plus doc-length, document-frequency and (n_docs, avgdl) stats — and a
    second call over the same input serves all four frames from the
    registry (same handles), so steady-state searches re-aggregate
    nothing.  The stats must equal a fresh aggregation of the postings."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.relevance import _bm25_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} alpha") for i in range(6)],
        "doc_id long, text string",
    )
    post, dl, dfreq, stats = _bm25_index(docs)
    post2, dl2, dfreq2, stats2 = _bm25_index(docs)
    assert post is post2 and dl is dl2 and dfreq is dfreq2 and stats is stats2

    fresh_dl = {
        r["doc_id"]: r["dl"]
        for r in post.groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()
    }
    assert {r["doc_id"]: r["dl"] for r in dl.collect()} == fresh_dl
    srow = stats.collect()[0]
    assert srow["n_docs"] == float(len(fresh_dl))
    assert srow["avgdl"] == sum(fresh_dl.values()) / len(fresh_dl)
    ndf = {r["term"]: r["df"] for r in dfreq.collect()}
    assert ndf["alpha"] == 6 and ndf[f"doc{0}"] == 1
