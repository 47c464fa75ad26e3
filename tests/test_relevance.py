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
