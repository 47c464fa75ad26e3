"""Edge-corpus hardening: empty and degenerate documents tables through
the training-data surface.  A 100 TB pipeline shards its input; some
shards are empty, some hold a single doc, some hold docs too short to
shingle — every operator must return an empty/correct frame, not throw.
"""

from __future__ import annotations

from conftest import write_docs_parquet as _write_docs

from marketstream_etl_spark.functions import cachegen
from marketstream_etl_spark.operators import dedup, text
from marketstream_etl_spark.plans import training_data
from marketstream_etl_spark.sources.tables import load_table




def test_empty_corpus_all_ops_return_empty(spark, tmp_path):
    sf = str(tmp_path)
    _write_docs(sf, {})
    docs = load_table(spark, sf, "documents")
    assert dedup.exact_dedup_groups(docs).count() == 0
    assert dedup.ngram_jaccard_pairs(docs).count() == 0
    assert dedup.minhash_lsh_pairs(docs).count() == 0
    assert dedup.simhash_near_pairs(docs).count() == 0
    assert text.analyze_documents(docs).count() == 0
    for q in [
        "text_analysis",
        "sentence_dedup",
        "bpe_merge_candidates",
        "quality_classifier",
        "incremental_dedup",
        "source_overlap",
        "vocab_topk",
        "sequence_packing",
        "chunk_documents",
    ]:
        assert getattr(training_data, f"q_{q}")(spark, sf).count() == 0, q
    cachegen.clear()


def test_single_and_short_docs(spark, tmp_path):
    # one real doc, one doc too short to shingle (k=3), one empty string
    sf = str(tmp_path)
    _write_docs(
        sf,
        {
            1: "alpha beta gamma delta epsilon zeta eta theta",
            2: "one two",  # < k tokens → zero shingles
            3: "",
        },
    )
    docs = load_table(spark, sf, "documents")
    # no pair ops can produce pairs from a 1-shingleable corpus
    assert dedup.ngram_jaccard_pairs(docs).count() == 0
    assert dedup.minhash_lsh_pairs(docs).count() == 0
    # simhash still yields a signature for every doc with >= 1 token
    sims = {r.doc_id for r in dedup.simhash(docs).collect()}
    assert sims == {1, 2}
    # analysis emits one row per doc, including the empty one
    assert text.analyze_documents(docs).count() == 3
    # clusters of an empty pair set: no rows, no crash
    assert dedup.duplicate_clusters(dedup.minhash_lsh_pairs(docs)).count() == 0
    cachegen.clear()


def test_new_ops_survive_empty_and_tiny_corpora(spark):
    """Late-r5 ops on degenerate inputs: empty corpus/graph → empty
    result (never a crash); single-doc corpus → empty pair/score sets."""
    from pyspark.sql import Row

    from marketstream_etl_spark.operators.graph import pagerank
    from marketstream_etl_spark.operators.relevance import bm25_search
    from marketstream_etl_spark.operators.similarity import ann_ivfpq, ann_pq

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_search(empty_docs).collect() == []

    empty_edges = spark.createDataFrame(
        [], "src string, dst string, weight long"
    )
    empty_nodes = spark.createDataFrame([], "node string")
    assert pagerank(empty_edges, empty_nodes).collect() == []

    one_vec = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0] * 64)]
    )
    # the only vector is both codebook and query; self is excluded
    assert ann_pq(one_vec).collect() == []
    assert ann_ivfpq(one_vec).collect() == []

    one_doc = spark.createDataFrame([Row(doc_id=0, text="alpha beta")])
    assert bm25_search(one_doc).collect() == []
