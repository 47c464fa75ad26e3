"""Edge-corpus hardening: empty and degenerate documents tables through
the training-data surface.  A 100 TB pipeline shards its input; some
shards are empty, some hold a single doc, some hold docs too short to
shingle — every operator must return an empty/correct frame, not throw.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from marketstream_etl_spark.functions import cachegen
from marketstream_etl_spark.operators import dedup, text
from marketstream_etl_spark.plans import training_data
from marketstream_etl_spark.sources.tables import load_table


def _write_docs(path: str, texts: dict[int, str]) -> None:
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["src0"] * len(ids), pa.string()),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


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
