"""Text-analysis semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from marketstream_etl_spark.operators.text import (
    analyze_documents,
    fingerprint,
    lang_id,
)


def test_lang_id_marker_heuristic(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat and the dog sat in a house that is warm"),
            Row(doc_id=1, text="el gato y la casa de madrid que juega con los amigos"),
            Row(doc_id=2, text="der hund und die katze ist nicht das problem"),
            Row(doc_id=3, text="le chat et les maisons dans une ville pour des amis"),
            Row(doc_id=4, text="xyzzy plugh qwerty"),
        ]
    )
    got = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {0: "en", 1: "es", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_invariant_to_case_punct_whitespace(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="Hello, World!"),
            Row(doc_id=1, text="hello   world"),
            Row(doc_id=2, text="HELLO-world."),
            Row(doc_id=3, text="goodbye world"),
        ]
    )
    fps = [r["fp"] for r in
           df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]


def test_analyze_documents_features(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="The quick brown fox, and the lazy dog!!")]
    )
    r = analyze_documents(df).collect()[0]
    assert r["lang_pred"] == "en"
    assert r["ws_tokens"] == 8
    # letter runs: The quick brown fox and the lazy dog (8) + ',' + '!!' (3)
    assert r["bpe_ish_tokens"] == 11
    assert r["n_tokens"] == 8
    assert r["stop_ratio"] == pytest.approx(3 / 8, abs=1e-6)
    assert 0.0 <= r["quality_score"] <= 1.0
    assert len(r["fingerprint"]) == 32
