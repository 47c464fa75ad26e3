"""Multimodal plumbing: binary columns, JVM metadata, Pandas-UDF decode."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from marketstream_etl_spark.operators.multimodal import (
    decode_real,
    extract_features,
    media_from_documents,
    media_metadata,
)


def test_metadata_sniffs_magic_bytes(spark):
    rows = [
        Row(media_id=0, payload=b"\x89PNG\r\n\x1a\nrest", media_type="png"),
        Row(media_id=1, payload=b"\xff\xd8\xff\xe0jfif", media_type="jpeg"),
        Row(media_id=2, payload=b"RIFF....WAVE", media_type="wav"),
        Row(media_id=3, payload=b"plain text bytes", media_type="txt"),
    ]
    df = spark.createDataFrame(rows)
    got = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert got[0]["sniffed_type"] == "png"
    assert got[1]["sniffed_type"] == "jpeg"
    assert got[2]["sniffed_type"] == "wav"
    assert got[3]["sniffed_type"] == "unknown"
    assert got[3]["n_bytes"] == 16
    assert len(got[0]["checksum"]) == 32


def test_extract_features_batch_shape(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"document number {i} content") for i in range(7)]
    )
    media = media_from_documents(docs)
    feats = extract_features(media, n_dims=8).collect()
    assert len(feats) == 7
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
        # fake decoder normalizes: features sum to ~1
        assert abs(sum(r["feature"]) - 1.0) < 1e-9


def test_extract_features_deterministic(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="same content")])
    media = media_from_documents(docs)
    a = extract_features(media).collect()[0]["feature"]
    b = extract_features(media).collect()[0]["feature"]
    assert a == b


def test_decode_real_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"...", "png")
