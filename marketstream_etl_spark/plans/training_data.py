"""Training-data pipeline queries (north-star surface): dedup, similarity
search, text analysis, multimodal — (spark, sf_dir) -> DataFrame wrappers
over the operators, paired with DuckDB oracle SQL in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketstream_etl_spark.operators import dedup, similarity, text
from marketstream_etl_spark.operators.multimodal import (
    extract_features,
    media_from_documents,
    media_metadata,
)
from marketstream_etl_spark.sources.tables import load_table


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID + quality + token counts + fingerprint, one map pass."""
    return text.analyze_documents(load_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_groups(
        load_table(spark, sf_dir, "documents")
    ).orderBy("fingerprint")


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_pairs(load_table(spark, sf_dir, "documents"))


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_bruteforce(load_table(spark, sf_dir, "embeddings"))


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_ivf(load_table(spark, sf_dir, "embeddings"))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings")
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF decode plumbing over binary payloads (no SQL oracle —
    driver records the rows-only check; feature math is the deterministic
    fake decoder, see operators/multimodal.py)."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return extract_features(media).orderBy("media_id")


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side binary metadata (length/checksum/magic sniff) — oracle-able."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return media_metadata(media).orderBy("media_id")
