"""Synthesize an 'sf1' dataset — 10x sf0.1 — for the second-decade scale
probe (tools/probe_decade.py): 1M events, 50K documents, 20K embeddings,
schema-identical to the driver testdata so every registered query runs
on it unmodified via its sf_dir parameter.

All columns are seeded-deterministic (F.rand(seed)/xxhash64 mixes), so a
regenerated dataset is bit-identical and probe numbers are reproducible.
The document corpus mirrors the testdata's shape (same 30-word SQL-ish
vocabulary, 20 sources, 5 langs, zipf-ish doc lengths) and plants ~4%
near-duplicates (a copy of an earlier doc with one word appended) so the
dedup families have real work at scale.

    python tools/gen_sf1.py [/tmp/marketstream_sf1]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from marketstream_etl_spark.session import get_spark

EVENTS = 1_000_000
DOCS = 50_000
EMBS = 20_000
DIM = 64
VOCAB = [
    "spark", "line", "column", "order", "small", "sort", "fast", "value",
    "scan", "hash", "slow", "group", "batch", "part", "vector", "query",
    "agg", "table", "stream", "key", "window", "join", "filter",
    "customer", "the", "a", "g", "index", "merge", "plan",
]
T0_US = 1_704_067_200_000_000  # 2024-01-01 UTC, the testdata epoch


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/marketstream_sf1"
    spark = get_spark("gen-sf1")

    # --- events: same columns/types as testdata events.parquet ---------
    ev = (
        spark.range(EVENTS)
        .repartition(32)
        .select(
            F.col("id").alias("event_id"),
            # ~26 days of microsecond timestamps, jittered but ordered in
            # expectation (bar/window ops see realistic time density)
            F.timestamp_micros(
                F.lit(T0_US)
                + F.col("id") * F.lit(2_240_000)
                + (F.xxhash64("id") % 2_000_000 + 2_000_000) % 2_000_000
            ).alias("ts"),
            (F.xxhash64("id", F.lit(1)) % 1000 + 1000) % 1000,
            F.element_at(
                F.array(
                    F.lit("click"), F.lit("view"), F.lit("purchase"),
                    F.lit("signup"), F.lit("error"),
                ),
                ((F.xxhash64("id", F.lit(2)) % 5 + 5) % 5 + 1).cast("int"),
            ).alias("event_type"),
            F.round(F.rand(seed=7) * 560, 2).alias("value"),
            F.concat(
                F.lit('{"k": '),
                ((F.xxhash64("id", F.lit(3)) % 100 + 100) % 100).cast(
                    "string"
                ),
                F.lit("}"),
            ).alias("props"),
        )
    )
    # name the positional user_id expression via toDF
    ev = ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")

    # --- documents: vocab text, zipf-ish lengths, planted near-dups ----
    words = F.array(*[F.lit(w) for w in VOCAB])
    base = (
        spark.range(DOCS)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            # length 8..120 words, skewed short
            (
                8
                + F.pow(F.rand(seed=11), F.lit(2.0)) * 112
            ).cast("int").alias("n_words"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_words")),
                    lambda i: F.element_at(
                        words,
                        (
                            (F.xxhash64(F.col("doc_id"), i) % len(VOCAB)
                             + len(VOCAB)) % len(VOCAB) + 1
                        ).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )
    # ~4% near-duplicates: doc_id >= DOCS copies text of doc_id - DOCS
    # with one appended token (winnowing/minhash/simhash get real pairs)
    dup_src = base.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + DOCS).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" merge")).alias("text"),
    )
    docs = (
        base.unionByName(dup_src)
        .select(
            "doc_id",
            "text",
            F.element_at(
                F.array(
                    F.lit("en"), F.lit("de"), F.lit("zh"),
                    F.lit("fr"), F.lit("es"),
                ),
                (
                    (F.xxhash64("doc_id", F.lit(5)) % 5 + 5) % 5 + 1
                ).cast("int"),
            ).alias("lang"),
            F.concat(
                F.lit("src"),
                ((F.xxhash64("doc_id", F.lit(6)) % 20 + 20) % 20).cast(
                    "string"
                ),
            ).alias("source"),
            F.length("text").alias("n_chars"),
        )
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    # --- embeddings: 64-dim floats, 8 labels ---------------------------
    emb = (
        spark.range(EMBS)
        .repartition(32)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.rand(seed=100 + d) * 2 - 1).cast("float")
                    for d in range(DIM)
                ]
            ).alias("embedding"),
            ((F.col("id") % 8)).cast("int").alias("label"),
        )
    )
    emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for t in ("events", "documents", "embeddings"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows -> {out}/{t}.parquet")


if __name__ == "__main__":
    main()
