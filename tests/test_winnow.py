"""Winnowing fingerprint properties (operators/winnow.py)."""
from pyspark.sql import Row

from marketstream_etl_spark.operators.winnow import (
    MIN_SHARED,
    SHINGLE_K,
    WINNOW_W,
    winnow_fingerprints,
    winnowing_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )


def test_density_and_short_doc(spark):
    """Fingerprint count is ~2/(w+1) of the gram count on random-ish text,
    and a doc shorter than one window still yields exactly one."""
    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(5000)}" for _ in range(3000)]
    long_doc = " ".join(words)
    short_doc = "alpha beta gamma delta"  # 2 grams < w
    fps = {
        r["doc_id"]: r["n"]
        for r in winnow_fingerprints(_docs(spark, [long_doc, short_doc]))
        .groupBy("doc_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    n_grams = 3000 - SHINGLE_K + 1
    expected = 2.0 / (WINNOW_W + 1) * n_grams
    assert 0.5 * expected < fps[0] < 2.0 * expected
    assert fps[1] == 1


def test_shared_substring_guarantee(spark):
    """The winnowing guarantee: two docs sharing a run of
    >= w + k - 1 tokens share at least one fingerprint, so the pair
    surfaces (given enough shared windows to clear MIN_SHARED)."""
    import random

    rng = random.Random(13)
    shared_run = " ".join(f"s{rng.randrange(10**6)}" for _ in range(60))
    pre_a = " ".join(f"a{rng.randrange(10**6)}" for _ in range(40))
    pre_b = " ".join(f"b{rng.randrange(10**6)}" for _ in range(40))
    noise = " ".join(f"n{rng.randrange(10**6)}" for _ in range(80))
    pairs = winnowing_pairs(
        _docs(spark, [pre_a + " " + shared_run, pre_b + " " + shared_run, noise])
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got
    row = next(r for r in pairs if (r["doc_a"], r["doc_b"]) == (0, 1))
    assert row["shared_fps"] >= MIN_SHARED
    assert 0 < row["sim_e6"] <= 1_000_000
    assert all(2 not in p for p in got)


def test_identical_docs_score_million(spark):
    """Identical texts share their full fingerprint set: sim_e6 == 1e6."""
    txt = " ".join(f"tok{i * 37 % 101}" for i in range(200))
    pairs = winnowing_pairs(_docs(spark, [txt, txt])).collect()
    assert len(pairs) == 1
    assert pairs[0]["sim_e6"] == 1_000_000
    assert pairs[0]["na"] == pairs[0]["nb"] == pairs[0]["shared_fps"]
