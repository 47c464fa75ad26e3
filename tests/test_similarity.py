"""Similarity-search semantics: exact top-k correctness on a constructed
corpus, IVF soundness properties."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from marketstream_etl_spark.operators.similarity import (
    ann_bruteforce,
    ann_ivf,
    embedding_neardup_pairs,
)


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_bruteforce_finds_exact_duplicate_first(spark):
    vecs = [
        [1.0, 0.0, 0.0, 0.0],   # query 0
        [0.0, 1.0, 0.0, 0.0],   # query 1
        [2.0, 0.0, 0.0, 0.0],   # same direction as 0 → cos 1
        [0.9, 0.1, 0.0, 0.0],   # close to 0
        [0.0, 0.0, 1.0, 0.0],   # orthogonal
    ]
    out = ann_bruteforce(emb_df(spark, vecs), n_queries=2, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q[0][0]["neighbor_id"] == 2
    assert by_q[0][0]["cos"] == pytest.approx(1.0)
    assert by_q[0][1]["neighbor_id"] == 3
    # ranks are 1..k and cosine non-increasing
    for q, rows in by_q.items():
        assert [r["rank"] for r in rows] == [1, 2]
        assert rows[0]["cos"] >= rows[1]["cos"]


def test_ivf_results_are_valid_neighbors_subset(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r["query_id"], r["neighbor_id"]): r["cos"]
             for r in ann_bruteforce(emb).collect()}
    approx = ann_ivf(emb).collect()
    assert len(approx) > 0
    # every IVF cosine is a genuine cosine (spot: self not returned, rank ok)
    for r in approx:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 5
    # recall sanity: IVF should recover a decent share of exact top-5
    hits = sum(1 for r in approx if (r["query_id"], r["neighbor_id"]) in exact)
    assert hits >= len(approx) * 0.3


def test_neardup_symmetric_pairs_half_matrix(spark):
    vecs = [[1.0, 0.0], [1.0, 0.001], [0.0, 1.0]]
    pairs = embedding_neardup_pairs(emb_df(spark, vecs), threshold=0.9, n_queries=3)
    got = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert got == [(0, 1)]


def test_embedding_stats_known_values(spark):
    """Hand-checkable vectors: unit x/y vectors per label → avg_norm 1,
    centroid norm reflects cancellation."""
    from marketstream_etl_spark.operators.similarity import embedding_stats

    rows = [
        (1, [1.0, 0.0], "a"),  # opposite unit vectors: centroid = 0
        (2, [-1.0, 0.0], "a"),
        (3, [0.0, 2.0], "b"),  # same direction: centroid norm = 2
        (4, [0.0, 2.0], "b"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = {r["label"]: r for r in embedding_stats(df).collect()}
    assert out["a"]["n_vectors"] == 2
    assert abs(out["a"]["avg_norm"] - 1.0) < 1e-9
    assert abs(out["a"]["centroid_norm"]) < 1e-9
    assert abs(out["b"]["avg_norm"] - 2.0) < 1e-9
    assert abs(out["b"]["centroid_norm"] - 2.0) < 1e-9


def test_pq_encode_codes_bounded_and_complete(spark, sf_dir):
    from marketstream_etl_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    codes = pq_encode(emb).collect()
    # every vector gets exactly M codes, each within the codebook range
    assert len(codes) == n * PQ_M
    assert all(0 <= r["code"] < PQ_K for r in codes)
    assert all(0 <= r["m"] < PQ_M for r in codes)


def test_pq_clone_shares_codes_and_ranks_first(spark, sf_dir):
    """An exact clone quantizes to identical codes, so its ADC distance
    equals the query's own reconstruction distance — the minimum any
    corpus vector can achieve — and it must rank 1."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.similarity import ann_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clone_id = 100_000
    clones = emb.filter(F.col("vec_id") == 0).select(
        F.lit(clone_id).cast("long").alias("vec_id"), "embedding", "label"
    )
    out = ann_pq(emb.unionByName(clones), n_queries=1, k=3).collect()
    assert out[0]["query_id"] == 0
    assert out[0]["rank"] == 1
    assert out[0]["neighbor_id"] == clone_id


def test_pq_recall_against_bruteforce(spark, sf_dir):
    """Quantization is lossy but must stay useful: PQ top-5 recovers a
    reasonable share of the exact top-5 on the test corpus."""
    from marketstream_etl_spark.operators.similarity import (
        ann_bruteforce,
        ann_pq,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_bruteforce(emb).collect()
    }
    approx = ann_pq(emb).collect()
    assert len(approx) > 0
    hits = sum(
        1 for r in approx if (r["query_id"], r["neighbor_id"]) in exact
    )
    assert hits >= len(approx) * 0.2


def test_ivfpq_scans_only_probed_buckets(spark, sf_dir):
    """IVF-PQ candidates must be a subset of the probed buckets' members
    (the pruning contract), and its ranking must stay PQ-consistent: any
    neighbor IVF-PQ returns that ann_pq also ranks gets the identical
    ADC distance (same codes, same tables)."""
    from marketstream_etl_spark.operators.similarity import ann_ivfpq, ann_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    full = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in ann_pq(emb, k=10_000).collect()
    }
    out = ann_ivfpq(emb).collect()
    assert len(out) > 0
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        key = (r["query_id"], r["neighbor_id"])
        assert full[key] == r["adc_dist"]


def test_ivfpq_recall_against_bruteforce(spark, sf_dir):
    """Both approximations stacked still recover a useful share of the
    exact top-5 on the test corpus."""
    from marketstream_etl_spark.operators.similarity import (
        ann_bruteforce,
        ann_ivfpq,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_bruteforce(emb).collect()
    }
    approx = ann_ivfpq(emb).collect()
    hits = sum(1 for r in approx if (r["query_id"], r["neighbor_id"]) in exact)
    assert hits >= len(approx) * 0.15


def test_neardup_capped_bounds_per_doc_degree(spark, sf_dir):
    """The capped near-dup output must (a) be a subset of the uncapped
    pair set with identical cos values, and (b) contain, for every doc,
    only pairs that doc OR its partner ranks inside its own top-cap —
    in particular a doc whose uncapped degree exceeds the cap must keep
    its cap strongest partners."""
    from collections import defaultdict

    from marketstream_etl_spark.operators.similarity import (
        NEARDUP_MAX_PAIRS_PER_DOC as CAP,
        embedding_neardup_ivf,
        embedding_neardup_ivf_capped,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    un = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_neardup_ivf(emb).collect()
    }
    cap = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_neardup_ivf_capped(emb).collect()
    }
    assert set(cap) <= set(un)
    assert all(un[k] == v for k, v in cap.items())
    # reference recompute of the either-endpoint top-cap rule
    sides = defaultdict(list)
    for (a, b), c in un.items():
        sides[a].append((c, b))
        sides[b].append((c, a))
    keep = set()
    for d, lst in sides.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for c, p in lst[:CAP]:
            keep.add((min(d, p), max(d, p)))
    assert set(cap) == keep


def test_ivfpq_served_batches_match_single_pass(spark, sf_dir):
    """Serving per batch must not change any per-query result: the
    5-batch union equals ann_ivfpq run at the served codebook size over
    all 40 query ids, with batch_id = query_id // batch_size."""
    from marketstream_etl_spark.operators.similarity import (
        SERVED_BATCH_SIZE,
        SERVED_N_BATCHES,
        ann_ivfpq,
        ann_ivfpq_served,
        served_centroid_count,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    served = ann_ivfpq_served(emb, approx_rows=n).collect()
    assert len(served) > 0
    single = ann_ivfpq(
        emb,
        n_queries=SERVED_N_BATCHES * SERVED_BATCH_SIZE,
        n_centroids=served_centroid_count(n),
    ).collect()
    s = sorted(
        (r["batch_id"], r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
        for r in served
    )
    t = sorted(
        (
            r["query_id"] // SERVED_BATCH_SIZE,
            r["query_id"],
            r["neighbor_id"],
            r["adc_dist"],
            r["rank"],
        )
        for r in single
    )
    assert s == t


def test_quantize_error_bounded_by_half_step(spark, sf_dir):
    """Affine int8 quantization error is bounded by span/(2·255) per
    dimension; the audit's max_abs_err must respect the corpus-wide
    worst-dimension bound, and a constant dimension contributes zero."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.similarity import (
        embedding_quantize_error,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    spans = (
        emb.select(
            F.posexplode(
                F.transform(F.col("embedding"), lambda x: x.cast("double"))
            ).alias("pos", "x")
        )
        .groupBy("pos")
        .agg((F.max("x") - F.min("x")).alias("span"))
        .agg(F.max("span").alias("mx"))
        .collect()[0]["mx"]
    )
    bound = spans / (2 * 255) + 1e-12
    out = embedding_quantize_error(emb).collect()
    assert len(out) > 0
    assert all(r["max_abs_err"] <= bound for r in out)

    const = spark.createDataFrame(
        [(i, [0.5] * 64, 0) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    r = embedding_quantize_error(const).collect()[0]
    assert r["max_abs_err"] == 0.0 and r["mse"] == 0.0


def test_nearest_buckets_kernel_matches_declarative_plan(spark):
    """The r11 map-only IVF assignment kernel must be bit-identical to the
    declarative cosine() + row_number(desc ccos, asc centroid_id) plan it
    replaced (r11 VERDICT item 2): same ascending-dimension IEEE dot fold,
    same stable top-n tie order — over a corpus engineered for exact-cosine
    ties (exact/scaled copies of a centroid, a duplicated centroid
    direction inside the codebook) and a 1-ulp near-tie, at top-n 1 and 3."""
    import numpy as np
    from pyspark.sql import Row, Window
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.similarity import (
        _centroids,
        _dvec,
        _nearest_buckets,
        cosine,
    )

    rng = np.random.default_rng(12)
    dim = 6
    vecs = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(48)]
    # duplicate centroid DIRECTION inside the codebook: centroid 1 is a
    # scaled copy of centroid 0, so every vector's cosine to both is equal
    # whenever the scaled norm/dot folds round identically (exact tie →
    # stable order must pick the lower centroid_id first)
    vecs[1] = (1, [3.0 * x for x in vecs[0][1]])
    vecs.append((48, list(vecs[0][1])))              # exact copy of centroid 0
    vecs.append((49, [0.5 * x for x in vecs[0][1]]))  # scaled copy
    bumped = list(vecs[2][1])                         # 1-ulp near-tie corpus row
    bumped[0] = float(np.nextafter(bumped[0], np.inf))
    vecs.append((50, bumped))
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in vecs])
    base = df.select("vec_id", _dvec(F.col("embedding")).alias("vec"))
    cents = _centroids(base, 8)

    for n in (1, 3):
        got = sorted(
            (r["vec_id"], r["bucket"])
            for r in _nearest_buckets(
                base, cents, "vec_id", "vec", n, "bucket"
            ).collect()
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("ccos"), F.col("centroid_id")
        )
        ref = sorted(
            (r["vec_id"], r["centroid_id"])
            for r in base.join(F.broadcast(cents))
            .select(
                "vec_id",
                "centroid_id",
                cosine(F.col("vec"), F.col("cvec")).alias("ccos"),
            )
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= n)
            .collect()
        )
        assert got == ref


def test_nearest_buckets_codebook_collected_once_and_shared(spark):
    """r11 ADVICE: the codebook handle is lazy until the FIRST kernel
    closure is pickled (classic PySpark pickles mapInPandas commands at
    DataFrame construction, so that is plan-build of the first consumer —
    pure handle construction runs nothing), and SHARED: sibling
    assign/probe calls on one handle collect + broadcast exactly once,
    and later plan builds / actions reuse the same broadcast."""
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.similarity import (
        _CodebookHandle,
        _centroids,
        _dvec,
        _nearest_buckets,
    )

    emb = emb_df(
        spark, [[float(i == j) for j in range(4)] for i in range(4)] * 3
    )
    base = emb.select("vec_id", _dvec(F.col("embedding")).alias("vec"))
    handle = _CodebookHandle(_centroids(base, 2))
    assert handle._bc is None, "handle construction must not collect"
    a = _nearest_buckets(base, handle, "vec_id", "vec", 1, "bucket")
    bc = handle._bc
    assert bc is not None, "first plan build pickles the kernel → collect"
    b = _nearest_buckets(base, handle, "vec_id", "vec", 2, "bucket")
    assert handle._bc is bc, "sibling plan build reuses the broadcast"
    assert a.count() == 12
    assert b.count() == 24
    assert handle._bc is bc, "actions reuse the broadcast too"


def test_assign_and_probe_matches_two_pass_kernel(spark):
    """The r13 fused assign+probe kernel must be bit-identical to the two
    separate _nearest_buckets passes it replaced (one corpus top-1 pass +
    one query top-nprobe pass): the batch cosine matrix is shared, but
    row-wise arithmetic and the stable tie order are unchanged — checked
    over the same tie-engineered corpus as the kernel-vs-declarative test
    (scaled centroid copies, duplicated centroid direction, 1-ulp bump)."""
    import numpy as np
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from marketstream_etl_spark.operators.similarity import (
        _CodebookHandle,
        _assign_and_probe,
        _centroids,
        _dvec,
        _nearest_buckets,
    )

    rng = np.random.default_rng(12)
    dim = 6
    vecs = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(48)]
    vecs[1] = (1, [3.0 * x for x in vecs[0][1]])
    vecs.append((48, list(vecs[0][1])))
    vecs.append((49, [0.5 * x for x in vecs[0][1]]))
    bumped = list(vecs[2][1])
    bumped[0] = float(np.nextafter(bumped[0], np.inf))
    vecs.append((50, bumped))
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in vecs])
    base = df.select("vec_id", _dvec(F.col("embedding")).alias("vec"))
    cents = _centroids(base, 8)

    n_queries, nprobe = 5, 3
    handle = _CodebookHandle(cents)
    a_slim, p_slim = _assign_and_probe(
        base, handle, "vec_id", "vec", n_queries, nprobe
    )
    got_assign = sorted(
        (r["vec_id"], r["bucket"]) for r in a_slim.collect()
    )
    got_probe = sorted(
        (r["vec_id"], r["bucket"]) for r in p_slim.collect()
    )

    ref_assign = sorted(
        (r["vec_id"], r["bucket"])
        for r in _nearest_buckets(
            base, cents, "vec_id", "vec", 1, "bucket"
        ).collect()
    )
    queries = base.filter(F.col("vec_id") < n_queries)
    ref_probe = sorted(
        (r["vec_id"], r["bucket"])
        for r in _nearest_buckets(
            queries, cents, "vec_id", "vec", nprobe, "bucket"
        ).collect()
    )
    assert got_assign == ref_assign
    assert got_probe == ref_probe
