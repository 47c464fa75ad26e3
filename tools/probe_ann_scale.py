"""Scale probe for the r5-continuation ANN ops: kmeans_fit and ann_lsh on
synthetic 64-dim vectors at 1k/10k/100k rows (cold per size, local[32]).
Run ad hoc; measured results are recorded in README 'Scale design'.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from marketstream_etl_spark.operators.similarity import ann_lsh, kmeans_fit
from marketstream_etl_spark.session import get_spark

spark = get_spark("ann-scale-probe")

for n in (1_000, 10_000, 100_000):
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.rand(seed=d) * 2 - 1).cast("float")
                    for d in range(64)
                ]
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    emb.count()
    t0 = time.perf_counter()
    kmeans_fit(emb, k=16, iters=3)
    t_km = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = ann_lsh(emb).collect()
    t_lsh = time.perf_counter() - t0
    ncand = sum({r.query_id: r.n_candidates for r in out}.values())
    print(
        f"n={n:>7}  kmeans_fit(16,3)={t_km:6.2f}s  "
        f"ann_lsh={t_lsh:6.2f}s  total_candidates={ncand}"
    )
    emb.unpersist()


# --- PQ / IVF-PQ extension (late r5): same synthetic corpus sizes --------
from marketstream_etl_spark.operators.similarity import ann_ivfpq, ann_pq  # noqa: E402

print("\nPQ paths (same sizes, cold per size):")
for n in (1_000, 10_000, 100_000):
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.rand(seed=d) * 2 - 1).cast("float")
                    for d in range(64)
                ]
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    emb.count()
    t0 = time.perf_counter()
    ann_pq(emb).collect()
    t_pq = time.perf_counter() - t0
    t0 = time.perf_counter()
    ann_ivfpq(emb).collect()
    t_ivfpq = time.perf_counter() - t0
    print(f"n={n:>7}  ann_pq={t_pq:6.2f}s  ann_ivfpq={t_ivfpq:6.2f}s")
    emb.unpersist()
