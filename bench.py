"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a count-style action; timings exclude
session startup (the engine's cost, not the query's).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from marketstream_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship ETL spine + representative joins/aggs.
HEADLINE = [
    "indicators",
    "validate_split",
    "symbol_leaderboard",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "top_parts_by_revenue",
    "text_analysis",
    "dedup_minhash_lsh",
    "ann_bruteforce",
    "simhash_pairs",
]


def main() -> None:
    spark = get_spark("marketstream-bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    timings: dict[str, float] = {}
    for name in names:
        # warm whole-stage-codegen for this plan shape at the smallest SF so
        # the timed run measures the query, not one-time JVM compilation
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        # force full materialization of every row cheaply (noop sink)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
