"""Second-decade scale probe: time the headline + heavy operator families
at sf0.1 (real testdata) vs 'sf1' (tools/gen_sf1.py synthetic, 10x) in
one warm session — the same methodology as the README's sf0.01→sf0.1
probes (codegen pre-warmed at sf0.001, count()-forced, best-of-N).

    python tools/gen_sf1.py            # once
    python tools/probe_decade.py       # prints per-op sf0.1 / sf1 / ratio
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from marketstream_etl_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/marketstream_sf1"
WARM = "/root/testdata/sf0.001"
N = 3

OPS = [
    "indicators",
    "ohlc_bars",
    "volume_bars",
    "dedup_minhash_lsh",
    "winnowing_pairs",
    "ann_ivf",
    "ann_bruteforce",
    "bm25_search",
    "text_analysis",
    "contamination",
    "hll_cardinality",
    # TPC-H rows are excluded: sf1 synthesizes only the events/documents/
    # embeddings tables (gen_sf1.py); the TPC-H surface has its own
    # sf0.01→sf0.1 evidence and its tables are driver-generated.
]


def main() -> None:
    spark = get_spark("probe-decade")
    qs = entrymod.queries()
    print(f"{'op':<22}{'sf0.1 s':>9}{'sf1 s':>9}{'ratio':>7}  rows0.1 / rows1")
    for name in OPS:
        if name not in qs:
            print(f"{name:<22}  -- not registered")
            continue
        fn = qs[name]
        try:
            fn(spark, WARM).count()  # codegen warm
            stats = {}
            for sf in (SF01, SF1):
                runs, rows = [], 0
                for _ in range(N):
                    t0 = time.perf_counter()
                    rows = fn(spark, sf).count()
                    runs.append(time.perf_counter() - t0)
                stats[sf] = (min(runs), rows)
            a, ra = stats[SF01]
            b, rb = stats[SF1]
            print(
                f"{name:<22}{a:>9.2f}{b:>9.2f}{b / a:>7.2f}"
                f"  {ra} / {rb}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name:<22}  FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
