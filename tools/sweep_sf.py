"""Execute EVERY registered query end-to-end at a given scale factor and
report failures — the scale-abort sweep.

The correctness gate runs at sf0.01; this sweep exists to catch failures
that only manifest at larger data (its first run caught a real one: an
ANSI DIVIDE_BY_ZERO from a parser-default 0.0 close that no sf0.01 bar
ever hits).  Run after operator changes and before a round closes:

    python tools/sweep_sf.py                      # sf0.1 (10x the gate)
    python tools/sweep_sf.py /root/testdata/sf0.01

Rows are counted (forces full materialization); values are NOT compared
— that is check_oracle.py's job at the gate SF.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from marketstream_etl_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sweep-sf")
    qs = entrymod.queries()
    fails: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"ok   {name} ({time.time() - t0:.1f}s, {n} rows)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__} {str(e)[:200]}", flush=True)
    print(f"sweep done: {len(qs) - len(fails)}/{len(qs)} ok; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
