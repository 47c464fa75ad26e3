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
    args = [a for a in sys.argv[1:]]
    skips: dict[str, str] = {}
    while "--skip" in args:
        i = args.index("--skip")
        name, reason = args[i + 1].split("=", 1)
        skips[name] = reason
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("sweep-sf")
    qs = entrymod.queries()
    fails: list[str] = []
    n_skipped = 0
    for name, fn in qs.items():
        if name in skips:
            # no silent caps: every skipped query is logged with its reason
            n_skipped += 1
            print(f"SKIP {name}: {skips[name]}", flush=True)
            continue
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"ok   {name} ({time.time() - t0:.1f}s, {n} rows)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__} {str(e)[:200]}", flush=True)
    print(
        f"sweep done: {len(qs) - len(fails) - n_skipped}/{len(qs)} ok"
        f" ({n_skipped} skipped, reasons above); fails: {fails}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
