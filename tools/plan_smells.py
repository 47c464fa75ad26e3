"""Registry-wide physical-plan smell scan: build (never execute) every
batch query's DataFrame and flag the plan shapes that become
scale-killers at 100x — CartesianProduct over non-literal inputs and
Window nodes with an EMPTY partitioning clause (single-reducer sort).

Streaming queries are skipped (building them runs a real stream); known
bounded sites are whitelisted inline with their bound.

    python tools/plan_smells.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from marketstream_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

# query -> reason the flagged node is bounded (reviewed)
WHITELIST: dict[str, str] = {
    # 1-row/bounded frames crossed on purpose compile to
    # BroadcastNestedLoopJoin, whose node name does not contain the
    # "CartesianProduct" substring this scanner matches — they are
    # inherently unmatched, not exempted by any code below.  The
    # whitelist stays empty unless a genuinely-bounded plan that
    # actually compiles to CartesianProduct appears.
}


def main() -> int:
    spark = get_spark("plan-smells")
    qs = entrymod.queries()
    flagged: list[str] = []
    checked = 0
    for name, fn in qs.items():
        if name.startswith("streaming"):
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            # building some queries runs a bounded stream or fixture;
            # they are covered by the correctness gate instead
            print(f"skip {name}: {type(e).__name__}", flush=True)
            continue
        checked += 1
        problems = []
        for line in plan.splitlines():
            if "CartesianProduct" in line:
                problems.append("CartesianProduct")
            # Window [funcs], [partition], [order] — empty partition list
            m = re.search(r"Window \[.*\], \[\], \[", line)
            if m:
                problems.append("unpartitioned Window")
            # Generate (pos)explode whose generator input embeds an
            # O(row-size) ARRAY-BUILD chain (array_distinct / zip_with —
            # the shingle, gram, and bigram builders): the input
            # re-evaluates once per OUTPUT row (projection collapse
            # through GenerateExec), turning a linear build quadratic —
            # r8's measured ~40x blowup class, fixed by pinning the
            # array behind a localCheckpoint before the explode.  Cheap
            # inputs (bare attrs, literal arrays, tokens()'s
            # split-filter, struct packing) measured ≤1.4x and are not
            # flagged — this lint exists to stop the FIXED class from
            # regressing, not to chase noise.
            g = re.search(r"Generate (?:pos)?explode\((.*?)\), ", line)
            if g and re.search(r"array_distinct\(|zip_with\(", g.group(1)):
                problems.append(
                    f"collapsed Generate({g.group(1)[:60]})"
                )
        if problems and name not in WHITELIST:
            flagged.append(f"{name}: {sorted(set(problems))}")
            print(f"FLAG {name}: {sorted(set(problems))}", flush=True)
    print(f"scanned {checked} batch queries; flagged: {len(flagged)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
