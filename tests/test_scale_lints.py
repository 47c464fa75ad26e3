"""Source-level scale lints: lock in the posture decisions earlier rounds
paid to learn, so a future edit cannot silently reintroduce them.

1. r5 VERDICT's one 100x scale-killer: forced F.broadcast() hints on
   TPC-H tables that grow with scale factor (customer/supplier/part/
   lineitem/orders).  Hints are allowed ONLY on fixed-cardinality
   nation/region aliases and bounded 1-row/aggregate frames.
2. Driver-side .collect() inventory: every site must be a known bounded
   materialization (codebooks, scalars, vocab, fixture probes).  A new
   .collect() fails the lint until it is reviewed and whitelisted here.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "marketstream_etl_spark"

# identifiers that are provably bounded at any scale factor
BOUNDED_BROADCAST_NAMES = {
    "nation", "region", "n1", "n2", "cnat", "snat",  # 25 / 5 rows fixed
    "total", "max_rev", "avg_qty", "avg_bal", "threshold",  # 1-row aggs
    "top_brands",  # LIMIT-bounded
}

SCALING_TABLES = ("cust", "supp", "part", "li", "orders", "lineitem",
                  "customer", "supplier")


def test_no_forced_broadcast_on_scaling_tables():
    src = (PKG / "plans" / "tpch.py").read_text()
    for m in re.finditer(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z_0-9]*)", src):
        name = m.group(1)
        assert name not in SCALING_TABLES, (
            f"F.broadcast({name}) forces a broadcast of a table that grows "
            "with scale factor — r5 VERDICT's executor-OOM scale-killer; "
            "let AQE/autoBroadcastJoinThreshold decide instead"
        )
        assert name in BOUNDED_BROADCAST_NAMES, (
            f"F.broadcast({name}) is not in the bounded whitelist — review "
            "whether it is fixed-cardinality at ANY scale factor, then add "
            "it to BOUNDED_BROADCAST_NAMES with a comment"
        )


def test_collect_sites_are_whitelisted():
    # file -> max allowed .collect() occurrences (all reviewed bounded:
    # dedup fixed-point scalar, kmeans codebooks + recall scalar + the
    # semantic_dedup capped-√rows codebook + the _nearest_buckets codebook
    # collect (≤ CODEBOOK_MAX_CENTROIDS rows by construction — r11, the
    # sf100-probe fix), vocab, sentinel fixture probe + socket-emitter
    # test fixture, stream-static anomaly stats.  training_data's second
    # site (r14): contamination_verbatim's benchmark gram-HASH set —
    # bounded by the benchmark slice exactly like the gram-STRING
    # broadcast the query has always done, at 8 bytes/gram instead of a
    # full string)
    # relevance.py (r14): bm25_search's query-vocabulary collect —
    # bounded by the n_queries docs' term count (a query parse, the
    # same class as the codebook collect), applied as the IN-list that
    # batch-prunes the term-clustered postings cache
    allowed = {
        "operators/dedup.py": 1,
        "operators/relevance.py": 1,
        "operators/similarity.py": 4,
        "plans/training_data.py": 2,
        "streaming/docs.py": 1,
        "streaming/ticks.py": 2,
    }
    found: dict[str, int] = {}
    for py in PKG.rglob("*.py"):
        n = py.read_text().count(".collect()")
        if n:
            found[str(py.relative_to(PKG))] = n
    for f, n in found.items():
        assert f in allowed and n <= allowed[f], (
            f"{f} has {n} .collect() site(s); the whitelist allows "
            f"{allowed.get(f, 0)}. A driver-side collect is only OK for "
            "provably bounded frames — review the new site and update the "
            "whitelist with its bound"
        )
