"""Dump `explain("formatted")` for named queries to per-query files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query (default: the bench
HEADLINE list).  The optimization-round evidence artifacts
(plans/r13/<query>_before.txt / _after.txt) are generated with this.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from bench import HEADLINE
from marketstream_etl_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        "dump-plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entrymod.queries()
    names = sys.argv[3:] or [n for n in HEADLINE if n in qs]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        try:
            df = qs[name](spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # streaming rows can't explain pre-start
            text = f"<explain failed: {e}>\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
