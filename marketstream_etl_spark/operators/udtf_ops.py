"""Python UDTF surface — the user-extension point the reference lacks
entirely (SURVEY §2.9: "no user-extension point; every function is
compiled in").

A UDTF is the right tool when one input row expands to a *variable* number
of output rows under imperative logic.  The demo op — top-k terms per
document — is deliberately also expressible as explode+groupBy+window, so
the oracle can check it exactly; real users would reach for a UDTF when
the per-row program (a parser, a tokenizer, a simulation) has no
relational form.

Scale notes: a UDTF is row-at-a-time Python — the slow path (SURVEY §2.9).
It runs partition-parallel (each task streams its rows through its own
Python worker), holds only one document in memory at a time, and never
touches the driver, so it *scales* fine; it just burns CPU vs. a native
plan.  Keep it off the hot path; it exists to cover the extension API.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

TOP_K = 3


@udtf(returnType="term string, cnt bigint, term_rank bigint")
class DocTopTerms:
    """Emit the top-k whitespace terms of one document, most-frequent
    first, ties broken lexicographically (deterministic for the oracle)."""

    def eval(self, text: str):  # noqa: A002 - UDTF contract
        if text is None:
            return
        counts = Counter(text.split(" "))
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (term, cnt) in enumerate(ranked[:TOP_K], start=1):
            yield term, cnt, i


def doc_top_terms(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """LATERAL-join every document row to its UDTF expansion."""
    spark.udtf.register("doc_top_terms", DocTopTerms)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.term, t.cnt, t.term_rank
        FROM _udtf_docs d, LATERAL doc_top_terms(d.text) t
        """
    )
