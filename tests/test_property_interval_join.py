"""Property test for the BANDED interval-join band math (r9).

The banded join replaces the symbol-only equality key with
(symbol, band) where band = floor(event_time/horizon), exploding the
probe side to its two candidate bands.  The claim under test: for ANY
input and horizon, the banded pair set equals the plain interval-join
pair set, with every true pair matched via EXACTLY one probe copy
(duplicates would corrupt counts; misses would drop pairs at band
boundaries — the classic off-by-one surface: sell exactly at
buy + horizon, timestamps exactly on a band edge).

Tested batch-side (same expressions, no streaming machinery) so
hypothesis can drive many randomized cases quickly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _pairs_plain(df, horizon_us: int):
    b = df.filter(F.col("side") == "B").select(
        F.col("sym").alias("bs"), F.col("tus").alias("bt")
    )
    s = df.filter(F.col("side") == "S").select(
        F.col("sym").alias("ss"), F.col("tus").alias("st")
    )
    return (
        b.join(
            s,
            (F.col("bs") == F.col("ss"))
            & (F.col("st") >= F.col("bt"))
            & (F.col("st") <= F.col("bt") + F.lit(horizon_us)),
        )
        .select("bs", "bt", "st")
    )


def _pairs_banded(df, horizon_us: int):
    band = lambda c: F.floor(F.col(c) / F.lit(horizon_us))  # noqa: E731
    b = df.filter(F.col("side") == "B").select(
        F.col("sym").alias("bs"),
        F.col("tus").alias("bt"),
        band("tus").alias("bband"),
    )
    s = (
        df.filter(F.col("side") == "S")
        .select(
            F.col("sym").alias("ss"),
            F.col("tus").alias("st"),
            band("tus").alias("sband"),
        )
        .withColumn(
            "sband",
            F.explode(F.array(F.col("sband"), F.col("sband") - F.lit(1))),
        )
    )
    return (
        b.join(
            s,
            (F.col("bs") == F.col("ss"))
            & (F.col("bband") == F.col("sband"))
            & (F.col("st") >= F.col("bt"))
            & (F.col("st") <= F.col("bt") + F.lit(horizon_us)),
        )
        .select("bs", "bt", "st")
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.sampled_from(["B", "S"]),
            # times clustered around band edges of horizon=100 so edge
            # cases (t on an edge, gap exactly == horizon) are common
            st.integers(min_value=0, max_value=500),
        ),
        min_size=0,
        max_size=30,
    ),
    horizon=st.sampled_from([1, 7, 100]),
)
def test_banded_join_equals_plain_interval_join(spark_prop, rows, horizon):
    df = spark_prop.createDataFrame(
        [(s, side, t) for s, side, t in rows] or [("Z", "X", 0)],
        "sym string, side string, tus long",
    )
    plain = sorted(map(tuple, _pairs_plain(df, horizon).collect()))
    banded = sorted(map(tuple, _pairs_banded(df, horizon).collect()))
    # multiset equality: every pair exactly once (no boundary miss, no
    # double-match through both probe copies)
    assert banded == plain
