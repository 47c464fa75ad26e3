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


def test_adaptive_horizon_threshold_and_pair_volume_bound(monkeypatch):
    """The density-adaptive horizon (ticks.join_horizon_ns) across the
    100K-row threshold: unchanged 1 HOUR for every n <= 2*REF-1 (driver
    and bench SFs keep oracle semantics), 1/scale² shrink above it, the
    emitted-pair-volume invariant n²·horizon <= 4·REF²·H at every n, and
    the 1 ms floor that keeps the µs band divisor nonzero at extrapolated
    scale."""
    from marketstream_etl_spark.sources import tables
    from marketstream_etl_spark.streaming import ticks

    HOUR = ticks.JOIN_HORIZON_NS
    REF = ticks.JOIN_REF_ROWS

    def horizon_for(n):
        monkeypatch.setattr(tables, "table_row_count", lambda sf, t: n)
        return ticks.join_horizon_ns("whatever")

    # below and at the threshold: the reference 1-hour horizon, exactly
    for n in (1, 1_000, REF - 1, REF, 2 * REF - 1):
        assert horizon_for(n) == HOUR, n
    # first shrink step lands at the threshold crossing, as documented
    assert horizon_for(2 * REF) == HOUR // 4
    assert horizon_for(10 * REF) == HOUR // 100  # sf1: 36 s
    assert horizon_for(100 * REF) == HOUR // 10_000  # sf10: 0.36 s
    # pair-volume invariant: floor(n/REF) >= n/(2*REF) for n >= REF, so
    # n²·horizon never exceeds 4·REF²·HOUR — emitted pairs stay pinned
    # at their sf0.1 level while input grows linearly
    for n in (REF, 2 * REF, 3 * REF - 1, 7 * REF, 10 * REF, 100 * REF,
              1000 * REF, 12_345_678):
        h = horizon_for(n)
        assert n * n * h <= 4 * REF * REF * HOUR, n
    # 1 ms floor: past scale² > 3.6e9 the unfloored horizon would round
    # to ZERO µs and the band divisor (horizon_ns DIV 1000) would divide
    # by zero; the floor keeps it >= 1000 µs forever
    for n in (100_000 * REF, 10_000_000 * REF):
        h = horizon_for(n)
        assert h == 1_000_000 and h // 1000 >= 1, n
    # the µs divisor is nonzero at EVERY row count (the property the
    # band expression actually needs)
    for n in (1, REF, 60 * REF, 999 * REF, 123_456 * REF):
        assert horizon_for(n) // 1000 >= 1, n
