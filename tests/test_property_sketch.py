"""Property-based invariants for the sketch-family expression generators
(hypothesis over wide random ranges; evaluated through DuckDB, which the
oracle gate already proves expression-equivalent to the Spark side).
"""
from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marketstream_etl_spark.operators.sketch import (
    HDR_SUB_BITS,
    HDR_SUBS,
    HLL_M,
    HLL_WBITS,
    _hdr_bid_expr,
    _hdr_bounds_exprs,
    _rho_case,
)

_con = duckdb.connect()


def _eval(expr_sql: str, **binds: int):
    cols = ", ".join(f"CAST({v} AS BIGINT) AS {k}" for k, v in binds.items())
    return _con.execute(
        f"SELECT {expr_sql} FROM (SELECT {cols})"
    ).fetchone()[0]


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=(1 << 41) - 1))
def test_hdr_bucket_inverse_brackets_value(v):
    """lo <= v <= hi for every representable cents value, and the bucket
    obeys the 1/SUBS relative-width bound once past the exact range."""
    bid_e = _hdr_bid_expr("v", "(({x}) >> ({n}))")
    lo_e, hi_e = _hdr_bounds_exprs(f"({bid_e})", "(({x}) << ({n}))", "//")
    lo = _eval(lo_e, v=v)
    hi = _eval(hi_e, v=v)
    assert lo <= v <= hi
    if v >= HDR_SUBS:
        assert (hi - lo + 1) * HDR_SUBS <= 2 * lo  # width <= lo/32 (x2 slack)
    else:
        assert lo == hi == v


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=(1 << 41) - 1),
    st.integers(min_value=1, max_value=(1 << 41) - 1),
)
def test_hdr_bucket_is_monotone(a, b):
    """v1 <= v2 implies bid(v1) <= bid(v2) — quantile ordering depends on
    it."""
    a, b = sorted((a, b))
    bid_e = _hdr_bid_expr("v", "(({x}) >> ({n}))")
    assert _eval(bid_e, v=a) <= _eval(bid_e, v=b)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 60) - 1))
def test_hll_rho_matches_python_trailing_zeros(h):
    """The generated rho CASE ladder equals trailing-zeros + 1 of the
    suffix (capped at WBITS + 1 for the all-zero suffix)."""
    w = h // HLL_M
    expected = HLL_WBITS + 1
    for k in range(HLL_WBITS):
        if (w >> k) & 1:
            expected = k + 1
            break
    rho_e = _rho_case(f"(h // {HLL_M})", "(({w}) >> ({k}))")
    assert _eval(rho_e, h=h) == expected


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
                min_size=1, max_size=50))
def test_hll_register_merge_is_max(hs):
    """Merging per-item registers by MAX equals building the register
    from the union — the mergeability property the __all__ scope relies
    on (checked directly on the integer model)."""
    regs_a: dict[int, int] = {}
    regs_b: dict[int, int] = {}
    half = len(hs) // 2
    for part, regs in ((hs[:half], regs_a), (hs[half:], regs_b)):
        for h in part:
            b = h % HLL_M
            w = h // HLL_M
            rho = HLL_WBITS + 1
            for k in range(HLL_WBITS):
                if (w >> k) & 1:
                    rho = k + 1
                    break
            regs[b] = max(regs.get(b, 0), rho)
    merged = {
        b: max(regs_a.get(b, 0), regs_b.get(b, 0))
        for b in set(regs_a) | set(regs_b)
    }
    regs_union: dict[int, int] = {}
    for h in hs:
        b = h % HLL_M
        w = h // HLL_M
        rho = HLL_WBITS + 1
        for k in range(HLL_WBITS):
            if (w >> k) & 1:
                rho = k + 1
                break
        regs_union[b] = max(regs_union.get(b, 0), rho)
    assert merged == regs_union
