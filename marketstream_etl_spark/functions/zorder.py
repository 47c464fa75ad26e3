"""Z-order (Morton) interleave as a native column expression.

The reference's only multi-key access path is the composite B-tree index
``(symbol, timestamp)`` (DatabaseLoader.cpp:117-125), which serves exactly
one key order.  A Z-order layout is the lakehouse generalization: interleave
the bits of TWO keys into one sort value, lay files out in that order, and
parquet min/max footer stats become tight on BOTH dimensions — so a box
predicate (``a BETWEEN .. AND b BETWEEN ..``) skips row groups no matter
which key it leads with.  At 100 TB this is how you serve two filter
dimensions with one copy of the data instead of two sorted copies.

The interleave is a fixed fold of shift/mask/or built-ins — pure JVM-side
whole-stage-codegen expressions, no UDF.  Keys must be non-negative and fit
in ``bits`` bits (callers range-bucket or rank first when the domain is
wider; TPC-H part/supp keys fit directly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave `a` (even bit positions) and `b` (odd positions).

    Equivalent Python: ``z |= ((a>>i)&1) << 2i; z |= ((b>>i)&1) << 2i+1``
    for i in [0, bits).  Result fits in 2*bits bits (long for bits<=31).
    """
    mask = F.lit((1 << bits) - 1)
    a = a.cast("long").bitwiseAND(mask)
    b = b.cast("long").bitwiseAND(mask)
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def z_value_py(a: int, b: int, bits: int = 16) -> int:
    """Pure-Python reference used by tests and the DuckDB oracle mirror."""
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z
