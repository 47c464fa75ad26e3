"""Pandas UDAF surface (grouped-aggregate ``pandas_udf``) — with
operators/udtf_ops.py this completes the UDF/UDAF/UDTF extension triple
the reference lacks (SURVEY §2.9).

A grouped-agg pandas UDF receives each group's columns as Arrow-backed
pandas Series and returns one scalar — the vectorized (not row-at-a-time)
custom-aggregate path.  Scale caveat vs. a native agg: there is NO partial
aggregation — every row shuffles to its group's task and the whole group
must fit in executor memory.  Fine for bounded groups (10 symbols here);
for unbounded groups prefer a native expression or an algebraic
decomposition (sum/count parts natively, combine after).  The demo
aggregate — VWAP — is deliberately also a native expression (A4), so the
oracle proves the UDAF exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def vwap_udaf(price: pd.Series, volume: pd.Series) -> float:
    """Sigma(p*v)/Sigma(v) over one group (TechnicalIndicators.hpp:310-330
    semantics: zero total volume -> 0.0)."""
    v = float(volume.astype("float64").sum())
    if v == 0.0:
        return 0.0
    return float((price * volume).sum() / v)


@pandas_udf("long")
def count_udaf(volume: pd.Series) -> int:
    """Group size — exists because a grouped-agg pandas UDF cannot be mixed
    with native aggregates in one .agg() (INVALID_PANDAS_UDF_PLACEMENT);
    every aggregate in the pandas path must itself be a pandas UDF."""
    return int(len(volume))


def vwap(price: Column, volume: Column) -> Column:
    return vwap_udaf(price, volume)
