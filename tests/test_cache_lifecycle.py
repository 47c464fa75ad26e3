"""Cache-lifecycle guarantees added in r4:

- dedup operators keep at most ONE generation of persisted intermediates
  per operator family (keyed rotation — repeat calls over the same input
  reuse the warm frames, a new input unpersists the old generation);
- the analytics valid-trades cache is keyed by source mtime, so a
  regenerated testdata directory is never served stale results.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from marketstream_etl_spark.operators import dedup
from marketstream_etl_spark.plans import analytics
from marketstream_etl_spark.sources.tables import load_table


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def test_lsh_cache_generation_is_bounded(spark):
    docs1 = load_table(spark, "/root/testdata/sf0.001", "documents")
    dedup.minhash_lsh_pairs(docs1).count()
    after_first = _n_cached(spark)
    # same input again: cached frames are REUSED, not duplicated
    dedup.minhash_lsh_pairs(docs1).count()
    assert _n_cached(spark) == after_first
    # different input: the old generation is rotated out, not leaked
    docs2 = load_table(spark, "/root/testdata/sf0.01", "documents")
    dedup.minhash_lsh_pairs(docs2).count()
    assert _n_cached(spark) <= after_first + 1  # transiently ±1 is fine
    # drain for other tests
    dedup._rotate_caches("minhash_lsh", -1, [])


def _write_events(path: str, prices: list[float]) -> None:
    n = len(prices)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, n + 1), pa.int64()),
                "ts": pa.array(
                    [1_704_067_200_000_000 + i for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([7] * n, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array(prices, pa.float64()),
                "props": pa.array(['{"k": 5}'] * n),
            }
        ),
        os.path.join(path, "events.parquet"),
    )


def test_valid_trades_cache_rotates_on_source_mtime(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_events(sf_dir, [10.0, 11.0, 12.0])
    first = analytics.q_indicators(spark, sf_dir).collect()
    assert len(first) == 1 and abs(first[0].vwap - 11.0) < 1e-9
    # regenerate the source with different prices; mtime changes, so the
    # cached generation must be discarded, never served
    os.remove(os.path.join(sf_dir, "events.parquet"))
    _write_events(sf_dir, [20.0, 21.0, 22.0])
    second = analytics.q_indicators(spark, sf_dir).collect()
    assert len(second) == 1 and abs(second[0].vwap - 21.0) < 1e-9
