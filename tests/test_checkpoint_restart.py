"""Checkpoint/restart fault-tolerance proof (ST7): a file-source stream
with a checkpointLocation survives a full query stop + process-level
restart without reprocessing or dropping input — the exactly-once
guarantee Structured Streaming's offset log + file-sink manifest provide.

The sequence is deterministic: each availableNow run drains exactly the
files the checkpoint has not seen, and the file sink's commit manifest
makes the output readable only for committed batches.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

SCHEMA = "trade_id long, symbol string, price double"


def _write_file(d: str, name: str, rows: list[tuple[int, str, float]]) -> None:
    pq.write_table(
        pa.table(
            {
                "trade_id": pa.array([r[0] for r in rows], pa.int64()),
                "symbol": pa.array([r[1] for r in rows], pa.string()),
                "price": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        os.path.join(d, name),
    )


def _run_once(spark, src: str, out: str, ck: str) -> None:
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("doubled", F.col("price") * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    # run 1: only file1 exists
    _write_file(src, "f1.parquet", [(1, "AAPL", 10.0), (2, "MSFT", 20.0)])
    _run_once(spark, src, out, ck)
    got1 = {r["trade_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 2}

    # run 2 (restart from checkpoint): file2 arrives; file1 must NOT
    # reprocess — the offset log remembers it across query objects
    _write_file(src, "f2.parquet", [(3, "GOOG", 30.0)])
    _run_once(spark, src, out, ck)
    rows = spark.read.parquet(out).collect()
    assert sorted(r["trade_id"] for r in rows) == [1, 2, 3]  # no dupes
    assert {r["doubled"] for r in rows} == {20.0, 40.0, 60.0}

    # run 3: nothing new -> nothing emitted
    _run_once(spark, src, out, ck)
    assert spark.read.parquet(out).count() == 3
