"""Small-file compaction — the maintenance half of a 100 TB layout.

Streaming ingests, partitioned writes, and incremental refreshes all leave
datasets fragmented into files far below the parquet sweet spot; every
downstream scan then pays per-file open/footer/schema overhead and the
driver pays listing time.  Compaction bin-packs the data back to a target
file size with one round-robin shuffle and an atomic directory swap
(write to a new path, never in place — readers of the old path are not
torn).  The reference has no analog: its one-shot pipeline writes a single
parquet file (ParquetWriter.cpp:286-310) and never revisits it.

Sizing here is row-based (the row count is free from parquet footers); a
warehouse deployment would derive the target from listed file bytes
instead — same plan, different constant.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

from marketstream_etl_spark.sources.tables import warehouse_path


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_rows_per_file: int = 1 << 20,
) -> int:
    """Rewrite `in_path` into ceil(n / target) evenly-sized files at
    `out_path`.  Returns the output file count."""
    df = spark.read.parquet(in_path)
    n_rows = df.count()  # footer metadata only — no data scan
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def ensure_compacted_documents(spark: SparkSession, sf_dir: str) -> str:
    """Fragment documents into 64 tiny files (the ingest-damage fixture),
    then compact back — once per source dir.  The 2^40 target means "one
    file"; compact_parquet's own count is the only job over the data."""
    frag = warehouse_path(spark, "frag_documents", sf_dir)
    compacted = warehouse_path(spark, "compact_documents", sf_dir)
    if not os.path.exists(os.path.join(compacted, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.repartition(64).write.mode("overwrite").parquet(frag)
        compact_parquet(spark, frag, compacted, target_rows_per_file=1 << 40)
    return compacted


def compacted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(ensure_compacted_documents(spark, sf_dir))
