"""Raw binary-asset ingestion via Spark's native `binaryFile` source —
the front door of the multimodal pipeline (operators/multimodal.py):
image/audio/video files on disk become (path, length, content) rows,
from which the typed-metadata/feature/frame operators take over.

The fixture is a deterministic set of binary files (content derived from
a constant spec, so the oracle can state the expected rows as literals
computed at SQL-build time — no filesystem access oracle-side).  Files
are written once per (spec digest, testdata generation) with temp-file +
atomic-rename, the same torn-write-proof contract as the CSV fixtures.

Scale note: binaryFile is the right source for ≤ a few MB per asset
(each file is one row; maxPartitionBytes packs small files per task);
beyond that a production pipeline lands assets in parquet/iceberg as
(id, binary) pages — exactly the shape documents/multimodal already use.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (seed, length): 12 assets, lengths chosen to straddle the 8-byte magic
# window and exercise varying row widths
BINARY_FIXTURE_SPEC = [(i, 64 + 17 * i) for i in range(12)]


def payload(seed: int, length: int) -> bytes:
    """Deterministic asset bytes — engine-independent by construction."""
    return bytes((seed * 7 + j * 13) % 256 for j in range(length))


def _spec_digest() -> str:
    raw = ";".join(f"{s}:{n}" for s, n in BINARY_FIXTURE_SPEC)
    return hashlib.md5(raw.encode()).hexdigest()[:8]


def ensure_binary_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write-once binary asset directory keyed by spec digest + testdata
    generation; returns the directory path."""
    from marketstream_etl_spark.sources.tables import warehouse_path

    path = warehouse_path(
        spark, f"binary_assets_{_spec_digest()}", sf_dir
    )
    os.makedirs(path, exist_ok=True)
    for seed, length in BINARY_FIXTURE_SPEC:
        dest = os.path.join(path, f"asset_{seed:03d}.bin")
        if os.path.exists(dest):
            continue
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(payload(seed, length))
        os.replace(tmp, dest)
    return path


def binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(file, n_bytes, checksum, magic8) per asset, ordered by file name —
    length/checksum/magic computed engine-side from the binary content,
    proving the binaryFile scan delivers the bytes intact."""
    d = ensure_binary_fixture(spark, sf_dir)
    # pathGlobFilter: a crashed run can leave a mkstemp *.tmp behind;
    # only the committed .bin assets are part of the contract
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    return (
        raw.select(
            F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col("content")).alias("checksum"),
            F.hex(F.expr("substring(content, 1, 8)")).alias("magic8"),
        )
    )


def binary_ingest_sql() -> str:
    """VALUES oracle: the expected rows are fully determined by the spec,
    so they are computed here in Python and stated as literals."""
    rows = []
    for seed, length in sorted(BINARY_FIXTURE_SPEC):
        data = payload(seed, length)
        rows.append(
            "('asset_{:03d}.bin', {}, '{}', '{}')".format(
                seed,
                length,
                hashlib.md5(data).hexdigest(),
                data[:8].hex().upper(),
            )
        )
    return (
        "SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(file, n_bytes, checksum, magic8) ORDER BY file"
    )
