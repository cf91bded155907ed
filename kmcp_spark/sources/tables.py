"""Checkpoint-table IO and testdata loading.

Checkpoint tables are the resumability backbone (the analog of kmcp's
file boundaries between compute / index / search / profile: each
subcommand's output is a durable artifact the next stage can restart
from).  Target deployments write Iceberg; this environment has no
Iceberg runtime jar, so the writer falls back to parquet directories
with an atomic ``_FINGERPRINT`` marker carrying the config fingerprint —
the same skip-if-valid semantics kmcp applies with its DB-compatibility
checks (`kmcp/cmd/util-db-search.go:689-695`).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)


def _marker(path: str) -> str:
    return os.path.join(path, "_FINGERPRINT")


def checkpoint_valid(path: str, fingerprint: str) -> bool:
    try:
        with open(_marker(path)) as f:
            return json.load(f).get("fingerprint") == fingerprint
    except (OSError, ValueError):
        return False


def write_checkpoint(
    df: DataFrame,
    path: str,
    fingerprint: str,
    partition_by: list[str] | None = None,
    fmt: str | None = None,
) -> None:
    """Write a stage output durably; the marker lands only on success.

    ``fmt`` selects the table format: "parquet" (default) or "iceberg".
    On a cluster with an Iceberg catalog configured, pass fmt="iceberg"
    (or set SPARK_GRAFT_CHECKPOINT_FORMAT=iceberg) and ``path`` is used
    as the table identifier — stages then get Iceberg's snapshot
    isolation and atomic overwrite.  This sandbox has no Iceberg runtime
    jar, so parquet directories with the atomic ``_FINGERPRINT`` marker
    provide the same skip-if-valid resume semantics.
    """
    write_checkpoint_data(df, path, partition_by, fmt)
    write_checkpoint_marker(path, fingerprint)


def write_checkpoint_data(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str | None = None,
) -> None:
    """The data half of ``write_checkpoint`` — no marker.  Callers that
    record lineage between the data landing and the marker landing (so
    marker-valid always implies lineage-recorded) use this +
    ``write_checkpoint_marker`` directly."""
    fmt = fmt or os.environ.get("SPARK_GRAFT_CHECKPOINT_FORMAT", "parquet")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "iceberg":
        w.format("iceberg").saveAsTable(_iceberg_ident(path))
        # the marker still lands as a local sidecar: checkpoint_valid()
        # drives the skip-if-valid resume for BOTH formats (without this
        # the iceberg path silently re-ran every stage every run)
        os.makedirs(path, exist_ok=True)
    else:
        w.parquet(path)


def write_checkpoint_marker(path: str, fingerprint: str) -> None:
    with open(_marker(path), "w") as f:
        json.dump({"fingerprint": fingerprint, "written_at": time.time()}, f)


def _iceberg_ident(path: str) -> str:
    """Map a checkpoint path to an Iceberg table identifier (the last two
    path components become namespace.table)."""
    parts = [p for p in path.replace("\\", "/").split("/") if p]
    safe = [p.replace("-", "_").replace(".", "_") for p in parts[-2:]]
    return ".".join(safe)


def read_checkpoint(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or os.environ.get("SPARK_GRAFT_CHECKPOINT_FORMAT", "parquet")
    if fmt == "iceberg":
        return spark.read.table(_iceberg_ident(path))
    return spark.read.parquet(path)


def partition_lineage(path: str) -> list[dict]:
    """Per-partition lineage for a checkpoint: one record per parquet
    file (relative path, row count, bytes) read from footer metadata —
    driver-side, no Spark job.

    This is the per-partition half of the north rule's "per-partition
    lineage + metrics" checkpoint contract (the stage-level half is
    metrics.jsonl): it records exactly which files a stage produced and
    how many rows each holds, so a resumed or audited run can verify a
    checkpoint file-by-file — the analog of kmcp's per-file `_info.txt`
    sidecars (`kmcp/cmd/compute.go:450-458`).  On Iceberg deployments
    the table's own manifest/snapshot metadata supersedes this.
    """
    import pyarrow.parquet as pq

    entries = []
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            if name.endswith(".parquet"):
                full = os.path.join(root, name)
                entries.append(
                    {
                        "file": os.path.relpath(full, path),
                        "rows": pq.ParquetFile(full).metadata.num_rows,
                        "bytes": os.path.getsize(full),
                    }
                )
    return entries


def checkpoint_rows(path: str) -> int:
    """Exact row count from parquet footers (driver-side, no Spark job).

    Stage metrics need rows_out, but a ``count()`` after every stage
    write is one whole extra job per stage — footer metadata gives the
    same number in milliseconds."""
    import pyarrow.parquet as pq

    total = 0
    # os.walk, not listdir: a checkpoint written with partition_by puts
    # its files in subdirectories — a flat listing would silently report
    # rows_out=0 for partitioned stages
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, name)).metadata.num_rows
    return total
