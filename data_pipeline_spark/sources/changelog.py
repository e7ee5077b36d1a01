"""Change-event log: epoch-partitioned parquet directory (the WAL).

The reference lands raw JSON snapshots under timestamped object keys and
replays "the newest file" (/root/reference/src/storage/minio_client.rs:121-143,
:205-268). The engine generalizes that to a real change log: an append-only,
``epoch=N/``-partitioned parquet directory. Epochs are the commit/replay unit;
partition pruning makes "read one epoch" an O(epoch) scan regardless of log
size (SURVEY.md S1/S8/S11).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CHANGE_COLUMNS = ["op", "url", "lsn", "warc_ts", "html", "lang", "schema_version"]


def write_log(df: DataFrame, log_dir: str, mode: str = "append") -> None:
    """Append change events (must carry an ``epoch`` column) to the log.

    Maps to S8 (raw JSON sink, minio_client.rs:121-143) — but partitioned by
    epoch so replay prunes, instead of list-and-sort-keys.
    """
    df.write.mode(mode).partitionBy("epoch").parquet(log_dir)


def list_epochs(spark: SparkSession, log_dir: str) -> list[int]:
    """Enumerate epochs present in the log (directory listing — metadata
    only, like the reference's list_objects at minio_client.rs:205-221,
    but deterministic ascending replay order instead of newest-first)."""
    if not os.path.isdir(log_dir):
        return []
    epochs = []
    for entry in os.listdir(log_dir):
        if entry.startswith("epoch="):
            try:
                epochs.append(int(entry.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(epochs)


def read_epoch(spark: SparkSession, log_dir: str, epoch: int) -> DataFrame:
    """Read exactly one epoch's events (partition-pruned scan)."""
    return (
        spark.read.option("basePath", log_dir)
        .parquet(os.path.join(log_dir, f"epoch={epoch}"))
        .where(F.col("epoch") == epoch)
    )


def read_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """Read the whole log (for full replays / audits)."""
    return spark.read.parquet(log_dir)
