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


def read_epoch(
    spark: SparkSession, log_dir: str, epoch: int, schema=None
) -> DataFrame:
    """Read exactly one epoch's events (partition-pruned scan).

    Pass ``schema`` (from a prior read) to skip per-epoch schema inference —
    one less Spark job per epoch in the replay loop. NOTE: an epoch that
    evolves the log schema must be read without it (the runner re-infers when
    the registry reports a version change).
    """
    reader = spark.read.option("basePath", log_dir)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(os.path.join(log_dir, f"epoch={epoch}")).where(
        F.col("epoch") == epoch
    )


def epoch_column_max(log_dir: str, epoch: int, column: str):
    """Max of ``column`` over one epoch from parquet FOOTER statistics —
    driver-side metadata read, no Spark job.

    The CDC analog of Iceberg manifest column stats: per-epoch facts like
    "highest schema_version seen" are answerable from file metadata in O(files)
    milliseconds instead of an O(rows) cluster scan. Returns None if the
    epoch/column is missing or any footer lacks stats (caller falls back to a
    Spark aggregate).
    """
    import pyarrow.parquet as pq

    epoch_dir = os.path.join(log_dir, f"epoch={epoch}")
    if not os.path.isdir(epoch_dir):
        return None
    best = None
    for fn in os.listdir(epoch_dir):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(epoch_dir, fn)).metadata
        schema_names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if column not in schema_names:
            return None
        idx = schema_names[column]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            if best is None or st.max > best:
                best = st.max
    return best


def read_log(spark: SparkSession, log_dir: str) -> DataFrame:
    """Read the whole log (for full replays / audits)."""
    return spark.read.parquet(log_dir)
