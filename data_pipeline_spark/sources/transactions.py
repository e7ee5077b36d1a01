"""Transaction-aligned epoch assignment — source-transaction atomicity on
top of the engine's per-epoch exactly-once commits.

Logical-decoding tails (Debezium exposes this as transaction metadata:
``transaction.id`` + BEGIN/END markers) deliver change events grouped by
source transaction. The engine's replay unit is the epoch (one idempotent
lake commit per epoch, streaming/runner.py) — so if a transaction's events
straddle an epoch boundary, a crash between the two commits exposes HALF
a source transaction to every downstream reader. The fix is at intake:
pick epoch boundaries that respect transaction boundaries.

``align_epochs`` assigns each transaction to an epoch such that

- a transaction is never split across epochs,
- transactions are packed in commit order (max event lsn) into epochs of
  ~``target_events`` events (an oversized transaction gets an epoch of
  its own rather than being split),

and does it scale-safely: the per-transaction fold is one hash
aggregation; the commit-order prefix sum runs as a two-pass distributed
scan (range partition by commit lsn → per-partition sums → O(partitions)
driver-side offsets → per-partition window), NEVER a single-partition
global window — the classic 10^10-row scan trap. Driver state is one
number per shuffle partition.

The reference has no transactions (HTTP snapshot fetches are the unit,
SURVEY.md §0); this is the WAL-native generalization its CDC reframing
calls for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def align_epochs(
    changes: DataFrame,
    tx_col: str = "tx_id",
    lsn_col: str = "lsn",
    target_events: int = 100_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``changes`` with an ``epoch`` column such that no value of
    ``tx_col`` spans two epochs and epochs hold ~``target_events`` events,
    packed in transaction-commit order (``max(lsn)`` per transaction,
    ties broken by ``tx_col``)."""
    spark = changes.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    tx = changes.groupBy(tx_col).agg(
        F.count("*").alias("_n"), F.max(lsn_col).alias("_commit_lsn")
    )
    # Distributed prefix sum over transactions in commit order.
    ranged = tx.repartitionByRange(
        num_partitions, F.col("_commit_lsn"), F.col(tx_col)
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=True)  # pin partitioning: both
    # passes below must see identical _pid assignments.
    # NULL tx/commit keys would silently vanish at the final inner equi-join
    # (NULL never equals NULL) — unquarantined data loss. Fail loudly; the
    # caller quarantines null-key events BEFORE alignment (split_poison /
    # ingest_job's DLQ). Probed on the already-checkpointed per-tx frame —
    # O(#transactions) at metadata cost, no second fold over the events.
    bad = ranged.where(
        F.col(tx_col).isNull() | F.col("_commit_lsn").isNull()
    ).count()
    if bad:
        raise ValueError(
            f"align_epochs: {bad} transaction group(s) with NULL {tx_col}/"
            f"{lsn_col} — quarantine null-key events before alignment"
        )
    part_sums = {
        r["_pid"]: r["_s"]
        for r in ranged.groupBy("_pid").agg(F.sum("_n").alias("_s")).collect()
    }  # O(num_partitions) driver-side — metadata scale.
    offsets, acc = {}, 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += part_sums.get(pid, 0)
    off_expr = F.element_at(
        F.create_map(
            *[x for pid in sorted(offsets) for x in (F.lit(pid), F.lit(offsets[pid]))]
        ),
        F.col("_pid"),
    )

    w = Window.partitionBy("_pid").orderBy("_commit_lsn", tx_col)
    assigned = ranged.withColumn(
        "_start", F.sum("_n").over(w) - F.col("_n") + off_expr
    ).withColumn("epoch", F.floor(F.col("_start") / F.lit(target_events)).cast("int"))

    return changes.join(
        assigned.select(tx_col, "epoch"), on=tx_col, how="inner"
    )


def check_alignment(with_epochs: DataFrame, tx_col: str = "tx_id") -> int:
    """Audit: number of transactions that straddle an epoch boundary
    (must be 0). One aggregation; use in tests/CI, not per-batch."""
    return (
        with_epochs.groupBy(tx_col)
        .agg(F.countDistinct("epoch").alias("_e"))
        .where(F.col("_e") > 1)
        .count()
    )
