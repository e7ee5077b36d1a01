"""Structured Streaming change-log tailer: ``readStream`` → merge sink.

The batch :class:`~data_pipeline_spark.streaming.runner.ReplayRunner` drives
the epoch loop itself; this module expresses the same tail as a Structured
Streaming query — the idiomatic Spark form of the reference's paginated
fetch loop (/root/reference/src/fetcher/unified_fetcher.rs:130-224, where
"two consecutive empty pages" is end-of-tail): the stream source discovers
new log files, its checkpoint carries the offsets, and each micro-batch is
applied through the exact same staging pipeline + idempotent LakeTable merge.

Exactly-once composition (the textbook ``foreachBatch`` pattern):

- Structured Streaming's own checkpoint guarantees a failed micro-batch is
  *re-executed with the same batch_id*;
- :meth:`LakeTable.merge` keyed by that batch_id is idempotent (the commit
  ledger in snapshot summaries), so the re-execution is a structural no-op;
- therefore each change event lands in the table exactly once, end-to-end,
  even across driver crashes — the streaming analog of the ReplayRunner's
  epoch ledger.

Micro-batches need not align with log epochs: per-key (warc_ts, lsn) LWW
with persisted tombstones makes the final state independent of batching
(the epoch-batching-invariance property tested in tests/test_replay_e2e.py).

Watermarks are deliberately absent: LWW order resolves late/out-of-order
events deterministically without discarding anything (SURVEY.md §2.8), so
there is no state to GC — the merge is stateless across batches.

Scale posture: ``maxFilesPerTrigger`` bounds per-batch work; the merge's
bucket pruning bounds per-batch target I/O; MoR mode keeps commits O(batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..lake.table import LakeTable
from ..plans.registry import SchemaRegistry
from .runner import maybe_evolve, stage_changes

# Streaming batch ids and batch-replay epoch numbers share the LakeTable
# commit ledger; offsetting the stream's ids keeps the two id spaces from
# colliding when a table is fed by both paths.
STREAM_EPOCH_BASE = 1_000_000_000


class ChangeLogTailer:
    def __init__(
        self,
        spark: SparkSession,
        log_dir: str,
        table: LakeTable,
        checkpoint_dir: str,
        registry: SchemaRegistry | None = None,
        merge_mode: str = "mor",
        max_files_per_trigger: int | None = None,
        quarantine_dir: str | None = None,
    ):
        self.spark = spark
        self.log_dir = log_dir
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.registry = registry
        self.merge_mode = merge_mode
        self.max_files_per_trigger = max_files_per_trigger
        self.quarantine_dir = quarantine_dir
        self.batch_metrics: list[dict] = []

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # In-flight schema evolution, same rule as the batch path (a batch
        # has no epoch dir for footer stats, so this one uses the agg path).
        maybe_evolve(self.table, self.registry, batch_df)
        n_quarantined = 0
        if self.quarantine_dir is not None:
            # Same dead-letter convention as the batch runner; keyed by
            # batch id, overwrite => idempotent across batch re-execution.
            from .runner import split_poison, write_dlq

            good, poison = split_poison(batch_df, self.table.key_col)
            n_quarantined = write_dlq(poison, self.quarantine_dir, batch_id)
            batch_df = good
        staged = stage_changes(self.spark, batch_df, self.table)
        metrics = self.table.merge(
            staged,
            epoch=STREAM_EPOCH_BASE + batch_id,
            mode=self.merge_mode,
            extra_summary={"engine.stream-batch": batch_id},
        )
        self.batch_metrics.append(
            {"batch_id": batch_id, "quarantined": n_quarantined, **metrics}
        )
        # ring buffer: a 24/7 tail must not leak one dict per batch forever
        from .runner import METRICS_KEEP

        del self.batch_metrics[:-METRICS_KEEP]

    def _source(self) -> DataFrame:
        # Schema from a one-time static read: streaming parquet sources
        # require an explicit schema.
        schema = self.spark.read.parquet(self.log_dir).schema
        reader = self.spark.readStream.schema(schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        # basePath keeps the epoch partition column visible to the stream.
        return reader.option("basePath", self.log_dir).parquet(
            os.path.join(self.log_dir, "epoch=*")
        )

    def run_available(self) -> list[dict]:
        """Process the whole backlog (Trigger.AvailableNow), then stop —
        the streaming equivalent of one ReplayRunner.run(). Restarting after
        a crash resumes from the stream checkpoint; already-merged batches
        re-apply as no-ops."""
        q = (
            self._source()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.batch_metrics

    def start(self):
        """Continuous tail (default micro-batch trigger) — returns the
        StreamingQuery; caller owns its lifecycle."""
        return (
            self._source()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )
