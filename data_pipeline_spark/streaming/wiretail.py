"""Structured Streaming tail of a Debezium landing zone → the lake.

``jobs/ingest_job.py`` is the batch form (landing zone → epoch log →
replay); this is the live form: ``readStream.text`` discovers new wire
files as the connector drops them, each micro-batch parses with the
native envelope decoder and applies through the SAME staging pipeline +
idempotent merge as every other ingestion mode (one implementation —
the modes cannot drift).

Exactly-once is the standard composition (see streaming/tailer.py): the
stream checkpoint re-executes a failed batch with the same batch_id, and
the merge keyed by that id is a structural no-op on re-execution.

Poison handling mirrors the batch DLQ: unparseable envelopes and events
with no lsn dead-letter per micro-batch (keyed by batch id, overwrite ⇒
idempotent across re-execution) — a poison message must never kill the
tail or silently vanish.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..lake.table import LakeTable
from ..plans.registry import SchemaRegistry
from ..sources.debezium import parse_debezium
from .runner import maybe_evolve, stage_changes

# Distinct id space from ChangeLogTailer's STREAM_EPOCH_BASE so one table
# fed by a log tail AND a wire tail cannot collide in the epoch ledger.
WIRE_EPOCH_BASE = 2_000_000_000


class WireTailer:
    def __init__(
        self,
        spark: SparkSession,
        wire_dir: str,
        row_ddl: str,
        table: LakeTable,
        checkpoint_dir: str,
        registry: SchemaRegistry | None = None,
        merge_mode: str = "mor",
        max_files_per_trigger: int | None = None,
        quarantine_dir: str | None = None,
    ):
        self.spark = spark
        self.wire_dir = wire_dir
        self.row_ddl = row_ddl
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.registry = registry
        self.merge_mode = merge_mode
        self.max_files_per_trigger = max_files_per_trigger
        self.quarantine_dir = quarantine_dir
        self.batch_metrics: list[dict] = []

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        parsed = parse_debezium(batch_df, self.row_ddl, keep_corrupt=True)
        bad_pred = F.col("_corrupt").isNotNull() | F.col("lsn").isNull()
        n_bad = 0
        if self.quarantine_dir is not None:
            from pyspark.sql import Observation

            bad = parsed.where(bad_pred).select(
                F.col("_corrupt").alias("raw"), "op", "lsn",
                F.when(F.col("_corrupt").isNotNull(), F.lit("corrupt_envelope"))
                .otherwise(F.lit("null_lsn")).alias("_reason"),
            )
            qobs = Observation()
            bad.observe(qobs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(os.path.join(self.quarantine_dir, f"batch={batch_id}"))
            n_bad = int(qobs.get["n"])
        good = parsed.where(~bad_pred).drop("_corrupt", "source_ts")
        maybe_evolve(self.table, self.registry, good)
        staged = stage_changes(self.spark, good, self.table)
        metrics = self.table.merge(
            staged,
            epoch=WIRE_EPOCH_BASE + batch_id,
            mode=self.merge_mode,
            extra_summary={"engine.wire-batch": batch_id},
        )
        self.batch_metrics.append(
            {"batch_id": batch_id, "quarantined": n_bad, **metrics}
        )

    def _source(self) -> DataFrame:
        reader = self.spark.readStream
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.text(self.wire_dir)

    def run_available(self) -> list[dict]:
        """Drain the landing-zone backlog (Trigger.AvailableNow) and stop;
        restart resumes from the stream checkpoint, merged batches skip."""
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
        """Continuous tail; caller owns the StreamingQuery lifecycle."""
        return (
            self._source()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )
