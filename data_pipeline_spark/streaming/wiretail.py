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

Poison handling mirrors the batch DLQ with the SAME poison taxonomy as
``streaming/runner.py::split_poison`` (corrupt envelope, null key, null
lsn, unknown op — any of which would corrupt or crash the merge):
offenders dead-letter per micro-batch (keyed by batch id, overwrite ⇒
idempotent across re-execution) with a replayable ``raw`` payload — the
original wire line for corrupt envelopes, the parsed row re-serialized
as JSON otherwise. A poison message must never kill the tail or
silently vanish, so when no ``quarantine_dir`` is given the DLQ
defaults to ``<checkpoint_dir>/dlq`` instead of dropping rows.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..lake.table import LakeTable
from ..plans.registry import SchemaRegistry
from ..sources.debezium import parse_debezium
from .runner import (
    METRICS_KEEP,
    maybe_evolve,
    split_poison,
    stage_changes,
    write_dlq,
)

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
        corrupt = F.col("_corrupt").isNotNull()
        # Same taxonomy as the log tailer: a parsed-but-null-KEY event
        # would form a bogus null-key LWW group, an unknown op would
        # misclassify — both must dead-letter, not just corrupt/null-lsn.
        good, poison = split_poison(parsed.where(~corrupt), self.table.key_col)
        payload_cols = [c for c in parsed.columns if c != "_corrupt"]
        poison_all = (
            parsed.where(corrupt)
            .withColumn("_reason", F.lit("corrupt_envelope"))
            .unionByName(poison)
            # replayable DLQ record: the raw wire line when we have it,
            # else the parsed row re-serialized — never a NULL payload
            .select(
                F.coalesce(
                    F.col("_corrupt"), F.to_json(F.struct(*payload_cols))
                ).alias("raw"),
                "op", "lsn", "_reason",
            )
        )
        qdir = self.quarantine_dir or os.path.join(self.checkpoint_dir, "dlq")
        n_bad = write_dlq(poison_all, qdir, batch_id)
        good = good.drop("_corrupt", "source_ts")
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
        del self.batch_metrics[:-METRICS_KEEP]

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
