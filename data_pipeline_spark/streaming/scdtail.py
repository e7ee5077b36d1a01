"""Streaming maintenance of the SCD2 history store: ``readStream`` over the
epoch-partitioned changelog → per-micro-batch incremental fold.

The batch path (:meth:`lake.scdstore.Scd2Store.refresh`) walks epochs; this
expresses the same maintenance as a Structured Streaming query, mirroring
:class:`streaming.tailer.ChangeLogTailer`'s exactly-once composition:

- the stream checkpoint guarantees a failed micro-batch re-executes with
  the SAME ``batch_id``;
- the store's meta records the last applied ``stream_batch`` in the same
  atomic commit as the data, so the re-execution skips — each micro-batch
  folds exactly once across driver crashes;
- micro-batches need not align with log epochs: the fold is
  batching-invariant (``scd2_apply_batch`` fold-order property), so the
  final history equals the full-stream derivation however the source
  splits the files.

Late keys rebuild from the retained log (a batch read of the log dir at
fold time). That read can be FRESHER than the stream position — a late-key
rebuild may incorporate already-landed events the stream has not delivered
yet. This is benign and converges: the rebuilt rows are true history from
the same durable log, the key's high-water advances with them, and the
events' own micro-batch later re-folds as a no-op. Use one maintenance
mode per store (epoch refresh OR streaming tail); mixing both against one
state dir is not supported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..lake.scdstore import Scd2Store
from ..operators.scd import scd2_apply_batch, scd2_history, scd2_prune

import pyspark.sql.functions as F


class Scd2Tailer:
    def __init__(
        self,
        spark: SparkSession,
        log_dir: str,
        store: Scd2Store,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.log_dir = log_dir
        self.store = store
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger

    def _apply_batch(self, df: DataFrame, batch_id: int) -> None:
        store = self.store
        meta = store._meta()
        last = (meta.get("stream_batch") if meta else None)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already folded, skip
        batch = store._project(df)
        if meta is None:
            h = scd2_history(
                batch, store.key_cols, store.order_cols, store.tracked_cols,
                carry_order=True,
            )
        else:
            retained = store._project(
                self.spark.read.option("mergeSchema", "true").parquet(self.log_dir)
            )
            h = scd2_apply_batch(
                store.read(), batch, store.key_cols, store.order_cols,
                store.tracked_cols, full_events=retained,
            )
        cutoff = store.retention_cutoff
        if cutoff is not None:
            h = scd2_prune(h, F.to_timestamp(F.lit(cutoff)))
        version = (meta["version"] if meta else 0) + 1
        # stream ledger rides in the SAME atomic commit as the data — any
        # other _commit against this store (e.g. prune between batches)
        # carries it through, so the exactly-once stamp can't be lost.
        store._commit(
            h, epoch=meta["epoch"] if meta else -1, version=version,
            stream_batch=batch_id,
        )

    def run_available(self) -> None:
        """Drain everything currently in the log (``availableNow``), then
        stop — call again to pick up later arrivals (same checkpoint)."""
        # mergeSchema: a tracked column added mid-log must be visible in the
        # stream schema, or _project would null-fill it for EVERY event
        # (the batch path's refresh() already reads merged for this reason).
        schema = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(self.log_dir)
            .schema
        )
        reader = self.spark.readStream.schema(schema)
        if self.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.parquet(self.log_dir)
        q = (
            stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
