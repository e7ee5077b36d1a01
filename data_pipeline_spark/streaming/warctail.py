"""Structured Streaming tail of a crawl segment landing zone → the lake.

``jobs/ingest_job.py --warc-dir`` is the batch bootstrap (segments →
epoch log → replay); this is the live form: the registered ``warc``
stream source (sources/warc_source.py) discovers new ``.warc[.gz]``
segments as the crawler drops them, and each micro-batch runs the SAME
bridge (``warc_to_change_events``) and staging pipeline + idempotent
merge as every other ingestion mode — one implementation, the modes
cannot drift. Mirrors streaming/wiretail.py's WireTailer for the Debezium
landing zone.

Exactly-once is the standard composition (streaming/tailer.py): the
stream checkpoint re-executes a failed batch with the same batch_id, and
the merge keyed by ``WARC_EPOCH_BASE + batch_id`` is a structural no-op
on re-execution. The epoch-id space is disjoint from the log tailer's and
the wire tailer's, so one table fed by all three cannot collide in the
exactly-once ledger.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..lake.table import LakeTable
from ..plans.registry import SchemaRegistry
from ..sources.warc import resolve_revisits, warc_to_change_events
from ..sources.warc_source import register_warc_source
from .runner import stage_changes

WARC_EPOCH_BASE = 3_000_000_000


class WarcTailer:
    def __init__(
        self,
        spark: SparkSession,
        warc_dir: str,
        table: LakeTable,
        checkpoint_dir: str,
        registry: SchemaRegistry | None = None,
        merge_mode: str = "mor",
        lang: str = "en",
        normalize_charset: bool = False,
        revisits: bool = False,
    ):
        """``revisits``: resolve payload-less revisit records against the
        responses OF THE SAME micro-batch (crawlers emit the original
        before its revisits, and a batch is whole files); cross-batch
        orphans stay body-less and the LWW merge keeps the stored body."""
        self.spark = spark
        self.warc_dir = warc_dir
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.registry = registry
        self.merge_mode = merge_mode
        self.lang = lang
        self.normalize_charset = normalize_charset
        self.revisits = revisits
        self.batch_metrics: list[dict] = []
        register_warc_source(spark)

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        recs = resolve_revisits(batch_df) if self.revisits else batch_df
        events = warc_to_change_events(
            recs, epoch=0, lang=self.lang,
            normalize_charset=self.normalize_charset,
        ).drop("epoch")
        staged = stage_changes(self.spark, events, self.table)
        metrics = self.table.merge(
            staged,
            epoch=WARC_EPOCH_BASE + batch_id,
            mode=self.merge_mode,
            extra_summary={"engine.warc-batch": batch_id},
        )
        self.batch_metrics.append({"batch_id": batch_id, **metrics})

    def _source(self) -> DataFrame:
        return self.spark.readStream.format("warc").option(
            "path", self.warc_dir
        ).load()

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
