"""Streaming maintenance of the persistent sidecar indexes (MinHash dedup
index and IVF vector index).

Composes the X24 incremental index with Structured Streaming the same way
the tailer composes the lake merge (streaming/tailer.py): ``foreachBatch``
applies each micro-batch through ``MinHashDedupIndex.update`` keyed by the
micro-batch id. Exactly-once falls out of the two ledgers meeting:

- Structured Streaming re-executes a failed/restarted micro-batch with the
  SAME batch_id;
- ``update(epoch=batch_id)`` is a no-op for a committed epoch;

so every document is indexed exactly once across driver crashes, and its
near-dup pairs against the ENTIRE historical corpus are reported exactly
once — a live "is this new page a duplicate of anything we have ever
ingested" stream.

Scale posture: per batch the only text-touching work is the batch itself;
the band equi-join against the stored corpus is the X24 plan, with the
stored-first ``max_bucket`` cap available for mass-duplicated pages.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.dedup_index import MinHashDedupIndex

# Same motivation as tailer.STREAM_EPOCH_BASE: keep stream batch ids from
# colliding with batch-pipeline epoch ids when one index is fed by both.
STREAM_EPOCH_BASE = 1_000_000_000


class StreamingDedupIndexer:
    """``foreachBatch`` sink: index the doc stream, surface dup pairs.

    ``on_pairs(pairs_df, batch_id)`` (optional) receives each batch's
    MATERIALIZED pair frame — route it to a sink (parquet append, metrics,
    alerting). Skipped batches (restart re-delivery) produce no callback:
    their pairs were already delivered when the epoch first committed.
    """

    def __init__(
        self,
        index: MinHashDedupIndex,
        id_col: str = "url",
        text_col: str = "text",
        max_bucket: int | None = 50,
        on_pairs: Callable[[DataFrame, int], None] | None = None,
        epoch_base: int = STREAM_EPOCH_BASE,
    ):
        self.index = index
        self.id_col = id_col
        self.text_col = text_col
        self.max_bucket = max_bucket
        self.on_pairs = on_pairs
        self.epoch_base = epoch_base

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        epoch = self.epoch_base + int(batch_id)
        if epoch in self.index.committed_epochs():
            return  # restart re-delivery: already indexed + reported
        pairs = self.index.update(
            batch_df,
            id_col=self.id_col,
            text_col=self.text_col,
            epoch=epoch,
            max_bucket=self.max_bucket,
        )
        if self.on_pairs is not None:
            self.on_pairs(pairs, int(batch_id))

    def attach(self, stream_docs: DataFrame, checkpoint_dir: str):
        """Wire onto a streaming DataFrame of documents; returns the
        DataStreamWriter (caller picks the trigger and calls start())."""
        return (
            stream_docs.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
        )


class StreamingVectorIndexer:
    """``foreachBatch`` sink for an embedding stream: append each batch to
    the persistent IVF index (X25) with the micro-batch id as an
    exactly-once epoch, and optionally surface each batch's nearest
    neighbours among everything indexed BEFORE it.

    Same two-ledger construction as :class:`StreamingDedupIndexer`:
    stream-checkpoint re-delivery meets the index epoch ledger, so every
    vector is indexed exactly once across driver restarts. ``on_matches``
    fires after the epoch commits and probes with the just-committed epoch
    excluded (physically — its directory is skipped), so matches are
    against the strictly-prior corpus and, like the dedup indexer's pairs,
    are delivered at most once per batch.
    """

    def __init__(
        self,
        index,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 5,
        nprobe: int = 4,
        on_matches: Callable[[DataFrame, int], None] | None = None,
        epoch_base: int = STREAM_EPOCH_BASE,
    ):
        self.index = index
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k
        self.nprobe = nprobe
        self.on_matches = on_matches
        self.epoch_base = epoch_base

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        epoch = self.epoch_base + int(batch_id)
        if epoch in self.index.committed_epochs():
            return  # restart re-delivery: already indexed + reported
        self.index.add(
            batch_df, id_col=self.id_col, vec_col=self.vec_col, epoch=epoch
        )
        if self.on_matches is not None:
            matches = self.index.topk(
                batch_df,
                vec_col=self.vec_col,
                id_col=self.id_col,
                k=self.k,
                nprobe=self.nprobe,
                exclude_epochs=[epoch],
            )
            self.on_matches(matches, int(batch_id))

    def attach(self, stream_vectors: DataFrame, checkpoint_dir: str):
        """Wire onto a streaming DataFrame of (id, embedding) rows; returns
        the DataStreamWriter (caller picks the trigger and calls start())."""
        return (
            stream_vectors.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
        )


class StreamingSearchIndexer:
    """``foreachBatch`` sink for a document stream: maintain the persistent
    inverted index (operators/inverted_index.py) with the micro-batch id
    as an exactly-once epoch.

    Same two-ledger construction as the sibling indexers: Structured
    Streaming re-delivers a failed micro-batch under the SAME batch_id and
    ``InvertedIndex.update(epoch=batch_id)`` is a no-op for a committed
    epoch, so every document version is indexed exactly once across driver
    restarts. Because the index's doc ledger keys postings to each doc's
    LATEST epoch, a url re-shipped by the CDC stream atomically swaps its
    searchable terms when the batch commits — searches never see a blend
    of old and new versions.
    """

    def __init__(
        self,
        index,
        id_col: str = "url",
        text_col: str = "text",
        op_col: str | None = None,
        delete_value: str = "delete",
        order_cols: list[str] | None = None,
        epoch_base: int = STREAM_EPOCH_BASE,
    ):
        self.index = index
        self.id_col = id_col
        self.text_col = text_col
        self.op_col = op_col
        self.delete_value = delete_value
        self.order_cols = order_cols
        self.epoch_base = epoch_base

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if self.order_cols:
            # One micro-batch may carry several commits — several versions
            # of the same url. LWW-fold to the batch's winner per key (one
            # max_by hash agg, the engine's staging idiom) before indexing;
            # without the fold, postings would blend old and new text.
            payload = [self.text_col] + ([self.op_col] if self.op_col else [])
            batch_df = (
                batch_df.groupBy(self.id_col)
                .agg(
                    F.max_by(
                        F.struct(*payload), F.struct(*self.order_cols)
                    ).alias("_w")
                )
                .select(self.id_col, "_w.*")
            )
        deletes = None
        if self.op_col is not None:
            # Change-feed shape (e.g. spark.readStream.format
            # ("icelite_changes")): deletes ride the same micro-batch and
            # tombstone in the SAME index epoch — the search index follows
            # the lake table exactly-once, deletes included.
            # NULL op must mean upsert, not "matches neither side": a raw
            # `op != delete` predicate is NULL for NULL op and the row
            # silently vanishes from both legs.
            is_delete = F.coalesce(
                F.col(self.op_col) == self.delete_value, F.lit(False)
            )
            deletes = batch_df.where(is_delete).select(self.id_col)
            batch_df = batch_df.where(~is_delete)
        self.index.update(
            batch_df,
            id_col=self.id_col,
            text_col=self.text_col,
            epoch=self.epoch_base + int(batch_id),
            deletes=deletes,
        )

    def attach(self, stream_docs: DataFrame, checkpoint_dir: str):
        """Wire onto a streaming DataFrame of documents; returns the
        DataStreamWriter (caller picks the trigger and calls start())."""
        return (
            stream_docs.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
