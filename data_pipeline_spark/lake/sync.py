"""Lake→lake incremental sync: CDC replication of one icelite table into
another, optionally filtered and transformed — a materialized view whose
maintenance cost is O(changes), not O(table).

This is the consumer story the row-level change feed (X30) exists for: at
10^10 rows a derived table (an English-only slice, a projection for a
downstream team, a redacted copy) cannot be recomputed per refresh.
`TableSync.refresh()`:

1. finds its cursor — the last source snapshot it applied — from the
   TARGET's own commit summaries (``sync.source-snapshot``), so the cursor
   and the data advance in the SAME atomic commit: a crash between commits
   re-reads an empty interval and no-ops (exactly-once without a ledger);
2. reads ``source.change_feed(cursor)`` — net per-key changes, manifest-
   diff bucket-pruned on the source side;
3. routes each changed key: source delete → target delete; post-image
   failing the predicate → target delete (the row LEFT the view — the case
   naive filter-then-upsert replication silently corrupts); post-image
   passing → transform → upsert;
4. applies them with the target's LWW merge (MoR by default: commit cost
   O(changes)), stamping the source snapshot id as the LSN tiebreak so
   re-applied intervals and out-of-order refreshes stay deterministic.

``refresh(rebuild=True)`` — or an expired cursor surfaced as
``ValueError`` — falls back to ONE full declarative MERGE (X29) with a
``WHEN NOT MATCHED BY SOURCE DELETE`` clause, converging the target from
any state (including rows a bug or manual write left behind).

Reference parity: the reference pipeline re-reads its whole store per run
(`/root/reference/src/bin/*.rs` full-table rewrites); incremental derived
tables are engine surface the north rule's derived-table story needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .table import LakeTable

CURSOR_KEY = "sync.source-snapshot"
# Tag pinned to the latest sync commit so target snapshot expiry never
# GC's the cursor-bearing snapshot.
CURSOR_TAG = "sync-cursor"


class TableSync:
    def __init__(
        self,
        source: LakeTable,
        target: LakeTable,
        transform=None,
        predicate: Column | str | None = None,
    ):
        if source.key_col != target.key_col:
            raise ValueError(
                f"source key {source.key_col!r} != target key {target.key_col!r}"
            )
        src_cols = {f.name for f in source.schema.fields}
        if target.order_col not in src_cols:
            raise ValueError(
                f"target order col {target.order_col!r} must exist in the "
                "source schema (delete routing needs it)"
            )
        self.source = source
        self.target = target
        self.transform = transform
        self.predicate = F.expr(predicate) if isinstance(predicate, str) else predicate

    # -- cursor ------------------------------------------------------------------

    def cursor(self) -> int | None:
        """Last applied source snapshot id, from the target's history.

        The latest sync commit is additionally pinned with a target tag
        (``sync-cursor``) so snapshot expiry on the target can never GC
        the cursor-bearing commit. Raises if the target has history but no
        cursor anywhere (e.g. the tag was dropped and expiry swept the
        sync commits): silently treating that as "never synced" would
        re-apply the source as inserts-only and leave deleted keys behind
        in the replica forever.
        """
        for snap in reversed(self.target.history()):
            v = snap.get("summary", {}).get(CURSOR_KEY)
            if v is not None:
                return int(v)
        if self.target.snapshot() is not None:
            raise ValueError(
                "target has snapshots but no sync cursor (expired or "
                "foreign table); run refresh(rebuild=True) to converge"
            )
        return None

    # -- refresh -----------------------------------------------------------------

    def _post_to_staged(self, post: DataFrame, deletes: DataFrame) -> DataFrame:
        """post-image rows (insert/update_postimage) + delete keys → the
        staged op-frame the target's LWW merge consumes."""
        key = self.source.key_col
        order = self.target.order_col
        if self.predicate is not None:
            moved_out = post.where(~F.coalesce(self.predicate, F.lit(False)))
            post = post.where(F.coalesce(self.predicate, F.lit(False)))
            deletes = deletes.unionByName(
                moved_out.select(key, order), allowMissingColumns=False
            )
        if self.transform is not None:
            post = self.transform(post)
            if key not in post.columns:
                raise ValueError(f"transform dropped the key column {key!r}")
            if order not in post.columns:
                raise ValueError(f"transform dropped the order column {order!r}")
        tgt_cols = [f.name for f in self.target.schema.fields]
        ups = post.select(
            *[
                (F.col(c) if c in post.columns else F.lit(None)).alias(c)
                for c in tgt_cols
            ]
        ).withColumn("op", F.lit("upsert"))
        dels = deletes.select(
            *[
                (F.col(c) if c in deletes.columns else F.lit(None)).alias(c)
                for c in tgt_cols
            ]
        ).withColumn("op", F.lit("delete"))
        return ups.unionByName(dels)

    def refresh(self, rebuild: bool = False, mode: str = "cow") -> dict:
        """Advance the target to the source's current snapshot.

        Returns the merge result plus ``{"synced_to": <snapshot id>}``; an
        interval with no logical changes (e.g. source compaction) still
        advances the cursor with an empty commit. ``rebuild=True`` (use
        after an expired-cursor ``ValueError``) converges via one full
        MERGE with by-source deletes instead of the change feed.

        Ordering: ``mode="cow"`` (default) applies changes in SOURCE
        COMMIT order — each refresh's rows beat every earlier refresh's
        via the stamped snapshot-id LSN with a constant event-time, so the
        target replays exactly the source's snapshot sequence (correct
        even if the source GC'd tombstones and a key was re-inserted with
        an older event time). ``mode="mor"`` keeps commits O(changes) but
        scan-time resolution orders by the target's event-time column —
        the same LWW contract as the source's own replay; use it when
        per-key event times are monotone (the normal CDC case).
        """
        src_snap = self.source.snapshot()
        to_id = src_snap["snapshot_id"] if src_snap else None
        cur = None if rebuild else self.cursor()
        if to_id is None or (not rebuild and cur == to_id):
            return {"skipped": True, "synced_to": cur, "reason": "no new snapshot"}

        key = self.source.key_col
        order = self.target.order_col
        if rebuild:
            full = self.source.read(snapshot_id=to_id)
            if self.predicate is not None:
                full = full.where(F.coalesce(self.predicate, F.lit(False)))
            if self.transform is not None:
                full = self.transform(full)
            res = (
                self.target.merge_builder(full, on=[key])
                .when_matched_update()
                .when_not_matched_insert()
                .when_not_matched_by_source_delete()
                .execute(extra_summary={CURSOR_KEY: to_id}, lsn=to_id)
            )
            self.target.tag(CURSOR_TAG)
            return {**res, "synced_to": to_id, "rebuilt": True}

        # The staged frame references the change feed several times (post
        # images, source deletes, predicate-exit deletes); persist the
        # feed so the snapshot-diff join runs once, not once per branch.
        feed = self.source.change_feed(cur, to_id).persist()
        try:
            post = feed.where(
                F.col("_change_type").isin("insert", "update_postimage")
            ).drop("_change_type", "_commit_snapshot_id")
            dels = feed.where(F.col("_change_type") == "delete").select(key, order)
            staged = self._post_to_staged(post, dels).withColumn(
                "__sync_lsn", F.lit(to_id).cast("long")
            )
            res = self.target.merge(
                staged,
                op_col="op",
                # cow: ts_col names a column absent from the staged frame,
                # so the merge orders purely by (__sync_lsn, __src) =
                # source commit order; mor: order by the real event-time
                # column (scan-time resolution uses it anyway).
                ts_col="__sync_commit_order" if mode == "cow" else order,
                lsn_col="__sync_lsn",
                mode=mode,
                extra_summary={CURSOR_KEY: to_id},
            )
        finally:
            feed.unpersist()
        self.target.tag(CURSOR_TAG)
        return {**res, "synced_to": to_id}


class StreamingTableSync:
    """Continuous lake→lake sync: Structured Streaming drives
    :meth:`TableSync.refresh` on a processing-time trigger.

    The streamed rows are only a clock (a ``rate`` source); state lives
    entirely in the tables — the cursor is the target's own commit summary,
    so exactly-once survives driver restarts WITHOUT depending on the
    stream checkpoint: a re-fired trigger sees an already-advanced cursor
    and no-ops. This mirrors how ``streaming/indexing.py`` composes
    incremental operators with ``foreachBatch``.
    """

    def __init__(self, sync: TableSync, mode: str = "cow", keep_results: int = 100):
        import collections

        self.sync = sync
        self.mode = mode
        # Bounded: an always-on 1s trigger would otherwise leak one dict
        # per tick on the driver for the stream's lifetime.
        self.results: collections.deque = collections.deque(maxlen=keep_results)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # The source is typically written by another process (the replay
        # job); re-read its metadata each tick so new snapshots are seen.
        self.sync.source.refresh()
        res = self.sync.refresh(mode=self.mode)
        self.results.append(res)

    def start(
        self,
        checkpoint_dir: str,
        interval: str = "1 second",
        rows_per_second: int = 1,
    ):
        spark = self.sync.source.spark
        clock = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )
        return (
            clock.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=interval)
            .start()
        )
