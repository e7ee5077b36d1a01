"""Structured-Streaming change feed over the icelite lake table, as a
PySpark 4 Python DataSource (``spark.readStream.format("icelite_changes")``).

The table's snapshot log becomes a streaming source: offsets are snapshot
ids on MAIN's lineage, each micro-batch carries the rows the next
merge commit(s) staged — logical columns plus ``op`` (upsert/delete),
``lsn``, and ``_commit_snapshot_id`` (the shape of
:meth:`LakeTable.read_changes`). Spark's checkpointed offset tracking makes
delivery exactly-once across restarts: downstream gets every committed
epoch once, in commit order, without running the tailer that produced it.

Semantics and scale posture:

- Only ``merge`` commits emit (compaction, bloom/stats builds, rescales and
  rollbacks are physical or corrective — their file deltas are not logical
  change batches). Run the table merge-on-read if consumers need exact
  increments: a CoW merge rewrites whole buckets, so its file delta
  over-approximates the logical delta (same caveat as ``read_changes``).
- WAP-branch commits are invisible until ``fast_forward`` splices them into
  main's lineage — the stream emits on publish, which is exactly the
  audit-then-release contract.
- The reader is a ``SimpleDataSourceStreamReader``: it runs driver-side in
  a Spark-less Python worker, reading table metadata (pure-JSON functions
  shared with :class:`LakeTable`) and the delta parquet files via pyarrow.
  That is feed-scale machinery — per-batch volume is one epoch's staged
  rows, already bounded by the ingest's epoch sizing — not a bulk-scan
  path. Bulk consumers (backfills, replica bootstraps) should use
  ``read_changes``/``change_feed``/``TableSync``, which stay fully
  distributed; cap a catch-up burst with ``maxSnapshotsPerBatch``.
- An offset that is no longer on main's lineage (expired history, or a
  rollback the stream had already read past) raises rather than silently
  re-reading the world — the same expired-cursor contract as
  ``read_changes``.

Usage::

    from data_pipeline_spark.lake.cdf_stream import register_changes_source
    register_changes_source(spark)
    feed = (spark.readStream.format("icelite_changes")
            .option("path", table_dir)
            .option("start", "earliest")          # or "latest"
            .option("maxSnapshotsPerBatch", "1")  # bound catch-up bursts
            .load())                              # (default: unlimited)

Rollback interaction: a rollback commit inside an unread span simply
retracts the not-yet-delivered rows it reverts; a rollback PAST the
consumer's cursor raises (delivered changes cannot be un-delivered on an
append feed) — the consumer must re-bootstrap, mirroring ``read_changes``'s
expired-cursor contract.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .table import DELETED_COL, LSN_COL, load_table_meta, manifest_files

FORMAT_NAME = "icelite_changes"
# Snapshot operations whose file delta is a logical change batch: CoW and
# MoR merges, generic MERGE INTO, and blind appends. Physical/corrective
# commits (compact, build-blooms, rescale, purge, rollback, evolve-schema)
# carry no new logical rows — or, for rollback, rows the stream already
# delivered.
_EMITTING_OPS = {"merge", "merge-mor", "merge-into", "append"}


def _logical_schema(meta: dict) -> StructType:
    return StructType.fromJson(meta["schemas"][str(meta["current_schema_id"])])


def _feed_schema(meta: dict) -> StructType:
    return StructType(
        list(_logical_schema(meta).fields)
        + [
            StructField("op", StringType(), False),
            StructField("lsn", LongType(), True),
            StructField("_commit_snapshot_id", LongType(), False),
        ]
    )


def _main_lineage(meta: dict) -> list[dict]:
    """Main's snapshot chain, oldest first (the log interleaves branch
    commits; offsets must never walk those until they are published)."""
    by_id = {s["snapshot_id"]: s for s in meta["snapshots"]}
    chain = []
    sid = meta.get("current_snapshot_id")
    while sid is not None:
        snap = by_id.get(sid)
        if snap is None:
            break  # expired tail of the chain
        chain.append(snap)
        sid = snap.get("parent_id")
    chain.reverse()
    return chain


class _ChangesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self.start = options.get("start", "earliest")
        if self.start not in ("earliest", "latest"):
            raise ValueError("option start must be 'earliest' or 'latest'")
        raw = options.get("maxsnapshotsperbatch")
        self.max_snapshots = int(raw) if raw is not None else None
        if self.max_snapshots is not None and self.max_snapshots < 1:
            raise ValueError("maxSnapshotsPerBatch must be >= 1")

    def initialOffset(self) -> dict:
        if self.start == "latest":
            cur = load_table_meta(self.path).get("current_snapshot_id")
            return {"snapshot_id": cur or 0}
        return {"snapshot_id": 0}

    def _pending(self, meta: dict, after: int) -> list[dict]:
        chain = _main_lineage(meta)
        ids = {s["snapshot_id"] for s in chain}
        if after != 0 and after not in ids:
            raise ValueError(
                f"stream offset snapshot {after} is not on main's lineage "
                f"(history expired or rolled back past the cursor); "
                f"re-bootstrap the consumer"
            )
        return [s for s in chain if s["snapshot_id"] > after]

    def _rows_of(self, meta: dict, snap: dict, parent: dict | None) -> Iterator[Tuple]:
        if snap.get("summary", {}).get("operation") not in _EMITTING_OPS:
            return
        import pyarrow.parquet as pq

        have = {f["path"] for f in manifest_files(self.path, parent)}
        cols = [f.name for f in _logical_schema(meta).fields]
        sid = snap["snapshot_id"]
        for f in manifest_files(self.path, snap):
            if f["path"] in have:
                continue
            tbl = pq.read_table(os.path.join(self.path, f["path"]))
            names = set(tbl.column_names)
            for rec in tbl.to_pylist():
                op = "delete" if rec.get(DELETED_COL) else "upsert"
                yield tuple(
                    [rec.get(c) if c in names else None for c in cols]
                    + [op, rec.get(LSN_COL), sid]
                )

    def _span_rows(self, meta: dict, pending: list[dict], after: int) -> list:
        """Rows for a span of main-lineage commits, processed in order.

        A rollback commit in the span retracts: rows this same span staged
        for commits newer than the rollback target are dropped before
        delivery (the consumer never sees them). If the CURSOR has already
        passed the target — earlier batches delivered commits the rollback
        reverts — an append feed cannot compensate, so raise and make the
        consumer re-bootstrap (bounded maxSnapshotsPerBatch catch-up can
        widen this window; the unlimited default minimizes it).
        """
        rows: list = []
        by_id = {s["snapshot_id"]: s for s in meta["snapshots"]}
        for snap in pending:
            if snap.get("summary", {}).get("operation") == "rollback":
                target = int(snap["summary"]["rollback-to"])
                if target < after:
                    raise ValueError(
                        f"table was rolled back to snapshot {target}, older "
                        f"than the stream cursor {after}; delivered changes "
                        f"were reverted — re-bootstrap the consumer"
                    )
                rows = [r for r in rows if r[-1] <= target]
                continue
            parent = by_id.get(snap.get("parent_id"))
            rows.extend(self._rows_of(meta, snap, parent))
        return rows

    def _read_span(self, after: int, limit: int | None) -> Tuple[list, int]:
        meta = load_table_meta(self.path)
        pending = self._pending(meta, after)
        if limit is not None:
            pending = pending[:limit]
        rows = self._span_rows(meta, pending, after)
        new_offset = pending[-1]["snapshot_id"] if pending else after
        return rows, new_offset

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        rows, end = self._read_span(start["snapshot_id"], self.max_snapshots)
        return iter(rows), {"snapshot_id": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # Replay for recovery: deterministic — a given closed span always
        # reproduces the same rows (commits are immutable; a rollback past
        # a consumed offset raises instead of rewriting delivered history).
        meta = load_table_meta(self.path)
        after = start["snapshot_id"]
        pending = [
            s for s in self._pending(meta, after)
            if s["snapshot_id"] <= end["snapshot_id"]
        ]
        yield from self._span_rows(meta, pending, after)


class IceliteChangesDataSource(DataSource):
    """``spark.readStream.format("icelite_changes").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return _feed_schema(load_table_meta(self.options["path"]))

    def simpleStreamReader(self, schema: StructType) -> _ChangesStreamReader:
        return _ChangesStreamReader(self.options)


def register_changes_source(spark) -> None:
    spark.dataSource.register(IceliteChangesDataSource)
