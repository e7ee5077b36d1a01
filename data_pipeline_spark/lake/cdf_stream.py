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
retracts the not-yet-delivered rows it reverts; a rollback past a commit
this consumer already DELIVERED raises (changes cannot be un-delivered on
an append feed) — the consumer must re-bootstrap, mirroring
``read_changes``'s expired-cursor contract.

Purge interaction (takedown): a purge commit emits synthetic erasure
deletes (op='delete', lsn and payload null) for exactly the keys it
physically removed — derived from the commit's file delta, since the purge
summary deliberately records no identifiers — so streaming replicas drop
the purged keys instead of serving them forever. Erasure deletes are
unconditional (not LWW events): fold them as deletes regardless of lsn.

Bootstrap after history expiry: a fresh earliest stream emits the oldest
live snapshot's FULL state first (whatever its operation — after expiry
the chain may root at a compact), then increments.
"""

from __future__ import annotations

import os
import sys
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .metautil import (
    DELETED_COL,
    LSN_COL,
    load_table_meta,
    main_lineage,
    manifest_files,
)

FORMAT_NAME = "icelite_changes"
# Snapshot operations whose file delta is a logical change batch: CoW and
# MoR merges, generic MERGE INTO, and blind appends. Physical commits
# (compact, build-blooms, rescale, evolve-schema) carry no new logical
# rows; rollback and purge get dedicated handling in _span_rows.
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


class _ChangesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.path = options["path"]
        self.start = options.get("start", "earliest")
        if self.start not in ("earliest", "latest"):
            raise ValueError("option start must be 'earliest' or 'latest'")
        raw = options.get("maxsnapshotsperbatch")
        self.max_snapshots = int(raw) if raw is not None else None
        if self.max_snapshots is not None and self.max_snapshots < 1:
            raise ValueError("maxSnapshotsPerBatch must be >= 1")
        # Logical columns pinned at STREAM START (the declared schema minus
        # the three feed columns): if the table's schema evolves while the
        # stream runs, rows keep the declared arity — new columns appear
        # after a stream restart, dropped columns read as null — and
        # readBetweenOffsets replay stays deterministic.
        self.cols = [f.name for f in schema.fields[:-3]]
        self.key_col = load_table_meta(self.path)["key_col"]

    def initialOffset(self) -> dict:
        # "base" records where this consumer ATTACHED: rollback-safety must
        # only consider commits actually delivered, i.e. in (base, cursor].
        if self.start == "latest":
            cur = load_table_meta(self.path).get("current_snapshot_id") or 0
            return {"snapshot_id": cur, "base": cur}
        return {"snapshot_id": 0, "base": 0}

    def _pending(self, meta: dict, after: int) -> list[dict]:
        chain = main_lineage(meta)
        ids = {s["snapshot_id"] for s in chain}
        if after != 0 and after not in ids:
            raise ValueError(
                f"stream offset snapshot {after} is not on main's lineage "
                f"(history expired or rolled back past the cursor); "
                f"re-bootstrap the consumer"
            )
        return [s for s in chain if s["snapshot_id"] > after]

    def _files(self, snap: dict | None, cache: dict) -> list[dict]:
        if snap is None:
            return []
        sid = snap["snapshot_id"]
        if sid not in cache:
            cache[sid] = manifest_files(self.path, snap)
        return cache[sid]

    def _rows_of(
        self, snap: dict, parent: dict | None, cache: dict, force: bool = False
    ) -> Iterator[Tuple]:
        if not force and (
            snap.get("summary", {}).get("operation") not in _EMITTING_OPS
        ):
            return
        import pyarrow.parquet as pq

        have = {f["path"] for f in self._files(parent, cache)}
        sid = snap["snapshot_id"]
        for f in self._files(snap, cache):
            if f["path"] in have:
                continue
            tbl = pq.read_table(os.path.join(self.path, f["path"]))
            names = set(tbl.column_names)
            for rec in tbl.to_pylist():
                op = "delete" if rec.get(DELETED_COL) else "upsert"
                yield tuple(
                    [rec.get(c) if c in names else None for c in self.cols]
                    + [op, rec.get(LSN_COL), sid]
                )

    def _purged_keys(
        self, snap: dict, parent: dict | None, cache: dict
    ) -> set:
        """Keys a purge commit physically removed, derived from its file
        delta: keys present in the replaced files but absent from their
        rewrites. The purge summary deliberately records only counts —
        persisting the purged identifiers in table metadata would itself
        retain what the takedown erased — so the delta is the only (and a
        sufficient) source. Column-pruned reads: only the key column."""
        import pyarrow.parquet as pq

        snap_paths = {f["path"] for f in self._files(snap, cache)}
        parent_files = self._files(parent, cache)
        replaced = [f for f in parent_files if f["path"] not in snap_paths]
        parent_paths = {f["path"] for f in parent_files}
        added = [
            f for f in self._files(snap, cache) if f["path"] not in parent_paths
        ]

        def keys_of(files):
            out = set()
            for f in files:
                t = pq.read_table(
                    os.path.join(self.path, f["path"]), columns=[self.key_col]
                )
                out.update(t.column(0).to_pylist())
            return out

        return keys_of(replaced) - keys_of(added)

    def _span_rows(self, meta: dict, pending: list[dict], after: int, base: int) -> list:
        """Rows for a span of main-lineage commits, processed in order.

        - Bootstrap: with no cursor (after==0) the first live snapshot
          emits its FULL state regardless of operation — after history
          expiry the chain may root at a compact/rollback commit, and its
          manifest IS the base state a fresh consumer needs.
        - Rollback: retracts this span's rows for commits newer than the
          target; raises re-bootstrap only if a commit actually DELIVERED
          to this consumer (an emitting — or bootstrap — snapshot in
          (base, after]) is newer than the target.
        - Purge: emits synthetic erasure deletes for the purged keys
          (op='delete', lsn null, payload null) and retracts any of this
          span's earlier rows for those keys, so replicas converge on the
          takedown instead of serving purged bytes forever.
        """
        rows: list = []
        by_id = {s["snapshot_id"]: s for s in meta["snapshots"]}
        chain = main_lineage(meta)
        delivered = [
            s["snapshot_id"]
            for i, s in enumerate(chain)
            if base < s["snapshot_id"] <= after
            and (
                s.get("summary", {}).get("operation") in _EMITTING_OPS
                or (i == 0 and base == 0)  # forced bootstrap emission
            )
        ]
        delivered_max = max(delivered, default=0)
        key_i = self.cols.index(self.key_col)
        cache: dict = {}
        for n, snap in enumerate(pending):
            op = snap.get("summary", {}).get("operation")
            sid = snap["snapshot_id"]
            if n == 0 and after == 0:
                rows.extend(self._rows_of(snap, None, cache, force=True))
                continue
            if op == "rollback":
                target = int(snap["summary"]["rollback-to"])
                if target < delivered_max:
                    raise ValueError(
                        f"table was rolled back to snapshot {target}, older "
                        f"than delivered commit {delivered_max}; delivered "
                        f"changes were reverted — re-bootstrap the consumer"
                    )
                rows = [r for r in rows if r[-1] <= target]
                continue
            if op == "purge":
                purged = self._purged_keys(
                    snap, by_id.get(snap.get("parent_id")), cache
                )
                rows = [r for r in rows if r[key_i] not in purged]
                blank = [None] * len(self.cols)
                for k in sorted(purged):
                    t = list(blank)
                    t[key_i] = k
                    rows.append(tuple(t + ["delete", None, sid]))
                continue
            rows.extend(self._rows_of(snap, by_id.get(snap.get("parent_id")), cache))
        return rows

    def _read_span(
        self, after: int, limit: int | None, base: int = 0
    ) -> Tuple[list, int]:
        meta = load_table_meta(self.path)
        pending = self._pending(meta, after)
        if limit is not None:
            pending = pending[:limit]
        rows = self._span_rows(meta, pending, after, base)
        new_offset = pending[-1]["snapshot_id"] if pending else after
        return rows, new_offset

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        base = start.get("base", 0)
        rows, end = self._read_span(start["snapshot_id"], self.max_snapshots, base)
        return iter(rows), {"snapshot_id": end, "base": base}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # Replay for recovery: deterministic — a given closed span always
        # reproduces the same rows (commits are immutable; a rollback past
        # a delivered offset raises instead of rewriting history).
        meta = load_table_meta(self.path)
        after = start["snapshot_id"]
        pending = [
            s for s in self._pending(meta, after)
            if s["snapshot_id"] <= end["snapshot_id"]
        ]
        yield from self._span_rows(meta, pending, after, start.get("base", 0))


class IceliteChangesDataSource(DataSource):
    """``spark.readStream.format("icelite_changes").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return _feed_schema(load_table_meta(self.options["path"]))

    def simpleStreamReader(self, schema: StructType) -> _ChangesStreamReader:
        return _ChangesStreamReader(schema, self.options)


def register_changes_source(spark) -> None:
    """Register the source on the session.

    The DataSource class is shipped to Spark's data-source Python worker
    by pickle, and that worker does NOT inherit ``--py-files``/
    ``addPyFile`` paths (unlike UDF workers) — so the module (and the
    table-metadata helpers it calls) must serialize BY VALUE, not by
    module reference, or spark-submit runs die with ModuleNotFoundError
    in plan_data_source. Registration is scoped to exactly this module
    and the dependency-free lake.metautil: ``register_pickle_by_value``
    is process-global and permanent, and covering lake.table with it
    would change how EVERY pickle in the session that captures table
    objects serializes (payload bloat; by-value class copies failing
    isinstance/except checks against by-reference imports).
    """
    from pyspark import cloudpickle

    from . import metautil as _metautil

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(_metautil)
    spark.dataSource.register(IceliteChangesDataSource)
