"""LakeTable: an Iceberg-style table with atomic, idempotent snapshot commits.

The reference "commits" by writing a whole new timestamped parquet object and
treating the newest key as current (/root/reference/src/storage/minio_client.rs:
121-166, 219-228) — at-least-once, whole-snapshot replacement. This module
implements the real thing the north_star asks for, against plain
parquet + JSON metadata ("icelite") so it runs in this sandbox; the API is a
drop-in for Iceberg (`MERGE INTO`-equivalent, snapshot log, summary
properties, time travel, schema evolution) when the runtime jar is available.

Layout::

    table_dir/
      metadata/
        v{N}.metadata.json    # full table metadata at version N (immutable)
        version-hint.text     # current N; updated via tmp + atomic rename
      data/
        commit-{snapshot}/bucket=K/part-*.parquet

Metadata carries: schemas (versioned), current schema id, key column, bucket
count, and the snapshot list; each snapshot lists its data files
``{path, bucket, schema_id}`` plus a summary dict (including
``engine.epoch`` — the idempotency key: re-applying a committed epoch is a
structural no-op).

Scale posture:

- Data files are hash-bucketed by key (``pmod(xxhash64(url), n_buckets)``) —
  the icelite analog of Iceberg's ``bucket(N, url)`` hidden partitioning.
  A merge touches only buckets containing changed keys, so per-epoch work is
  O(epoch ∩ buckets), not O(table).
- Commits never move data: a snapshot is a file *list*; commit = write one
  JSON + two renames. Crash between steps leaves either the old version
  current (safe) or an orphan metadata file (harmless).
- Reads align old-schema files to the current schema (missing column → null,
  retyped column → cast) — Iceberg-style resolve-at-scan evolution.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.skew import with_salt

from .metautil import (  # noqa: F401 — canonical home; re-exported for callers
    DELETED_COL,
    LSN_COL,
    load_table_meta,
    main_lineage,
    manifest_files,
)

BUCKET_COL = "__bucket"
# LSN_COL/DELETED_COL (imported above; defined in lake/metautil.py so the
# Spark-less stream reader shares them): system columns persisted in data
# files but outside the logical schema — the icelite analog of Iceberg
# metadata columns. They carry the LWW order (__lsn) and merge-on-read
# delete markers (__deleted tombstones), which is what makes replay
# independent of epoch batching: a later epoch carrying an *older*
# (warc_ts, lsn) event can never clobber a newer stored row, and a winning
# delete stays deleted even if an older event for the key arrives in a
# later epoch.
_TS_FLOOR = "1900-01-01 00:00:00"


class CommitConflictError(RuntimeError):
    """Another writer advanced the table since this handle loaded metadata.

    The icelite analog of Iceberg's optimistic-concurrency commit failure:
    a real catalog does an atomic compare-and-swap on the metadata pointer;
    here we detect the stale handle before mutating and refuse, so a commit
    can never resurrect snapshots another handle expired (their data files
    are already gone). Callers should ``refresh()`` and retry.
    """


def _stat_json(v):
    """Parquet-footer stat → JSON-comparable scalar. Timestamps become
    epoch micros (both the stored stat AND read-time filter bounds go
    through this, so comparisons live in one space regardless of the
    session timezone convention)."""
    import datetime as dt

    if isinstance(v, bytes):
        v = v.decode("utf-8", "replace")
    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, dt.date):
        return v.toordinal()
    if isinstance(v, bool):
        return None  # min/max pruning on booleans is pointless
    if isinstance(v, (str, int, float)):
        return v
    return None


def _range_overlaps(file_rec: dict, col: str, lo, hi) -> bool:
    """File-level range pruning: keep the file unless its recorded
    [min, max] for ``col`` is provably disjoint from [lo, hi] (either
    bound may be None = open). Files without stats are kept."""
    stats = file_rec.get("stats", {}).get(col)
    if not stats:
        return True
    fmin, fmax = stats
    if lo is not None and fmax < lo:
        return False
    if hi is not None and fmin > hi:
        return False
    return True


def _may_contain(file_rec: dict, key) -> bool:
    """Manifest-level data skipping for one file: key min/max range first
    (prunes across buckets), then the per-file Bloom filter if the file has
    one (prunes across commits WITHIN a bucket, where hash-distributed keys
    make min/max useless — see lake/bloom.py). Files lacking stats are
    conservatively kept."""
    if "key_min" in file_rec and not (
        file_rec["key_min"] <= key <= file_rec["key_max"]
    ):
        return False
    if "bloom" in file_rec:
        from .bloom import might_contain

        if not might_contain(file_rec["bloom"], key):
            return False
    return True


def _null_count_from_footer(path: str, col: str) -> int | None:
    """Driver-side null count of one column from the parquet footer;
    None when any row group lacks the statistic (callers must treat
    unknown as 'may have nulls')."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col not in idx:
            return None
        total = 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or st.null_count is None:
                return None
            total += st.null_count
        return total
    except Exception:  # noqa: BLE001 — stats are an optimization, never fatal
        return None


def _row_count_from_footer(path: str) -> int | None:
    """Exact row count from the parquet footer (Iceberg's per-file
    record_count) — driver-local metadata, no Spark job."""
    try:
        import pyarrow.parquet as pq

        return int(pq.ParquetFile(path).metadata.num_rows)
    except Exception:  # noqa: BLE001 — metadata is an optimization, never fatal
        return None


def _atomic_write(path: str, content: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(content)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX


# load_table_meta / main_lineage / manifest_files live in lake/metautil.py
# (imported above) so the Spark-less stream reader shares them by value.


class LakeTable:
    """Single-writer lake table. All mutation goes through ``_commit``."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta
        self._manifest_cache: dict[int, list[dict]] = {}
        # Content-addressed manifest segments are immutable, so this cache
        # is shared across snapshots (CDF's two-snapshot diff loads common
        # segments once). Entries describe the FILE (path, stats, bloom),
        # not the snapshot, so sharing entry dicts between snapshots that
        # reference the same data file is correct by construction.
        self._segment_cache: dict[str, list[dict]] = {}

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: StructType,
        key_col: str = "url",
        n_buckets: int = 16,
        order_col: str = "warc_ts",
        stats_cols: list[str] | None = None,
    ) -> "LakeTable":
        """CREATE TABLE IF NOT EXISTS semantics (S13). ``order_col`` is the
        event-time column of the LWW order (tie-broken by ``__lsn``).

        ``stats_cols`` get per-file min/max recorded in the manifest at
        commit time (Iceberg column stats) so :meth:`read` can prune whole
        files for range predicates; defaults to ``[order_col]`` — the
        event-time dimension every CDC lake is range-queried on."""
        if os.path.exists(os.path.join(path, "metadata", "version-hint.text")):
            return cls.load(spark, path)
        os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        if stats_cols is None:
            stats_cols = [order_col] if any(
                f.name == order_col for f in schema.fields
            ) else []
        meta = {
            "format_version": 1,
            "table_uuid": uuid.uuid4().hex,
            "key_col": key_col,
            "n_buckets": n_buckets,
            "bucket_specs": {"1": n_buckets},
            "current_spec_id": 1,
            "order_col": order_col,
            "stats_cols": stats_cols,
            "schemas": {"1": json.loads(schema.json())},
            "current_schema_id": 1,
            "snapshots": [],
            "current_snapshot_id": None,
            "version": 0,
        }
        tbl = cls(spark, path, meta)
        tbl._write_version(0)
        return tbl

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        return cls(spark, path, load_table_meta(path))

    def refresh(self) -> None:
        """Re-read metadata from disk (pick up another handle's commits)."""
        self.meta = LakeTable.load(self.spark, self.path).meta
        self._manifest_cache.clear()
        self._segment_cache.clear()

    def _assert_current(self) -> None:
        hint = os.path.join(self.path, "metadata", "version-hint.text")
        if not os.path.exists(hint):
            return
        with open(hint, encoding="utf-8") as f:
            disk = int(f.read().strip())
        if disk != self.meta["version"]:
            raise CommitConflictError(
                f"table at {self.path} is at version {disk} on disk but this "
                f"handle holds version {self.meta['version']}; refresh() and retry"
            )

    # How many past v{N}.metadata.json files to retain. Every commit writes
    # a full metadata document, so an unbounded history is O(commits^2)
    # metadata bytes at 10^5 commits; old versions serve only catalog-less
    # forensics (all table function — snapshots, time travel, refs — lives
    # in the CURRENT document). The Iceberg analog is
    # write.metadata.delete-after-commit.enabled + previous-versions-max.
    METADATA_KEEP = 50

    def _write_version(self, version: int) -> None:
        self.meta["version"] = version
        meta_path = os.path.join(self.path, "metadata", f"v{version}.metadata.json")
        _atomic_write(meta_path, json.dumps(self.meta, indent=1))
        _atomic_write(
            os.path.join(self.path, "metadata", "version-hint.text"), str(version)
        )
        # Trim expired version files, walking down from the retention edge
        # until the first gap — steady state deletes exactly one file per
        # commit, a table predating retention catches up on its first
        # commit, and the directory is never listed.
        v = version - self.METADATA_KEEP
        while v >= 0:
            old = os.path.join(self.path, "metadata", f"v{v}.metadata.json")
            if not os.path.exists(old):
                break
            os.remove(old)
            v -= 1

    # -- schema ----------------------------------------------------------------

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(self.meta["schemas"][str(self.meta["current_schema_id"])])

    @property
    def key_col(self) -> str:
        return self.meta["key_col"]

    @property
    def n_buckets(self) -> int:
        return self.bucket_spec(self.current_spec_id)

    @property
    def current_spec_id(self) -> int:
        return self.meta.get("current_spec_id", 1)

    def bucket_spec(self, spec_id: int) -> int:
        """Bucket count of a partition spec (pre-evolution metadata has a
        single implicit spec 1 = ``n_buckets``)."""
        specs = self.meta.get("bucket_specs")
        if specs is None:
            return self.meta["n_buckets"]
        return specs[str(spec_id)]

    def rescale_buckets(self, new_n_buckets: int) -> int:
        """Partition-spec evolution (the Iceberg bucket-rescale analog): new
        writes hash into ``new_n_buckets`` buckets; EXISTING data files are
        untouched and keep their original spec id — a metadata-only change,
        no data rewrite, which is the only affordable way to re-bucket a
        10^10-row table whose key space outgrew its bucket count.

        Mixed-spec reads stay correct because bucket pruning is per-file
        spec-aware (see :meth:`_split_by_buckets`): files under a
        non-current spec are conservatively scanned until :meth:`compact`
        rewrites them under the current spec (any compaction — full or
        partial — migrates every legacy file it selects, and
        :meth:`dirty_buckets` reports legacy files as dirty so periodic
        maintenance converges the table to one spec)."""
        self._assert_current()
        if new_n_buckets < 1:
            raise ValueError("new_n_buckets must be >= 1")
        specs = self.meta.setdefault(
            "bucket_specs", {"1": self.meta["n_buckets"]}
        )
        new_id = max(int(s) for s in specs) + 1
        specs[str(new_id)] = new_n_buckets
        self.meta["current_spec_id"] = new_id
        # kept in sync for old readers / debugging dumps
        self.meta["n_buckets"] = new_n_buckets
        self._write_version(self.meta["version"] + 1)
        return new_id

    @staticmethod
    def _spec_of(f: dict) -> int:
        return f.get("spec_id", 1)

    def _split_by_buckets(
        self, files: list[dict], buckets: list[int] | None
    ) -> tuple[list[dict], list[dict]]:
        """(selected, excluded) for a CURRENT-spec bucket-id prune.

        A file written under a different spec hashes keys into a different
        bucket count, so its id is not comparable — it is conservatively
        SELECTED (pruning is an optimization, never a correctness filter).
        Rewrite paths (merge, compact) must carry exactly the excluded
        list, never recompute it by bucket id."""
        if buckets is None:
            return list(files), []
        bset = set(buckets)
        cur = self.current_spec_id
        sel, exc = [], []
        for f in files:
            (sel if self._spec_of(f) != cur or f["bucket"] in bset else exc).append(f)
        return sel, exc

    @property
    def order_col(self) -> str:
        return self.meta.get("order_col", "warc_ts")

    def schema_for(self, schema_id: int) -> StructType:
        return StructType.fromJson(self.meta["schemas"][str(schema_id)])

    def evolve(self, new_schema: StructType, summary: dict | None = None) -> int:
        """Register a new schema version and make it current (ALTER TABLE).

        Existing data files keep their schema_id; reads resolve at scan:
        added column → null, dropped column → not selected, retyped column →
        cast. Mirrors the registry-driven evolution the north_star requires
        (reference analog: FieldClassifier's canonical mapping,
        /root/reference/src/processor/field_classifier.rs:196-232).
        """
        new_id = max(int(k) for k in self.meta["schemas"]) + 1
        self.meta["schemas"][str(new_id)] = json.loads(new_schema.json())
        self.meta["current_schema_id"] = new_id
        self._commit(
            files=self.files_of(self._current_snapshot()),
            summary={"operation": "evolve-schema", **(summary or {})},
        )
        return new_id

    # -- snapshots ---------------------------------------------------------------

    def _current_snapshot(self) -> dict | None:
        sid = self.meta["current_snapshot_id"]
        if sid is None:
            return None
        return next(s for s in self.meta["snapshots"] if s["snapshot_id"] == sid)

    def snapshot(self, snapshot_id: int | None = None) -> dict | None:
        if snapshot_id is None:
            return self._current_snapshot()
        return next(
            (s for s in self.meta["snapshots"] if s["snapshot_id"] == snapshot_id), None
        )

    def commit_with_retry(self, fn, attempts: int = 3):
        """Optimistic-concurrency retry loop for multi-writer tables.

        ``fn(table)`` performs one commit operation (a merge / append /
        compact / merge_builder execute). If another writer advanced the
        table since this handle loaded metadata, the commit refuses with
        :class:`CommitConflictError`; this helper ``refresh()``-es and
        re-runs ``fn`` against the new head — the Iceberg commit loop.
        Safe to re-run because every commit path either recomputes from
        the (now refreshed) current state or no-ops via the epoch ledger.
        """
        last: Exception | None = None
        for i in range(attempts):
            try:
                return fn(self)
            except CommitConflictError as e:
                last = e
                self.refresh()
        raise last

    def snapshot_as_of(self, timestamp_ms: int) -> dict | None:
        """Latest snapshot committed at or before ``timestamp_ms`` (the
        ``FOR SYSTEM_TIME AS OF`` analog). Returns None if the table had no
        snapshot yet at that time. Expired snapshots are gone from history,
        so an as-of older than the retention window resolves to None —
        callers distinguish "empty table then" from "history expired" via
        the oldest live snapshot's timestamp."""
        # Follow MAIN's lineage only: meta['snapshots'] also holds
        # branch-staged (write-audit-publish) commits, and time travel must
        # never resolve to staged, unpublished — possibly audit-failed —
        # state. Branch state is read explicitly via read(ref=...).
        lineage = main_lineage(self.meta)
        best = None
        for s in lineage:
            if s.get("timestamp_ms", 0) <= timestamp_ms and (
                best is None or s["snapshot_id"] > best["snapshot_id"]
            ):
                best = s
        return best

    def read_as_of(self, timestamp_ms: int, **kwargs) -> DataFrame:
        """Time travel by wall-clock commit time; kwargs pass to
        :meth:`read`."""
        snap = self.snapshot_as_of(timestamp_ms)
        if snap is None:
            return self._read_files([]).drop(LSN_COL, DELETED_COL)
        return self.read(snapshot_id=snap["snapshot_id"], **kwargs)

    def history(self) -> list[dict]:
        return list(self.meta["snapshots"])

    def committed_epochs(self) -> set[int]:
        """Epochs recorded in snapshot summaries — the exactly-once ledger."""
        out = set()
        for s in self.meta["snapshots"]:
            e = s["summary"].get("engine.epoch")
            if e is not None:
                out.add(int(e))
        return out

    # -- refs (named snapshots) ------------------------------------------------

    def tag(self, name: str, snapshot_id: int | None = None) -> None:
        """Pin a name to a snapshot (Iceberg tag): reproducible reads
        ("the snapshot we trained run X on") that survive snapshot expiry —
        ``expire_snapshots`` never drops a tagged snapshot."""
        self._assert_current()
        sid = snapshot_id if snapshot_id is not None else self.meta["current_snapshot_id"]
        if self.snapshot(sid) is None:
            raise ValueError(f"cannot tag unknown snapshot {sid}")
        self.meta.setdefault("refs", {})[name] = sid
        self._write_version(self.meta["version"] + 1)

    def drop_tag(self, name: str) -> None:
        self._assert_current()
        refs = self.meta.get("refs", {})
        if name in refs:
            del refs[name]
            self._write_version(self.meta["version"] + 1)

    def ref(self, name: str) -> int:
        """Resolve a name to a snapshot id — tags first, then branch heads
        (so ``read(ref="audit")`` reads a branch's staged state)."""
        refs = self.meta.get("refs", {})
        if name in refs:
            return refs[name]
        branches = self.meta.get("branches", {})
        if name in branches:
            return branches[name]
        raise ValueError(
            f"unknown ref {name!r}; have tags {sorted(refs)}, "
            f"branches {sorted(branches)}"
        )

    def rollback_to(
        self, snapshot_id: int | None = None, ref: str | None = None
    ) -> dict:
        """Restore an earlier snapshot's STATE as a NEW commit (Iceberg
        ``rollback_to_snapshot``): the bad commits stay in history (time
        travel and forensics keep working, ``expire_snapshots`` eventually
        reclaims their files), readers atomically flip to the restored
        state, and the change feed across the rollback commit emits the
        reverse deltas — so downstream sync replicas (lake/sync.py) heal
        themselves on their next refresh.

        The exactly-once epoch ledger spans the WHOLE snapshot log, rolled
        back commits included: replaying an epoch whose effects were rolled
        back still skips. Rollback is a state-repair hatch, not an undo of
        ingestion — re-ingest corrected data under a new epoch, or better,
        stage suspect epochs on a WAP branch and audit before publish.
        """
        if (snapshot_id is None) == (ref is None):
            raise ValueError("pass exactly one of snapshot_id or ref")
        if ref is not None:
            snapshot_id = self.ref(ref)
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise ValueError(f"cannot roll back to unknown snapshot {snapshot_id}")
        # Iceberg semantics: the target must be an ANCESTOR of current.
        # Restoring a branch-staged snapshot would splice unpublished state
        # into main outside the audited fast_forward path (and break the
        # streaming feed's lineage-ordered retraction).
        if snapshot_id not in {s["snapshot_id"] for s in main_lineage(self.meta)}:
            raise ValueError(
                f"snapshot {snapshot_id} is not on main's lineage; rollback "
                f"targets must be ancestors of the current snapshot "
                f"(publish branches via fast_forward, not rollback)"
            )
        return self._commit(
            list(self.files_of(snap)),
            {"operation": "rollback", "rollback-to": snapshot_id},
            needs_resolve=bool(snap.get("needs_resolve")),
        )

    # -- branches (write-audit-publish) -----------------------------------------

    def create_branch(self, name: str, at: int | None = None) -> int:
        """Start a branch at a snapshot (default: current) — the Iceberg
        write-audit-publish pattern: stage epoch commits on the branch
        (``merge(..., branch=name)``), audit them via ``read(ref=name)``,
        then :meth:`fast_forward` to publish. Readers of main never see
        unaudited data; an audit failure is ``drop_branch`` + GC, touching
        nothing published."""
        self._assert_current()
        sid = at if at is not None else self.meta["current_snapshot_id"]
        if sid is not None and self.snapshot(sid) is None:
            raise ValueError(f"cannot branch from unknown snapshot {sid}")
        branches = self.meta.setdefault("branches", {})
        if name in branches or name in self.meta.get("refs", {}):
            raise ValueError(f"ref {name!r} already exists")
        branches[name] = sid
        self._write_version(self.meta["version"] + 1)
        return sid

    def drop_branch(self, name: str) -> None:
        """Abandon a branch (its snapshots become expirable history)."""
        self._assert_current()
        branches = self.meta.get("branches", {})
        if name in branches:
            del branches[name]
            self._write_version(self.meta["version"] + 1)

    def fast_forward(self, name: str) -> int:
        """Publish a branch: point main at the branch head. Requires main's
        current snapshot to be an ANCESTOR of the head (pure fast-forward —
        nothing main already serves is rewritten); a diverged branch (main
        advanced since the fork) must be re-staged, not force-published.

        The ancestry check walks parent ids, so publish (or drop) branches
        before aggressive ``expire_snapshots`` — a broken chain refuses
        (safely) rather than force-publishing."""
        self._assert_current()
        head = self.meta.get("branches", {}).get(name)
        if head is None:
            raise ValueError(f"unknown branch {name!r}")
        cur = self.meta["current_snapshot_id"]
        node = head
        while True:
            if node == cur:  # includes cur=None: every chain roots at None
                self.meta["current_snapshot_id"] = head
                del self.meta["branches"][name]
                self._write_version(self.meta["version"] + 1)
                return head
            if node is None:
                break
            snap = self.snapshot(node)
            node = snap["parent_id"] if snap else None
        raise ValueError(
            f"branch {name!r} (head {head}) does not descend from main's "
            f"current snapshot {cur}: diverged — re-stage on a fresh branch"
        )

    def files_of(self, snap: dict | None) -> list[dict]:
        """A snapshot's data-file list, from its manifest.

        File lists live OUTSIDE the table metadata (one
        ``metadata/manifest-{snapshot_id}.json`` per snapshot), and since
        format 2 that manifest is a *manifest list* of content-addressed
        per-(spec, bucket) SEGMENT files (``metadata/seg-{digest}.json``) —
        the icelite analog of Iceberg's manifest-list → shared-manifest
        layout. A commit that touches k of B buckets rewrites k segments
        plus one small manifest list; the untouched buckets' segments hash
        identically and are referenced, not rewritten, so per-commit
        metadata WRITE volume is O(touched files + B), not O(total files).
        (Canonicalizing + hashing the file list is still O(total files) of
        driver CPU per commit — microseconds per thousand files — but the
        write/PUT volume, the thing that hurts against an object store at
        10^6-file scale, is O(touched).)

        Reads both older formats: a flat JSON list manifest (format 1) and
        ``files`` inline in the snapshot (pre-manifest tables).
        """
        if snap is None:
            return []
        if "files" in snap:
            return snap["files"]
        sid = snap["snapshot_id"]
        cached = self._manifest_cache.get(sid)
        if cached is not None:
            return cached
        files = manifest_files(self.path, snap, load_segment=self._load_segment)
        self._manifest_cache[sid] = files
        return files

    def _manifest_doc(self, snap: dict):
        """A snapshot's raw manifest document: a format-2 manifest list
        (dict) or a legacy flat file list (see also module-level
        ``manifest_files``, the shared entry-list loader)."""
        with open(os.path.join(self.path, snap["manifest"]), encoding="utf-8") as f:
            return json.load(f)

    def _load_segment(self, rel: str) -> list[dict]:
        cached = self._segment_cache.get(rel)
        if cached is None:
            with open(os.path.join(self.path, rel), encoding="utf-8") as f:
                cached = json.load(f)
            self._segment_cache[rel] = cached
        return cached

    def _segments_of(self, snap: dict) -> list[str]:
        """Segment paths a snapshot's manifest list references ([] for the
        flat/inline legacy formats)."""
        if "manifest" not in snap or not os.path.exists(
            os.path.join(self.path, snap["manifest"])
        ):
            return []
        doc = self._manifest_doc(snap)
        if isinstance(doc, dict):
            return [seg["path"] for seg in doc["segments"]]
        return []

    def _write_manifest(self, files: list[dict], manifest_rel: str) -> None:
        """Write ``files`` as a manifest list of content-addressed segments,
        one per (spec_id, bucket), each sorted by path so a group's bytes —
        and therefore its digest and segment file — are identical across
        commits whenever its entries are. Two racing writers producing the
        same group content write the same segment path atomically, so
        content addressing is also concurrency-safe for free."""
        groups: dict[tuple, list[dict]] = {}
        for f in files:
            groups.setdefault((f.get("spec_id", 1), f["bucket"]), []).append(f)
        segments = []
        for (spec_id, bucket) in sorted(groups):
            entries = sorted(groups[(spec_id, bucket)], key=lambda e: e["path"])
            payload = json.dumps(entries, sort_keys=True)
            digest = hashlib.sha256(payload.encode("utf-8")).hexdigest()[:20]
            rel = f"metadata/seg-{digest}.json"
            full = os.path.join(self.path, rel)
            if not os.path.exists(full):
                _atomic_write(full, payload)
            else:
                # Refresh mtime on reuse: the orphan sweep's grace window
                # protects in-flight commits by modification time, and a
                # reused segment may be an old crash-orphan whose stale
                # mtime would otherwise let the sweep delete it between
                # this write and the metadata-pointer commit.
                os.utime(full)
            self._segment_cache.setdefault(rel, entries)
            segments.append(
                {"path": rel, "spec_id": spec_id, "bucket": bucket,
                 "n_files": len(entries)}
            )
        _atomic_write(
            os.path.join(self.path, manifest_rel),
            json.dumps({"format": 2, "segments": segments}),
        )

    def _next_snapshot_id(self) -> int:
        """Globally unique next id: with branches (WAP), main and a branch
        interleave commits, so parent+1 would collide (and overwrite a
        commit-N data dir)."""
        return max(
            (s["snapshot_id"] for s in self.meta["snapshots"]), default=0
        ) + 1

    def _head(self, branch: str | None) -> dict | None:
        """The snapshot a commit builds on: main's current, or the branch
        head. A branch forked at the empty state has head id None — that is
        an EMPTY head, not "fall through to main's current" (snapshot(None)
        would do exactly that)."""
        if branch is None:
            return self._current_snapshot()
        sid = self.meta.get("branches", {})[branch]
        return None if sid is None else self.snapshot(sid)

    def _commit(
        self,
        files: list[dict],
        summary: dict,
        needs_resolve: bool | None = None,
        branch: str | None = None,
    ) -> dict:
        self._assert_current()
        parent_snap = self._head(branch)
        parent = parent_snap["snapshot_id"] if parent_snap else None
        if needs_resolve is None:
            # Carry the parent's state: a commit that neither appends
            # multi-version rows (MoR) nor collapses them (compact) cannot
            # change whether scan-time LWW resolution is required.
            needs_resolve = bool(parent_snap and parent_snap.get("needs_resolve"))
        snapshot_id = self._next_snapshot_id()
        manifest_rel = f"metadata/manifest-{snapshot_id}.json"
        # Segments first, manifest list second, metadata pointer last: a
        # crash between any two leaves orphan segment/manifest files
        # (harmless, GC'd by remove_orphan_files), never a dangling pointer.
        self._write_manifest(files, manifest_rel)
        snap = {
            "snapshot_id": snapshot_id,
            "parent_id": parent,
            "schema_id": self.meta["current_schema_id"],
            "timestamp_ms": int(time.time() * 1000),
            "summary": {k: str(v) for k, v in summary.items()},
            "needs_resolve": needs_resolve,
            "manifest": manifest_rel,
            "n_files": len(files),
        }
        self._manifest_cache[snapshot_id] = files
        self.meta["snapshots"].append(snap)
        if branch is None:
            self.meta["current_snapshot_id"] = snapshot_id
        else:
            self.meta["branches"][branch] = snapshot_id
        self._write_version(self.meta["version"] + 1)
        return snap

    # -- read ---------------------------------------------------------------------

    def _align(self, df: DataFrame, target: StructType) -> DataFrame:
        """Project/cast a file-schema DataFrame onto the target schema."""
        cols = []
        have = {f.name: f for f in df.schema.fields}
        for f in target.fields:
            if f.name in have:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    @staticmethod
    def _with_system(schema: StructType) -> StructType:
        from pyspark.sql.types import BooleanType, LongType, StructField

        return StructType(
            list(schema.fields)
            + [
                StructField(LSN_COL, LongType(), True),
                StructField(DELETED_COL, BooleanType(), True),
            ]
        )

    def read(
        self,
        snapshot_id: int | None = None,
        buckets: list[int] | None = None,
        with_system: bool = False,
        key_equals=None,
        ref: str | None = None,
        range_filters: dict | None = None,
        resolve: bool = False,
    ) -> DataFrame:
        """Scan the table (optionally time-traveled / bucket-pruned).

        Files are grouped by schema_id; each group is read with its stored
        schema and aligned to the *current* schema, then unioned — the
        icelite version of Iceberg's scan-time schema resolution.

        ``with_system=True`` (merge-internal) keeps the ``__lsn``/
        ``__deleted`` metadata columns and the tombstone rows; the default
        user scan filters tombstones and hides system columns.

        ``key_equals`` additionally skips files whose manifest key min/max
        range excludes the value (Iceberg-style data skipping; every
        version of a key lives in files whose range contains it, so MoR
        LWW resolution stays correct on the pruned set). Files predating
        the stats (or non-string keys) are conservatively kept.

        ``range_filters`` is ``{col: (lo, hi)}`` over the table's
        ``stats_cols`` (either bound may be None): files whose recorded
        min/max is disjoint from the range are skipped, and the predicate
        is ALSO applied row-level (inclusive bounds), so kept-but-
        conservative files never leak out-of-range rows. CAUTION with MoR
        range scans: pruning drops a key's out-of-range VERSIONS before
        scan-time LWW resolution, so the per-key winner is the winner
        WITHIN the range (range-local semantics — for global-winner-then-
        filter semantics, read() then filter).
        """
        if ref is not None:
            if snapshot_id is not None:
                raise ValueError("pass either snapshot_id or ref, not both")
            snapshot_id = self.ref(ref)
        snap = self.snapshot(snapshot_id)
        snap_files = self.files_of(snap)
        if buckets is not None:
            snap_files, _ = self._split_by_buckets(snap_files, buckets)
        if key_equals is not None:
            snap_files = [f for f in snap_files if _may_contain(f, key_equals)]
        if range_filters:
            for col, (lo, hi) in range_filters.items():
                jlo, jhi = _stat_json(lo), _stat_json(hi)
                snap_files = [
                    f for f in snap_files if _range_overlaps(f, col, jlo, jhi)
                ]
        out = self._read_files(snap_files)
        if range_filters:
            # Row-level twin of the file pruning (inclusive bounds) — kept
            # files may straddle the range.
            for col, (lo, hi) in range_filters.items():
                if lo is not None:
                    out = out.where(F.col(col) >= F.lit(lo))
                if hi is not None:
                    out = out.where(F.col(col) <= F.lit(hi))
        if with_system:
            # resolve=True: collapse MoR multi-versions to per-key winners
            # while KEEPING the system columns — consumers that diff or
            # stamp against stored state (reconcile_snapshot) need winners,
            # not every superseded version; merge internals pass False and
            # handle versions themselves.
            if resolve and snap is not None and snap.get("needs_resolve"):
                out = self._resolve(out)
            return out
        if snap is not None and snap.get("needs_resolve"):
            out = self._resolve(out)
        return out.where(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        ).drop(LSN_COL, DELETED_COL)

    def _read_files(self, files: list[dict]) -> DataFrame:
        """Read a data-file list, grouping by schema_id and aligning each
        group to the current schema (scan-time schema resolution)."""
        target = self._with_system(self.schema)
        if not files:
            return self.spark.createDataFrame([], target)
        by_schema: dict[int, list[str]] = {}
        for f in files:
            by_schema.setdefault(f["schema_id"], []).append(
                os.path.join(self.path, f["path"])
            )
        parts = []
        for schema_id, paths in by_schema.items():
            read_schema = self._with_system(self.schema_for(schema_id))
            df = self.spark.read.schema(read_schema).parquet(*paths)
            parts.append(self._align(df, target))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_changes(
        self,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Incremental scan: the rows in data files added after
        ``from_snapshot_id`` up to ``to_snapshot_id`` (default: current) —
        the table re-exposed as a change stream, so downstream consumers can
        chain off the lake without replaying the source log (the icelite
        analog of Iceberg's incremental append scan).

        Output shape mirrors the change log: an ``op`` column
        (``upsert``/``delete``) plus the logical columns. Exact for
        merge-on-read commits (each commit's files are precisely its staged
        winner/tombstone rows); copy-on-write commits rewrite whole buckets,
        so their file delta over-approximates the logical delta — run MoR if
        consumers need exact increments.
        """
        if from_snapshot_id is not None and self.snapshot(from_snapshot_id) is None:
            # An expired/unknown cursor must NOT silently degrade to a full
            # re-read: an incremental consumer would re-receive the entire
            # table as "changes". Surface it so the consumer can distinguish
            # "cursor expired, re-bootstrap" from a genuine delta.
            raise ValueError(
                f"from_snapshot_id={from_snapshot_id} is not a live snapshot "
                f"(expired or never existed); re-bootstrap with a full scan"
            )
        from_files = {
            f["path"] for f in self.files_of(self.snapshot(from_snapshot_id))
        } if from_snapshot_id is not None else set()
        to_files = self.files_of(self.snapshot(to_snapshot_id))
        new = [f for f in to_files if f["path"] not in from_files]
        out = self._read_files(new)
        op = F.when(
            F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("delete")
        ).otherwise(F.lit("upsert"))
        return out.withColumn("op", op).withColumn(
            "lsn", F.col(LSN_COL)
        ).drop(LSN_COL, DELETED_COL)

    def change_feed(
        self,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Row-level change data feed between two snapshots (the Delta CDF
        analog): the logical columns plus ``_change_type`` (``insert`` /
        ``update_preimage`` / ``update_postimage`` / ``delete``) and
        ``_commit_snapshot_id`` (the interval's TO snapshot).

        Semantics are **net** over the interval: a key updated five times
        emits one preimage/postimage pair (first-vs-last), an insert that
        was deleted again emits nothing — the squashed view an incremental
        consumer needs to converge its replica. (Per-commit granularity =
        call per adjacent snapshot pair.)

        Physical plan (scale posture): the FROM/TO file manifests are
        diffed driver-side (metadata only); only buckets whose file set
        changed can hold logical changes, so both snapshot reads are
        bucket-pruned to that set, then ONE full-outer self-join on the key
        compares pre vs post row images. Copy-on-write rewrites whole
        buckets, so unchanged keys in a touched bucket appear on both
        sides — the null-safe row-image equality filter drops them;
        compaction therefore yields an EMPTY feed (no logical change).
        Scan-time LWW resolution runs inside both reads, so late events and
        multi-version MoR files resolve before the diff.
        """
        if from_snapshot_id is not None and self.snapshot(from_snapshot_id) is None:
            raise ValueError(
                f"from_snapshot_id={from_snapshot_id} is not a live snapshot "
                f"(expired or never existed); re-bootstrap with a full scan"
            )
        to_snap = self.snapshot(to_snapshot_id)
        to_id = to_snap["snapshot_id"] if to_snap else None
        from_files = {
            f["path"]: f for f in self.files_of(self.snapshot(from_snapshot_id))
        } if from_snapshot_id is not None else {}
        to_files = {f["path"]: f for f in self.files_of(to_snap)}
        touched = sorted(
            {f["bucket"] for p, f in to_files.items() if p not in from_files}
            | {f["bucket"] for p, f in from_files.items() if p not in to_files}
        )

        key = self.key_col
        payload = [f.name for f in self.schema.fields if f.name != key]
        by_name = {f.name: f for f in self.schema.fields}
        # Key-first field order to match the non-empty frame (tagged()).
        cdf_type = StructType(
            [by_name[key]]
            + [by_name[c] for c in payload]
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_snapshot_id", LongType(), True),
            ]
        )
        if not touched or to_snap is None:
            return self.spark.createDataFrame([], cdf_type)

        if from_snapshot_id is None:
            pre = self._read_files([]).drop(LSN_COL, DELETED_COL)
        else:
            pre = self.read(snapshot_id=from_snapshot_id, buckets=touched)
        post = self.read(snapshot_id=to_id, buckets=touched)
        # Diff semantics live in lake/diff.py (pure operator, oracle-
        # checked by the cdc_net_changes contract query). Unchanged keys —
        # which CoW bucket rewrites put on both sides — drop there via the
        # null-safe row-image filter.
        from .diff import snapshot_diff

        pre = pre.select(key, *payload)
        post = post.select(key, *payload)
        return snapshot_diff(pre, post, key).withColumn(
            "_commit_snapshot_id", F.lit(to_id).cast("long")
        )

    def stored_row_count(self, snapshot_id: int | None = None) -> int:
        """Exact PHYSICAL row count of a snapshot from manifest metadata —
        zero Spark jobs (the S12 metadata-probe analog,
        /root/reference/src/storage/minio_client.rs:271-281). Counts stored
        rows: under merge-on-read this includes superseded versions and
        tombstones until compaction, so it bounds (not equals) the logical
        count; after compact(drop_tombstones=True) they coincide. Files
        predating the per-file ``rows`` stat fall back to one driver-local
        footer read each."""
        total = 0
        for f in self.files_of(self.snapshot(snapshot_id)):
            n = f.get("rows")
            if n is None:
                n = _row_count_from_footer(os.path.join(self.path, f["path"])) or 0
            total += n
        return total

    def inspect(self, name: str, snapshot_id: int | None = None) -> DataFrame:
        """Metadata tables (the Iceberg ``table$snapshots`` /
        ``table$files`` analog): table internals exposed as DataFrames so
        operators can run SQL over their lake's own metadata (audit
        dashboards, file-size skew checks, snapshot forensics).

        Driver-side metadata only — building the frame launches no scan of
        data files.

        - ``snapshots``: one row per snapshot (id, parent, branch-reachable
          operation summary, file count, commit time);
        - ``files``: the data files of one snapshot (default current) with
          bucket, spec, schema id, row count and key/stats ranges;
        - ``refs``: named refs — ``main``, tags, branches — with their
          snapshot ids;
        - ``specs``: bucket partition specs (id, n_buckets, current flag);
        - ``manifests``: (snapshot, segment) pairs — the segment-sharing
          audit surface (how much manifest metadata commits actually reuse).
        """
        if name == "snapshots":
            rows = [
                {
                    "snapshot_id": s["snapshot_id"],
                    "parent_id": s.get("parent_id"),
                    "timestamp_ms": s.get("timestamp_ms"),
                    "operation": s.get("summary", {}).get("operation"),
                    "n_files": s.get("n_files"),
                    "needs_resolve": bool(s.get("needs_resolve")),
                    "summary": {k: str(v) for k, v in s.get("summary", {}).items()},
                }
                for s in self.meta["snapshots"]
            ]
            schema = (
                "snapshot_id long, parent_id long, timestamp_ms long, "
                "operation string, n_files long, needs_resolve boolean, "
                "summary map<string,string>"
            )
        elif name == "files":
            rows = [
                {
                    "path": f["path"],
                    "bucket": f["bucket"],
                    "spec_id": self._spec_of(f),
                    "schema_id": f.get("schema_id"),
                    "rows": f.get("rows"),
                    "key_min": f.get("key_min"),
                    "key_max": f.get("key_max"),
                    "stats": {
                        c: json.dumps(v) for c, v in (f.get("stats") or {}).items()
                    },
                }
                for f in self.files_of(self.snapshot(snapshot_id))
            ]
            schema = (
                "path string, bucket int, spec_id int, schema_id int, "
                "rows long, key_min string, key_max string, "
                "stats map<string,string>"
            )
        elif name == "refs":
            rows = [
                {"name": "main", "type": "branch",
                 "snapshot_id": self.meta.get("current_snapshot_id")}
            ]
            for t, sid in sorted(self.meta.get("refs", {}).items()):
                rows.append({"name": t, "type": "tag", "snapshot_id": sid})
            for b, sid in sorted(self.meta.get("branches", {}).items()):
                rows.append({"name": b, "type": "branch", "snapshot_id": sid})
            schema = "name string, type string, snapshot_id long"
        elif name == "specs":
            specs = self.meta.get("bucket_specs") or {"1": self.meta["n_buckets"]}
            rows = [
                {"spec_id": int(sid), "n_buckets": n,
                 "is_current": int(sid) == self.current_spec_id}
                for sid, n in sorted(specs.items(), key=lambda kv: int(kv[0]))
            ]
            schema = "spec_id int, n_buckets int, is_current boolean"
        elif name == "manifests":
            # One row per (snapshot, segment): which snapshots share which
            # segment files — the audit surface for X35's reuse claim
            # (SELECT path, count(*) shows the sharing factor; total rows
            # vs distinct paths shows metadata amplification).
            rows = [
                {"snapshot_id": s["snapshot_id"], "segment": seg}
                for s in self.meta["snapshots"]
                for seg in self._segments_of(s)
            ]
            schema = "snapshot_id long, segment string"
        else:
            raise ValueError(
                f"unknown metadata table {name!r} "
                "(have: snapshots, files, refs, specs, manifests)"
            )
        return self.spark.createDataFrame([tuple(r.values()) for r in rows], schema)

    def lookup(self, key_value) -> DataFrame:
        """Point lookup: hash the key to its ONE bucket, scan only that
        bucket's files with the key predicate pushed into the parquet reader
        — combined with the within-file key sort this touches one bucket's
        files and, inside them, only the row groups whose min/max straddle
        the key. O(table/n_buckets) worst case, O(row group) typical.

        Bucket routing is a driver-side Python xxhash64 twin (pinned
        against the JVM by test) — zero Spark jobs before the pruned scan.
        """
        from .xxhash import spark_xxhash64

        bucket = spark_xxhash64(key_value) % self.n_buckets  # pmod: Python % is non-negative
        return self.read(
            buckets=[int(bucket)],
            key_equals=key_value if isinstance(key_value, str) else None,
        ).where(F.col(self.key_col) == key_value)

    def _lww_order(self, df: DataFrame):
        ts = (
            F.coalesce(F.col(self.order_col), F.lit(_TS_FLOOR).cast("timestamp"))
            if self.order_col in df.columns
            else F.lit(0)
        )
        return F.struct(ts, F.coalesce(F.col(LSN_COL), F.lit(-1)))

    def _resolve(self, df: DataFrame) -> DataFrame:
        """Scan-time LWW: collapse multi-version rows (MoR commits) to the
        per-key ``(order_col, __lsn)`` winner. ``max_by`` hash aggregation —
        map-side combinable, so hot keys collapse before the shuffle."""
        key = self.key_col
        payload = [c for c in df.columns if c != key]
        return df.groupBy(key).agg(
            F.max_by(F.struct(*[F.col(c) for c in payload]), self._lww_order(df)).alias("_w")
        ).select(key, *[F.col(f"_w.{c}").alias(c) for c in payload])

    # -- write ---------------------------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets))

    def _write_data_files(
        self, df: DataFrame, snapshot_id: int, sort_cols: list | None = None
    ) -> list[dict]:
        """Write rows (already in current schema + BUCKET_COL) as data files.

        ``sort_cols`` (column names or Column expressions, e.g. a Z-value)
        orders rows within each written file (default: the
        key column — see the point-lookup note below). Compaction passes
        ``cluster_by`` through here to re-cluster files on a range-scan
        dimension instead.

        Salted repartition bounds files-per-bucket while spreading hot
        buckets over several tasks (north_rule skew handling). Deterministic
        salt — task retries rewrite identical partitions.
        """
        # The uuid suffix makes the write target collision-proof across
        # CONCURRENT HANDLES: two writers racing from the same metadata
        # version compute the same next snapshot id, and without the
        # suffix the loser's .mode("overwrite") write would destroy the
        # winner's already-committed data files before the optimistic
        # commit check ever ran. With it, the loser's files land in a
        # sibling directory that remove_orphan_files later sweeps.
        commit_dir = f"data/commit-{snapshot_id}-{uuid.uuid4().hex[:8]}"
        out_path = os.path.join(self.path, commit_dir)
        # Parquet encode is the CPU-expensive part of a commit, so the write
        # must use every core (without an explicit count AQE coalesces this
        # shuffle to ~bytes/64MB partitions — measured: 6 writer tasks on 32
        # cores). But files-per-commit is ALSO a cost: every later scan pays
        # O(files) listing/footer/task overhead. Rows here are one-per-key
        # (merge winners), so per-KEY skew cannot exist; salting is only
        # needed when n_buckets alone can't feed the cluster. Auto-size it:
        # salt=1 (one file per bucket) once n_buckets >= 2x parallelism.
        par = max(self.spark.sparkContext.defaultParallelism, 1)
        salt_buckets = max(1, -(-2 * par // max(self.n_buckets, 1)))
        salted = with_salt(df, salt_buckets, salt_from=[self.key_col, "__rowhash"]
                           if "__rowhash" in df.columns else None)
        n_out = max(2 * par, self.n_buckets)
        (
            salted.repartition(n_out, F.col(BUCKET_COL), F.col("_salt"))
            .drop("_salt")
            # Sort within each task: parquet row-group min/max stats on the
            # sort columns become selective. Default = the key column, so
            # point lookups (WHERE url = ...) prune row groups inside the
            # one bucket file they hash to — O(log) inside the bucket
            # instead of full scan. cluster_by compaction substitutes a
            # range-scan dimension here.
            # BUCKET_COL must LEAD the sort: partitionBy(BUCKET_COL) makes
            # the writer require ordering by the partition column, and if
            # the plan's ordering doesn't already satisfy it Spark inserts
            # its own non-stable SortExec — which silently destroys the
            # clustering this sort just established (measured: files came
            # out unsorted). With the bucket prefix the required ordering
            # is satisfied and the writer adds nothing.
            .sortWithinPartitions(F.col(BUCKET_COL), *(sort_cols or [self.key_col]))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out_path)
        )
        files = []
        for entry in sorted(os.listdir(out_path)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            bucket = int(entry.split("=", 1)[1])
            bdir = os.path.join(out_path, entry)
            for fn in sorted(os.listdir(bdir)):
                if fn.endswith(".parquet"):
                    rec = {
                        "path": f"{commit_dir}/{entry}/{fn}",
                        "bucket": bucket,
                        "schema_id": self.meta["current_schema_id"],
                        "spec_id": self.current_spec_id,
                    }
                    rng = self._key_range_from_footer(os.path.join(bdir, fn))
                    if rng is not None:
                        rec["key_min"], rec["key_max"] = rng
                    stats = self._col_ranges_from_footer(os.path.join(bdir, fn))
                    if stats:
                        rec["stats"] = stats
                    rows = _row_count_from_footer(os.path.join(bdir, fn))
                    if rows is not None:
                        rec["rows"] = rows
                    files.append(rec)
        return files

    def _col_ranges_from_footer(self, path: str) -> dict:
        """Per-file (min, max) for every ``stats_cols`` column, from the
        parquet footer at commit time — the Iceberg column-stats analog,
        letting :meth:`read` prune files for range predicates (e.g.
        ``warc_ts BETWEEN ...`` over a CDC lake touches only the epochs in
        range). Values are JSON-normalized via ``_stat_json`` (timestamps →
        epoch micros); a column whose stats are unavailable is simply
        absent (conservatively unprunable)."""
        cols = self.meta.get("stats_cols") or []
        if not cols:
            return {}
        out = {}
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(path).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for col in cols:
                if col not in idx:
                    continue
                ci = idx[col]
                mins, maxs = [], []
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if not ok or not mins:
                    continue
                lo, hi = _stat_json(min(mins)), _stat_json(max(maxs))
                if lo is not None and hi is not None:
                    out[col] = [lo, hi]
        except Exception:  # noqa: BLE001 — stats are an optimization, never fatal
            return out
        return out

    def _key_range_from_footer(self, path: str) -> tuple | None:
        """(min, max) of the key column from the parquet footer — the
        manifest-level column stats Iceberg keeps per data file. Read
        driver-side at commit time (the footer is already local and the
        rows were just written key-sorted, so stats are tight); lets
        :meth:`read` skip whole files, not just whole buckets, for key
        predicates. String keys only (url); other types degrade gracefully
        to bucket-level pruning."""
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(path).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if self.key_col not in idx:
                return None
            ci = idx[self.key_col]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    return None
                mins.append(st.min)
                maxs.append(st.max)
            if not mins:
                return None
            lo, hi = min(mins), max(maxs)
            if isinstance(lo, bytes):
                lo, hi = lo.decode("utf-8", "replace"), hi.decode("utf-8", "replace")
            if not isinstance(lo, str):
                return None
            return lo, hi
        except Exception:  # noqa: BLE001 — stats are an optimization, never fatal
            return None

    def append(
        self, df: DataFrame, epoch: int | None = None, branch: str | None = None
    ) -> dict:
        """Blind append (no key resolution) — bulk backfill path.
        ``branch`` stages the commit on a WAP branch (see
        :meth:`create_branch`) instead of main."""
        self._require_branch(branch)
        summary: dict = {"operation": "append"}
        if epoch is not None:
            if epoch in self.committed_epochs():
                return {"skipped": True, "epoch": epoch}
            summary["engine.epoch"] = epoch
        staged = (
            self._align(df, self.schema)
            .withColumn(LSN_COL, F.lit(-1).cast("long"))
            .withColumn(DELETED_COL, F.lit(False))
            .withColumn(BUCKET_COL, self._bucket_expr())
        )
        new_files = self._write_data_files(staged, self._next_snapshot_id())
        files = self.files_of(self._head(branch)) + new_files
        snap = self._commit(files, summary, branch=branch)
        return {"skipped": False, "epoch": epoch, "snapshot_id": snap["snapshot_id"]}

    def _require_branch(self, branch: str | None) -> None:
        if branch is not None and branch not in self.meta.get("branches", {}):
            raise ValueError(
                f"unknown branch {branch!r}; create_branch() first "
                f"(have {sorted(self.meta.get('branches', {}))})"
            )

    def merge(
        self,
        staged: DataFrame,
        epoch: int | None = None,
        op_col: str = "op",
        delete_op: str = "delete",
        lsn_col: str = "lsn",
        ts_col: str = "warc_ts",
        mode: str = "cow",
        extra_summary: dict | None = None,
        branch: str | None = None,
    ) -> dict:
        """MERGE INTO with per-key ``(ts, lsn)`` last-writer-wins.

        Two physical modes, same logical result (Iceberg's copy-on-write vs
        merge-on-read):

        - ``mode="cow"``: read touched buckets, pick winners, rewrite them.
          Commit cost O(table ∩ touched buckets); reads stay collapse-free.
        - ``mode="mor"``: append the staged winner rows (and delete
          tombstones) as new files — NO target read, commit cost O(epoch).
          Reads LWW-resolve at scan until :meth:`compact` collapses the
          versions. The right mode at 10^10 events/epoch-heavy ingest:
          per-epoch work no longer scales with table size.

        Semantics = ``MERGE INTO target t USING staged s ON t.key = s.key
        WHEN MATCHED AND s wins AND s.op='delete' THEN DELETE
        WHEN MATCHED AND s wins THEN UPDATE SET *
        WHEN NOT MATCHED AND s.op!='delete' THEN INSERT *`` — where "s wins"
        compares ``(ts, lsn)`` against the values persisted with the stored
        row (system column ``__lsn``). Winning deletes are persisted as
        ``__deleted`` tombstones (merge-on-read style), so the final state
        after replaying the whole log equals the *global* per-key LWW winner
        regardless of how events were batched into epochs — out-of-order
        epochs and late events resolve deterministically (SURVEY.md §7.4).

        Physical strategy (scale-first):

        1. bucket-prune: only buckets containing staged keys are read;
        2. candidates = target-bucket rows ∪ staged rows; one hash
           aggregation (``max_by`` over the order struct) picks each key's
           winner — partial-agg combinable, so hot urls collapse map-side
           (no skewed join);
        3. winners (incl. tombstones) are rewritten as new bucket files;
           untouched buckets carry over by reference;
        4. single atomic snapshot commit carrying ``engine.epoch`` — applying
           the same epoch twice is a no-op (exactly-once).

        ``branch`` stages the commit on a WAP branch (built on the branch
        head, main untouched until :meth:`fast_forward`); the epoch ledger
        spans branches, so a staged-but-unpublished epoch still skips.
        """
        self._require_branch(branch)
        # Fail fast on a stale handle before any data is written; the
        # commit-time check remains the authority.
        self._assert_current()
        if epoch is not None and epoch in self.committed_epochs():
            return {"skipped": True, "epoch": epoch, "reason": "epoch already committed"}

        key = self.key_col
        staged = staged.withColumn(BUCKET_COL, self._bucket_expr())
        # Metadata-scale facts (row count, touched-bucket set) ride the data
        # pass as a CollectMetrics observation instead of extra Spark jobs
        # (count + distinct collect), which at high parallelism were pure
        # serial overhead.
        from pyspark.sql import Observation

        obs = Observation()
        staged = staged.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.collect_set(BUCKET_COL).alias("buckets"),
        )

        have = set(staged.columns)
        align_exprs = [
            (
                F.col(f.name).cast(f.dataType)
                if f.name in have
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in self.schema.fields
        ]
        s_cand = staged.select(
            *align_exprs,
            F.col(lsn_col).cast("long").alias(LSN_COL),
            (F.col(op_col) == delete_op).alias(DELETED_COL),
            F.col(BUCKET_COL),
        )

        if mode == "mor":
            # Merge-on-read is single-pass: the staged pipeline (parse,
            # extraction, LWW dedup) runs exactly once, inside the write job —
            # no persist/count materialization, no target read. The
            # observation fills in during the same job.
            new_files = self._write_data_files(s_cand, self._next_snapshot_id())
            staged_count = obs.get["n"]
            touched = sorted(obs.get["buckets"])
            carried = list(self.files_of(self._head(branch)))
            summary = {
                "operation": "merge-mor",
                "staged-rows": staged_count,
                "touched-buckets": len(touched),
                "new-files": len(new_files),
                "carried-files": len(carried),
                **(extra_summary or {}),
            }
            if epoch is not None:
                summary["engine.epoch"] = epoch
            snap = self._commit(
                carried + new_files, summary, needs_resolve=True, branch=branch
            )
            return {
                "skipped": False,
                "epoch": epoch,
                "snapshot_id": snap["snapshot_id"],
                "staged_rows": staged_count,
                "touched_buckets": len(touched),
                "new_files": len(new_files),
            }

        # Copy-on-write: the touched-bucket set must be known BEFORE the
        # target read (it prunes it), so staged is materialized first and
        # cached for its second use in the candidate union.
        staged.persist()
        try:
            staged.count()  # materializes the cache + fires the observation
            staged_count = obs.get["n"]
            touched = sorted(obs.get["buckets"])  # ≤ n_buckets ints

            head = self._head(branch)
            if head is None:
                # Empty target (virgin table, or branch forked before any
                # snapshot): read(None) would fall through to main's
                # CURRENT state, which is wrong for a branch.
                selected, carried = [], []
            else:
                # Spec-aware split: legacy-spec files are conservatively
                # selected (and thus rewritten under the current spec);
                # carried is exactly the complement, never recomputed by
                # bucket id.
                selected, carried = self._split_by_buckets(
                    self.files_of(head), touched
                )
            t_scan = self._read_files(selected)
            t_cand = t_scan.withColumn(
                BUCKET_COL, self._bucket_expr()
            ).withColumn("__src", F.lit(0))

            cand = t_cand.unionByName(s_cand.withColumn("__src", F.lit(1)))
            payload_cols = [c for c in cand.columns if c not in (key, "__src")]
            order_ts = (
                F.coalesce(F.col(ts_col), F.lit(_TS_FLOOR).cast("timestamp"))
                if ts_col in cand.columns
                else F.lit(0)
            )
            order_key = F.struct(
                order_ts,
                F.coalesce(F.col(LSN_COL), F.lit(-1)),
                F.col("__src"),
            )
            winners = cand.groupBy(key).agg(
                F.max_by(F.struct(*[F.col(c) for c in payload_cols]), order_key).alias(
                    "_w"
                )
            )
            out = winners.select(
                key, *[F.col(f"_w.{c}").alias(c) for c in payload_cols]
            )
            new_files = self._write_data_files(out, self._next_snapshot_id())

            summary = {
                "operation": "merge",
                "staged-rows": staged_count,
                "touched-buckets": len(touched),
                "new-files": len(new_files),
                "carried-files": len(carried),
                **(extra_summary or {}),
            }
            if epoch is not None:
                summary["engine.epoch"] = epoch
            snap = self._commit(carried + new_files, summary, branch=branch)
        finally:
            staged.unpersist()
        return {
            "skipped": False,
            "epoch": epoch,
            "snapshot_id": snap["snapshot_id"],
            "staged_rows": staged_count,
            "touched_buckets": len(touched),
            "new_files": len(new_files),
        }

    def merge_builder(self, source: DataFrame, on: list[str] | None = None):
        """Generic declarative MERGE INTO this table (Delta-style clause
        builder; see :mod:`data_pipeline_spark.lake.merge`).  ``on``
        defaults to the table's key column.  Finish with ``.execute()``."""
        from .merge import LakeMergeBuilder

        return LakeMergeBuilder(self, source, on)

    # -- maintenance -----------------------------------------------------------------

    def dirty_buckets(self, min_files: int = 2) -> list[int]:
        """Buckets whose current snapshot holds ≥ ``min_files`` data files —
        the candidates that can hold multi-version rows (every MoR commit
        appends at most one file per touched bucket). Metadata-only."""
        counts: dict[int, int] = {}
        cur = self.current_spec_id
        for f in self.files_of(self._current_snapshot()):
            if self._spec_of(f) != cur:
                # Non-current-spec files need migration, but their bucket
                # ids live in a different modulus — callers check
                # has_legacy_files() and pass even an empty bucket list to
                # compact(), whose conservative split sweeps them.
                continue
            counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
        return sorted(b for b, n in counts.items() if n >= min_files)

    def has_legacy_files(self) -> bool:
        """True if any current-snapshot file was written under a
        non-current bucket spec (pending migration; any compact() —
        including ``compact(buckets=[])`` — rewrites exactly those)."""
        cur = self.current_spec_id
        return any(
            self._spec_of(f) != cur
            for f in self.files_of(self._current_snapshot())
        )

    def compact(
        self,
        drop_tombstones: bool = False,
        buckets: list[int] | None = None,
        cluster_by: list[str] | None = None,
        cluster_strategy: str = "linear",
    ) -> dict:
        """Collapse MoR multi-version rows to one winner row per key and
        rewrite data files (Iceberg rewrite_data_files).

        ``cluster_by`` sorts rewritten files on those columns instead of
        the key (Iceberg rewrite_data_files sort-order): parquet row-group
        min/max on a range-scan dimension (e.g. the event-time column)
        become tight and monotone, so ``read(range_filters=...)``'s pushed
        predicate skips whole row groups. Trade-off: point lookups lose
        within-file key ordering in the re-clustered files (manifests'
        key min/max and Blooms still prune at file granularity).

        ``cluster_strategy="zorder"`` orders by the Morton interleave of
        the ``cluster_by`` columns instead of lexicographically (the Delta
        ``OPTIMIZE ... ZORDER BY`` analog): with a linear sort only the
        LEADING column's row-group stats get tight; Z-order makes range
        predicates on EVERY clustered column skip row groups, at the cost
        of each being somewhat looser than a dedicated single-column sort
        (see lake/zorder.py). Costs one extra column-pruned min/max pass
        over the rewritten rows.

        ``buckets=None`` compacts the whole table and clears the scan-time
        resolve flag. Passing ``buckets`` (e.g. :meth:`dirty_buckets`)
        compacts only those — maintenance cost O(dirty buckets), not
        O(table), which is what keeps background compaction viable while a
        10^10-event tail keeps appending; the table-level resolve flag then
        stays set (re-resolving already-clean buckets is a no-op).

        ``drop_tombstones=True`` also physically removes delete markers —
        only safe once no change event older than the tombstones can still
        arrive (i.e. the replay horizon has passed); otherwise a late
        out-of-order event could resurrect a deleted key.
        """
        prior = self._current_snapshot()
        # Spec-aware split: legacy-spec files are always selected, so any
        # compaction migrates them to the current bucket spec.
        selected, carried = self._split_by_buckets(self.files_of(prior), buckets)
        raw = self._read_files(selected)
        resolved = self._resolve(raw)
        if drop_tombstones:
            resolved = resolved.where(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        out = resolved.withColumn(BUCKET_COL, self._bucket_expr())
        snapshot_id = self._next_snapshot_id()
        if cluster_strategy not in ("linear", "zorder"):
            raise ValueError(f"unknown cluster_strategy {cluster_strategy!r}")
        if cluster_strategy != "linear" and not cluster_by:
            # Must not silently fall back to the key sort: the caller would
            # believe the table is Z-ordered when it is not.
            raise ValueError("cluster_strategy requires cluster_by")
        sort_arg = cluster_by
        if cluster_by:
            known = {f.name for f in self.schema.fields}
            bad = [c for c in cluster_by if c not in known]
            if bad:
                raise ValueError(f"cluster_by columns not in schema: {bad}")
            if cluster_strategy == "zorder":
                from .zorder import zorder_expr

                sort_arg = [zorder_expr(out, cluster_by)]
        new_files = self._write_data_files(out, snapshot_id, sort_cols=sort_arg)
        replaced = len(selected)
        needs_resolve = (
            False if buckets is None else bool(prior and prior.get("needs_resolve"))
        )
        snap = self._commit(
            carried + new_files,
            {
                "operation": "compact",
                "compacted-files": replaced,
                "new-files": len(new_files),
                "buckets": "all" if buckets is None else len(buckets),
                "dropped-tombstones": drop_tombstones,
                **({"cluster-by": ",".join(cluster_by),
                    "cluster-strategy": cluster_strategy} if cluster_by else {}),
            },
            needs_resolve=needs_resolve,
        )
        return {"snapshot_id": snap["snapshot_id"], "new_files": len(new_files)}

    def build_blooms(
        self,
        bits_per_key: int | None = None,
        k: int | None = None,
        cap_bits: int | None = None,
    ) -> dict:
        """Stats-only commit: add per-file key Bloom filters to the current
        manifest (Iceberg's puffin-blob analog; see lake/bloom.py for why
        min/max cannot prune within a bucket). Data files are untouched and
        carried verbatim, so ``read_changes`` across this commit yields an
        empty delta and time travel is unaffected.

        Maintenance-time by design: the build is one column-pruned
        distributed pass over files that lack blooms, which would add a
        per-epoch job to the replay hot path — run it with compaction
        (``jobs/maintenance_job.py --build-blooms``), where the cost
        amortizes over long-lived files.
        """
        from . import bloom as B

        self._assert_current()
        snap = self._current_snapshot()
        files = [dict(f) for f in self.files_of(snap)]
        todo = [f for f in files if "bloom" not in f]
        if not todo:
            return {"built": 0, "snapshot_id": snap["snapshot_id"] if snap else None}
        by_schema: dict[int, list[dict]] = {}
        for f in todo:
            by_schema.setdefault(f["schema_id"], []).append(f)
        groups = [
            (
                [os.path.join(self.path, f["path"]) for f in fs],
                self._with_system(self.schema_for(sid)),
            )
            for sid, fs in by_schema.items()
        ]
        kwargs = {}
        if bits_per_key is not None:
            kwargs["bits_per_key"] = bits_per_key
        if k is not None:
            kwargs["k"] = k
        if cap_bits is not None:
            kwargs["cap_bits"] = cap_bits
        built = B.build_file_blooms(self.spark, groups, self.key_col, **kwargs)
        # input_file_name() returns file: URIs (percent-encoded — a table
        # path with a space arrives as %20); manifest paths are
        # table-relative. Decode + normalize for the join back.
        from urllib.parse import unquote, urlparse

        by_abs = {}
        for f in files:
            by_abs[os.path.abspath(os.path.join(self.path, f["path"]))] = f
        n = 0
        for uri, rec in built.items():
            if uri.startswith("file:"):
                p = unquote(urlparse(uri).path)
            else:
                p = unquote(uri) if "%" in uri else uri
            target = by_abs.get(os.path.abspath(p))
            if target is not None:
                target["bloom"] = rec
                n += 1
        snap = self._commit(
            files, {"operation": "build-blooms", "n_blooms": n}
        )
        return {"built": n, "snapshot_id": snap["snapshot_id"]}

    def purge_keys(self, keys, isin_max: int = 1000) -> dict:
        """Physically remove EVERY stored version of the given keys
        (takedown / right-to-be-forgotten — a first-class need for a
        web-crawl lake; the reference's only analog is whole-object delete,
        /root/reference/src/storage/minio_client.rs:284-296).

        A tombstone delete (``merge`` with op='delete') masks a key but the
        payload bytes stay in the old data files. Purge REWRITES the files
        that may contain a target key with those rows dropped, so the new
        snapshot's files no longer hold the bytes at all. Prior snapshots
        still reference the old files — complete physical erasure is
        ``purge_keys()`` then ``expire_snapshots()`` then
        ``remove_orphan_files()`` (the maintenance job's ``--purge-keys``
        path chains them).

        Cost is O(files that may contain a target key), not O(table): keys
        route to their buckets via the driver-side xxhash64 twin (zero Spark
        jobs), then per-file key min/max and manifest Blooms prune within
        the bucket; every other file carries into the new snapshot by
        reference. One Spark job total (the rewrite); row accounting comes
        from parquet footers (driver-local metadata, not an extra job — and
        not an ``observe()``, which AQE's empty-relation propagation elides
        when a rewrite leaves zero survivors).

        Key lists above ``isin_max`` switch from an ``isin`` predicate
        (pushed to the parquet reader) to a broadcast anti-join, so a
        million-key takedown list never builds a million-literal plan.
        """
        from .xxhash import spark_xxhash64

        self._assert_current()
        keys = sorted(set(keys))
        snap = self._current_snapshot()
        files = self.files_of(snap)
        # Route keys to buckets under EACH live spec (bucket-spec evolution
        # means files can disagree on the bucket count; a file only matches
        # keys hashed with ITS spec's modulus).
        by_spec: dict[int, dict[int, list]] = {}
        for spec in {self._spec_of(f) for f in files}:
            n = self.bucket_spec(spec)
            route: dict[int, list] = {}
            for kv in keys:
                route.setdefault(int(spark_xxhash64(kv) % n), []).append(kv)
            by_spec[spec] = route
        todo, carried = [], []
        for f in files:
            ks = by_spec[self._spec_of(f)].get(f["bucket"])
            if ks and any(_may_contain(f, kv) for kv in ks):
                todo.append(f)
            else:
                carried.append(f)
        if not todo:
            # Nothing can contain the keys — no rewrite, no commit.
            return {
                "snapshot_id": snap["snapshot_id"] if snap else None,
                "files_rewritten": 0,
                "rows_removed": 0,
                "committed": False,
            }
        cand = self._read_files(todo)
        if len(keys) <= isin_max:
            kept = cand.where(~F.col(self.key_col).isin(keys))
        else:
            key_df = self.spark.createDataFrame(
                [(kv,) for kv in keys], f"{self.key_col} string"
            )
            kept = cand.join(
                F.broadcast(key_df), on=self.key_col, how="left_anti"
            )
        kept = kept.withColumn(BUCKET_COL, self._bucket_expr())
        snapshot_id = self._next_snapshot_id()
        new_files = self._write_data_files(kept, snapshot_id)
        rows_in = sum(
            f["rows"]
            if "rows" in f
            else (_row_count_from_footer(os.path.join(self.path, f["path"])) or 0)
            for f in todo
        )
        removed = rows_in - sum(f.get("rows") or 0 for f in new_files)
        snap = self._commit(
            carried + new_files,
            {
                "operation": "purge",
                "purged-keys": len(keys),
                "rows-removed": removed,
                "files-rewritten": len(todo),
                "new-files": len(new_files),
            },
        )
        return {
            "snapshot_id": snap["snapshot_id"],
            "files_rewritten": len(todo),
            "rows_removed": removed,
            "committed": True,
        }

    def apply_ttl(self, older_than, ts_col: str | None = None) -> dict:
        """Row-level retention (X114): physically remove every row with
        ``ts_col < older_than`` ("keep 90 days of page history"). A CDC
        lake accretes history forever otherwise, and at 10^10 keys the
        naive path — read, filter, rewrite everything — is a full-table
        job every night.

        Cost here is O(files that STRADDLE the cutoff), usually ~one
        epoch's worth, because the per-file column stats the manifest
        already keeps (the Iceberg-style analog recorded at commit) split
        the snapshot three ways driver-side, no Spark job:

        - ``max(ts) < cutoff`` → the file is dropped METADATA-ONLY (its
          bytes are simply not referenced by the new snapshot — expiry +
          orphan GC reclaims them, same as any rewritten file);
        - ``min(ts) >= cutoff`` → carried by reference, untouched;
        - otherwise (or stats missing) → rewritten with the row filter.

        NULL ``ts_col`` rows are always KEPT (event-time absence is a
        quarantine question, not an age): parquet min/max stats ignore
        nulls, so a wholly-expired-looking file with nulls must not be
        dropped blind — the footer's null counts are checked driver-side
        and such files are demoted to the rewrite path.

        Semantics note: ``ts_col`` defaults to the table's LWW order
        column (``warc_ts``), and under LWW-by-(ts, lsn) a key's winner
        always carries its max ts — so TTL can never resurrect a
        superseded version (every superseded row is at least as old as
        the winner, and tombstones outrank what they delete). Passing an
        unrelated column forfeits that guarantee on MoR tables; compact
        first.

        Complete physical erasure of the dropped bytes is ``apply_ttl()``
        then ``expire_snapshots()`` then ``remove_orphan_files()`` —
        the same chain as :meth:`purge_keys`.
        """
        self._assert_current()
        ts = ts_col or self.order_col
        snap = self._current_snapshot()
        files = self.files_of(snap)
        cutoff = _stat_json(older_than)
        if cutoff is None:
            raise ValueError("older_than must be a concrete comparable value")
        dropped, carried, todo = [], [], []
        for f in files:
            stats = f.get("stats", {}).get(ts)
            if stats and stats[0] >= cutoff:
                carried.append(f)
            elif stats and stats[1] < cutoff:
                nulls = _null_count_from_footer(
                    os.path.join(self.path, f["path"]), ts
                )
                # nulls unknown (None) is conservative: rewrite, not drop
                if nulls == 0:
                    dropped.append(f)
                else:
                    todo.append(f)
            else:
                todo.append(f)
        if not dropped and not todo:
            return {
                "snapshot_id": snap["snapshot_id"] if snap else None,
                "files_dropped": 0,
                "files_rewritten": 0,
                "rows_removed": 0,
                "committed": False,
            }
        removed = sum(
            f["rows"]
            if "rows" in f
            else (_row_count_from_footer(os.path.join(self.path, f["path"])) or 0)
            for f in dropped
        )
        new_files: list[dict] = []
        if todo:
            cand = self._read_files(todo)
            # Row filter must use the SAME instant convention as the
            # file-stat split above: _stat_json treats a naive cutoff as
            # UTC epoch micros, while F.lit(datetime) would re-interpret
            # it in the session timezone — on a non-UTC session those are
            # different instants and rows in the gap would be dropped or
            # kept depending on which file they sat in. unix_micros is
            # session-tz-independent and matches the stats exactly.
            import datetime as _dt

            if isinstance(older_than, _dt.datetime):
                keep_row = F.unix_micros(F.col(ts)) >= F.lit(int(cutoff))
            else:
                keep_row = F.col(ts) >= F.lit(older_than)
            kept = cand.where(
                F.col(ts).isNull() | keep_row
            ).withColumn(BUCKET_COL, self._bucket_expr())
            snapshot_id = self._next_snapshot_id()
            new_files = self._write_data_files(kept, snapshot_id)
            rows_in = sum(
                f["rows"]
                if "rows" in f
                else (
                    _row_count_from_footer(os.path.join(self.path, f["path"]))
                    or 0
                )
                for f in todo
            )
            removed += rows_in - sum(f.get("rows") or 0 for f in new_files)
        snap = self._commit(
            carried + new_files,
            {
                "operation": "ttl",
                "ttl-col": ts,
                "ttl-cutoff": str(cutoff),
                "rows-removed": removed,
                "files-dropped": len(dropped),
                "files-rewritten": len(todo),
                "new-files": len(new_files),
            },
        )
        return {
            "snapshot_id": snap["snapshot_id"],
            "files_dropped": len(dropped),
            "files_rewritten": len(todo),
            "rows_removed": removed,
            "committed": True,
        }

    def remove_orphan_files(self, grace_seconds: float = 3600.0) -> int:
        """Delete data files no live snapshot references (Iceberg's
        remove_orphan_files action).

        A crash between ``_write_data_files`` and ``_commit`` leaves the
        written files unreferenced — harmless for correctness (reads are
        manifest-driven), but they leak storage until GC'd. ``grace_seconds``
        skips recently-modified files so an in-flight commit's files are
        never swept (default 1 h — set above the longest conceivable commit
        duration; pass 0 only when no writer can be active).

        Guards the multi-handle hazard the same way ``expire_snapshots``
        does: a stale handle computes "live" from stale metadata and would
        sweep another writer's just-committed files as orphans.
        """
        self._assert_current()
        live = {
            f["path"] for s in self.meta["snapshots"] for f in self.files_of(s)
        }
        now = time.time()
        removed = 0
        data_dir = os.path.join(self.path, "data")
        for root, _, files in os.walk(data_dir):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, self.path)
                if rel in live:
                    continue
                if now - os.path.getmtime(full) < grace_seconds:
                    continue
                os.remove(full)
                removed += 1
        # Manifest files a crashed commit wrote but never referenced (crash
        # between _write_manifest and the metadata pointer) leak the same
        # way data files do; sweep both halves — segment files no live
        # snapshot references, and manifest-list files whose snapshot id
        # is not in the snapshot log — under the same grace window.
        live_segs = {
            seg for s in self.meta["snapshots"] for seg in self._segments_of(s)
        }
        live_manifests = {
            s["manifest"] for s in self.meta["snapshots"] if "manifest" in s
        }
        meta_dir = os.path.join(self.path, "metadata")
        for fn in os.listdir(meta_dir):
            if fn.startswith("seg-") and fn.endswith(".json"):
                rel = f"metadata/{fn}"
                if rel in live_segs:
                    continue
            elif fn.startswith("manifest-") and fn.endswith(".json"):
                rel = f"metadata/{fn}"
                if rel in live_manifests:
                    continue
            else:
                continue
            full = os.path.join(meta_dir, fn)
            if now - os.path.getmtime(full) < grace_seconds:
                continue
            os.remove(full)
            self._segment_cache.pop(rel, None)
            removed += 1
        return removed

    def expire_snapshots(self, keep_last: int = 5) -> int:
        """Drop old snapshots and physically delete data files no live
        snapshot references (S16 / Iceberg snapshot expiry). Tagged
        snapshots (:meth:`tag`) are always retained."""
        if keep_last < 1:
            # keep_last=0 would be a silent no-op (snaps[-0:] is the whole
            # list) while the caller meant "maximal trim" — reject it.
            raise ValueError("keep_last must be >= 1 (the current snapshot stays)")
        self._assert_current()
        snaps = self.meta["snapshots"]
        if len(snaps) <= keep_last:
            return 0
        keep_ids = (
            {s["snapshot_id"] for s in snaps[-keep_last:]}
            | set(self.meta.get("refs", {}).values())
            # Branch snapshots interleave with main's in the log, so "last
            # N" alone could drop main's current head or a branch head.
            | {
                sid
                for sid in [self.meta["current_snapshot_id"]]
                + list(self.meta.get("branches", {}).values())
                if sid is not None
            }
        )
        keep = [s for s in snaps if s["snapshot_id"] in keep_ids]
        live = {f["path"] for s in keep for f in self.files_of(s)}
        dropped = [s for s in snaps if s["snapshot_id"] not in keep_ids]
        if not dropped:
            return 0
        dead = {f["path"] for s in dropped for f in self.files_of(s)} - live
        for rel in dead:
            p = os.path.join(self.path, rel)
            if os.path.exists(p):
                os.remove(p)
        # Expired snapshots' manifests go with them — and so do manifest
        # segments only they reference. Segments shared with a kept
        # snapshot (the common case: untouched buckets) must survive, so
        # collect both reference sets BEFORE removing the manifest lists.
        live_segs = {seg for s in keep for seg in self._segments_of(s)}
        dead_segs = {
            seg for s in dropped for seg in self._segments_of(s)
        } - live_segs
        for s in dropped:
            if "manifest" in s:
                mp = os.path.join(self.path, s["manifest"])
                if os.path.exists(mp):
                    os.remove(mp)
            self._manifest_cache.pop(s["snapshot_id"], None)
        for seg in dead_segs:
            sp = os.path.join(self.path, seg)
            if os.path.exists(sp):
                os.remove(sp)
            self._segment_cache.pop(seg, None)
        # Remove now-empty commit dirs.
        data_dir = os.path.join(self.path, "data")
        for d in os.listdir(data_dir):
            full = os.path.join(data_dir, d)
            if os.path.isdir(full) and not any(
                files for _, _, files in os.walk(full)
            ):
                shutil.rmtree(full)
        self.meta["snapshots"] = keep
        self._write_version(self.meta["version"] + 1)
        return len(dead)
