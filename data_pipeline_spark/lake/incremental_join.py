"""Incrementally-maintained JOIN views over icelite lake tables.

`IncrementalRollup` (lake/incremental.py) keeps *aggregates* fresh in
O(changes); this module does the same for a materialized two-table equi-join
— the other derived table every CDC consumer builds (fact enriched with its
dimension: orders x customer, events x user profile). Recomputing a join of
two 10^10-row tables per epoch is exactly the job a 100 TB deployment cannot
afford; the delta algebra here is the standard incremental-view-maintenance
result (deltas restricted to *affected join keys*, everything else carried
over untouched) used by Materialize/Flink/differential dataflow, expressed
as plain Spark joins so Catalyst keeps planning it.

Two layers:

- :func:`join_view_refresh` — the pure splice algebra. Given the previous
  materialized view, the touched fact keys, the fact table's post-image
  rows for those keys, and the dimension's post-image rows for the affected
  join keys, it produces the new view WITHOUT touching unaffected rows.
  This is the piece the `cdc_join_incremental` contract query proves equal
  to a full recompute (DuckDB joins the post-snapshots directly).

- :class:`IncrementalJoinView` — the maintained derived table: cursors over
  BOTH base tables' change streams, bucket-pruned pre/post-image reads
  (same "the table's scan-time LWW is the authority" posture as
  IncrementalRollup), state stored in a LakeTable so commits are atomic,
  exactly-once per (snap_a, snap_b) cursor pair, and spliced via
  ``merge(mode=...)`` so per-refresh write cost is O(touched buckets), not
  O(view).

The view is materialized in LEFT-join form (fact rows with no dimension
match carry null dimension columns) — the standard IVM trick: an inner view
cannot be maintained under dimension INSERTS without rescanning the fact
table for previously-unmatched rows, while the left form keeps those rows
resident so a late-arriving dimension key upgrades them in place. ``read()``
serves either form (inner = filter on the dimension key's null-ness).

Scale notes (100 TB posture):

- Fact-side deltas touch O(Δfact) keys; their pre/post images come from
  bucket-pruned fact reads (cost ∝ touched buckets).
- Dimension-side deltas touch the view rows holding affected join keys.
  Locating those rows needs a join-key access path on a view that is
  KEYED by the fact key; we use the view table's per-file min/max stats on
  the join-key column (``stats_cols``) as a coarse file prune plus an exact
  semi-join — the Iceberg data-skipping answer. Z-order/clustered
  compaction on the join key (lake/zorder.py) tightens the prune; without
  clustering the worst case is a view scan, never a fact/dimension scan.
- No full scan of either BASE table ever happens after bootstrap.

Reference parity: the reference recomputes its joined output per run
(pipeline.rs re-reads and re-joins everything); maintained join views are
engine surface the north rule's derived-table story requires at scale.
"""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable
from .table import _atomic_write


def touched_join_keys(
    a_pre: DataFrame,
    a_post: DataFrame,
    b_changed_keys: DataFrame,
    join_key_a: str,
    join_key_b: str,
) -> DataFrame:
    """The affected-join-key set K of one refresh: join-key values carried
    by the changed fact rows' PRE-images (a row that moved k1→k2 invalidates
    its old k1 group), their POST-images (it lands in k2), and the changed
    dimension keys. One distinct over a 3-way union of single columns —
    map-side combinable, output bounded by the delta size."""
    cols = [
        a_pre.select(F.col(join_key_a).alias("__k")),
        a_post.select(F.col(join_key_a).alias("__k")),
        b_changed_keys.select(F.col(join_key_b).alias("__k")),
    ]
    out = cols[0]
    for c in cols[1:]:
        out = out.unionByName(c)
    return out.where(F.col("__k").isNotNull()).distinct().select(
        F.col("__k").alias(join_key_a)
    )


def join_view_refresh(
    old_view: DataFrame,
    touched_a: DataFrame,
    a_post: DataFrame,
    b_post_k: DataFrame,
    affected_k: DataFrame,
    a_key: str,
    join_key_a: str,
    join_key_b: str,
) -> DataFrame:
    """Pure splice: the new LEFT-join view from the old one plus deltas.

    Inputs (all DataFrames; the caller guarantees the coverage contracts):

    - ``old_view``: previous materialized view, columns = fact columns ++
      dimension columns (dimension side null for unmatched fact rows).
      Fact and dimension column names must be disjoint.
    - ``touched_a``: one column ``a_key`` — fact keys whose rows changed
      (insert/update/delete) since the view was built.
    - ``a_post``: the fact table's CURRENT rows for exactly the
      ``touched_a`` keys (deleted keys simply absent). Fact columns only.
    - ``b_post_k``: the dimension's CURRENT rows for every join key in
      ``affected_k`` (keys with no current dimension row simply absent).
    - ``affected_k``: one column ``join_key_a`` — the affected join keys
      (see :func:`touched_join_keys`); MUST cover the pre- and post-image
      join keys of every touched fact row and every changed dimension key.

    Output: the new view, same columns as ``old_view``. Rows neither in
    ``touched_a`` nor holding an affected join key pass through verbatim
    (at the stateful layer those never leave their files); everything else
    is recomputed with ONE restricted left join whose size is O(delta).
    """
    b_cols = set(b_post_k.columns)
    a_cols = [c for c in old_view.columns if c not in b_cols]
    if join_key_a not in a_cols:
        raise ValueError(f"join_key_a={join_key_a!r} not among fact columns {a_cols}")
    dim_cols = [c for c in old_view.columns if c in b_cols]

    # Untouched rows: fact key untouched AND join key unaffected. A null
    # join key never matches any dimension row, and never appears in
    # affected_k — left_anti keeps such rows, which is correct.
    keep = old_view.join(touched_a, a_key, "left_anti").join(
        affected_k, join_key_a, "left_anti"
    )

    # Fact rows needing a fresh dimension lookup: (1) resident view rows in
    # an affected join-key group whose own fact row did NOT change — their
    # fact part is current, only the dimension side may have moved; (2) the
    # post-images of the touched fact keys (covers inserts, updates, and
    # key moves; deletes are absent and so disappear from the view).
    resident = (
        old_view.join(affected_k, join_key_a, "left_semi")
        .join(touched_a, a_key, "left_anti")
        .select(*a_cols)
    )
    fact = resident.unionByName(a_post.select(*a_cols))

    # Rename the dimension side before joining: the old view usually shares
    # lineage with the dimension post-image (both derive from the dimension
    # relation), and unprefixed columns trip Spark's ambiguous-self-join
    # detection.
    b_r = b_post_k.select(
        *[F.col(c).alias(f"__b_{c}") for c in b_post_k.columns]
    )
    joined = fact.join(
        b_r, fact[join_key_a] == b_r[f"__b_{join_key_b}"], "left"
    ).select(
        *a_cols, *[F.col(f"__b_{c}").alias(c) for c in dim_cols]
    )

    # name-based joins reorder columns (join key first); pin the view shape
    return keep.unionByName(joined).select(*old_view.columns)


class IncrementalJoinView:
    """A maintained fact⋈dimension left-join view as a durable derived
    LakeTable, advanced by cursors over both base tables' change streams.

    The fact table's key is the view's key (one view row per fact row);
    the dimension is keyed by the join key. Each ``refresh()`` is one
    atomic view commit tagged with the (snap_a, snap_b) cursor pair —
    re-running a crashed refresh is exactly-once because the cursor file
    only advances in the same commit as the data (write-ahead epoch on the
    view table's own ledger covers the merge itself).
    """

    def __init__(
        self,
        spark: SparkSession,
        fact: LakeTable,
        dim: LakeTable,
        join_key_fact: str,
        state_dir: str,
        dim_cols: list[str] | None = None,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.fact = fact
        self.dim = dim
        self.join_key_fact = join_key_fact
        self.join_key_dim = dim.key_col
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self._dim_cols = dim_cols  # None = all dimension columns
        self._n_buckets = n_buckets
        self._view: LakeTable | None = None

    # -- cursors -----------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.state_dir, "cursors.json")

    def cursors(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as fh:
            return json.load(fh)

    # -- schema ------------------------------------------------------------

    def _dim_frame(self, snapshot_id=None, buckets=None) -> DataFrame:
        df = self.dim.read(snapshot_id=snapshot_id, buckets=buckets)
        if self._dim_cols is not None:
            keep = [self.join_key_dim] + [
                c for c in self._dim_cols if c != self.join_key_dim
            ]
            df = df.select(*keep)
        return df

    def _fact_cols(self) -> list[str]:
        return [f.name for f in self.fact.schema.fields]

    def _view_table(self) -> LakeTable:
        if self._view is not None:
            return self._view
        path = os.path.join(self.state_dir, "view")
        fact_df = self.fact.read().limit(0)
        dim_df = self._dim_frame().limit(0)
        overlap = set(fact_df.columns) & set(dim_df.columns)
        if overlap:
            raise ValueError(
                f"fact/dimension column names must be disjoint, got {sorted(overlap)}"
            )
        shape = (
            fact_df.join(
                dim_df,
                fact_df[self.join_key_fact] == dim_df[self.join_key_dim],
                "left",
            )
            .select(*fact_df.columns, *[dim_df[c] for c in dim_df.columns])
            # merge()'s LWW order expects a timestamp order column; encode
            # the refresh version as epoch-seconds (deterministic, no wall
            # clock — versions are small integers).
            .withColumn("_view_ver", F.timestamp_seconds(F.lit(0)))
        )
        self._view = LakeTable.create(
            self.spark,
            path,
            shape.schema,
            key_col=self.fact.key_col,
            n_buckets=self._n_buckets,
            order_col="_view_ver",
            # join-key min/max per file => dimension-side refreshes prune
            # view files Iceberg-style; cluster on it for tight pruning.
            stats_cols=[self.join_key_fact],
        )
        return self._view

    # -- reads -------------------------------------------------------------

    @property
    def table(self) -> LakeTable:
        """The view's backing LakeTable — a first-class table: time travel,
        change feed, compaction, and (star schemas) serving as the FACT of
        another IncrementalJoinView. Chained views compose because
        `read_changes` over the view's cow commits over-approximates the
        logical delta (a superset of touched keys recomputes to the same
        rows). The `_view_ver` system column is part of its schema;
        downstream consumers should exclude it from their dim_cols."""
        return self._view_table()

    def read(self, inner: bool = False) -> DataFrame:
        """The maintained view. ``inner=True`` filters to matched rows
        (dimension join key non-null) — the inner-join projection."""
        cur = self.cursors()
        if cur is None:
            raise ValueError("view has no state yet — call refresh()")
        df = self._view_table().read().drop("_view_ver")
        if inner:
            df = df.where(F.col(self.join_key_dim).isNotNull())
        return df

    # -- refresh -----------------------------------------------------------

    def _touched_keys(self, table: LakeTable, from_snap: int, to_snap: int) -> DataFrame:
        return (
            table.read_changes(from_snap or None, to_snap)
            .select(table.key_col)
            .distinct()
        )

    def _pruned_read(self, table: LakeTable, snap: int, keys: DataFrame) -> DataFrame:
        """Snapshot read restricted to ``keys``, bucket-pruned via the
        table's own bucket expression (metadata-scale collect: ≤ n_buckets
        ids — the IncrementalRollup posture)."""
        rows = keys.select(table._bucket_expr().alias("b")).distinct().collect()
        buckets = sorted(int(r["b"]) for r in rows)
        # snap stays 0 for "before the first snapshot" (empty relation);
        # None would mean "current" and zero the delta (see IncrementalRollup).
        return table.read(snapshot_id=snap, buckets=buckets).join(
            keys, table.key_col, "left_semi"
        )

    def refresh(self, rebuild: bool = False) -> dict:
        """Advance the view to both base tables' current snapshots."""
        to_a = self.fact.meta["current_snapshot_id"] or 0
        to_b = self.dim.meta["current_snapshot_id"] or 0
        view = self._view_table()
        cur = self.cursors()

        if cur is None or rebuild:
            fact_df = self.fact.read(snapshot_id=to_a or None)
            dim_df = self._dim_frame(snapshot_id=to_b or None)
            full = (
                fact_df.join(
                    dim_df,
                    fact_df[self.join_key_fact] == dim_df[self.join_key_dim],
                    "left",
                )
                .select(*fact_df.columns, *[dim_df[c] for c in dim_df.columns])
            )
            ver = (cur["version"] + 1) if cur else 1
            self._commit_rows(
                full, deletes=None, version=ver, snap_a=to_a, snap_b=to_b,
                full_rebuild=True,
            )
            return {"mode": "full", "to_a": to_a, "to_b": to_b}

        from_a, from_b = cur["snap_a"], cur["snap_b"]
        if (from_a, from_b) == (to_a, to_b):
            return {"mode": "noop", "to_a": to_a, "to_b": to_b}

        touched_a = self._touched_keys(self.fact, from_a, to_a).localCheckpoint(
            eager=True
        )
        touched_b = self._touched_keys(self.dim, from_b, to_b).localCheckpoint(
            eager=True
        )

        a_pre = self._pruned_read(self.fact, from_a, touched_a)
        a_post = self._pruned_read(self.fact, to_a, touched_a).localCheckpoint(
            eager=True
        )
        affected_k = touched_join_keys(
            a_pre.select(self.join_key_fact),
            a_post.select(self.join_key_fact),
            touched_b,
            self.join_key_fact,
            self.join_key_dim,
        ).localCheckpoint(eager=True)

        # Dimension post-image restricted to K — bucket-pruned on the dim
        # table (its key IS the join key).
        b_post_k = self._pruned_read(
            self.dim,
            to_b,
            affected_k.select(F.col(self.join_key_fact).alias(self.join_key_dim)),
        )
        if self._dim_cols is not None:
            keep = [self.join_key_dim] + [
                c for c in self._dim_cols if c != self.join_key_dim
            ]
            b_post_k = b_post_k.select(*keep)

        # Resident view rows in affected join-key groups: coarse file prune
        # via the view's join-key min/max stats, exact via semi-join. Never
        # touches either base table.
        bounds = affected_k.agg(
            F.min(self.join_key_fact).alias("lo"), F.max(self.join_key_fact).alias("hi")
        ).collect()[0]
        vread = view.read(
            range_filters={self.join_key_fact: (bounds["lo"], bounds["hi"])}
        ) if bounds["lo"] is not None else view.read().limit(0)
        fact_cols = self._fact_cols()
        resident = (
            vread.join(affected_k, self.join_key_fact, "left_semi")
            .join(touched_a, self.fact.key_col, "left_anti")
            .select(*fact_cols)
        )

        # NOTE: this mirrors join_view_refresh's resident/union/left-join
        # splice (the oracle-checked pure form above) — any change to the
        # delta algebra must land in BOTH. The __b_ rename the pure form
        # needs is not required here: both sides come off LakeTable parquet
        # reads (fresh lineage each scan), so Spark's ambiguous-self-join
        # check cannot trip, and attribute-qualified refs disambiguate the
        # select.
        fact_rows = resident.unionByName(a_post.select(*fact_cols))
        joined = fact_rows.join(
            b_post_k,
            fact_rows[self.join_key_fact] == b_post_k[self.join_key_dim],
            "left",
        ).select(*fact_cols, *[b_post_k[c] for c in b_post_k.columns])

        # Fact keys deleted since the cursor: touched but absent post-image.
        deleted = touched_a.join(
            a_post.select(self.fact.key_col), self.fact.key_col, "left_anti"
        )

        ver = cur["version"] + 1
        n = self._commit_rows(
            joined, deletes=deleted, version=ver, snap_a=to_a, snap_b=to_b,
        )
        return {
            "mode": "incremental",
            "from_a": from_a, "to_a": to_a,
            "from_b": from_b, "to_b": to_b,
            "upserts": n,
        }

    def _commit_rows(
        self,
        rows: DataFrame,
        deletes: DataFrame | None,
        version: int,
        snap_a: int,
        snap_b: int,
        full_rebuild: bool = False,
    ) -> int:
        view = self._view_table()
        staged = rows.withColumn("op", F.lit("upsert"))
        if deletes is not None:
            del_rows = deletes.withColumn("op", F.lit("delete"))
            for c in staged.columns:
                if c not in del_rows.columns:
                    del_rows = del_rows.withColumn(
                        c, F.lit(None).cast(dict(staged.dtypes)[c])
                    )
            staged = staged.unionByName(del_rows.select(*staged.columns))
        if full_rebuild and view.meta["current_snapshot_id"]:
            # a rebuild must also retire rows whose fact key vanished
            # entirely: stage explicit deletes for keys in the view but not
            # in the rebuilt row set.
            gone = (
                view.read()
                .select(self.fact.key_col)
                .join(rows.select(self.fact.key_col), self.fact.key_col, "left_anti")
                .withColumn("op", F.lit("delete"))
            )
            for c in staged.columns:
                if c not in gone.columns:
                    gone = gone.withColumn(
                        c, F.lit(None).cast(dict(staged.dtypes)[c])
                    )
            staged = staged.unionByName(gone.select(*staged.columns))
        # version stamps go on LAST so every leg (upserts, deletes, retired
        # keys) carries them — a null-stamped delete would lose LWW to the
        # stored row and silently resurrect it. The LWW tiebreak rides a
        # RESERVED _view_lsn column: stamping the fact's own ``lsn``
        # payload column (if it has one — engine tables usually do) would
        # clobber the source value with the refresh counter.
        staged = staged.withColumn(
            "_view_ver", F.timestamp_seconds(F.lit(version))
        ).withColumn("_view_lsn", F.lit(version).cast("long"))
        res = view.merge(
            staged,
            epoch=version,
            ts_col="_view_ver",
            lsn_col="_view_lsn",
            mode="cow",
            extra_summary={"snap_a": snap_a, "snap_b": snap_b},
        )
        if res.get("skipped"):
            # Epoch ``version`` was already applied by a run that crashed
            # before its cursor write. The delta just computed may be WIDER
            # (the base tables advanced since); recording its snapshots
            # would silently drop the widened range forever. Recover the
            # snapshots the applied commit actually consumed from its own
            # commit summary and record those — the next refresh then
            # re-derives exactly the missing delta under version+1.
            applied = next(
                (s for s in view.history()
                 if s["summary"].get("engine.epoch") == str(version)),
                None,
            )
            if applied is not None:
                def _snap(k: str):
                    v = applied["summary"].get(k)
                    return None if v in (None, "None") else int(v)

                snap_a, snap_b = _snap("snap_a"), _snap("snap_b")
        _atomic_write(
            self._meta_path,
            json.dumps({
                "snap_a": snap_a,
                "snap_b": snap_b,
                "version": version,
                "committed_at": time.time(),
            }),
        )
        return int(res.get("staged_rows") or 0)


class StreamingJoinView:
    """Continuous join-view maintenance: Structured Streaming drives
    :meth:`IncrementalJoinView.refresh` on a processing-time trigger — the
    same rate-clock composition as :class:`lake.sync.StreamingTableSync`.

    The streamed rows are only a clock; state lives entirely in the
    tables: the cursor pair is re-read from disk each tick and only
    advances in the same commit as the view data, so exactly-once
    survives driver restarts WITHOUT depending on the stream checkpoint —
    a re-fired trigger sees an already-advanced cursor and no-ops.
    """

    def __init__(self, view: IncrementalJoinView, keep_results: int = 100):
        import collections

        self.view = view
        # Bounded: an always-on trigger would otherwise leak one dict per
        # tick on the driver for the stream's lifetime.
        self.results: collections.deque = collections.deque(maxlen=keep_results)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Base tables are typically written by other processes (replay
        # jobs); re-read their metadata each tick so new snapshots are seen.
        self.view.fact.refresh()
        self.view.dim.refresh()
        self.results.append(self.view.refresh())

    def start(
        self,
        checkpoint_dir: str,
        interval: str = "1 second",
        rows_per_second: int = 1,
    ):
        spark = self.view.spark
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
