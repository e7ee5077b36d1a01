"""Incrementally-maintained group-by rollups over an icelite lake table.

A CDC engine's derived tables must not be recomputed from 10^10 rows every
epoch. `IncrementalRollup` maintains count/sum aggregates keyed by group
columns, advancing a snapshot cursor over the base table's change stream
(`LakeTable.read_changes`, exact under merge-on-read commits):

    delta(group) = Σ contributions(new winners) - Σ contributions(pre-images)

The change stream only identifies WHICH keys were touched; both the pre-
and post-image of every touched key are read from the table's own FROM/TO
snapshots via time travel, so the table's scan-time LWW resolution is the
single authority. (Trusting the change rows themselves would corrupt the
rollup on LATE events: a change row older than the stored row loses LWW
in the table but would "win" a changes-only dedup.) Both snapshot reads
are **bucket-pruned**: the touched keys' bucket set is computed with the
table's own bucket expression and only those buckets are scanned (cost ∝
touched buckets, not table size); a key contributes exactly once per
refresh regardless of how many epochs hit it.

State is a small parquet relation (one row per group) committed atomically
(tmp dir + rename, versioned meta JSON) with the base-table snapshot
cursor stored alongside — a crash before the rename leaves the previous
state + cursor intact, and a re-run of refresh() is idempotent because the
cursor only advances in the same atomic commit. An expired cursor (base
snapshots GC'd past it) raises from read_changes; `refresh(rebuild=True)`
re-bootstraps with one full recompute.

Maintained aggregates: n_rows (count) and sum_<col> for each numeric
``sum_cols`` entry (fully retractable — pure addition), and since round 4
min_<col>/max_<col> for each ``minmax_cols`` entry. Min/max are NOT
retractable by algebra, so they follow the standard IVM treatment
(Materialize's "reduction" operator, Flink's retract-amended aggregates):

* insert-only groups fold monotonically (``least``/``greatest`` against
  the stored extremum — no rescan ever);
* a group is **affected** only when a removed pre-image could have HELD
  the stored extremum (pre-image min ≤ stored min, or pre-image max ≥
  stored max, per column); only affected groups re-aggregate, from the
  TO snapshot restricted to exactly those groups. Cost is O(affected
  groups' rows) — at 10^10 rows the restricting predicate is an
  ``isin`` over a metadata-scale group list, which reaches the parquet
  reader (PushedFilters → row-group pruning) on COMPACTED state when
  the table clusters by the group columns
  (``compact(cluster_by=group_cols)``); on un-compacted merge-on-read
  state the predicate correctly stays above the scan-time LWW resolve
  (a pre-LWW filter on a mutable group column could flip which version
  wins) — both shapes pinned in
  ``test_incremental.py::test_minmax_rescan_pushes_isin_to_scan``. A
  delete that does not touch a group's extremum costs nothing beyond
  the delta math.

``distinct_cols`` entries maintain an exact n_distinct_<col> per group —
the one aggregate that IS exactly retractable, via the auxiliary
per-(group, value) count relation the IVM literature keeps for it:
deletes decrement value counts, a value leaves the group only when its
count hits zero, and the per-group distinct is the aux relation's group
cardinality. The aux rides the same atomic version-dir commit as the
main state (one ``os.rename`` publishes both) and costs O(live distinct
(group, value) pairs) of state — the price of exactness.

``distinct_mode="hll"`` (round 5) swaps the exact aux for per-group HLL
register tables (`operators/hll.py`, precision ``hll_p``): state drops
to O(groups × 2^p) — bounded per group no matter the value cardinality,
which is what a 10^10-row table with a high-cardinality distinct column
needs. Registers merge loss-free on inserts (pointwise max, the HLL
union law); they cannot retract, so groups that lost a pre-image with a
non-NULL value get the same non-retractable treatment as min/max — a
register rebuild from the TO snapshot restricted to exactly the
affected groups (shared ``_restricted_scan``). ``n_distinct_<col>``
keeps its name and long type (now a bias-corrected estimate); the mode
and precision are recorded in meta.json and frozen until
``rebuild=True``. Exact stays the default.

NULL group keys are first-class (round 5): SQL GROUP BY treats NULL as
its own group, the count/sum delta path (union+groupBy) always has, and
every min/max/distinct attach, diff, and rescan join now goes through a
null-safe ``eqNullSafe`` equi-join (``_ns_join``) — a plain name-list
join would silently hand the NULL group NULL extrema and 0 distinct.

Averages are derived (sum/n) at read time.

Reference parity: the reference recomputes everything per run (its only
"derived" artifact is the re-written parquet); incremental maintenance is
round-2 engine surface aligned with the north rule's derived-table story.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable, _atomic_write


class IncrementalRollup:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        group_cols: list[str],
        sum_cols: list[str],
        state_dir: str,
        minmax_cols: list[str] | None = None,
        distinct_cols: list[str] | None = None,
        distinct_mode: str = "exact",
        hll_p: int = 12,
    ):
        self.spark = spark
        self.table = table
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.minmax_cols = list(minmax_cols or [])
        self.distinct_cols = list(distinct_cols or [])
        if distinct_mode not in ("exact", "hll"):
            raise ValueError("distinct_mode must be 'exact' or 'hll'")
        self.distinct_mode = distinct_mode
        self.hll_p = int(hll_p)
        overlap = set(self.distinct_cols) & set(self.group_cols)
        if overlap:
            # n_distinct of a grouping column is identically 1 — and the
            # aux relation would carry a duplicate column name. Refuse
            # loudly instead of maintaining a meaningless aggregate.
            raise ValueError(
                f"distinct_cols {sorted(overlap)} are group columns; "
                "their per-group distinct is always 1"
            )
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _check_meta_cols(self, m: dict) -> None:
        """The maintained column set is frozen at the first commit — a
        drift between configured and stored aggregates would silently
        read garbage columns. Changing the set needs refresh(rebuild=True)."""
        for field, want, dflt in (
            ("minmax_cols", self.minmax_cols, []),
            ("distinct_cols", self.distinct_cols, []),
            ("distinct_mode", self.distinct_mode, "exact"),
        ):
            stored = m.get(field, dflt)
            if stored != want:
                raise ValueError(
                    f"rollup state maintains {field}={stored}, configured "
                    f"{want}; pass rebuild=True to change the set"
                )
        if self.distinct_cols and self.distinct_mode == "hll":
            stored_p = m.get("hll_p", self.hll_p)
            if stored_p != self.hll_p:
                # registers built at a different precision cannot merge
                raise ValueError(
                    f"rollup state maintains hll_p={stored_p}, configured "
                    f"{self.hll_p}; pass rebuild=True to change it"
                )

    # -- state I/O ---------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.state_dir, "meta.json")

    def _meta(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as fh:
            return json.load(fh)

    def cursor(self) -> int | None:
        m = self._meta()
        return None if m is None else m["snapshot_id"]

    def _data_root(self, m: dict) -> str:
        return os.path.join(self.state_dir, m["data"])

    def read(self) -> DataFrame:
        """Current rollup: (group_cols, n_rows, sum_*, min_*/max_*,
        n_distinct_*...)."""
        m = self._meta()
        if m is None:
            raise ValueError("rollup has no state yet — call refresh()")
        root = self._data_root(m)
        # layout 2 (round 4, with aux relations): main relation nests under
        # <state>/main; layout 1 states ARE the parquet dir
        if m.get("layout", 1) >= 2:
            return self.spark.read.parquet(os.path.join(root, "main"))
        return self.spark.read.parquet(root)

    def read_aux(self, col: str) -> DataFrame:
        """The auxiliary relation backing n_distinct_<col>: in ``exact``
        mode the per-(group, value) count relation (the exactly-retractable
        auxiliary the IVM literature keeps for distinct aggregates); in
        ``hll`` mode the per-(group, idx) max-rho HLL register table
        (``operators/hll.py``) — O(groups × 2^p) state instead of O(live
        (group, value) pairs)."""
        m = self._meta()
        if m is None or col not in m.get("distinct_cols", []):
            raise ValueError(f"no distinct aux maintained for {col!r}")
        return self.spark.read.parquet(
            os.path.join(self._data_root(m), f"aux_distinct_{col}")
        )

    def _commit(
        self,
        df: DataFrame,
        snapshot_id: int,
        version: int,
        aux: dict[str, DataFrame] | None = None,
    ) -> None:
        """Atomic: write data to a tmp dir, rename it in, then fsync-swap
        meta.json (the cursor advances in the same commit as the data).
        Readers only ever follow meta.json, so a crash at any point leaves
        the previous state + cursor fully intact."""
        # sweep debris from crashed commits FIRST: a state-vN that meta
        # never pointed to (crash between rename and meta swap) would make
        # os.rename fail with ENOTEMPTY forever; .tmp-* dirs would leak a
        # state-sized copy per crash
        cur = self._meta()
        live = cur["data"] if cur else None
        for fn in os.listdir(self.state_dir):
            p = os.path.join(self.state_dir, fn)
            if fn.startswith(".tmp-") or (
                fn.startswith("state-v") and fn != live
            ):
                shutil.rmtree(p, ignore_errors=True)
        name = f"state-v{version}"
        tmp = tempfile.mkdtemp(dir=self.state_dir, prefix=".tmp-")
        # main + any aux relations nest under ONE version dir, so a single
        # os.rename publishes them together (atomic multi-relation commit)
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data", "main"))
        for aux_name, aux_df in (aux or {}).items():
            aux_df.write.mode("overwrite").parquet(
                os.path.join(tmp, "data", aux_name)
            )
        final = os.path.join(self.state_dir, name)
        os.rename(os.path.join(tmp, "data"), final)
        _atomic_write(  # write+flush+fsync+replace, same as table metadata
            self._meta_path,
            json.dumps({
                "snapshot_id": snapshot_id,
                "version": version,
                "data": name,
                "layout": 2,
                "minmax_cols": self.minmax_cols,
                "distinct_cols": self.distinct_cols,
                "distinct_mode": self.distinct_mode,
                "hll_p": self.hll_p,
                "committed_at": time.time(),
            }),
        )
        shutil.rmtree(tmp, ignore_errors=True)
        if live and live != name:
            shutil.rmtree(os.path.join(self.state_dir, live), ignore_errors=True)

    # -- aggregation helpers ----------------------------------------------

    def _contrib(self, df: DataFrame, sign: int) -> DataFrame:
        """Per-group (±count, ±sums) of a row set."""
        aggs = [F.count("*").cast("long").alias("n_rows")] + [
            F.sum(F.col(c).cast("double")).alias(f"sum_{c}") for c in self.sum_cols
        ]
        out = df.groupBy(*self.group_cols).agg(*aggs)
        if sign < 0:
            out = out.select(
                *self.group_cols,
                (-F.col("n_rows")).alias("n_rows"),
                *[(-F.col(f"sum_{c}")).alias(f"sum_{c}") for c in self.sum_cols],
            )
        return out

    def _merge_deltas(self, parts: list[DataFrame], prune: bool = False) -> DataFrame:
        """Sum contribution relations per group. ``prune`` drops n_rows==0
        groups and is ONLY valid on the final state (no rows → group gone):
        an intermediate DELTA legitimately has n_rows==0 with nonzero sums
        (a value update inside one group changes the sum, not the count)."""
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        aggs = [F.sum("n_rows").cast("long").alias("n_rows")] + [
            F.sum(f"sum_{c}").alias(f"sum_{c}") for c in self.sum_cols
        ]
        out = out.groupBy(*self.group_cols).agg(*aggs)
        return out.where(F.col("n_rows") != 0) if prune else out

    def _ns_join(
        self,
        left: DataFrame,
        right: DataFrame,
        how: str,
        broadcast_right: bool = False,
    ) -> DataFrame:
        """Null-safe equi-join on the group columns. A NULL group key is a
        real group under SQL GROUP BY (the union+groupBy delta path treats
        it as one), so every attach/diff join here must match NULL to NULL
        — a plain name-list join (null-unsafe ``=``) would silently give
        that group NULL min/max and 0 distinct. Right-side group columns
        are renamed before the join and coalesced/dropped after, so outer
        shapes keep exactly one copy of each group column."""
        g = self.group_cols
        r = right
        for c in g:
            r = r.withColumnRenamed(c, f"__r_{c}")
        if broadcast_right:
            # hint applied AFTER the renames so it sits directly under the
            # join in the plan (a rename above the hint can strand it)
            r = F.broadcast(r)
        cond = F.lit(True)
        for c in g:
            cond = cond & left[c].eqNullSafe(F.col(f"__r_{c}"))
        out = left.join(r, cond, how)
        if how in ("left_semi", "left_anti"):
            return out
        if how == "full":
            # matched NULL-key rows coalesce to NULL (correct: the key IS
            # NULL); right-only rows take the right copy
            sel = [F.coalesce(left[c], F.col(f"__r_{c}")).alias(c) for c in g]
        else:
            sel = [left[c] for c in g]
        lkeep = [left[c] for c in left.columns if c not in g]
        rkeep = [F.col(c2) for c2 in r.columns if not c2.startswith("__r_")]
        return out.select(*sel, *lkeep, *rkeep)

    def _mm_aggs(self, prefix: str = "") -> list:
        """min/max aggregate exprs in the columns' NATIVE types."""
        return [
            F.min(c).alias(f"{prefix}min_{c}") for c in self.minmax_cols
        ] + [F.max(c).alias(f"{prefix}max_{c}") for c in self.minmax_cols]

    def _mm_names(self) -> list[str]:
        return [f"min_{c}" for c in self.minmax_cols] + [
            f"max_{c}" for c in self.minmax_cols
        ]

    def _full_state(self, rows: DataFrame) -> DataFrame:
        """Full-recompute path: count/sum/min/max in ONE hash agg — no
        attach join at all, so NULL group keys are handled natively by
        GROUP BY and the scan is aggregated exactly once."""
        aggs = (
            [F.count("*").cast("long").alias("n_rows")]
            + [
                F.sum(F.col(c).cast("double")).alias(f"sum_{c}")
                for c in self.sum_cols
            ]
            + self._mm_aggs()
        )
        return rows.groupBy(*self.group_cols).agg(*aggs)

    def _nd_names(self) -> list[str]:
        return [f"n_distinct_{c}" for c in self.distinct_cols]

    def _aux_counts(self, rows: DataFrame, c: str, sign: int) -> DataFrame:
        """±count per (group, value) — NULL values never count toward a
        distinct (SQL count(DISTINCT c) semantics)."""
        out = (
            rows.where(F.col(c).isNotNull())
            .groupBy(*self.group_cols, c)
            .agg((F.count("*") * sign).cast("long").alias("cnt"))
        )
        return out

    def _hll_regs(self, rows: DataFrame, c: str) -> DataFrame:
        """Per-group sparse HLL register table for column ``c`` (NULL
        values excluded, matching count(DISTINCT c))."""
        from ..operators.hll import hll_registers

        return hll_registers(
            rows, c, group_cols=self.group_cols, p=self.hll_p,
            seed=f"rollup:{c}",
        )

    def _attach_distinct(
        self, state: DataFrame, aux: dict[str, DataFrame]
    ) -> DataFrame:
        """Join per-group distinct counts (derived from the aux relations)
        into the main state; a live group whose values are all NULL gets 0.
        In ``hll`` mode the count is the bias-corrected register estimate,
        rounded to a long (same column name/type as exact mode — the mode
        is recorded in meta.json)."""
        from ..operators.hll import hll_estimate

        for c in self.distinct_cols:
            a = aux[f"aux_distinct_{c}"]
            if self.distinct_mode == "hll":
                nd = hll_estimate(
                    a, p=self.hll_p, group_cols=self.group_cols
                ).select(
                    *self.group_cols,
                    F.round("est").cast("long").alias(f"n_distinct_{c}"),
                )
            else:
                nd = a.groupBy(*self.group_cols).agg(
                    F.count("*").cast("long").alias(f"n_distinct_{c}")
                )
            state = self._ns_join(state, nd, "left").withColumn(
                f"n_distinct_{c}",
                F.coalesce(F.col(f"n_distinct_{c}"), F.lit(0).cast("long")),
            )
        return state

    def _touched_buckets(self, keys: DataFrame) -> list[int]:
        """Distinct bucket ids of the changed keys (≤ n_buckets values —
        metadata-scale collect, same posture as the hot-key list)."""
        rows = keys.select(
            self.table._bucket_expr().alias("b")
        ).distinct().collect()
        return sorted(int(r["b"]) for r in rows)

    # -- refresh -----------------------------------------------------------

    def refresh(self, rebuild: bool = False) -> dict:
        """Advance the rollup to the base table's current snapshot.

        Returns {mode, from, to, changed_keys?}. Full recompute when there
        is no state yet or ``rebuild=True``; incremental otherwise.
        """
        to_snap = self.table.meta["current_snapshot_id"] or 0
        m = self._meta()
        if m is None or rebuild:
            rows = self.table.read(snapshot_id=to_snap or None)
            state = self._full_state(rows)
            aux = {
                f"aux_distinct_{c}": (
                    self._hll_regs(rows, c)
                    if self.distinct_mode == "hll"
                    else self._aux_counts(rows, c, +1)
                ).localCheckpoint(eager=True)
                for c in self.distinct_cols
            }
            state = self._attach_distinct(state, aux)
            self._commit(
                state, to_snap, (m["version"] + 1) if m else 1, aux=aux
            )
            return {"mode": "full", "from": None, "to": to_snap}
        self._check_meta_cols(m)
        from_snap = m["snapshot_id"] or 0
        if from_snap == to_snap:
            return {"mode": "noop", "from": from_snap, "to": to_snap}

        key = self.table.key_col
        changes = self.table.read_changes(from_snap or None, to_snap)
        # Touched-key set (several epochs may have hit one key).
        touched = changes.select(key).distinct().localCheckpoint(eager=True)
        n_changed = touched.count()
        buckets = self._touched_buckets(touched)
        # PRE- and POST-images both come from the TABLE's own snapshots
        # (bucket-pruned to the touched keys): the table's scan-time LWW is
        # the authority. Trusting the change stream's own winner would be
        # wrong for LATE events — a change row older than the stored row
        # loses LWW in the table but would "win" a changes-only dedup,
        # corrupting the rollup (pre == post for such keys must net zero).
        # NOTE: from_snap stays 0 here (NOT mapped to None): snapshot 0
        # never exists, so read() yields the empty relation — None would
        # mean "current snapshot" and make every pre-image equal its
        # post-image, zeroing the whole delta.
        old = self.table.read(snapshot_id=from_snap, buckets=buckets).join(
            touched, key, "left_semi"
        )
        new = self.table.read(snapshot_id=to_snap, buckets=buckets).join(
            touched, key, "left_semi"
        )
        delta = self._merge_deltas(
            [self._contrib(new, +1), self._contrib(old, -1)]
        )
        state = self.read()
        derived = self._mm_names() + self._nd_names()
        state_cs = state.drop(*derived) if derived else state
        merged = self._merge_deltas([state_cs, delta], prune=True)
        n_affected = 0
        if self.minmax_cols:
            mm_names = self._mm_names()
            mm_final, n_affected = self._refresh_minmax(
                state.select(*self.group_cols, *mm_names), old, new, to_snap
            )
            merged = self._ns_join(merged, mm_final, "left")
        aux_out: dict[str, DataFrame] = {}
        nd_rescanned = 0
        for c in self.distinct_cols:
            if self.distinct_mode == "hll":
                merged_aux, n_re = self._refresh_hll_aux(c, old, new, to_snap)
                nd_rescanned = max(nd_rescanned, n_re)
            else:
                # exactly-retractable distinct: fold ±(group, value) counts
                # into the stored aux relation, prune exhausted values
                merged_aux = (
                    self.read_aux(c)
                    .unionByName(self._aux_counts(new, c, +1))
                    .unionByName(self._aux_counts(old, c, -1))
                    .groupBy(*self.group_cols, c)
                    .agg(F.sum("cnt").cast("long").alias("cnt"))
                    .where(F.col("cnt") > 0)
                )
            # sever from the old aux files before the commit swaps them
            aux_out[f"aux_distinct_{c}"] = merged_aux.localCheckpoint(
                eager=True
            )
        if self.distinct_cols:
            merged = self._attach_distinct(merged, aux_out)
        merged = merged.localCheckpoint(
            eager=True
        )  # sever lineage from the OLD state files before the commit
        # swaps them out underneath the plan
        self._commit(merged, to_snap, m["version"] + 1, aux=aux_out)
        out = {
            "mode": "incremental",
            "from": from_snap,
            "to": to_snap,
            "changed_keys": n_changed,
            "buckets_scanned": len(buckets),
        }
        if self.minmax_cols:
            out["minmax_recomputed_groups"] = n_affected
        if self.distinct_cols and self.distinct_mode == "hll":
            out["distinct_recomputed_groups"] = nd_rescanned
        return out

    def _refresh_hll_aux(
        self, c: str, old: DataFrame, new: DataFrame, to_snap: int
    ) -> tuple[DataFrame, int]:
        """Advance the HLL register aux for ``c``. Registers merge loss-
        free on INSERTS (pointwise max — the HLL union law), but cannot
        retract: any group that lost a pre-image with a non-NULL ``c``
        might have lost a distinct value, so those groups get the same
        non-retractable treatment as min/max — register rebuild from the
        TO snapshot restricted to exactly the affected groups (the shared
        ``_restricted_scan``, O(affected groups' rows)). Insert-only
        groups never rescan. Returns (merged register table, n rescanned
        groups)."""
        from ..operators.hll import hll_merge

        stored = self.read_aux(c)
        new_regs = self._hll_regs(new, c)
        affected = (
            old.where(F.col(c).isNotNull())
            .select(*self.group_cols)
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_aff = affected.count()
        if n_aff == 0:
            return hll_merge(stored, new_regs), 0
        scan = self._restricted_scan(affected, n_aff, to_snap)
        recomputed = self._hll_regs(scan, c)
        keep = self._ns_join(stored, affected, "left_anti")
        fresh = self._ns_join(new_regs, affected, "left_anti")
        return hll_merge(keep, fresh, recomputed), n_aff

    # -- min/max IVM -------------------------------------------------------

    #: above this many affected groups the rescan predicate switches from a
    #: driver-side isin list (parquet row-group pruning) to a broadcast
    #: semi-join (no 100k-literal plans)
    _MM_ISIN_CAP = 10_000

    def _restricted_scan(
        self, affected: DataFrame, n_affected: int, to_snap: int
    ) -> DataFrame:
        """TO-snapshot rows restricted to the (metadata-scale) affected
        group set — the shared rescan primitive for the non-retractable
        aggregates (min/max, HLL distinct). Single-column group sets under
        the cap become a driver-side isin literal list (pushed to the
        parquet reader → row-group pruning on compacted state, with an
        explicit IS NULL arm for a NULL-keyed group); larger/composite
        sets use a broadcast null-safe semi-join."""
        g = self.group_cols
        if len(g) == 1 and n_affected <= self._MM_ISIN_CAP:
            vals = [r[0] for r in affected.collect()]
            pred_scan = F.col(g[0]).isin([v for v in vals if v is not None])
            if any(v is None for v in vals):
                pred_scan = pred_scan | F.col(g[0]).isNull()
            return self.table.read(snapshot_id=to_snap).where(pred_scan)
        return self._ns_join(
            self.table.read(snapshot_id=to_snap),
            affected,
            "left_semi",
            broadcast_right=True,
        )

    def _refresh_minmax(
        self, state_mm: DataFrame, old: DataFrame, new: DataFrame, to_snap: int
    ) -> tuple[DataFrame, int]:
        """Advance min_*/max_* per group: monotone fold for groups whose
        removed pre-images could not have held the stored extremum,
        TO-snapshot re-aggregation restricted to the (metadata-scale)
        affected group set otherwise. Returns (per-group minmax frame
        covering ALL live groups, n recomputed groups)."""
        g = self.group_cols
        old_mm = old.groupBy(*g).agg(*self._mm_aggs(prefix="old_"))
        new_mm = new.groupBy(*g).agg(*self._mm_aggs(prefix="new_"))
        touched = self._ns_join(
            self._ns_join(old_mm, new_mm, "full"), state_mm, "left"
        )
        # affected ⇔ some removed pre-image value ties-or-beats the stored
        # extremum for some column (each guarded term is non-null boolean)
        pred = F.lit(False)
        for c in self.minmax_cols:
            pred = pred | (
                F.col(f"old_min_{c}").isNotNull()
                & F.col(f"min_{c}").isNotNull()
                & (F.col(f"old_min_{c}") <= F.col(f"min_{c}"))
            ) | (
                F.col(f"old_max_{c}").isNotNull()
                & F.col(f"max_{c}").isNotNull()
                & (F.col(f"old_max_{c}") >= F.col(f"max_{c}"))
            )
        touched = touched.localCheckpoint(eager=True)  # reused 3×
        affected = touched.where(pred).select(*g)
        # unaffected (incl. brand-new groups): least/greatest skip nulls,
        # so state-less groups take the post-image extremum directly
        folded = touched.where(~pred).select(
            *g,
            *[
                F.least(F.col(f"min_{c}"), F.col(f"new_min_{c}")).alias(
                    f"min_{c}"
                )
                for c in self.minmax_cols
            ],
            *[
                F.greatest(F.col(f"max_{c}"), F.col(f"new_max_{c}")).alias(
                    f"max_{c}"
                )
                for c in self.minmax_cols
            ],
        )
        affected = affected.localCheckpoint(eager=True)
        n_affected = affected.count()
        if n_affected == 0:
            recomputed = None
        else:
            scan = self._restricted_scan(affected, n_affected, to_snap)
            recomputed = scan.groupBy(*g).agg(*self._mm_aggs())
        untouched = self._ns_join(state_mm, touched.select(*g), "left_anti")
        out = untouched.unionByName(folded)
        if recomputed is not None:
            out = out.unionByName(recomputed)
        return out, n_affected


class StreamingRollup:
    """Continuous rollup maintenance: Structured Streaming drives
    :meth:`IncrementalRollup.refresh` on a processing-time trigger — the
    same rate-clock composition as :class:`StreamingJoinView` and
    :class:`lake.sync.StreamingTableSync`, completing the maintained
    derived-table triangle (join views, SCD2 history, grouped rollups).

    The streamed rows are only a clock; state lives entirely on disk:
    the snapshot cursor is re-read each tick and only advances in the
    same atomic commit as the rollup data (main + aux relations under one
    version-dir rename), so exactly-once survives driver restarts WITHOUT
    depending on the stream checkpoint — a re-fired trigger sees an
    already-advanced cursor and records a no-op.
    """

    def __init__(self, rollup: IncrementalRollup, keep_results: int = 100):
        import collections

        self.rollup = rollup
        # Bounded: an always-on trigger would otherwise leak one dict per
        # tick on the driver for the stream's lifetime.
        self.results: "collections.deque" = collections.deque(
            maxlen=keep_results
        )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # The base table is typically written by another process (the
        # replay job); re-read its metadata each tick so new snapshots
        # are seen.
        self.rollup.table.refresh()
        self.results.append(self.rollup.refresh())

    def start(
        self,
        checkpoint_dir: str,
        interval: str = "1 second",
        rows_per_second: int = 1,
    ):
        spark = self.rollup.spark
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
