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
``sum_cols`` entry. Averages are derived (sum/n) at read time; aggregates
needing full history (min/max under deletes) are out of scope and
documented as such — that is the same contract Materialize/Flink give for
retractable vs non-retractable aggregates.

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
    ):
        self.spark = spark
        self.table = table
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

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

    def read(self) -> DataFrame:
        """Current rollup: (group_cols, n_rows, sum_*...)."""
        m = self._meta()
        if m is None:
            raise ValueError("rollup has no state yet — call refresh()")
        return self.spark.read.parquet(
            os.path.join(self.state_dir, m["data"])
        )

    def _commit(self, df: DataFrame, snapshot_id: int, version: int) -> None:
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
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        final = os.path.join(self.state_dir, name)
        os.rename(os.path.join(tmp, "data"), final)
        _atomic_write(  # write+flush+fsync+replace, same as table metadata
            self._meta_path,
            json.dumps({
                "snapshot_id": snapshot_id,
                "version": version,
                "data": name,
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
            state = self._contrib(
                self.table.read(snapshot_id=to_snap or None), +1
            )
            self._commit(state, to_snap, (m["version"] + 1) if m else 1)
            return {"mode": "full", "from": None, "to": to_snap}
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
        merged = self._merge_deltas(
            [self.read(), delta], prune=True
        ).localCheckpoint(eager=True)  # sever lineage from the OLD state
        # files before the commit swaps them out underneath the plan
        self._commit(merged, to_snap, m["version"] + 1)
        return {
            "mode": "incremental",
            "from": from_snap,
            "to": to_snap,
            "changed_keys": n_changed,
            "buckets_scanned": len(buckets),
        }
