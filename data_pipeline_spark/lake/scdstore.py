"""Maintained SCD2 history store over the epoch-partitioned changelog.

:mod:`operators.scd` gives the DataFrame-level algebra (full derivation +
exact incremental fold); this module makes it a durable, resumable derived
table: one small parquet relation holding the version history, advanced
epoch-by-epoch off the same change log the replay runner consumes.

Per epoch COMPUTE is O(batch + affected keys) — the fold touches only the
batch's keys; late keys (events at or before a key's stored high-water
mark) rebuild from the retained log slice, which is exactly why the store
keeps the log as its source of truth instead of trusting arrival order.
Commit I/O is O(history) per commit (COW snapshot rewrite), so
:meth:`Scd2Store.refresh` takes ``epochs_per_commit`` to amortize it over
a backlog — the fold is batching-invariant, so grouping is exact.

Durability follows the engine's derived-state convention
(:class:`lake.incremental.IncrementalRollup`): data written to a tmp dir,
renamed in, then the meta pointer (carrying the epoch cursor) fsync-swapped
— the cursor advances in the same atomic commit as the data, so a crash at
any point leaves the previous state intact and a re-run of
:meth:`refresh` is idempotent (exactly-once per epoch).

Deletes: pass ``op`` (or a derived flag) among ``tracked_cols`` to make
delete events open tombstone versions that close the preceding interval —
the SCD2-standard way to keep deletions queryable as history rather than
erased (the latest-state view stays with the lake table; this store is the
history view).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.scd import scd2_apply_batch, scd2_history, scd2_prune
from ..sources import changelog
from .table import _atomic_write

# sentinel: "carry the current meta value through" (vs. explicit None)
_KEEP = object()


class Scd2Store:
    def __init__(
        self,
        spark: SparkSession,
        log_dir: str,
        state_dir: str,
        key_cols: Sequence[str],
        order_cols: Sequence[str],
        tracked_cols: Sequence[str],
    ):
        self.spark = spark
        self.log_dir = log_dir
        self.state_dir = state_dir
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.tracked_cols = list(tracked_cols)
        os.makedirs(state_dir, exist_ok=True)

    # -- state I/O (IncrementalRollup conventions) -------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.state_dir, "meta.json")

    def _meta(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as fh:
            return json.load(fh)

    @property
    def cursor(self) -> int | None:
        """Highest applied epoch (epochs apply in order, contiguously)."""
        m = self._meta()
        return m["epoch"] if m else None

    def read(self) -> DataFrame:
        """The current history (scd2_history output schema with carried
        order columns); empty-schema error if never refreshed."""
        m = self._meta()
        if m is None:
            raise ValueError(f"no SCD2 state at {self.state_dir} — run refresh()")
        return self.spark.read.parquet(os.path.join(self.state_dir, m["data"]))

    @property
    def retention_cutoff(self) -> str | None:
        """Persisted retention cutoff (ISO timestamp string) — versions
        ended at or before it are pruned at every commit."""
        m = self._meta()
        return m.get("retention_cutoff") if m else None

    def _commit(
        self,
        df: DataFrame,
        epoch: int,
        version: int,
        *,
        retention_cutoff=_KEEP,
        stream_batch=_KEEP,
    ) -> None:
        """Atomic state swap. ``retention_cutoff`` / ``stream_batch``
        default to carrying the current meta values through — every commit
        path preserves both ledgers, and callers that change one pass it
        HERE so it lands in the same fsync-swapped meta as the data (a
        crash can never apply the data without its ledger or vice versa).
        """
        cur = self._meta()
        live = cur["data"] if cur else None
        for fn in os.listdir(self.state_dir):
            if fn.startswith(".tmp-") or (fn.startswith("state-v") and fn != live):
                shutil.rmtree(os.path.join(self.state_dir, fn), ignore_errors=True)
        name = f"state-v{version}"
        tmp = tempfile.mkdtemp(dir=self.state_dir, prefix=".tmp-")
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        os.rename(os.path.join(tmp, "data"), os.path.join(self.state_dir, name))
        if retention_cutoff is _KEEP:
            retention_cutoff = cur.get("retention_cutoff") if cur else None
        if stream_batch is _KEEP:
            stream_batch = cur.get("stream_batch") if cur else None
        _atomic_write(
            self._meta_path,
            json.dumps({
                "epoch": epoch,
                "version": version,
                "data": name,
                "retention_cutoff": retention_cutoff,
                "stream_batch": stream_batch,
                "committed_at": time.time(),
            }),
        )
        shutil.rmtree(tmp, ignore_errors=True)
        if live and live != name:
            shutil.rmtree(os.path.join(self.state_dir, live), ignore_errors=True)

    def _parse_cutoff(self, cutoff) -> tuple[str, "F.Column"]:
        """Stringify + VALIDATE a retention cutoff. An unparseable cutoff
        would become NULL inside ``to_timestamp`` and the prune predicate
        ``valid_to > NULL`` would then silently drop every closed version —
        a mass deletion from a typo. Fail fast instead (one metadata-scale
        driver job)."""
        cutoff_s = cutoff.isoformat() if hasattr(cutoff, "isoformat") else str(cutoff)
        # try_to_timestamp: under ANSI a malformed literal makes to_timestamp
        # THROW at plan time; the try_ variant yields NULL so we can raise a
        # clear error either way (and non-ANSI sessions get the same guard).
        parsed = (
            self.spark.range(1)
            .select(F.try_to_timestamp(F.lit(cutoff_s)).alias("t"))
            .first()["t"]
        )
        if parsed is None:
            raise ValueError(
                f"retention cutoff {cutoff!r} does not parse as a timestamp "
                "(pass a datetime or an ISO 'YYYY-MM-DD[ HH:MM:SS]' string)"
            )
        return cutoff_s, F.to_timestamp(F.lit(cutoff_s))

    def prune(self, cutoff) -> int:
        """Apply history retention now and persist the cutoff so every
        subsequent :meth:`refresh` commit re-enforces it (a late-key
        rebuild regenerates log-retained history; the standing cutoff
        re-prunes it). Returns rows remaining. ``cutoff``: timestamp (or
        ISO string) compared against the exclusive ``valid_to``."""
        m = self._meta()
        if m is None:
            raise ValueError(f"no SCD2 state at {self.state_dir} — run refresh()")
        cutoff_s, cutoff_col = self._parse_cutoff(cutoff)
        pruned = scd2_prune(self.read(), cutoff_col)
        # cutoff rides in the SAME commit as the pruned data — a crash
        # between "data pruned" and "cutoff persisted" cannot happen.
        self._commit(
            pruned, epoch=m["epoch"], version=m["version"] + 1,
            retention_cutoff=cutoff_s,
        )
        return self.read().count()

    # -- maintenance -------------------------------------------------------

    def _merged_log_schema(self):
        if getattr(self, "_log_schema", None) is None:
            self._log_schema = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(self.log_dir)
                .schema
            )
        return self._log_schema

    def _project(self, df: DataFrame) -> DataFrame:
        """Project to (keys, tracked, order), null-filling columns a given
        epoch predates (schema evolution: a tracked column added mid-log
        must read as null in older epochs, typed from the merged log
        schema so parquet writes and unions stay typed)."""
        cols = [*self.key_cols, *self.tracked_cols, *self.order_cols]
        have = set(df.columns)
        missing = [c for c in cols if c not in have]
        if not missing:
            return df.select(*cols)
        types = {f.name: f.dataType for f in self._merged_log_schema().fields}
        unknown = [c for c in missing if c not in types]
        if unknown:
            raise ValueError(
                f"column(s) {unknown} exist in no epoch of {self.log_dir}"
            )
        exprs = [
            (F.col(c) if c in have else F.lit(None).cast(types[c])).alias(c)
            for c in cols
        ]
        return df.select(*exprs)

    def refresh(self, epochs_per_commit: int | None = 1) -> dict:
        """Apply every unapplied epoch in order, atomically committing every
        ``epochs_per_commit`` epochs (resumable mid-stream: a crash re-folds
        only the uncommitted group). Returns ``{"applied": [...],
        "versions": n_rows_of_final_state}``.

        Cost note — each commit rewrites the full history relation (COW
        snapshot store), so commit I/O is O(history) PER COMMIT while the
        fold's compute is O(batch + affected keys). When landing a backlog
        of many small epochs, pass a larger group (or ``None`` = all
        pending in ONE commit): the fold is batching-invariant
        (``scd2_apply_batch``'s fold-order property, pinned by test), so
        grouping is exact and cuts the O(history) rewrites by the group
        size. The default of 1 keeps the finest-grained resumability.
        """
        self._log_schema = None  # new epochs may have widened the schema
        done = self.cursor
        epochs = [
            e
            for e in changelog.list_epochs(self.spark, self.log_dir)
            if done is None or e > done
        ]
        step = len(epochs) if epochs_per_commit is None else max(1, epochs_per_commit)
        applied = []
        m = self._meta()
        version = m["version"] if m else 0
        for i in range(0, len(epochs), step):
            group = epochs[i : i + step]
            parts = [
                self._project(changelog.read_epoch(self.spark, self.log_dir, e))
                for e in group
            ]
            batch = parts[0]
            for p in parts[1:]:
                batch = batch.unionByName(p)
            if self._meta() is None:
                h = scd2_history(
                    batch, self.key_cols, self.order_cols, self.tracked_cols,
                    carry_order=True,
                )
            else:
                # retained log slice up to and including this group — only
                # evaluated when the fold actually finds late keys
                retained = self._project(
                    self.spark.read.option("mergeSchema", "true")
                    .parquet(self.log_dir)
                    .where(F.col("epoch") <= group[-1])
                )
                h = scd2_apply_batch(
                    self.read(), batch, self.key_cols, self.order_cols,
                    self.tracked_cols, full_events=retained,
                )
            cutoff = self.retention_cutoff
            if cutoff is not None:
                h = scd2_prune(h, F.to_timestamp(F.lit(cutoff)))
            version += 1
            self._commit(h, epoch=group[-1], version=version)
            applied.extend(group)
        return {
            "applied": applied,
            "versions": self.read().count() if self._meta() else 0,
        }
