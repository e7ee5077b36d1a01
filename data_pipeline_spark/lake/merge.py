"""Generic declarative MERGE — a Delta-/Iceberg-style clause builder
compiled to ONE equi-join Spark plan.

The reference pipeline's only merge is the hard-wired per-key LWW upsert
(`/root/reference/src/storage/mod.rs` store-latest semantics), which
:meth:`LakeTable.merge` implements.  Real lake users also need the general
form::

    MERGE INTO target t USING source s ON t.k = s.k
    WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE
    WHEN NOT MATCHED [AND cond] THEN INSERT ...
    WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... | DELETE

Semantics (Delta-compatible):

- clauses are evaluated in declaration order within their group; the FIRST
  clause whose condition holds acts on the row, later clauses are ignored;
- a (matched) target row whose matched-clauses all fail passes through
  unchanged; an unmatched source row whose insert-clauses all fail is
  dropped; a by-source target row whose by-source-clauses all fail passes
  through unchanged;
- more than one source row matching one target row makes UPDATE/DELETE
  nondeterministic — :meth:`MergeBuilder.validate_source_unique` (run by
  the lake apply path by default) raises ``MergeCardinalityError`` exactly
  like Delta's ``DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE``.

Physical plan (scale posture at 10^10 rows):

- ONE full-outer (or left-outer when no insert clause needs source-only
  rows) equi-join on the key columns — a single shuffle, broadcastable
  when the source is small; every clause becomes a CASE branch over a
  precomputed action ordinal, so no per-clause passes and no second join;
- row presence is tracked with explicit ``__t_present``/``__s_present``
  literals, not key-null checks, so null join keys cannot fake a match;
- the lake apply path (:func:`merge_into`) bucket-prunes the target scan
  to the source's buckets whenever no BY SOURCE clause exists (rows in
  other buckets cannot match by the bucket-hash argument) — commit cost
  O(touched buckets), untouched files carried by reference.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MergeCardinalityError(RuntimeError):
    """Multiple source rows matched one target row for an UPDATE/DELETE."""


def _as_col(expr) -> Column:
    return F.expr(expr) if isinstance(expr, str) else expr


@dataclass
class _Clause:
    group: str  # "matched" | "not_matched" | "by_source"
    action: str  # "update" | "delete" | "insert"
    condition: Column | None
    assignments: dict | None  # None => "SET *" / "INSERT *"


class MergeBuilder:
    """Build a MERGE clause set over two DataFrames and compile it.

    ``target`` and ``source`` are referenced in conditions/assignments by
    the SQL aliases ``t`` and ``s`` (pass strings — they go through
    ``F.expr`` — or Columns built with ``F.col("s.x")``).
    """

    def __init__(self, target: DataFrame, source: DataFrame, on: list[str]):
        if not on:
            raise ValueError("MERGE needs at least one key column in `on`")
        missing = [k for k in on if k not in target.columns or k not in source.columns]
        if missing:
            raise ValueError(f"key columns missing from target or source: {missing}")
        self.target = target
        self.source = source
        self.on = list(on)
        self.clauses: list[_Clause] = []

    # -- clause surface ----------------------------------------------------------

    def when_matched_update(self, set: dict | None = None, condition=None):
        self.clauses.append(_Clause("matched", "update", _maybe(condition), set))
        return self

    def when_matched_delete(self, condition=None):
        self.clauses.append(_Clause("matched", "delete", _maybe(condition), None))
        return self

    def when_not_matched_insert(self, values: dict | None = None, condition=None):
        self.clauses.append(_Clause("not_matched", "insert", _maybe(condition), values))
        return self

    def when_not_matched_by_source_update(self, set: dict, condition=None):
        self.clauses.append(_Clause("by_source", "update", _maybe(condition), set))
        return self

    def when_not_matched_by_source_delete(self, condition=None):
        self.clauses.append(_Clause("by_source", "delete", _maybe(condition), None))
        return self

    # -- validation --------------------------------------------------------------

    @property
    def has_by_source(self) -> bool:
        return any(c.group == "by_source" for c in self.clauses)

    @property
    def has_insert(self) -> bool:
        return any(c.group == "not_matched" for c in self.clauses)

    def validate_source_unique(self) -> None:
        """Raise if several source rows share a key while any matched clause
        exists (Delta's ambiguous-merge error). One small agg job over the
        source only — the target is never touched."""
        if not any(c.group == "matched" for c in self.clauses):
            return
        dup = (
            self.source.groupBy(*self.on)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {k: dup[0][k] for k in self.on}
            raise MergeCardinalityError(
                f"source has {dup[0]['n']} rows for key {key}; "
                "UPDATE/DELETE on a multiply-matched target row is "
                "nondeterministic (dedup the source first)"
            )

    # -- compile -----------------------------------------------------------------

    def plan(
        self, include_action: bool = False, keep_deletes: bool = False
    ) -> DataFrame:
        """The post-merge table image (target schema), as one lazy plan.

        ``include_action`` (internal, used by the lake apply path) appends
        the ``__action`` clause ordinal (-1 = pass-through) so the caller
        can distinguish rows the merge actually changed.

        ``keep_deletes`` (internal, lake apply path) keeps rows a DELETE
        clause claimed — identified by their ``__action`` ordinal, values
        passed through from the target side — so the caller can turn them
        into winner tombstones instead of losing them."""
        if not self.clauses:
            raise ValueError("MERGE needs at least one WHEN clause")
        t = self.target.withColumn("__t_present", F.lit(True)).alias("t")
        s = self.source.withColumn("__s_present", F.lit(True)).alias("s")
        on_cond = functools.reduce(
            lambda a, b: a & b,
            [F.col(f"t.{k}") == F.col(f"s.{k}") for k in self.on],
        )
        how = "full_outer" if self.has_insert else "left_outer"
        j = t.join(s, on_cond, how)

        t_present = F.coalesce(F.col("t.__t_present"), F.lit(False))
        s_present = F.coalesce(F.col("s.__s_present"), F.lit(False))
        group_pred = {
            "matched": t_present & s_present,
            "not_matched": ~t_present & s_present,
            "by_source": t_present & ~s_present,
        }

        # First-match-wins ordinal: clause i acts iff its group predicate and
        # condition hold and no earlier clause of the same group fired.
        # Groups are disjoint, so one global F.when chain in declaration
        # order implements exactly that.
        action = None
        for i, c in enumerate(self.clauses):
            pred = group_pred[c.group]
            if c.condition is not None:
                pred = pred & c.condition
            action = (action.when(pred, i) if action is not None else F.when(pred, i))
        # -1 = pass-through (target rows no clause touched); -2 = drop
        # (source-only rows with no applicable insert).
        action = action.otherwise(F.when(t_present, F.lit(-1)).otherwise(F.lit(-2)))
        j = j.select(F.col("*"), action.alias("__action"))

        drop_ordinals = [-2] if keep_deletes else [
            i for i, c in enumerate(self.clauses) if c.action == "delete"
        ] + [-2]
        kept = j.where(~F.col("__action").isin(drop_ordinals))

        out_cols = []
        tgt_fields = {f.name: f for f in self.target.schema.fields}
        for name, field in tgt_fields.items():
            col = F.col(f"t.{name}")
            for i, c in enumerate(self.clauses):
                if c.action == "delete":
                    continue
                expr = self._clause_value(c, name)
                if expr is not None:
                    col = F.when(F.col("__action") == i, expr).otherwise(col)
            out_cols.append(col.cast(field.dataType).alias(name))
        if include_action:
            out_cols.append(F.col("__action"))
        return kept.select(*out_cols)

    def _clause_value(self, c: _Clause, name: str) -> Column | None:
        """The value clause ``c`` assigns to output column ``name`` (None =
        clause leaves the column at its default for its row class)."""
        if c.action == "update":
            if c.assignments is None:  # UPDATE SET * — source value if present
                if name in self.source.columns and name not in self.on:
                    return F.col(f"s.{name}")
                return None
            if name in c.assignments:
                return _as_col(c.assignments[name])
            return None
        if c.action == "insert":
            if c.assignments is None:  # INSERT * — source value or NULL
                return (
                    F.col(f"s.{name}") if name in self.source.columns else F.lit(None)
                )
            # explicit values: unassigned columns are NULL on an insert row
            # (the target side is all-null there anyway)
            if name in c.assignments:
                return _as_col(c.assignments[name])
            return F.lit(None)
        return None


def _maybe(condition) -> Column | None:
    return None if condition is None else _as_col(condition)


def merge_frames(target: DataFrame, source: DataFrame, on: list[str]) -> MergeBuilder:
    """Entry point for the pure-DataFrame form (no lake table involved)."""
    return MergeBuilder(target, source, on)


class LakeMergeBuilder(MergeBuilder):
    """MERGE INTO a :class:`LakeTable`: same clause surface, plus an atomic
    bucket-pruned copy-on-write commit.

    Created via ``LakeTable.merge_builder(source, on=...)``; finish with
    :meth:`execute`.  The target DataFrame is bound lazily at execute time
    so bucket pruning can see the final clause set.
    """

    def __init__(self, table, source: DataFrame, on: list[str] | None = None):
        on = list(on) if on is not None else [table.key_col]
        missing = [k for k in on if k not in source.columns]
        if missing:
            raise ValueError(f"key columns missing from source: {missing}")
        schema_cols = {f.name for f in table.schema.fields}
        bad = [k for k in on if k not in schema_cols]
        if bad:
            raise ValueError(f"key columns missing from table schema: {bad}")
        # Bind a placeholder target; execute() swaps in the pruned scan.
        self.table = table
        self.source = source
        self.on = on
        self.clauses = []
        self.target = None  # type: ignore[assignment]

    def _touched_buckets(self) -> list[int] | None:
        """Buckets the merge can touch, or None for all.

        Rows in buckets the source doesn't hash to can never MATCH (same
        bucket function on both sides) and inserts land in source-key
        buckets — so when no BY SOURCE clause exists and the table's bucket
        key is a merge key, only the source's buckets are read/rewritten.
        """
        if self.has_by_source or self.table.key_col not in self.on:
            return None
        row = (
            self.source.select(
                F.collect_set(
                    F.pmod(
                        F.xxhash64(F.col(self.table.key_col)),
                        F.lit(self.table.n_buckets),
                    )
                ).alias("b")
            ).collect()
        )
        return sorted(row[0]["b"]) if row else []

    def execute(
        self,
        epoch: int | None = None,
        validate: bool = True,
        branch: str | None = None,
        extra_summary: dict | None = None,
        lsn: int | None = None,
    ) -> dict:
        """Apply the clause set and commit one snapshot.

        ``epoch`` gives exactly-once semantics (re-applying a committed
        epoch is a no-op), same ledger as :meth:`LakeTable.merge`.
        ``lsn`` stamps rewritten rows' ``__lsn``; the default is the row's
        stored lsn + 1 (0 for fresh inserts) — IN the event-lsn space, so
        a clause-touched row dominates every event already applied for its
        key (an at-least-once redelivery ties on ts and loses on lsn) while
        any genuinely newer event still wins. A snapshot-counter stamp
        would be meaningless against event lsns.
        """
        from .table import BUCKET_COL, DELETED_COL, LSN_COL

        tbl = self.table
        tbl._require_branch(branch)
        if epoch is not None and epoch in tbl.committed_epochs():
            return {"skipped": True, "epoch": epoch, "reason": "epoch already committed"}
        if validate:
            self.validate_source_unique()

        touched = self._touched_buckets()
        head = tbl._head(branch)
        # Spec-aware split (bucket evolution): legacy-spec files are
        # conservatively selected and rewritten under the current spec;
        # carried is exactly the complement.
        selected, carried = tbl._split_by_buckets(tbl.files_of(head), touched)
        raw = tbl._read_files(selected)
        if head is not None and head.get("needs_resolve"):
            raw = tbl._resolve(raw)
        is_del = F.coalesce(F.col(DELETED_COL), F.lit(False))
        tombs = raw.where(is_del)
        # The live view keeps each row's stored LSN as a hidden passthrough
        # column: rows no clause touches must retain their original
        # (order_col, lsn) LWW coordinates, or a later re-delivered event
        # would compare against a meaningless snapshot-counter LSN.
        self.target = (
            raw.where(~is_del)
            .drop(DELETED_COL)
            .withColumnRenamed(LSN_COL, "__t_lsn")
        )
        merged = self.plan(include_action=True, keep_deletes=True)
        insert_ords = [
            i for i, c in enumerate(self.clauses) if c.action == "insert"
        ]
        delete_ords = [
            i for i, c in enumerate(self.clauses) if c.action == "delete"
        ]
        # Winner tombstones are live metadata: they are what stops a late
        # out-of-order CDC event from resurrecting a deleted key. A merge
        # rewrite must carry them — EXCEPT for keys the merge actually
        # INSERTS (an explicit INSERT establishes a new baseline; keeping
        # the old tombstone would non-deterministically re-delete the key
        # at the next LWW resolve). Source keys whose insert clause did
        # NOT fire keep their tombstone — erasing on mere source presence
        # would let a late out-of-order event resurrect the key. (The
        # anti-join's right side re-derives the merge plan; the extra pass
        # is O(touched buckets), the same bound as the rewrite itself.)
        if tbl.key_col in self.on and insert_ords:
            inserted = (
                merged.where(F.col("__action").isin(insert_ords))
                .select(tbl.key_col)
                .distinct()
            )
            tombs = tombs.join(inserted, tbl.key_col, "left_anti")

        snapshot_id = tbl._next_snapshot_id()
        new_lsn = (
            F.coalesce(F.col("__t_lsn"), F.lit(-1)) + 1
            if lsn is None
            else F.lit(lsn)
        )
        stamp = F.when(F.col("__action") >= 0, new_lsn).otherwise(
            F.coalesce(F.col("__t_lsn"), F.lit(-1))
        )
        # Rows a DELETE clause claimed become winner tombstones (stamped
        # with the NEW lsn so they win LWW against late redeliveries) —
        # the same protection the CDC delete path writes; simply dropping
        # them would let an at-least-once redelivery resurrect the key.
        clause_deleted = (
            F.col("__action").isin(delete_ords) if delete_ords else F.lit(False)
        )
        out = (
            merged.withColumn(LSN_COL, stamp.cast("long"))
            .withColumn(DELETED_COL, clause_deleted)
            .drop("__action", "__t_lsn")
        )
        out = out.unionByName(tombs.select(*out.columns)).withColumn(
            BUCKET_COL, tbl._bucket_expr()
        )
        new_files = tbl._write_data_files(out, snapshot_id)
        summary = {
            "operation": "merge-into",
            "clauses": len(self.clauses),
            "touched-buckets": "all" if touched is None else len(touched),
            "new-files": len(new_files),
            "carried-files": len(carried),
            **(extra_summary or {}),
        }
        if epoch is not None:
            summary["engine.epoch"] = epoch
        # A full rewrite (touched is None) collapses every bucket to one
        # version per key, so scan-time LWW resolution is no longer needed;
        # a pruned rewrite leaves untouched buckets as they were.
        snap = tbl._commit(
            carried + new_files,
            summary,
            needs_resolve=False if touched is None else None,
            branch=branch,
        )
        return {
            "skipped": False,
            "epoch": epoch,
            "snapshot_id": snap["snapshot_id"],
            "touched_buckets": touched,
            "new_files": len(new_files),
        }


def filter_unchanged(
    table,
    staged: DataFrame,
    compare_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
    observation=None,
) -> DataFrame:
    """No-op-update suppression: drop staged non-delete rows whose
    ``compare_cols`` are (null-safely) byte-equal to the stored row.

    At 10^10 change events over web pages, MOST re-crawls carry an
    unchanged payload; applying them anyway is pure write amplification —
    cow re-rewrites the bucket for nothing, mor appends a redundant
    version per event that compaction must later collapse. This pre-merge
    filter costs one bucket-pruned read of the CURRENT state (O(epoch ∩
    buckets), the same bound as a cow merge) joined once against the
    staged frame on the key.

    Semantics caveat (documented, inherent to no-op suppression in any
    engine): a suppressed event does not advance the stored row's
    ``(ts, lsn)``. If a LATER out-of-order event with a ts between the
    stored and the suppressed one arrives afterwards, it now wins, where
    full replay would have kept the (content-identical) suppressed event.
    Content never regresses to a third value — only the winning timestamp
    can differ — so this is safe when per-key events arrive in ts order
    (a crawl tail) and acceptable wherever Debezium's own no-op skipping
    is. Deletes always pass through.

    Pass an ``Observation`` to count suppressions on the merge job itself
    (read it only after the merge ran — a skipped epoch never executes
    this plan). Returns the filtered frame with staged columns unchanged.
    """
    key = table.key_col
    # Metadata-scale collect (≤ n_buckets values) to prune the target read,
    # same policy as the merge path's touched-bucket observation.
    touched = [
        r["b"]
        for r in staged.select(table._bucket_expr().alias("b")).distinct().collect()
    ]
    t_cols = [f"__t_{c}" for c in compare_cols]
    cur = table.read(buckets=touched).select(
        F.col(key).alias("__t_key"),
        F.lit(True).alias("__t_present"),
        *[F.col(c).alias(tc) for c, tc in zip(compare_cols, t_cols)],
    )
    same = F.col("__t_present").isNotNull()
    for c, tc in zip(compare_cols, t_cols):
        same = same & F.col(c).eqNullSafe(F.col(tc))
    unchanged = F.coalesce(
        same & (F.col(op_col) != F.lit(delete_op)), F.lit(False)
    )
    out = staged.join(cur, F.col(key) == F.col("__t_key"), "left")
    if observation is not None:
        out = out.observe(
            observation,
            F.sum(F.when(unchanged, 1).otherwise(0)).alias("suppressed"),
            F.count(F.lit(1)).alias("staged_total"),
        )
    return out.where(~unchanged).drop("__t_key", "__t_present", *t_cols)
