"""Column-level partial updates (sparse patch apply) — CDC sources that
emit only the changed fields (MongoDB oplog $set, JSON-Patch, Debezium
with incomplete images) instead of full after-rows.

Semantics: patches carry (key, lsn, op, patch: map<col, value>). Replaying
them in lsn order onto a base snapshot gives, for every key and column,
*the value of the latest patch that set that column* (else the base
value), with deletes erasing the row and later patches resurrecting the
key from nothing (unset columns NULL).

Spark-first shape — the naive replay is per-key sequential; the insight is
that "latest patch that set column c, after the last delete" is just
per-COLUMN last-writer-wins, so the whole replay collapses into ONE hash
aggregation (`max_by(patch[c], lsn)` per column, all map-side combinable —
a hot key's million patches collapse to one row per partition before the
shuffle, same skew posture as `lww_dedup`) plus ONE full-outer equi-join
against the base. No window, no iteration, no per-row Python; cost is
O(patches) regardless of how many patches pile onto one key.

The reference has no partial-update path (its sources always re-send full
records, SURVEY.md §1.1); this generalizes the engine's D1 LWW to the
sparse encoding its CDC users meet in the wild.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def apply_patches(
    base: DataFrame,
    patches: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    patch_col: str = "patch",
) -> DataFrame:
    """Fold sparse patches onto ``base``; returns the final snapshot with
    ``key_cols + value_cols`` (patch values cast to each base column's
    type).

    ``patches`` ops: ``upsert`` rows apply their ``patch`` map; ``delete``
    rows erase the key at their lsn (base image gone; only *later* patches
    contribute). A key never seen in ``base`` is created by its patches.
    """
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    types = dict(base.select(*value_cols).dtypes)

    lsn = F.col(lsn_col)
    is_del = F.col(op_col) == "delete"
    del_lsn = F.max(F.when(is_del, lsn)).alias("_del_lsn")
    # Per-column LWW among patches that set the column AND survive the last
    # delete. Two-pass trick in one aggregation: max_by ignores rows whose
    # ordering expr is NULL, so gating the ordering expr on "sets column c"
    # selects the right patch; the delete cutoff is applied afterwards by
    # comparing each winner's lsn against _del_lsn.
    sets_c = lambda c: F.when(~is_del & F.map_contains_key(F.col(patch_col), F.lit(c)), lsn)  # noqa: E731
    aggs = [del_lsn, F.max(F.when(~is_del, lsn)).alias("_last_patch_lsn")]
    for c in value_cols:
        aggs.append(
            F.max_by(F.element_at(F.col(patch_col), F.lit(c)), sets_c(c)).alias(f"_v_{c}")
        )
        aggs.append(F.max(sets_c(c)).alias(f"_l_{c}"))
    folded = patches.groupBy(*key_cols).agg(*aggs)

    joined = base.withColumn("_in_base", F.lit(True)).join(
        folded, on=key_cols, how="full_outer"
    )
    in_base = F.col("_in_base").isNotNull()
    dele = F.col("_del_lsn")
    never_deleted = dele.isNull()
    # Key survives iff (in base and never deleted) or any patch after the
    # last delete.
    resurrected = F.col("_last_patch_lsn") > dele
    alive = (in_base & never_deleted) | (
        F.col("_last_patch_lsn").isNotNull() & (never_deleted | resurrected)
    )

    out_cols = []
    for c in value_cols:
        patched_val = F.col(f"_v_{c}").cast(types[c])
        patch_wins = F.col(f"_l_{c}").isNotNull() & (
            never_deleted | (F.col(f"_l_{c}") > dele)
        )
        base_val = F.when(in_base & never_deleted, F.col(c))
        out_cols.append(
            F.when(patch_wins, patched_val).otherwise(base_val).alias(c)
        )
    return joined.where(alive).select(*key_cols, *out_cols)
