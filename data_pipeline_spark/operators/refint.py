"""Cross-stream CDC audits: referential integrity after replay, and
multi-writer conflict detection.

A multi-table CDC ingest (streaming/multitable.py routes one wire into many
tables) preserves per-table exactly-once — but nothing upstream guarantees
the tables stay mutually consistent: a parent row can be deleted while its
children keep arriving, and two writers can race on the same key space.
These operators make both failure modes first-class, queryable facts:

* :func:`orphan_audit` — replay parent and child streams to their final
  LWW states, then report every surviving child whose foreign key points
  at a deleted or never-seen parent, with the reason split
  (``parent_deleted`` vs ``parent_missing``). This is the check a real
  lakehouse runs before exposing a snapshot that a downstream join
  consumes.
* :func:`conflict_audit` — union the writers' streams, replay globally,
  and report per contended key whether the writers' individual final
  states actually disagree (``is_conflict``) and which writer's version
  won under the deterministic resolution order (sequence, then writer
  priority = ascending writer id). Keys only one writer touched never
  reach the conflict check.

Reference analog: the reference runs each store's pipeline independently
and never cross-checks stores (/root/reference/src/bin/*.rs one-binary-per-
store); these audits are part of the multi-table extension.

Scale posture: every step is a keyed hash aggregation (map-side combined —
one ``max_by`` struct per key) followed by ONE equi-join on the foreign
key / conflict key; no windows, no driver-side state. At 10^10 events the
join is key-partitioned and AQE-skew-splittable; the reports are bounded by
the violating keys, not the stream.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DELETE_OPS = ("delete",)


def _final_state(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Per-key last-writer state: one map-side-combinable ``max_by`` agg.

    Returns ``key_cols + (final_op, payload_cols...)`` — the final row
    per key INCLUDING tombstones (callers filter them; the orphan reason
    split needs to see them).
    """
    key_cols = list(key_cols)
    winner = F.max_by(
        F.struct(F.col(op_col).alias("_op"), *[F.col(c) for c in payload_cols]),
        F.col(seq_col),
    )
    agg = df.groupBy(*key_cols).agg(winner.alias("_w"))
    return agg.select(
        *key_cols,
        F.col("_w._op").alias("final_op"),
        *[F.col(f"_w.{c}").alias(c) for c in payload_cols],
    )


def orphan_audit(
    children: DataFrame,
    parents: DataFrame,
    child_key_cols: Sequence[str],
    fk_col: str,
    parent_key_col: str,
    seq_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Surviving child rows whose foreign key has no surviving parent.

    Output: ``child_key_cols + (fk_col, reason)`` where reason is
    ``parent_deleted`` (the parent's final state is a tombstone) or
    ``parent_missing`` (no event for that parent key at all — a broken
    or reordered wire, or a fk written before its parent's insert
    replicated).

    The child's surviving fk is its LWW fk (an update can re-point a
    child), so an audit after a fk-churn burst judges the final edge,
    not a historical one.
    """
    child_key_cols = list(child_key_cols)
    kids = _final_state(
        children, child_key_cols, seq_col, op_col, [fk_col]
    ).where(~F.col("final_op").isin(*DELETE_OPS))
    pars = _final_state(parents, [parent_key_col], seq_col, op_col, [])
    joined = kids.join(
        pars, kids[fk_col] == pars[parent_key_col], "left"
    )
    # kids carries its own final_op too; disambiguate via the frames.
    reason = F.when(
        pars[parent_key_col].isNull(), F.lit("parent_missing")
    ).otherwise(
        F.when(
            pars["final_op"].isin(*DELETE_OPS), F.lit("parent_deleted")
        ).otherwise(F.lit(None))
    )
    return (
        joined.select(
            *[kids[c] for c in child_key_cols],
            kids[fk_col].alias(fk_col),
            reason.alias("reason"),
        )
        .where(F.col("reason").isNotNull())
    )


def conflict_audit(
    streams: Sequence[tuple[int, DataFrame]],
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Multi-writer conflict report over the union of writers' streams.

    ``streams`` is ``[(writer_id, frame), ...]``; frames share
    ``key_cols + seq_col + op_col + payload_cols``. For every key touched
    by MORE THAN ONE writer the report carries:

    * ``n_writers`` — how many writers touched the key;
    * ``is_conflict`` — whether the writers' individual final states
      (op + payload) actually differ (two writers idempotently writing
      the same value is contention, not a conflict);
    * ``winner_writer``, ``winner_seq``, ``final_op`` + payload — the
      global resolution under LWW by (seq, writer_id): highest sequence
      wins, ties broken toward the LOWEST writer id (deterministic and
      total, so replaying the same streams always resolves identically).

    One union → one hash agg (all per-key facts ride a single
    ``max_by`` + count(distinct) pass); no self-join of the stream.
    """
    key_cols = list(key_cols)
    tagged = None
    for wid, df in streams:
        t = df.select(
            *key_cols,
            F.lit(int(wid)).alias("_writer"),
            F.col(seq_col).alias("_seq"),
            F.col(op_col).alias("_op"),
            *[F.col(c) for c in payload_cols],
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    if tagged is None:
        raise ValueError("conflict_audit needs at least one stream")

    # Global winner: max_by on (seq, -writer) — highest seq, lowest writer.
    rank = F.struct(
        F.col("_seq").alias("s"), (-F.col("_writer")).alias("nw")
    )
    winner = F.max_by(
        F.struct(
            F.col("_writer").alias("w"),
            F.col("_seq").alias("q"),
            F.col("_op").alias("o"),
            *[F.col(c) for c in payload_cols],
        ),
        rank,
    )
    # Distinct final state per writer: collect each writer's OWN winner,
    # then count distinct (op, payload) images among them. Two-level agg:
    # writer-local winners first (map-side combined on (key, writer)),
    # then the key-level rollup — both hash aggs, no window.
    per_writer = tagged.groupBy(*key_cols, "_writer").agg(
        F.max_by(
            F.struct(F.col("_op").alias("o"), *[F.col(c) for c in payload_cols]),
            F.col("_seq"),
        ).alias("_local")
    )
    key_facts = per_writer.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n_writers"),
        (F.count_distinct(F.col("_local")) > 1).alias("is_conflict"),
    )
    resolved = tagged.groupBy(*key_cols).agg(winner.alias("_win"))
    return (
        key_facts.where(F.col("n_writers") > 1)
        .join(resolved, key_cols)
        .select(
            *key_cols,
            "n_writers",
            "is_conflict",
            F.col("_win.w").alias("winner_writer"),
            F.col("_win.q").alias("winner_seq"),
            F.col("_win.o").alias("final_op"),
            *[F.col(f"_win.{c}").alias(c) for c in payload_cols],
        )
    )
