"""SCD Type-2 history derivation from a change log, plus point-in-time lookup.

A CDC engine that only materializes "latest state" (D1 LWW) loses the
dimension history warehouses actually query: *what was this url's record
when the event happened?* SCD2 is the standard answer — one row per
(key, version interval) with ``valid_from`` / ``valid_to`` bounds — and
deriving it from the change log is a pure event-time computation.

The reference pipeline stores only latest-state product rows (its lake
write is overwrite-newest, /root/reference/src/storage/minio_client.rs:219-228);
history derivation is part of the engine's CDC extension surface, in the
same family as the net-change feed (lake/diff.py) and as-of join
(operators/asof.py).

Scale posture — ONE keyed shuffle, no self-join:

- The naive SCD2 build is "join each version to the next version per key"
  (a self-join, two shuffles, and quadratic under hot keys). This module
  instead sorts each key's versions once (window partitioned by key),
  detects tracked-attribute changes with null-safe ``lag`` compares,
  filters to version starts, and takes ``lead(valid_from)`` for the
  closing bound — the filter preserves the hash distribution, so Catalyst
  reuses the exchange: both Window nodes sit on a single shuffle (pinned
  in tests/test_plans.py).
- Versions-per-key is bounded in practice (and enforceable upstream by
  changelog compaction, sources/logcompact.py); a pathological hot key
  behaves like any keyed window — salt upstream or compact first.
- Consecutive events whose tracked columns are unchanged collapse into
  one interval (true SCD2: a no-op update does not open a new version).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .asof import asof_join


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    tracked_cols: Sequence[str],
    valid_from_col: str | None = None,
    carry_order: bool = False,
) -> DataFrame:
    """Collapse a change log into SCD2 version intervals.

    Parameters
    ----------
    df : change events, one row per version event.
    key_cols : entity identity (e.g. ``url``).
    order_cols : total per-key event order (e.g. ``(warc_ts, lsn)``); the
        FIRST order column is the event-time axis used for the validity
        bounds, the rest are tie-breakers.
    tracked_cols : attributes whose change opens a new version; events
        where every tracked column is null-safe-equal to the previous
        event's are collapsed into the open interval.
    valid_from_col : column carrying the version's effective time; defaults
        to ``order_cols[0]``.

    Returns one row per version: ``key_cols + tracked_cols + (valid_from,
    valid_to, version, is_current)``. ``valid_to`` is exclusive and null on
    the current version; ``version`` numbers from 1 in event order.

    ``carry_order=True`` additionally emits, for :func:`scd2_apply_batch`:
    ``start_<c>`` for every order column beyond the first (the start
    event's tie-break values — keep the per-key total order stable across
    incremental rebuilds) and ``seen_<c>`` for every order column (the
    key's event high-water mark — the max order tuple over ALL events of
    the key, including collapsed no-ops, which the version rows otherwise
    forget; it is what lets the incremental fold detect late events).
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    tracked_cols = list(tracked_cols)
    ts = valid_from_col or order_cols[0]

    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    if carry_order:
        # Per-key max order tuple over the FULL event input — computed
        # before collapse, same partitioning (no extra shuffle).
        w_all = Window.partitionBy(*key_cols)
        df = df.withColumn(
            "_seen", F.max(F.struct(*[F.col(c) for c in order_cols])).over(w_all)
        )
    first_row = F.lag(F.lit(1)).over(w).isNull()
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    starts = df.withColumn("_new_version", first_row | changed).where(
        F.col("_new_version")
    )
    # The filter keeps the hash distribution on key_cols, so this second
    # window reuses the first one's exchange (one shuffle total).
    out = (
        starts.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("version", F.row_number().over(w).cast("long"))
        .withColumn("is_current", F.lead(F.lit(1)).over(w).isNull())
    )
    carry = []
    if carry_order:
        carry = [F.col(c).alias(f"start_{c}") for c in order_cols[1:]] + [
            F.col("_seen")[c].alias(f"seen_{c}") for c in order_cols
        ]
    return out.select(
        *key_cols, *tracked_cols, "valid_from", "valid_to", "version",
        "is_current", *carry,
    )


def scd2_apply_batch(
    history: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    tracked_cols: Sequence[str],
    full_events: DataFrame | None = None,
) -> DataFrame:
    """Incremental SCD2 maintenance: fold one batch of change events into an
    existing history (built with ``carry_order=True``) — O(batch + affected
    keys' history), never O(table).

    Only the batch's keys are touched; unaffected keys' rows pass through
    untouched (one semi/anti join pair over the same scan). Affected keys
    split by the stored high-water mark (``seen_<c>``):

    - **In-order keys** (every batch event strictly after the key's
      high-water, and brand-new keys): version STARTS are projected back
      to events and re-derived together with the batch. This is EXACT:
      the new events' change-detection compares against the last seen
      event, whose tracked values equal the current version start's by
      construction — interior collapsed events can't matter because
      nothing lands among them.
    - **Late keys** (some batch event at or before the high-water):
      rebuilding from starts is NOT exact — collapse drops no-op events,
      and a late event landing between a dropped no-op and its
      predecessor changes whether that no-op is a change (information the
      history no longer has). These keys are rebuilt from
      ``full_events`` (the retained event stream — in this engine the
      changelog IS retained), semi-joined to just the late keys. Without
      ``full_events`` a late batch raises rather than silently writing a
      wrong history.

    The fold is idempotent under redelivery and, given ``full_events``,
    any batch split in any order converges to the full-stream history
    (pinned by property test).
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    tracked_cols = list(tracked_cols)
    ts, tiebreaks = order_cols[0], order_cols[1:]

    def order_struct(prefix: str = ""):
        return F.struct(*[F.col(f"{prefix}{c}") for c in order_cols])

    # Every join below streams the BIG frame (history / full_events — which
    # are union-shaped after a prior fold) against a BROADCAST key set.
    # Broadcast is both the scale-correct plan (batch key sets are the small
    # side by construction) and deliberately avoids sort-merge joins on a
    # Union input, whose claimed output partitioning Spark can trust into a
    # runtime "Can't zip RDDs with unequal numbers of partitions" failure.
    affected = F.broadcast(
        batch.groupBy(*key_cols).agg(F.min(order_struct()).alias("_bmin"))
    )
    seen = history.where("is_current").select(
        *key_cols, order_struct("seen_").alias("_seen")
    )
    # inner join (history keys ∩ batch keys): keys new to the history can't
    # be late; build side = the broadcast batch key set.
    late_keys = F.broadcast(
        seen.join(affected, key_cols)
        .where(F.col("_bmin") <= F.col("_seen"))
        .select(*key_cols)
    )
    inorder_keys = F.broadcast(
        affected.join(late_keys, key_cols, "left_anti").select(*key_cols)
    )

    untouched = history.join(
        affected.select(*key_cols), key_cols, "left_anti"
    )

    h_events = history.join(inorder_keys, key_cols, "left_semi").select(
        *key_cols,
        *tracked_cols,
        F.col("valid_from").alias(ts),
        *[F.col(f"start_{c}").alias(c) for c in tiebreaks],
    )
    e_cols = [*key_cols, *tracked_cols, ts, *tiebreaks]
    e_inorder = batch.join(inorder_keys, key_cols, "left_semi").select(*e_cols)
    rebuilt = scd2_history(
        h_events.unionByName(e_inorder), key_cols, order_cols, tracked_cols,
        carry_order=True,
    )
    # scd2_history renumbers from 1; a PRUNED key's surviving versions start
    # above 1 (scd2_prune keeps original numbers for auditability), so add
    # back each key's stored numbering base. Only pruned keys carry a
    # non-zero base — the broadcast stays batch-key-bounded.
    vbase = F.broadcast(
        history.join(inorder_keys, key_cols, "left_semi")
        .groupBy(*key_cols)
        .agg((F.min("version") - F.lit(1)).cast("long").alias("_vbase"))
        .where(F.col("_vbase") > 0)
    )
    rebuilt = (
        rebuilt.join(vbase, key_cols, "left")
        .withColumn(
            "version",
            F.col("version") + F.coalesce(F.col("_vbase"), F.lit(0).cast("long")),
        )
        .drop("_vbase")
    )

    n_late = late_keys.count()  # metadata-scale job; 0 on the hot path
    if n_late:
        if full_events is None:
            raise ValueError(
                f"{n_late} key(s) have late events (at or before their "
                "stored high-water mark); pass full_events (the retained "
                "event stream) to rebuild them exactly"
            )
        l_events = full_events.join(late_keys, key_cols, "left_semi").select(
            *e_cols
        )
        l_batch = batch.join(late_keys, key_cols, "left_semi").select(*e_cols)
        rebuilt_late = scd2_history(
            # union the batch too: exact duplicates collapse as no-ops, so
            # it is safe whether or not the log already carries the batch
            l_events.unionByName(l_batch),
            key_cols, order_cols, tracked_cols, carry_order=True,
        )
        rebuilt = rebuilt.unionByName(rebuilt_late)

    return untouched.unionByName(rebuilt)


def scd2_prune(history: DataFrame, cutoff, valid_to_col: str = "valid_to") -> DataFrame:
    """History retention: drop versions whose interval ended at or before
    ``cutoff`` — exactly the rows no point-in-time query at t >= cutoff can
    ever return (``valid_to`` is exclusive, so a version ending exactly AT
    the cutoff is already superseded there). The version covering the
    cutoff and everything after survive, so :func:`scd2_lookup` results are
    byte-identical for all probes at or after the cutoff (pinned in tests);
    original version numbers are kept for auditability (a pruned key's
    numbering starts above 1).

    Incremental-maintenance caveat: align the cutoff with changelog
    retention/compaction (sources/logcompact.py) — a late event older than
    the cutoff triggers a rebuild from the retained log, which regenerates
    whatever history the log still carries.
    """
    return history.where(
        F.col(valid_to_col).isNull() | (F.col(valid_to_col) > F.lit(cutoff))
    )


def scd2_lookup(
    history: DataFrame,
    probes: DataFrame,
    key_cols: Sequence[str],
    probe_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Point-in-time lookup: each probe row gains the tracked values of the
    version whose ``[valid_from, valid_to)`` interval contains its
    timestamp (null when the probe precedes the first version).

    Built on :func:`asof_join` (union + keyed sort + running ``last``), so
    it is ONE shuffle with no range-join row explosion — a probe at exactly
    ``valid_from`` matches the version taking effect at that instant,
    which is precisely the interval semantics (``valid_to`` exclusive).

    Values ride wrapped in a single struct: ``asof_join``'s bare-column
    carry treats NULL as "no update" and would return the PREVIOUS
    version's value for probes inside a version whose tracked value is
    legitimately NULL (delete tombstones, null transitions — both real
    SCD2 versions here, see ``scd2_history``'s eqNullSafe change detect).
    The struct is non-null whenever a version row exists, so the matched
    version's fields come back exactly, nulls included.
    """
    value_cols = tuple(value_cols)
    wrapped = history.select(
        *key_cols, "valid_from",
        F.struct(*[F.col(c) for c in value_cols]).alias("__scd_vals"),
    )
    out = asof_join(
        probes,
        wrapped,
        key_cols=tuple(key_cols),
        left_ts=probe_ts,
        right_ts="valid_from",
        value_cols=("__scd_vals",),
    )
    return out.select(
        *probes.columns,
        *[F.col("__scd_vals")[c].alias(c) for c in value_cols],
    )
