"""Key-scoped table repair: re-derive the correct state for the keys a bad
epoch range touched, stage it on a WAP branch, audit, publish.

The operational scenario every long-lived CDC pipeline hits: epochs
[a..b] were applied while a transform was broken (wrong extractor
version, bad normalization constant), so the table is wrong for exactly
the keys those epochs touched. Replaying the whole log from genesis is
O(log) downtime; dropping the table loses exactly-once lineage. This
module repairs in O(affected keys):

1. affected = DISTINCT keys of the bad epochs (partition-pruned log scan
   — only ``epoch=a..b`` directories are read);
2. their full event history is re-read from ALL *applied* epochs (a
   left-semi join keyed by url — never a wide join) and pushed through
   the SAME staging pipeline the replay runner uses
   (:func:`streaming.runner.stage_changes` — LWW winners, then the
   current/fixed extractor on winners only), plus an optional caller
   ``fix`` hook;
3. winners are merged onto a WAP branch in **cow** mode. Correctness
   hinges on a merge detail: the winner order struct is ``(warc_ts,
   lsn, __src)`` with staged ``__src=1``, so a corrected payload with
   the SAME (warc_ts, lsn) as the stored bad row still replaces it —
   repairs are not "newer", they are "righter". (mor append would leave
   a stored-vs-staged tie to scan-time resolution; cow is forced.)
4. audit checks run against the branch; all pass → ``fast_forward``
   publishes atomically, any fail → the branch is kept for forensics.

Scale posture: the bad-epoch scan is partition-pruned, the history scan
is one semi-join (broadcastable when the affected key set is small), the
merge is the standard bucket-pruned cow commit — cost O(affected keys ∩
touched buckets), never O(table) or O(log). Repair commits are
idempotent under their own epoch-ledger id space (``REPAIR_EPOCH_BASE +
repair_id``), disjoint from log epochs by construction.

Reference analog: none — the reference re-runs the whole scrape when a
parser bug ships (fetch-everything-again, /root/reference/README.md
pipeline description); targeted repair is part of the engine's CDC
extension surface.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..lake.audit import Check, CheckResult, audit
from ..lake.table import LakeTable
from ..sources import changelog
from .checkpoint import CheckpointStore
from .runner import stage_changes

# Log epochs are small integers (directory ordinals); repair ids live far
# above so the shared exactly-once ledger can never collide the two spaces.
REPAIR_EPOCH_BASE = 1 << 40


def repair_keys(
    spark: SparkSession,
    log_dir: str,
    table: LakeTable,
    checkpoints: CheckpointStore,
    bad_epochs: Sequence[int],
    repair_id: int = 0,
    branch: str | None = None,
    fix: Callable[[DataFrame], DataFrame] | None = None,
    checks: Sequence[Check] = (),
    publish: bool = True,
) -> dict:
    """Repair the keys touched by ``bad_epochs`` and (optionally) publish.

    ``fix``: optional transform applied to the affected keys' raw event
    history before staging (e.g. patch a mis-normalized column); the
    HTML→text re-extraction with the current extractor happens in staging
    regardless.

    ``checks``: :mod:`lake.audit` checks run against the branch before
    publish. ``publish=False`` stages + audits but leaves the branch for
    manual inspection (``table.read(ref=branch)``).

    Returns a metrics dict: affected keys, staged rows, audit results,
    published flag, snapshot id. Raises ``ValueError`` when a bad epoch
    was never applied (repairing it would fast-apply future data).

    ``branch`` defaults to ``repair-<repair_id>`` — one branch per repair
    attempt; a branch kept by a failed audit is reused (still rooted at
    main — :meth:`LakeTable.fast_forward`'s ancestry check guards a
    diverged one).
    """
    if branch is None:
        branch = f"repair-{int(repair_id)}"
    bad_epochs = sorted(set(int(e) for e in bad_epochs))
    all_epochs = changelog.list_epochs(spark, log_dir)
    applied = [e for e in all_epochs if checkpoints.is_done(e)]
    not_applied = [e for e in bad_epochs if e not in applied]
    if not_applied:
        raise ValueError(
            f"bad_epochs {not_applied} are not applied yet — repair covers "
            "committed state only; let the replay runner apply them first"
        )

    # epoch is a partition column (isin filters prune directories);
    # mergeSchema: the log may span schema-evolution versions and the
    # affected keys' history needs every column ever present.
    log = spark.read.option("mergeSchema", "true").parquet(log_dir)
    key = table.key_col
    bad_slice = log.where(F.col("epoch").isin(bad_epochs))
    # localCheckpoint: `affected` feeds the history semi-join AND the
    # n_affected_keys metric below — without the pin the bad-epoch scan +
    # distinct runs twice (a second full Spark job just for a metric).
    # It is delta-sized by construction (distinct keys of the bad epochs).
    affected = (
        bad_slice.select(key).where(F.col(key).isNotNull()).distinct()
        .localCheckpoint(eager=True)
    )

    history = (
        log.where(F.col("epoch").isin(applied))
        .join(affected, key, "left_semi")
        .drop("epoch")
    )
    if fix is not None:
        history = fix(history)

    staged = stage_changes(spark, history, table)

    if branch not in table.meta.get("branches", {}):
        table.create_branch(branch)
    merge_metrics = table.merge(
        staged,
        epoch=REPAIR_EPOCH_BASE + int(repair_id),
        mode="cow",  # staged wins (ts, lsn) ties — required, see module doc
        branch=branch,
        extra_summary={"engine.repair-epochs": ",".join(map(str, bad_epochs))},
    )

    results: list[CheckResult] = audit(table, branch, list(checks))
    ok = all(r.ok for r in results)
    published = False
    if publish and ok and not merge_metrics.get("skipped"):
        table.fast_forward(branch)
        published = True

    return {
        "bad_epochs": bad_epochs,
        "n_affected_keys": affected.count(),
        "repair_epoch": REPAIR_EPOCH_BASE + int(repair_id),
        "audit": [(r.name, r.ok, r.detail) for r in results],
        "audit_ok": ok,
        "published": published,
        **{k: v for k, v in merge_metrics.items() if k != "skipped"},
        "skipped": bool(merge_metrics.get("skipped")),
    }


RECONCILE_EPOCH_BASE = 1 << 41


def reconcile_snapshot(
    spark: SparkSession,
    snapshot: DataFrame,
    table: LakeTable,
    reconcile_id: int = 0,
    branch: str | None = None,
    checks: Sequence[Check] = (),
    publish: bool = True,
    lsn_col: str = "lsn",
) -> dict:
    """Heal a replica against an authoritative source snapshot.

    The consistency question every CDC operator eventually asks: "does my
    replica actually equal the source right now — and if not, fix it
    without a re-bootstrap." Given a full source snapshot (every logical
    column of the table, one row per live key), this computes the exact
    row-level divergence (:func:`lake.diff.snapshot_diff` — one full-outer
    join) and commits ONE corrective epoch:

    - keys the source lacks → staged deletes, stamped at the stored row's
      own ``(ts, lsn)`` — the cow merge's staged-wins-ties rule persists
      the tombstone ("righter, not newer", the `repair_keys` argument);
    - diverged rows → upserts carrying the snapshot's values, stamped at
      ``greatest(stored_ts, snapshot_ts)`` / ``greatest(stored_lsn,
      snapshot_lsn)`` so a spurious future-dated replica event cannot
      out-LWW its own correction (the per-key event-time high-water is
      preserved, never rewound);
    - missing keys → inserts at the snapshot's own stamps.

    Cost: O(table ∩ snapshot) for the diff — this is a FULL consistency
    sweep by definition; run it bucket-scoped (pre-filter both sides) for
    targeted checks. Corrections merge in the usual bucket-pruned cow
    path, cost O(diverged keys ∩ buckets). Idempotent under
    ``RECONCILE_EPOCH_BASE + reconcile_id`` (disjoint from log and repair
    epoch spaces); a second run with a fresh id over a healed table stages
    zero corrections. Audits + WAP branch as in :func:`repair_keys`.
    """
    from ..lake.diff import snapshot_diff

    if branch is None:
        branch = f"reconcile-{int(reconcile_id)}"
    key = table.key_col
    ts_col = table.meta["order_col"]
    logical = [f.name for f in table.schema.fields]
    missing_cols = [c for c in logical if c not in snapshot.columns]
    if missing_cols:
        raise ValueError(
            f"snapshot must carry every logical column of the table; "
            f"missing {missing_cols} — a partial snapshot would null-out "
            "columns it does not know about"
        )

    # resolve=True: on a MoR table the raw with_system scan returns EVERY
    # stored version of a key; diffing superseded versions against the
    # snapshot masks real divergence (a stale pre-delete row that happens
    # to equal the snapshot hides a wrongful tombstone) and duplicates
    # corrections. Reconcile wants the per-key winners, stamps included.
    resolved = table.read(with_system=True, resolve=True)
    live = resolved.where(~F.coalesce(F.col("__deleted"), F.lit(False)))
    # Stamps come from the resolved winners INCLUDING tombstones: a key
    # wrongly deleted in the replica has a winning tombstone as its stored
    # state, and the resurrecting correction must stamp at (>=) ITS
    # (ts, lsn) to win LWW — stamping at the snapshot's (older) stamp
    # would lose to the tombstone and the heal would silently no-op.
    stored = resolved.select(
        F.col(key).alias("__k"),
        F.col(ts_col).alias("__stored_ts"),
        F.col("__lsn").alias("__stored_lsn"),
    )
    value_cols = [c for c in logical if c != key]
    # Compare PAYLOAD only: the stamp columns (order/lsn) are excluded
    # because corrections deliberately keep the per-key high-water stamp —
    # including them would re-flag every healed row on the next sweep.
    cmp_cols = [c for c in value_cols if c not in (ts_col, lsn_col)]
    diff = snapshot_diff(
        live.select(key, *cmp_cols), snapshot.select(key, *cmp_cols), key
    ).where(F.col("_change_type") != "update_preimage")

    snap = snapshot.select(
        F.col(key).alias("__sk"),
        *[F.col(c).alias(f"__s_{c}") for c in value_cols],
    )
    has_lsn = lsn_col in snapshot.columns and lsn_col in value_cols
    snap_lsn = (
        F.col(f"__s_{lsn_col}").cast("long") if has_lsn
        else F.lit(None).cast("long")
    )
    corr = (
        diff.select(key, "_change_type")
        .join(stored, diff[key] == stored["__k"], "left")
        .join(snap, diff[key] == snap["__sk"], "left")
        .select(
            key,
            *[
                F.col(f"__s_{c}").alias(c)
                for c in value_cols if c not in (ts_col, lsn_col)
            ],
            F.when(
                F.col("_change_type") == "delete", F.col("__stored_ts")
            ).otherwise(
                F.greatest(
                    F.col(f"__s_{ts_col}"),
                    F.coalesce("__stored_ts", F.col(f"__s_{ts_col}")),
                )
            ).alias(ts_col),
            F.when(
                F.col("_change_type") == "delete", F.col("__stored_lsn")
            ).otherwise(
                F.greatest(
                    F.coalesce(snap_lsn, F.lit(0)),
                    F.coalesce("__stored_lsn", F.lit(0)),
                )
            ).alias(lsn_col),
            F.when(F.col("_change_type") == "delete", F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
        )
    )

    if branch not in table.meta.get("branches", {}):
        table.create_branch(branch)
    merge_metrics = table.merge(
        corr,
        epoch=RECONCILE_EPOCH_BASE + int(reconcile_id),
        ts_col=ts_col,
        lsn_col=lsn_col,
        mode="cow",  # staged wins (ts, lsn) ties — deletes depend on it
        branch=branch,
        extra_summary={"engine.reconcile-id": str(int(reconcile_id))},
    )
    results: list[CheckResult] = audit(table, branch, list(checks))
    ok = all(r.ok for r in results)
    published = False
    if publish and ok and not merge_metrics.get("skipped"):
        table.fast_forward(branch)
        published = True
    return {
        "reconcile_epoch": RECONCILE_EPOCH_BASE + int(reconcile_id),
        "audit": [(r.name, r.ok, r.detail) for r in results],
        "audit_ok": ok,
        "published": published,
        **{k: v for k, v in merge_metrics.items() if k != "skipped"},
        "skipped": bool(merge_metrics.get("skipped")),
    }


def requeue_quarantine(
    spark: SparkSession,
    quarantine_dir: str,
    log_dir: str,
    as_epoch: int,
    key_col: str = "url",
    fix: Callable[[DataFrame], DataFrame] | None = None,
    source_epochs: Sequence[int] | None = None,
) -> dict:
    """Close the dead-letter loop: quarantined rows, once fixable, re-enter
    the change log as a NEW epoch and flow through the normal replay path
    (exactly-once, LWW, schema evolution) like any other arrival.

    1. read ``quarantine_dir`` (``epoch=N`` partitions; ``source_epochs``
       narrows which DLQ epochs to requeue);
    2. drop the ``_reason`` provenance column and apply the caller's
       ``fix`` (e.g. map a late-registered op alias, backfill a null lsn
       from a sibling field);
    3. REVALIDATE with the exact gate that quarantined them
       (:func:`streaming.runner.split_poison`) — rows the fix did not heal
       raise with per-reason counts rather than being silently re-poisoned
       or re-admitted;
    4. append as ``epoch=as_epoch`` (must be a fresh epoch id — colliding
       with an applied epoch would be silently skipped by the ledger, and
       merging files into a pending epoch would corrupt its lineage).

    The next :meth:`ReplayRunner.run` applies the requeued epoch normally;
    event-time LWW makes the outcome identical to the rows having arrived
    on time (batching-invariance).
    """
    from .runner import split_poison

    from ..sources import changelog

    existing = set(changelog.list_epochs(spark, log_dir))
    if as_epoch in existing:
        raise ValueError(
            f"as_epoch {as_epoch} already exists in the log — requeue needs "
            f"a fresh epoch id (max existing: {max(existing)})"
        )
    dlq = spark.read.option("mergeSchema", "true").parquet(quarantine_dir)
    if source_epochs is not None:
        dlq = dlq.where(F.col("epoch").isin([int(e) for e in source_epochs]))
    rows = dlq.drop("_reason", "epoch")
    if fix is not None:
        rows = fix(rows)
    good, still_poison = split_poison(rows, key_col)
    n_bad = still_poison.count()
    if n_bad:
        reasons = {
            r["_reason"]: r["n"]
            for r in still_poison.groupBy("_reason")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        raise ValueError(
            f"{n_bad} quarantined row(s) still poison after fix: {reasons}"
        )
    out = good.withColumn("epoch", F.lit(int(as_epoch)))
    n = out.count()
    changelog.write_log(out, log_dir)
    return {"requeued": n, "as_epoch": int(as_epoch)}
