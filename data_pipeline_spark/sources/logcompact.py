"""Changelog compaction — Kafka-style log compaction for the epoch log.

At 10^10 change events a from-genesis replay (bootstrap of a new
consumer, disaster recovery, backfill of a derived table) re-processes
every superseded version of every key. Because the lake merge is GLOBAL
per-key (warc_ts, lsn) LWW — batching into epochs never changes the
final state (lake/table.py::merge) — the cold prefix of the log can be
folded to one epoch holding only each key's winner event, and replaying
``compacted prefix + untouched suffix`` provably equals replaying the
original log. LWW is associative and idempotent over the (warc_ts, lsn)
max, so fold(fold(prefix) ∪ suffix) == fold(prefix ∪ suffix).

Scale shape: the fold is the same one map-side-combinable ``max_by`` hash
aggregation the merge path uses (hot urls collapse before the shuffle);
suffix epochs are carried over by file copy, never re-encoded. Cost is
O(prefix) once, repaid on every subsequent replay.

Delete winners are kept as tombstone events by default: a compacted log
must stay correct when replayed onto a table that already has state
(resume, cross-log merge). ``drop_tombstones=True`` is the from-genesis
optimization — replay always starts empty, a delete-to-empty is a no-op.

Checkpoint compatibility: the compacted epoch keeps the id of the LAST
prefix epoch, so a checkpoint store that already marked the prefix done
skips it (exactly-once ledger unchanged) and a fresh store replays it
once — both correct.

Reference parity: the reference keeps only "the newest raw file" per
source (minio_client.rs:219-228) — a degenerate whole-log compaction
with no replay story. This is the per-key generalization the CDC
reframing needs.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from ..operators.dedup import lww_dedup
from . import changelog


def compact_log(
    spark: SparkSession,
    log_dir: str,
    out_dir: str,
    upto_epoch: int,
    key_col: str = "url",
    order_cols: tuple[str, str] = ("warc_ts", "lsn"),
    drop_tombstones: bool = False,
    op_col: str = "op",
    delete_op: str = "delete",
) -> dict:
    """Write a compacted copy of ``log_dir`` to ``out_dir``: epochs
    ``<= upto_epoch`` folded to per-key winners under the id of the LAST
    ACTUAL prefix epoch (not ``upto_epoch`` verbatim — a checkpoint store
    that marked the prefix done must find the folded epoch's id among the
    ids it already skipped, or it re-applies the whole fold); later epochs
    copied through byte-identical. Returns
    {'prefix_epochs', 'winners', 'dropped_tombstones', 'suffix_epochs'}.
    """
    epochs = changelog.list_epochs(spark, log_dir)
    prefix = [e for e in epochs if e <= upto_epoch]
    suffix = [e for e in epochs if e > upto_epoch]
    if not prefix:
        raise ValueError(f"no epochs <= {upto_epoch} in {log_dir}")

    # mergeSchema: the prefix may span schema-registry versions (v1 epochs
    # lack later payload columns); winners carry the superset with NULLs,
    # and the replay runner's footer-stats evolution sees max(schema_version)
    # exactly as it would have on the original log.
    prefix_df = (
        spark.read.option("basePath", log_dir)
        .option("mergeSchema", "true")
        .parquet(*[os.path.join(log_dir, f"epoch={e}") for e in prefix])
        .drop("epoch")
    )
    winners = lww_dedup(prefix_df, key_cols=(key_col,), order_cols=order_cols)

    os.makedirs(out_dir, exist_ok=True)
    # Idempotent re-run: the folded epoch is this operator's output, and
    # write_log appends — a partial previous attempt must not double the
    # winners. The suffix copies below already guard on existence.
    folded_epoch = int(prefix[-1])
    shutil.rmtree(os.path.join(out_dir, f"epoch={folded_epoch}"),
                  ignore_errors=True)
    # Winner/tombstone counts ride the write job as an observation (the
    # fold over a 10^10-event prefix is the heaviest stage here — no
    # extra aggregations over it).
    from pyspark.sql import Observation

    obs = Observation()
    observed = winners.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col(op_col) == delete_op, 1)).alias("tombs"),
    )
    out_df = (
        observed.where(F.col(op_col) != delete_op) if drop_tombstones else observed
    )
    changelog.write_log(
        out_df.withColumn("epoch", F.lit(folded_epoch)), out_dir
    )
    m = obs.get
    dropped = int(m["tombs"]) if drop_tombstones else 0
    n_winners = int(m["n"]) - dropped

    for e in suffix:
        src = os.path.join(log_dir, f"epoch={e}")
        dst = os.path.join(out_dir, f"epoch={e}")
        if not os.path.exists(dst):
            # copy to a temp sibling + atomic rename: a crash mid-copytree
            # would otherwise leave a PARTIAL epoch dir that every re-run's
            # existence guard skips -- silent event loss in the compacted
            # log. rename() is atomic on one filesystem; a leftover tmp dir
            # from a crash is overwritten by the next attempt.
            tmp = dst + ".__tmp__"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(src, tmp)
            os.rename(tmp, dst)

    return {
        "prefix_epochs": len(prefix),
        "winners": n_winners,
        "dropped_tombstones": dropped,
        "suffix_epochs": len(suffix),
    }
