"""Wire egress: the lake's change feed exported as Debezium envelopes.

The ingest direction (sources/debezium.py + jobs/ingest_job.py) brings a
Debezium tail INTO the lake; this is the other half — downstream systems
that are not Spark (search indexers, caches, other warehouses) consume
the lake's own changes as standard Debezium JSON lines.

Two properties the naive "dump the feed" misses:

- **True before-images.** The X30 change feed emits update pre/post
  images as separate rows; here they pair back into ONE envelope with
  both ``before`` and ``after`` populated — the REPLICA IDENTITY FULL
  shape the import side of most Debezium consumers expects (and richer
  than ``to_debezium``, which has no pre-image to offer).
- **Exactly-once across restarts.** Each export covers a (from, to]
  snapshot interval, lands in a directory named by that interval, and
  only then advances a cursor file (atomic rename). A crash before the
  cursor write re-exports the SAME interval into the SAME directory
  (overwrite — idempotent); after it, the next export starts where this
  one ended. The cursor stores the table's snapshot id, so compaction /
  expiry in between cannot shift the interval.

Scale: the feed itself is bucket-pruned to changed files (lake/diff.py);
the pre/post pairing is one keyed aggregation over feed rows (O(changes));
serialization is native to_json.
"""

from __future__ import annotations

import json
import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..sources.debezium import _JSON_OPTS
from .table import LakeTable

_TYPE_TO_OP = {"insert": "c", "update_postimage": "u", "delete": "d"}


def changes_to_envelopes(
    feed: DataFrame,
    key_col: str,
    payload_cols: list[str],
    lsn_col: str | None = None,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """X30 change-feed rows → Debezium envelope JSON strings (one per
    logical change; update pre/post images paired into one envelope).

    ``lsn_col`` defaults to ``_commit_snapshot_id`` — the feed exposes
    only logical columns (the table's ``__lsn`` is internal), and the
    commit ordinal is the monotone apply-order a downstream consumer
    needs; per-row event time still rides inside the payload."""
    row = F.struct(*[F.col(c) for c in payload_cols])
    base = feed.select(
        F.col(key_col).alias("_k"),
        F.col("_commit_snapshot_id").alias("_snap"),
        F.col("_change_type").alias("_ct"),
        row.alias("_row"),
        F.col(lsn_col or "_commit_snapshot_id").cast("bigint").alias("_lsn"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("_ts_ms"),
    )
    # Pair the (at most two) images per key+interval in one aggregation:
    # the pre image feeds `before`, the main image (insert/post/delete)
    # carries op, lsn, ts.
    is_pre = F.col("_ct") == "update_preimage"
    paired = base.groupBy("_k", "_snap").agg(
        F.max_by(F.col("_row"), F.when(is_pre, F.lit(1))).alias("_before"),
        F.max_by(F.col("_row"), F.when(~is_pre, F.lit(1))).alias("_main"),
        F.max_by(F.col("_ct"), F.when(~is_pre, F.lit(1))).alias("_op_ct"),
        F.max_by(F.col("_lsn"), F.when(~is_pre, F.lit(1))).alias("_mlsn"),
        F.max_by(F.col("_ts_ms"), F.when(~is_pre, F.lit(1))).alias("_mts"),
    )
    op = F.element_at(
        F.create_map(
            *[x for k, v in _TYPE_TO_OP.items() for x in (F.lit(k), F.lit(v))]
        ),
        F.col("_op_ct"),
    )
    is_del = F.col("_op_ct") == "delete"
    envelope = F.struct(
        F.struct(
            F.when(is_del, F.col("_main")).otherwise(F.col("_before")).alias("before"),
            F.when(is_del, F.lit(None).cast(paired.schema["_main"].dataType))
            .otherwise(F.col("_main")).alias("after"),
            F.struct(
                F.col("_mlsn").alias("lsn"), F.col("_mts").alias("ts_ms")
            ).alias("source"),
            op.alias("op"),
            F.col("_mts").alias("ts_ms"),
        ).alias("payload")
    )
    return paired.select(F.to_json(envelope, _JSON_OPTS).alias("value"))


def export_changes_wire(
    table: LakeTable,
    out_dir: str,
    payload_cols: list[str],
    cursor_path: str | None = None,
    lsn_col: str | None = None,
    ts_col: str = "warc_ts",
) -> dict:
    """Export every change since the cursor as Debezium JSON lines under
    ``out_dir/commits=<from>-<to>/``, then advance the cursor. Returns
    {'from', 'to', 'rows', 'dir'} (rows == -1 when nothing new)."""
    cursor_path = cursor_path or os.path.join(out_dir, "_cursor.json")
    from_snap = None
    if os.path.exists(cursor_path):
        with open(cursor_path, encoding="utf-8") as f:
            from_snap = json.load(f)["snapshot_id"]
    to_snap = table.meta["current_snapshot_id"]
    if from_snap == to_snap:
        return {"from": from_snap, "to": to_snap, "rows": -1, "dir": None}

    # Sweep stale partial exports: a crash between the data write and the
    # cursor write leaves a directory whose interval end exceeds the
    # cursor; on retry after MORE commits landed, the new interval has a
    # different name and the stale dir would double-deliver (from, old_to]
    # to tree-reading consumers. Anything past the cursor is uncommitted
    # by definition — remove it before exporting.
    if os.path.isdir(out_dir):
        for fn in os.listdir(out_dir):
            if fn.startswith("commits=") and "-" in fn:
                try:
                    dir_to = int(fn.split("-")[-1])
                except ValueError:
                    continue
                if from_snap is None or dir_to > from_snap:
                    import shutil

                    shutil.rmtree(os.path.join(out_dir, fn), ignore_errors=True)

    feed = table.change_feed(from_snap, to_snap)
    wire = changes_to_envelopes(
        feed, table.key_col, payload_cols, lsn_col=lsn_col, ts_col=ts_col
    )
    dest = os.path.join(out_dir, f"commits={from_snap or 0}-{to_snap}")
    from pyspark.sql import Observation

    obs = Observation()
    wire.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).text(dest)
    n = int(obs.get["n"])
    tmp = f"{cursor_path}.tmp.{uuid.uuid4().hex}"
    os.makedirs(os.path.dirname(cursor_path) or ".", exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"snapshot_id": to_snap}, f)
    os.replace(tmp, cursor_path)
    return {"from": from_snap, "to": to_snap, "rows": n, "dir": dest}
