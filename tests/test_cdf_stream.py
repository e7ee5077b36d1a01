"""Streaming change feed via the Python DataSource API (lake/cdf_stream.py).

Pins: epoch-aligned exactly-once delivery across stream restarts (Spark's
checkpointed offsets + snapshot-id offsets), delete ops, maintenance
commits emitting nothing, start=latest, WAP-branch invisibility until
publish, and the expired/rolled-back-offset error contract.
"""

import os
import time

import pytest

from data_pipeline_spark.lake.cdf_stream import (
    _main_lineage,
    register_changes_source,
)
from data_pipeline_spark.lake.table import LakeTable, load_table_meta


def _mk(spark, path):
    return LakeTable.create(
        spark,
        path,
        spark.createDataFrame([], "url string, v long").schema,
        key_col="url",
        n_buckets=2,
    )


def _stage(spark, rows):
    return spark.createDataFrame(
        [(u, v, "delete" if v is None else "upsert", lsn) for u, v, lsn in rows],
        "url string, v long, op string, lsn long",
    )


def _drain(spark, table_dir, checkpoint, sink):
    """Run the stream to completion (availableNow) into a collecting
    foreachBatch sink; returns rows appended this run."""
    register_changes_source(spark)
    got = []

    def collect(batch_df, batch_id):
        got.extend(
            (r["url"], r["v"], r["op"], r["lsn"], r["_commit_snapshot_id"])
            for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("icelite_changes")
        .option("path", table_dir)
        .load()
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink.extend(got)
    return got


def test_stream_delivers_epochs_exactly_once(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_stage(spark, [("a", 1, 1), ("b", 2, 2)]), epoch=0, mode="mor", ts_col="v")
    t.merge(_stage(spark, [("b", 20, 20), ("a", None, 21)]), epoch=1,
            mode="mor", ts_col="v")
    cp, sink = str(tmp_path / "cp"), []
    run1 = _drain(spark, t.path, cp, sink)
    sids = [s["snapshot_id"] for s in t.history()]
    key = lambda r: (r[0], r[4])  # noqa: E731 — v may be None
    assert sorted(run1, key=key) == sorted(
        [("a", 1, "upsert", 1, sids[0]), ("b", 2, "upsert", 2, sids[0]),
         ("b", 20, "upsert", 20, sids[1]), ("a", None, "delete", 21, sids[1])],
        key=key,
    )
    # Restart on the same checkpoint with nothing new: zero redelivery.
    assert _drain(spark, t.path, cp, sink) == []
    # A maintenance commit emits nothing; the next merge emits only itself.
    t.compact()
    t.merge(_stage(spark, [("c", 3, 30)]), epoch=2, mode="mor", ts_col="v")
    run3 = _drain(spark, t.path, cp, sink)
    new_sid = t.snapshot()["snapshot_id"]
    assert run3 == [("c", 3, "upsert", 30, new_sid)]


def test_stream_start_latest_skips_history(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "l"))
    t.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    register_changes_source(spark)
    got = []

    def collect(batch_df, batch_id):
        got.extend(batch_df.collect())

    q = (
        spark.readStream.format("icelite_changes")
        .option("path", t.path)
        .option("start", "latest")
        .load()
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "cpl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got == []


def test_branch_commits_invisible_until_publish(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "b"))
    t.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    cp, sink = str(tmp_path / "cpb"), []
    _drain(spark, t.path, cp, sink)
    t.create_branch("audit")
    t.merge(_stage(spark, [("z", 9, 9)]), epoch=1, mode="mor", ts_col="v",
            branch="audit")
    # Staged-only: main's lineage is unchanged, the stream sees nothing.
    assert _drain(spark, t.path, cp, sink) == []
    t.fast_forward("audit")
    pub = _drain(spark, t.path, cp, sink)
    assert [(r[0], r[2]) for r in pub] == [("z", "upsert")]


def test_offset_off_lineage_raises(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "x"))
    for e in range(3):
        t.merge(_stage(spark, [(f"k{e}", e, e)]), epoch=e, mode="mor", ts_col="v")
    from data_pipeline_spark.lake.cdf_stream import _ChangesStreamReader

    rdr = _ChangesStreamReader({"path": t.path})
    rows, end = rdr._read_span(0, None)
    assert len(rows) == 3 and end == t.snapshot()["snapshot_id"]
    # Roll back PAST the consumed offset: delivered changes were reverted
    # and an append feed cannot compensate — the consumer must re-bootstrap.
    first = t.meta["snapshots"][0]["snapshot_id"]
    t.rollback_to(first)
    with pytest.raises(ValueError, match="re-bootstrap"):
        rdr._read_span(end, None)


def test_rollback_inside_unread_span_retracts(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "rr"))
    t.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    from data_pipeline_spark.lake.cdf_stream import _ChangesStreamReader

    rdr = _ChangesStreamReader({"path": t.path})
    _, cursor = rdr._read_span(0, None)  # consumed epoch 0
    # Epochs 1-2 land and are rolled back BEFORE the consumer reads them.
    t.merge(_stage(spark, [("b", 2, 2)]), epoch=1, mode="mor", ts_col="v")
    sid1 = t.snapshot()["snapshot_id"]
    t.merge(_stage(spark, [("c", 3, 3)]), epoch=2, mode="mor", ts_col="v")
    t.rollback_to(sid1)
    rows, end = rdr._read_span(cursor, None)
    # Epoch 1 survives (at/under the rollback target); epoch 2 is retracted.
    assert [(r[0], r[2]) for r in rows] == [("b", "upsert")]
    assert end == t.snapshot()["snapshot_id"]
    # Next merge resumes cleanly from the restored state.
    t.merge(_stage(spark, [("d", 4, 4)]), epoch=3, mode="mor", ts_col="v")
    rows2, _ = rdr._read_span(end, None)
    assert [(r[0], r[2]) for r in rows2] == [("d", "upsert")]


def test_main_lineage_excludes_branch_interleaves(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "m"))
    t.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    t.create_branch("wip")
    t.merge(_stage(spark, [("b", 2, 2)]), epoch=1, mode="mor", ts_col="v",
            branch="wip")
    t.merge(_stage(spark, [("c", 3, 3)]), epoch=2, mode="mor", ts_col="v")
    meta = load_table_meta(t.path)
    chain = [s["snapshot_id"] for s in _main_lineage(meta)]
    branch_head = meta["branches"]["wip"]
    assert branch_head not in chain
    assert chain == sorted(chain)
    assert chain[-1] == meta["current_snapshot_id"]
