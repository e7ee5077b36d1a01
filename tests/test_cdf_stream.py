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
    _ChangesStreamReader,
    _feed_schema,
    register_changes_source,
)
from data_pipeline_spark.lake.table import (
    LakeTable,
    load_table_meta,
    main_lineage,
)


def _reader(table, **opts):
    meta = load_table_meta(table.path)
    return _ChangesStreamReader(
        _feed_schema(meta), {"path": table.path, **opts}
    )


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

    rdr = _reader(t)
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
    rdr = _reader(t)
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


def test_bootstrap_after_expiry_emits_full_state(spark, tmp_path):
    """History expired down to a COMPACT snapshot: a fresh earliest
    consumer must still receive the full base state, not just post-compact
    increments (and not depend on which operation survived expiry)."""
    t = _mk(spark, str(tmp_path / "exp"))
    for e in range(3):
        t.merge(_stage(spark, [(f"k{e}", e, e)]), epoch=e, mode="mor", ts_col="v")
    t.compact()
    t.expire_snapshots(keep_last=1)  # only the compact snapshot survives
    assert t.snapshot()["summary"]["operation"] == "compact"
    t.merge(_stage(spark, [("k3", 3, 3)]), epoch=3, mode="mor", ts_col="v")
    rows, end = _reader(t)._read_span(0, None)
    assert {r[0] for r in rows} == {"k0", "k1", "k2", "k3"}
    assert end == t.snapshot()["snapshot_id"]


def test_purge_emits_erasure_deletes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "pg"))
    t.merge(_stage(spark, [("keep", 1, 1), ("gone", 2, 2)]), epoch=0,
            mode="mor", ts_col="v")
    rdr = _reader(t)
    _, cursor = rdr._read_span(0, None)  # both keys delivered
    t.purge_keys(["gone"])
    rows, _ = rdr._read_span(cursor, None)
    assert rows == [("gone", None, "delete", None,
                     t.snapshot()["snapshot_id"])]
    # In-span retraction: upsert and purge in the SAME span — the purged
    # key's bytes are never delivered, only its erasure delete.
    t2 = _mk(spark, str(tmp_path / "pg2"))
    t2.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    rdr2 = _reader(t2)
    _, c2 = rdr2._read_span(0, None)
    t2.merge(_stage(spark, [("secret", 9, 9)]), epoch=1, mode="mor", ts_col="v")
    t2.purge_keys(["secret"])
    rows2, _ = rdr2._read_span(c2, None)
    assert [(r[0], r[2], r[1]) for r in rows2] == [("secret", "delete", None)]


def test_rollback_of_maintenance_only_does_not_force_rebootstrap(spark, tmp_path):
    """Rollback targeting a snapshot at/after the last DELIVERED commit —
    e.g. undoing only a compaction — must not raise."""
    t = _mk(spark, str(tmp_path / "rm"))
    t.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    merge_sid = t.snapshot()["snapshot_id"]
    t.compact()
    rdr = _reader(t)
    _, cursor = rdr._read_span(0, None)  # cursor sits on the compact commit
    assert cursor > merge_sid
    t.rollback_to(merge_sid)  # undo the compaction only
    rows, end = rdr._read_span(cursor, None)
    assert rows == [] and end == t.snapshot()["snapshot_id"]
    # And the stream keeps working afterwards.
    t.merge(_stage(spark, [("b", 2, 2)]), epoch=1, mode="mor", ts_col="v")
    rows2, _ = rdr._read_span(end, None)
    assert [(r[0], r[2]) for r in rows2] == [("b", "upsert")]


def test_start_latest_rollback_before_attach_is_safe(spark, tmp_path):
    """A latest-start consumer never delivered historic commits; a rollback
    over them must not force its re-bootstrap (offset carries base)."""
    t = _mk(spark, str(tmp_path / "lb"))
    t.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    keep = t.snapshot()["snapshot_id"]
    t.merge(_stage(spark, [("b", 2, 2)]), epoch=1, mode="mor", ts_col="v")
    rdr = _reader(t, start="latest")
    off = rdr.initialOffset()
    assert off["base"] == off["snapshot_id"] == t.snapshot()["snapshot_id"]
    t.rollback_to(keep)  # reverts epoch 1 — which this consumer never saw
    rows, end = rdr._read_span(off["snapshot_id"], None, base=off["base"])
    assert rows == []
    t.merge(_stage(spark, [("c", 3, 3)]), epoch=2, mode="mor", ts_col="v")
    rows2, _ = rdr._read_span(end, None, base=off["base"])
    assert [(r[0], r[2]) for r in rows2] == [("c", "upsert")]


def test_rollback_refuses_branch_target(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "rb"))
    t.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    t.create_branch("wip")
    t.merge(_stage(spark, [("z", 9, 9)]), epoch=1, mode="mor", ts_col="v",
            branch="wip")
    staged = t.meta["branches"]["wip"]
    with pytest.raises(ValueError, match="not on main's lineage"):
        t.rollback_to(staged)


def test_main_lineage_excludes_branch_interleaves(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "m"))
    t.merge(_stage(spark, [("a", 1, 1)]), epoch=0, mode="mor", ts_col="v")
    t.create_branch("wip")
    t.merge(_stage(spark, [("b", 2, 2)]), epoch=1, mode="mor", ts_col="v",
            branch="wip")
    t.merge(_stage(spark, [("c", 3, 3)]), epoch=2, mode="mor", ts_col="v")
    meta = load_table_meta(t.path)
    chain = [s["snapshot_id"] for s in main_lineage(meta)]
    branch_head = meta["branches"]["wip"]
    assert branch_head not in chain
    assert chain == sorted(chain)
    assert chain[-1] == meta["current_snapshot_id"]
