"""Snapshot rollback (LakeTable.rollback_to) and metadata-version retention.

Rollback restores an earlier snapshot's state as a NEW commit: history is
preserved, the change feed across the rollback emits reverse deltas (sync
replicas heal), and the epoch ledger still spans rolled-back commits
(replay stays exactly-once). Metadata retention bounds the v{N}.metadata.json
history at METADATA_KEEP files.
"""

import os

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.table import LakeTable


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
        [(u, v, "upsert" if v is not None else "delete", lsn)
         for u, v, lsn in rows],
        "url string, v long, op string, lsn long",
    )


def _state(t):
    return {r["url"]: r["v"] for r in t.read().collect()}


@pytest.fixture()
def rb_table(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "rb"))
    t.merge(_stage(spark, [("a", 1, 1), ("b", 2, 2)]), epoch=0, mode="mor", ts_col="v")
    t.merge(_stage(spark, [("b", 20, 20), ("c", 3, 21)]), epoch=1, mode="mor", ts_col="v")
    return t


def test_rollback_restores_state_preserves_history(spark, rb_table):
    t = rb_table
    good = t.meta["snapshots"][0]["snapshot_id"]
    pre = len(t.history())
    snap = t.rollback_to(good)
    assert snap["summary"]["operation"] == "rollback"
    assert snap["summary"]["rollback-to"] == str(good)
    assert _state(t) == {"a": 1, "b": 2}
    # History grows — the bad commit remains time-travelable.
    assert len(t.history()) == pre + 1
    assert {r["url"]: r["v"] for r in
            t.read(snapshot_id=t.meta["snapshots"][1]["snapshot_id"]).collect()
            } == {"a": 1, "b": 20, "c": 3}


def test_rollback_change_feed_emits_reverse_deltas(spark, rb_table):
    t = rb_table
    s_good, s_bad = (s["snapshot_id"] for s in t.meta["snapshots"][:2])
    s_rb = t.rollback_to(s_good)["snapshot_id"]
    feed = t.change_feed(s_bad, s_rb)
    got = {(r["url"], r["_change_type"]): r["v"] for r in feed.collect()}
    # Epoch 1 upserted b:20 and inserted c; the rollback reverses both.
    assert got[("c", "delete")] == 3
    assert got[("b", "update_preimage")] == 20
    assert got[("b", "update_postimage")] == 2
    # And across the whole bad+rollback interval the feed nets to nothing.
    assert t.change_feed(s_good, s_rb).count() == 0


def test_rollback_does_not_reopen_epoch_ledger(spark, rb_table):
    t = rb_table
    good = t.meta["snapshots"][0]["snapshot_id"]
    t.rollback_to(good)
    assert t.committed_epochs() == {0, 1}
    # Re-applying the rolled-back epoch is still a no-op (exactly-once).
    before = len(t.history())
    t.merge(_stage(spark, [("b", 20, 20), ("c", 3, 21)]), epoch=1,
            mode="mor", ts_col="v")
    assert len(t.history()) == before
    assert _state(t) == {"a": 1, "b": 2}


def test_rollback_by_tag_and_arg_validation(spark, rb_table):
    t = rb_table
    good = t.meta["snapshots"][0]["snapshot_id"]
    t.tag("known-good", good)
    t.rollback_to(ref="known-good")
    assert _state(t) == {"a": 1, "b": 2}
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback_to()
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback_to(1, ref="known-good")
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.rollback_to(9999)


def test_maintenance_job_rollback_flag(spark, rb_table, capsys, monkeypatch):
    """--rollback-to (id or ref) through the job entrypoint, in-process
    (the real spark-submit path is covered by test_submit_job.py)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import maintenance_job

    t = rb_table
    good = t.meta["snapshots"][0]["snapshot_id"]
    t.tag("good", good)
    monkeypatch.setattr(
        "sys.argv",
        ["maintenance_job.py", "--table", t.path, "--rollback-to", "good"],
    )
    # The job ends with spark.stop(); in-process that would kill the shared
    # session-scoped SparkSession for every later test.
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    maintenance_job.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json as _json

    done = _json.loads(out)
    assert done["rolled_back_to"] == "good"
    t.refresh()
    assert _state(t) == {"a": 1, "b": 2}


def test_inspect_manifests_shows_segment_sharing(spark, rb_table):
    t = rb_table
    good = t.meta["snapshots"][0]["snapshot_id"]
    t.rollback_to(good)
    m = t.inspect("manifests")
    rows = m.count()
    distinct = m.select("segment").distinct().count()
    # The rollback commit references the good snapshot's exact segments,
    # so sharing is visible: more (snapshot, segment) rows than segments.
    assert rows > distinct
    shared = (
        m.groupBy("segment").count().where(F.col("count") >= 2).count()
    )
    assert shared >= 1


def test_metadata_version_retention(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "keep"))
    t.METADATA_KEEP = 3
    for i in range(8):
        t.merge(_stage(spark, [(f"k{i}", i, i)]), epoch=i, mode="mor", ts_col="v")
    meta_dir = os.path.join(t.path, "metadata")
    versions = sorted(
        int(fn[1:].split(".")[0])
        for fn in os.listdir(meta_dir)
        if fn.endswith(".metadata.json")
    )
    cur = t.meta["version"]
    assert versions == list(range(cur - 3 + 1, cur + 1))
    # Current state and full snapshot history are intact in the current doc.
    cold = LakeTable.load(spark, t.path)
    assert cold.read().count() == 8
    assert len(cold.history()) == 8
    first = cold.meta["snapshots"][0]["snapshot_id"]
    assert cold.read(snapshot_id=first).count() == 1
