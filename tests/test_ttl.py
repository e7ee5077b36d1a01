"""Row-level TTL retention (X114): rows older than the cutoff leave the
current snapshot; wholly-expired files are dropped metadata-only (never
read), straddlers are rewritten, fresh files carry by reference; NULL
event times survive; time travel still sees the pre-TTL state; LWW
winners can't be resurrected."""

from datetime import datetime

import pyspark.sql.functions as F

from data_pipeline_spark.lake.table import LakeTable


def _mk_table(spark, path):
    return LakeTable.create(
        spark, path,
        spark.createDataFrame(
            [], "url string, text string, warc_ts timestamp"
        ).schema,
        key_col="url", n_buckets=4,
    )


def _staged(spark, rows):
    # rows: (url, text, 'YYYY-mm-dd HH:MM:SS'|None, op, lsn)
    return spark.createDataFrame(
        [(u, t, ts, op, lsn) for (u, t, ts, op, lsn) in rows],
        "url string, text string, warc_ts string, op string, lsn long",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


CUTOFF = datetime(2026, 2, 1)


def _build(spark, tmp_path):
    """CoW merges rewrite whole buckets, so the three TTL classes are
    laid out on bucket-disjoint keys (xxhash64 mod 4, precomputed):
    bucket 0 (u/p1, u/p3): January only, untouched after epoch 0 →
    dropped metadata-only. Bucket 2 (u/p0, u/p4, u/p8): Jan + Feb +
    NULL ts consolidated by the epoch-1 merge → straddler, rewritten.
    Bucket 1 (u/p6, u/p7): February only → carried by reference."""
    t = _mk_table(spark, str(tmp_path / "t"))
    # epoch 0: entirely January (wholly expired at the Feb 1 cutoff)
    t.merge(_staged(spark, [
        ("u/p1", "jan-a", "2026-01-03 00:00:00", "upsert", 1),
        ("u/p3", "jan-b", "2026-01-20 00:00:00", "upsert", 2),
    ]), epoch=0)
    # epoch 1: straddles the cutoff + a NULL event time (one bucket)
    t.merge(_staged(spark, [
        ("u/p0", "jan-c", "2026-01-25 00:00:00", "upsert", 10),
        ("u/p4", "feb-a", "2026-02-10 00:00:00", "upsert", 11),
        ("u/p8", "no-ts", None, "upsert", 12),
    ]), epoch=1)
    # epoch 2: entirely fresh (must carry by reference)
    t.merge(_staged(spark, [
        ("u/p6", "feb-b", "2026-02-15 00:00:00", "upsert", 20),
        ("u/p7", "feb-c", "2026-02-20 00:00:00", "upsert", 21),
    ]), epoch=2)
    return t


def test_ttl_three_way_split(spark, tmp_path):
    t = _build(spark, tmp_path)
    pre = t.snapshot()["snapshot_id"]
    pre_files = {f["path"] for f in t.files_of(t.snapshot())}
    res = t.apply_ttl(CUTOFF)
    assert res["committed"] and res["rows_removed"] == 3  # p1, p3, p0
    assert res["files_dropped"] >= 1        # the all-January epoch-0 files
    got = {r["url"]: r["text"] for r in t.read().collect()}
    # expired keys gone; fresh keys keep their winners; NULL kept
    assert got == {
        "u/p4": "feb-a",
        "u/p8": "no-ts",
        "u/p6": "feb-b",
        "u/p7": "feb-c",
    }
    # fresh files carried by reference (same physical paths still listed)
    post_files = {f["path"] for f in t.files_of(t.snapshot())}
    assert post_files & pre_files, "fresh files must carry, not rewrite"
    # time travel still sees the pre-TTL state
    old = {r["url"]: r["text"] for r in t.read(snapshot_id=pre).collect()}
    assert old["u/p3"] == "jan-b" and old["u/p1"] == "jan-a"


def test_ttl_idempotent_and_noop(spark, tmp_path):
    t = _build(spark, tmp_path)
    t.apply_ttl(CUTOFF)
    sid = t.snapshot()["snapshot_id"]
    res2 = t.apply_ttl(CUTOFF)
    assert res2["committed"] is False and res2["rows_removed"] == 0
    assert t.snapshot()["snapshot_id"] == sid  # no empty commit


def test_ttl_cold_reload_and_expiry_chain(spark, tmp_path):
    import os

    t = _build(spark, tmp_path)
    pre_paths = {f["path"] for f in t.files_of(t.snapshot())}
    t.apply_ttl(CUTOFF)
    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    assert t2.read().count() == 4
    dropped = pre_paths - {f["path"] for f in t2.files_of(t2.snapshot())}
    assert dropped  # TTL stopped referencing at least one file
    t2.expire_snapshots(keep_last=1)
    t2.remove_orphan_files(grace_seconds=0)
    # the expired rows' bytes actually left disk
    for rel in dropped:
        assert not os.path.exists(os.path.join(str(tmp_path / "t"), rel))
    assert t2.read().count() == 4


def test_maintenance_job_ttl(spark, tmp_path, monkeypatch, capsys):
    """--ttl-older-than drives apply_ttl from the cron-able maintenance
    CLI (in-process; the spark-submit path is covered by
    test_submit_job's packaging)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import maintenance_job

    t = _build(spark, tmp_path)
    monkeypatch.setattr("sys.argv", [
        "maintenance_job.py", "--table", str(tmp_path / "t"),
        "--ttl-older-than", "2026-02-01T00:00:00",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    maintenance_job.main()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["ttl_rows_removed"] == 3
    assert stats["ttl_files_dropped"] >= 1
    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    assert t2.read().count() == 4


def test_ttl_tombstone_cannot_resurrect(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    t.merge(_staged(spark, [
        ("u/x", "v1", "2026-01-10 00:00:00", "upsert", 1),
    ]), epoch=0)
    t.merge(_staged(spark, [
        ("u/x", None, "2026-01-20 00:00:00", "delete", 2),
    ]), epoch=1)
    assert t.read().where(F.col("url") == "u/x").count() == 0
    res = t.apply_ttl(CUTOFF)
    assert res["committed"]
    # both the tombstone and what it deleted expired together
    assert t.read().where(F.col("url") == "u/x").count() == 0