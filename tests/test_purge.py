"""Physical key purge (takedown / right-to-be-forgotten): every stored
version of the key leaves the current snapshot's data files; only the files
that may contain a target key are rewritten; after snapshot expiry + orphan
GC the bytes are gone from storage entirely."""

import os

import pyspark.sql.functions as F

from data_pipeline_spark.lake.table import LakeTable


def _mk_table(spark, path, n_buckets=4):
    return LakeTable.create(
        spark, path,
        spark.createDataFrame([], "url string, text string, warc_ts timestamp").schema,
        key_col="url", n_buckets=n_buckets,
    )


def _staged(spark, rows):
    # rows: (url, text, ts_offset_seconds, op, lsn)
    return spark.createDataFrame(
        [
            (u, t, f"2026-01-01 00:00:{s:02d}", op, lsn)
            for (u, t, s, op, lsn) in rows
        ],
        "url string, text string, warc_ts string, op string, lsn long",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


SECRET = "SENSITIVE-PAYLOAD-d41d8cd9"
TARGET = "https://takedown.example/page"


def _build(spark, tmp_path, mode="mor"):
    table = _mk_table(spark, str(tmp_path / "t"))
    # Three epochs; the target key is updated in two of them, so multiple
    # stored versions exist pre-compaction.
    table.merge(_staged(spark, [
        (TARGET, SECRET + "-v1", 1, "upsert", 1),
        ("https://keep.example/a", "alpha", 1, "upsert", 2),
        ("https://keep.example/b", "beta", 2, "upsert", 3),
    ]), epoch=0, mode=mode)
    table.merge(_staged(spark, [
        (TARGET, SECRET + "-v2", 10, "upsert", 10),
        ("https://keep.example/c", "gamma", 11, "upsert", 11),
    ]), epoch=1, mode=mode)
    table.merge(_staged(spark, [
        ("https://keep.example/a", "alpha2", 20, "upsert", 20),
    ]), epoch=2, mode=mode)
    return table


def test_purge_removes_every_version(spark, tmp_path):
    table = _build(spark, tmp_path)
    before = {r["url"]: r["text"] for r in table.read().collect()}
    assert before[TARGET] == SECRET + "-v2"

    res = table.purge_keys([TARGET])
    assert res["committed"] and res["rows_removed"] == 2  # v1 + v2

    after = {r["url"]: r["text"] for r in table.read().collect()}
    assert TARGET not in after
    # Every other key is untouched, including un-collapsed MoR versions.
    want = {u: t for u, t in before.items() if u != TARGET}
    assert after == want
    # The raw (with_system) scan holds no version of the key either — the
    # bytes left the current snapshot's files, not just the resolved view.
    raw = table.read(with_system=True)
    assert raw.where(F.col("url") == TARGET).count() == 0


def test_purge_rewrites_only_containing_files(spark, tmp_path):
    table = _build(spark, tmp_path)
    prior = table.files_of(table._current_snapshot())
    res = table.purge_keys([TARGET])
    now = {f["path"] for f in table.files_of(table._current_snapshot())}
    carried = [f for f in prior if f["path"] in now]
    # Files in other buckets / without the key's range carried by reference.
    assert len(carried) == len(prior) - res["files_rewritten"]
    assert res["files_rewritten"] < len(prior)


def test_purge_absent_key_is_a_no_commit_no_op(spark, tmp_path):
    table = _build(spark, tmp_path)
    sid = table.meta["current_snapshot_id"]
    res = table.purge_keys(["https://never-stored.example/x"])
    # Bucket routing + key stats prove absence — nothing rewritten.
    assert res == {
        "snapshot_id": sid, "files_rewritten": 0,
        "rows_removed": 0, "committed": False,
    }
    assert table.meta["current_snapshot_id"] == sid


def test_purge_then_expire_then_gc_erases_bytes(spark, tmp_path):
    table = _build(spark, tmp_path)
    table.purge_keys([TARGET])
    table.expire_snapshots(keep_last=1)
    table.remove_orphan_files(grace_seconds=0.0)
    # No parquet byte anywhere under the table still holds the payload.
    hits = []
    for root, _dirs, files in os.walk(table.path):
        for fn in files:
            if fn.endswith(".parquet"):
                with open(os.path.join(root, fn), "rb") as f:
                    if SECRET.encode() in f.read():
                        hits.append(os.path.join(root, fn))
    assert hits == []
    # Survivors still read back.
    assert table.read().count() == 3


def test_purge_time_travel_before_expiry(spark, tmp_path):
    """Purge is a snapshot like any other: the pre-purge snapshot still
    shows the key until expiry (audit window), then expiry removes it."""
    table = _build(spark, tmp_path)
    pre = table.meta["current_snapshot_id"]
    table.purge_keys([TARGET])
    old = table.read(snapshot_id=pre)
    assert old.where(F.col("url") == TARGET).count() == 1


def test_purge_large_key_list_join_path(spark, tmp_path):
    """Key lists above isin_max take the broadcast anti-join path and
    produce the same result."""
    table = _build(spark, tmp_path)
    filler = [f"https://absent.example/{i}" for i in range(20)]
    res = table.purge_keys([TARGET] + filler, isin_max=5)
    assert res["rows_removed"] == 2
    assert table.read().where(F.col("url") == TARGET).count() == 0
    assert table.read().count() == 3


def test_purge_after_compaction_cow(spark, tmp_path):
    table = _build(spark, tmp_path, mode="cow")
    table.compact()
    res = table.purge_keys([TARGET])
    assert res["rows_removed"] == 1  # compaction collapsed to one winner
    assert table.read().where(F.col("url") == TARGET).count() == 0
    assert table.read().count() == 3


def test_stored_row_count_metadata_probe(spark, tmp_path):
    """stored_row_count: exact physical rows from manifest metadata (no
    Spark job); tracks purge and equals the logical count once compacted
    tombstone-free."""
    table = _build(spark, tmp_path)
    n_physical = table.read(with_system=True).count()
    assert table.stored_row_count() == n_physical
    pre = table.meta["current_snapshot_id"]
    table.purge_keys([TARGET])
    assert table.stored_row_count() == n_physical - 2
    assert table.stored_row_count(snapshot_id=pre) == n_physical
    table.compact(drop_tombstones=True)
    assert table.stored_row_count() == table.read().count() == 3
