"""Bucket-spec evolution (Iceberg partition-evolution analog):
rescale_buckets is metadata-only, mixed-spec reads/merges/lookups/purges
stay correct via conservative per-file spec routing, and compaction
migrates legacy files to the current spec."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_pipeline_spark.lake.table import LakeTable

SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("score", DoubleType()),
])


def _mk(spark, path, n_buckets=4):
    return LakeTable.create(
        spark, path, SCHEMA, key_col="url", n_buckets=n_buckets, order_col="warc_ts",
    )


def _stage(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, sec long, score double, op string"
    )
    return df.select(
        "url", F.timestamp_seconds("sec").alias("warc_ts"), "score", "op",
        F.col("sec").alias("lsn"),
    )


def _state(tbl, snap=None):
    return {r["url"]: r["score"] for r in tbl.read(snapshot_id=snap).collect()}


def test_rescale_is_metadata_only_and_stamps_specs(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "t"), n_buckets=4)
    tbl.merge(_stage(spark, [(f"u{i}", 1, float(i), "upsert") for i in range(20)]),
              epoch=0)
    files_before = {f["path"] for f in tbl.files_of(tbl.snapshot())}
    n_snaps = len(tbl.history())
    assert tbl.rescale_buckets(8) == 2
    assert tbl.n_buckets == 8 and tbl.current_spec_id == 2
    # no new snapshot, no file changes
    assert len(tbl.history()) == n_snaps
    assert {f["path"] for f in tbl.files_of(tbl.snapshot())} == files_before
    assert all(tbl._spec_of(f) == 1 for f in tbl.files_of(tbl.snapshot()))
    # new writes carry the new spec and its bucket range
    tbl.merge(_stage(spark, [(f"v{i}", 2, 2.0, "upsert") for i in range(20)]),
              epoch=1)
    new = [f for f in tbl.files_of(tbl.snapshot()) if tbl._spec_of(f) == 2]
    assert new and all(0 <= f["bucket"] < 8 for f in new)
    assert max(f["bucket"] for f in new) > 3  # actually uses the wider range
    # cold reload keeps the spec metadata
    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    assert t2.n_buckets == 8 and t2.current_spec_id == 2
    assert t2.bucket_spec(1) == 4


def test_mixed_spec_reads_merges_and_lww(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "m"), n_buckets=4)
    tbl.merge(_stage(spark, [(f"u{i}", 1, 1.0, "upsert") for i in range(30)]),
              epoch=0)
    tbl.rescale_buckets(16)
    # update half the OLD keys + delete some + add new keys, post-rescale
    tbl.merge(_stage(
        spark,
        [(f"u{i}", 5, 50.0, "upsert") for i in range(0, 30, 2)]
        + [(f"u{i}", 5, 0.0, "delete") for i in range(1, 30, 6)]
        + [(f"w{i}", 5, 9.0, "upsert") for i in range(5)],
    ), epoch=1)
    state = _state(tbl)
    expected = {}
    for i in range(30):
        expected[f"u{i}"] = 1.0
    for i in range(0, 30, 2):
        expected[f"u{i}"] = 50.0
    for i in range(1, 30, 6):
        expected.pop(f"u{i}")
    for i in range(5):
        expected[f"w{i}"] = 9.0
    assert state == expected
    # point lookups hit both eras
    assert tbl.lookup("u2").collect()[0]["score"] == 50.0
    assert tbl.lookup("u3").collect()[0]["score"] == 1.0
    assert tbl.lookup("w1").collect()[0]["score"] == 9.0


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_late_event_lww_across_rescale(spark, tmp_path, mode):
    tbl = _mk(spark, str(tmp_path / f"l_{mode}"), n_buckets=4)
    tbl.merge(_stage(spark, [("k", 10, 10.0, "upsert")]), epoch=0, mode=mode)
    tbl.rescale_buckets(8)
    # late event (older ts) must lose LWW even across the spec boundary
    tbl.merge(_stage(spark, [("k", 3, 3.0, "upsert")]), epoch=1, mode=mode)
    assert _state(tbl) == {"k": 10.0}


def test_compact_migrates_legacy_files(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "c"), n_buckets=4)
    tbl.merge(_stage(spark, [(f"u{i}", 1, float(i), "upsert") for i in range(40)]),
              epoch=0, mode="mor")
    tbl.rescale_buckets(8)
    assert tbl.has_legacy_files()  # legacy files pending migration
    before = _state(tbl)
    # compact with the (possibly empty) dirty list sweeps exactly the
    # legacy files via the conservative spec split
    tbl.compact(buckets=tbl.dirty_buckets())
    files = tbl.files_of(tbl.snapshot())
    assert all(tbl._spec_of(f) == 2 for f in files)
    assert all(0 <= f["bucket"] < 8 for f in files)
    assert _state(tbl) == before
    assert not tbl.has_legacy_files()
    assert tbl.dirty_buckets() == []


def test_change_feed_across_rescale(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "cf"), n_buckets=4)
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert"), ("b", 1, 2.0, "upsert")]),
              epoch=0)
    s0 = tbl.snapshot()["snapshot_id"]
    tbl.rescale_buckets(8)
    tbl.merge(_stage(spark, [("a", 2, 10.0, "upsert"), ("c", 2, 3.0, "upsert")]),
              epoch=1)
    feed = sorted(
        (r["url"], r["_change_type"], r["score"])
        for r in tbl.change_feed(s0).collect()
    )
    assert feed == [
        ("a", "update_postimage", 10.0), ("a", "update_preimage", 1.0),
        ("c", "insert", 3.0),
    ]


def test_generic_merge_and_purge_across_rescale(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "gp"), n_buckets=4)
    tbl.merge(_stage(spark, [(f"u{i}", 1, float(i), "upsert") for i in range(10)]),
              epoch=0)
    tbl.rescale_buckets(16)
    src = spark.createDataFrame([("u1", 111.0), ("z9", 99.0)],
                                "url string, score double")
    (tbl.merge_builder(src)
        .when_matched_update(set={"score": "s.score"})
        .when_not_matched_insert(values={
            "url": "s.url", "warc_ts": "timestamp_seconds(7)", "score": "s.score"})
        .execute())
    state = _state(tbl)
    assert state["u1"] == 111.0 and state["z9"] == 99.0 and len(state) == 11
    # purge a pre-rescale key: routed under the FILE's spec, so the legacy
    # file containing it is found and rewritten
    res = tbl.purge_keys(["u3"])
    assert res["rows_removed"] == 1
    assert "u3" not in _state(tbl)
    assert len(_state(tbl)) == 10
