"""Lake→lake incremental sync (lake/sync.py): bootstrap, O(changes)
refresh, predicate view maintenance (rows leaving the view are deleted),
transforms, cursor exactly-once, and full rebuild convergence."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from data_pipeline_spark.lake.sync import TableSync
from data_pipeline_spark.lake.table import LakeTable

SRC_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("lang", StringType()),
    StructField("score", DoubleType()),
])


def _mk_src(spark, path):
    return LakeTable.create(
        spark, path, SRC_SCHEMA, key_col="url", n_buckets=4, order_col="warc_ts",
    )


def _mk_tgt(spark, path, schema=SRC_SCHEMA):
    return LakeTable.create(
        spark, path, schema, key_col="url", n_buckets=4, order_col="warc_ts",
    )


def _stage(spark, rows):
    """rows: (url, sec, lang, score, op)"""
    df = spark.createDataFrame(
        rows, "url string, sec long, lang string, score double, op string"
    )
    return df.select(
        "url", F.timestamp_seconds("sec").alias("warc_ts"), "lang", "score",
        "op", F.col("sec").alias("lsn"),
    )


def _state(tbl):
    return {r["url"]: (r["lang"], r["score"]) for r in tbl.read().collect()}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_bootstrap_and_incremental(spark, tmp_path, mode):
    src = _mk_src(spark, str(tmp_path / f"s_{mode}"))
    tgt = _mk_tgt(spark, str(tmp_path / f"t_{mode}"))
    sync = TableSync(src, tgt)
    src.merge(_stage(spark, [
        ("a", 1, "en", 1.0, "upsert"), ("b", 1, "de", 2.0, "upsert"),
        ("c", 1, "en", 3.0, "upsert"),
    ]), epoch=0)
    r = sync.refresh(mode=mode)
    assert not r["skipped"] and r["synced_to"] == src.snapshot()["snapshot_id"]
    assert _state(tgt) == _state(src)

    # incremental: update / delete / insert — only changes flow
    src.merge(_stage(spark, [
        ("a", 2, "en", 10.0, "upsert"),
        ("b", 2, "de", 0.0, "delete"),
        ("d", 2, "fr", 4.0, "upsert"),
    ]), epoch=1)
    r2 = sync.refresh(mode=mode)
    assert _state(tgt) == _state(src) == {
        "a": ("en", 10.0), "c": ("en", 3.0), "d": ("fr", 4.0),
    }
    # idempotent: nothing new -> no commit
    n_snaps = len(tgt.history())
    r3 = sync.refresh(mode=mode)
    assert r3["skipped"]
    assert len(tgt.history()) == n_snaps


def test_predicate_view_rows_leave_and_join(spark, tmp_path):
    src = _mk_src(spark, str(tmp_path / "ps"))
    tgt = _mk_tgt(spark, str(tmp_path / "pt"))
    sync = TableSync(src, tgt, predicate="lang = 'en'")
    src.merge(_stage(spark, [
        ("a", 1, "en", 1.0, "upsert"), ("b", 1, "de", 2.0, "upsert"),
    ]), epoch=0)
    sync.refresh()
    assert set(_state(tgt)) == {"a"}
    # a flips OUT of the view; b flips IN
    src.merge(_stage(spark, [
        ("a", 2, "de", 1.0, "upsert"), ("b", 2, "en", 2.0, "upsert"),
    ]), epoch=1)
    sync.refresh()
    assert _state(tgt) == {"b": ("en", 2.0)}


def test_transform_projection(spark, tmp_path):
    tgt_schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("score2", DoubleType()),
    ])
    src = _mk_src(spark, str(tmp_path / "xs"))
    tgt = _mk_tgt(spark, str(tmp_path / "xt"), tgt_schema)
    sync = TableSync(
        src, tgt,
        transform=lambda df: df.select(
            "url", "warc_ts", (F.col("score") * 2).alias("score2")
        ),
    )
    src.merge(_stage(spark, [("a", 1, "en", 1.5, "upsert")]), epoch=0)
    sync.refresh()
    rows = tgt.read().collect()
    assert rows[0]["score2"] == 3.0
    src.merge(_stage(spark, [("a", 2, "en", 5.0, "upsert")]), epoch=1)
    sync.refresh()
    assert tgt.read().collect()[0]["score2"] == 10.0


def test_source_compaction_advances_cursor_with_no_changes(spark, tmp_path):
    src = _mk_src(spark, str(tmp_path / "cs"))
    tgt = _mk_tgt(spark, str(tmp_path / "ct"))
    sync = TableSync(src, tgt)
    src.merge(_stage(spark, [("a", 1, "en", 1.0, "upsert")]), epoch=0, mode="mor")
    src.merge(_stage(spark, [("a", 2, "en", 2.0, "upsert")]), epoch=1, mode="mor")
    sync.refresh()
    before = _state(tgt)
    src.compact()
    r = sync.refresh()
    assert not r["skipped"] and r["synced_to"] == src.snapshot()["snapshot_id"]
    assert _state(tgt) == before
    assert sync.cursor() == src.snapshot()["snapshot_id"]


def test_rebuild_converges_from_stale_target(spark, tmp_path):
    src = _mk_src(spark, str(tmp_path / "rs"))
    tgt = _mk_tgt(spark, str(tmp_path / "rt"))
    sync = TableSync(src, tgt)
    src.merge(_stage(spark, [
        ("a", 1, "en", 1.0, "upsert"), ("b", 1, "de", 2.0, "upsert"),
    ]), epoch=0)
    sync.refresh()
    # pollute the target out-of-band (a bug / manual write)
    tgt.merge(_stage(spark, [("zz", 9, "xx", 99.0, "upsert")]), epoch=500)
    assert "zz" in _state(tgt)
    src.merge(_stage(spark, [("a", 2, "en", 7.0, "upsert")]), epoch=1)
    r = sync.refresh(rebuild=True)
    assert r.get("rebuilt")
    assert _state(tgt) == _state(src)
    # and incremental continues from the rebuilt cursor
    src.merge(_stage(spark, [("b", 3, "de", 0.0, "delete")]), epoch=2)
    sync.refresh()
    assert _state(tgt) == _state(src)


def test_expired_cursor_raises_then_rebuild(spark, tmp_path):
    src = _mk_src(spark, str(tmp_path / "es"))
    tgt = _mk_tgt(spark, str(tmp_path / "et"))
    sync = TableSync(src, tgt)
    for i in range(4):
        src.merge(_stage(spark, [("a", i + 1, "en", float(i), "upsert")]), epoch=i)
        if i == 0:
            sync.refresh()
    src.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="not a live snapshot"):
        sync.refresh()
    sync.refresh(rebuild=True)
    assert _state(tgt) == _state(src)


def test_key_mismatch_and_missing_order_col(spark, tmp_path):
    src = _mk_src(spark, str(tmp_path / "vs"))
    bad = LakeTable.create(
        spark, str(tmp_path / "vb"), SRC_SCHEMA, key_col="lang", n_buckets=2,
        order_col="warc_ts",
    )
    with pytest.raises(ValueError, match="key"):
        TableSync(src, bad)


def test_streaming_sync_tracks_source(spark, tmp_path):
    """Continuous sync: a running rate-clock stream applies refreshes; the
    target converges to every source state without manual refresh calls."""
    import time

    from data_pipeline_spark.lake.sync import StreamingTableSync

    src = _mk_src(spark, str(tmp_path / "ss"))
    tgt = _mk_tgt(spark, str(tmp_path / "st"))
    sync = TableSync(src, tgt, predicate="lang = 'en'")
    stream = StreamingTableSync(sync)
    q = stream.start(str(tmp_path / "cp"), interval="1 second")
    try:
        src.merge(_stage(spark, [
            ("a", 1, "en", 1.0, "upsert"), ("b", 1, "de", 2.0, "upsert"),
        ]), epoch=0)
        _await(lambda: set(_state(tgt)) == {"a"})
        src.merge(_stage(spark, [
            ("a", 2, "en", 0.0, "delete"), ("c", 2, "en", 3.0, "upsert"),
        ]), epoch=1)
        _await(lambda: set(_state(tgt)) == {"c"})
    finally:
        q.stop()
    assert any(not r.get("skipped") for r in stream.results)


def _await(cond, timeout=60.0):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return
        time.sleep(0.5)
    raise AssertionError("condition not reached within timeout")


def test_lost_cursor_raises_and_tag_protects_it(spark, tmp_path):
    """Review finding: a target whose cursor-bearing commits were expired
    must raise, not silently re-apply inserts-only; and the sync-cursor
    tag keeps expiry from dropping the cursor in the first place."""
    src = _mk_src(spark, str(tmp_path / "ls"))
    tgt = _mk_tgt(spark, str(tmp_path / "lt"))
    sync = TableSync(src, tgt)
    src.merge(_stage(spark, [("a", 1, "en", 1.0, "upsert")]), epoch=0)
    sync.refresh()
    # churn the target with non-sync commits, then expire aggressively:
    # the tagged sync commit must survive and the cursor stay readable
    for i in range(4):
        tgt.compact()
    tgt.expire_snapshots(keep_last=1)
    assert sync.cursor() == src.snapshot()["snapshot_id"]
    # drop the protective tag and expire the sync commits away -> raise
    tgt.drop_tag("sync-cursor")
    for i in range(2):
        tgt.compact()
    tgt.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="no sync cursor"):
        sync.refresh()
    # rebuild converges
    sync.refresh(rebuild=True)
    assert _state(tgt) == _state(src)
