"""Row-level change data feed (LakeTable.change_feed — the Delta CDF
analog): net insert/update/delete emission between snapshots, squashing,
compaction invisibility, and cursor guards, all against a Python
full-state-diff oracle."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
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
    """rows: (url, ts_second, score, op)"""
    df = spark.createDataFrame(
        [(u, t, s, op) for (u, t, s, op) in rows],
        "url string, sec long, score double, op string",
    )
    return df.select(
        "url",
        F.timestamp_seconds(F.col("sec")).alias("warc_ts"),
        "score",
        "op",
        F.col("sec").alias("lsn"),
    )


def _state(tbl, snap_id=None):
    return {
        r["url"]: (r["warc_ts"], r["score"])
        for r in tbl.read(snapshot_id=snap_id).collect()
    }


def _feed(tbl, frm, to=None):
    rows = tbl.change_feed(frm, to).collect()
    return sorted((r["url"], r["_change_type"], r["score"]) for r in rows)


def python_diff_oracle(pre, post):
    out = []
    for k in pre.keys() - post.keys():
        out.append((k, "delete", pre[k][1]))
    for k in post.keys() - pre.keys():
        out.append((k, "insert", post[k][1]))
    for k in pre.keys() & post.keys():
        if pre[k] != post[k]:
            out.append((k, "update_preimage", pre[k][1]))
            out.append((k, "update_postimage", post[k][1]))
    return sorted(out)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_feed_matches_state_diff(spark, tmp_path, mode):
    tbl = _mk(spark, str(tmp_path / f"t_{mode}"))
    tbl.merge(_stage(spark, [
        ("a", 1, 1.0, "upsert"), ("b", 1, 2.0, "upsert"), ("c", 1, 3.0, "upsert"),
    ]), epoch=0, mode=mode)
    s0 = tbl.snapshot()["snapshot_id"]
    tbl.merge(_stage(spark, [
        ("b", 2, 20.0, "upsert"),           # update
        ("c", 2, 3.0, "delete"),            # delete
        ("d", 2, 4.0, "upsert"),            # insert
    ]), epoch=1, mode=mode)
    s1 = tbl.snapshot()["snapshot_id"]

    expected = python_diff_oracle(_state(tbl, s0), _state(tbl, s1))
    assert _feed(tbl, s0, s1) == expected
    assert expected == sorted([
        ("b", "update_preimage", 2.0), ("b", "update_postimage", 20.0),
        ("c", "delete", 3.0), ("d", "insert", 4.0),
    ])
    # snapshot ids are stamped
    types = {r["_commit_snapshot_id"] for r in tbl.change_feed(s0, s1).collect()}
    assert types == {s1}


def test_feed_is_net_over_interval(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "net"))
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert")]), epoch=0, mode="mor")
    s0 = tbl.snapshot()["snapshot_id"]
    # a updated twice; e inserted then deleted -> net nothing
    tbl.merge(_stage(spark, [("a", 2, 2.0, "upsert"), ("e", 2, 9.0, "upsert")]),
              epoch=1, mode="mor")
    tbl.merge(_stage(spark, [("a", 3, 3.0, "upsert"), ("e", 3, 9.0, "delete")]),
              epoch=2, mode="mor")
    s2 = tbl.snapshot()["snapshot_id"]
    assert _feed(tbl, s0, s2) == [
        ("a", "update_postimage", 3.0), ("a", "update_preimage", 1.0),
    ]


def test_from_none_is_all_inserts_and_empty_interval(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "boot"))
    # empty table, no snapshots at all
    assert tbl.change_feed(None).count() == 0
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert"), ("b", 1, 2.0, "upsert")]),
              epoch=0)
    s0 = tbl.snapshot()["snapshot_id"]
    assert _feed(tbl, None, s0) == [("a", "insert", 1.0), ("b", "insert", 2.0)]
    # from == to -> no file delta -> empty
    assert tbl.change_feed(s0, s0).count() == 0
    # schema of the empty frame matches the populated one
    assert tbl.change_feed(s0, s0).columns == tbl.change_feed(None, s0).columns


def test_compaction_is_invisible(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "cmp"))
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert"), ("b", 1, 2.0, "upsert")]),
              epoch=0, mode="mor")
    tbl.merge(_stage(spark, [("a", 2, 5.0, "upsert")]), epoch=1, mode="mor")
    s1 = tbl.snapshot()["snapshot_id"]
    tbl.compact()
    s2 = tbl.snapshot()["snapshot_id"]
    assert s2 != s1
    # physical rewrite, zero logical change
    assert tbl.change_feed(s1, s2).count() == 0


def test_expired_cursor_raises(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "exp"))
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert")]), epoch=0)
    with pytest.raises(ValueError, match="not a live snapshot"):
        tbl.change_feed(123456)


def test_generic_merge_shows_in_feed(spark, tmp_path):
    tbl = _mk(spark, str(tmp_path / "gm"))
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert"), ("b", 1, 2.0, "upsert")]),
              epoch=0)
    s0 = tbl.snapshot()["snapshot_id"]
    src = spark.createDataFrame([("a", 100.0), ("z", 7.0)],
                                "url string, score double")
    (tbl.merge_builder(src)
        .when_matched_update(set={"score": "s.score"})
        .when_not_matched_insert(
            values={"url": "s.url", "warc_ts": "timestamp_seconds(9)",
                    "score": "s.score"})
        .execute())
    expected = python_diff_oracle(_state(tbl, s0), _state(tbl))
    assert _feed(tbl, s0) == expected
    assert ("z", "insert", 7.0) in expected


def test_null_key_rows_visible_in_feed(spark, tmp_path):
    """Review finding: null-key rows never join (SQL equality), so presence
    must come from literals — a null-key insert/delete shows in the feed."""
    tbl = _mk(spark, str(tmp_path / "nk"))
    tbl.merge(_stage(spark, [("a", 1, 1.0, "upsert"), (None, 1, 9.0, "upsert")]),
              epoch=0)
    s0 = tbl.snapshot()["snapshot_id"]
    rows0 = {(r["url"], r["_change_type"], r["score"])
             for r in tbl.change_feed(None, s0).collect()}
    assert (None, "insert", 9.0) in rows0
    tbl.merge(_stage(spark, [(None, 2, 9.0, "delete")]), epoch=1)
    rows1 = {(r["url"], r["_change_type"], r["score"])
             for r in tbl.change_feed(s0).collect()}
    assert (None, "delete", 9.0) in rows1
