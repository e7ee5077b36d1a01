"""Generic declarative MERGE (lake/merge.py): clause semantics against a
Python dict oracle, Delta-parity edge cases (first-match-wins, null keys,
ambiguous source), and the LakeTable apply path (bucket pruning, epoch
idempotence, by-source full rewrite)."""

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

from data_pipeline_spark.lake.merge import (
    MergeCardinalityError,
    merge_frames,
)
from data_pipeline_spark.lake.table import LakeTable

TGT_ROWS = [
    (1, "alpha", 10.0),
    (2, "beta", -5.0),
    (3, "gamma", 7.5),
    (4, "delta", 0.0),
    (None, "nullkey", 99.0),
]
SRC_ROWS = [
    (1, 100.0, "del"),      # matched, delete condition fires
    (2, 20.0, "upd"),       # matched, update
    (5, 50.0, "new"),       # not matched -> insert
    (6, 60.0, "skip"),      # not matched, insert condition fails
    (None, 1.0, "upd"),     # null key: never matches; insert cond fails
]


def _frames(spark):
    t = spark.createDataFrame(
        TGT_ROWS, schema="k long, name string, bal double"
    )
    s = spark.createDataFrame(SRC_ROWS, schema="k long, amt double, tag string")
    return t, s


def _full_builder(t, s):
    return (
        merge_frames(t, s, on=["k"])
        .when_matched_delete(condition="s.tag = 'del'")
        .when_matched_update(
            set={"bal": "t.bal + s.amt", "name": F.concat(F.col("t.name"), F.lit("!"))}
        )
        .when_not_matched_insert(
            values={"k": "s.k", "name": "concat('n-', s.tag)", "bal": "s.amt"},
            condition="s.tag <> 'skip' AND s.k IS NOT NULL",
        )
        .when_not_matched_by_source_update(
            set={"name": "concat(t.name, '?')"}, condition="t.bal < 0"
        )
    )


def test_merge_frames_all_clause_types(spark):
    t, s = _frames(spark)
    out = {r["k"]: (r["name"], r["bal"]) for r in _full_builder(t, s).plan().collect()}
    assert out == {
        # 1 deleted; 2 updated; 3 by-source but bal >= 0 -> untouched;
        # 4 by-source bal==0 -> untouched; None-key target is "by source"
        # (null never matches) and bal>0 -> untouched; 5 inserted; 6 and
        # null-key source dropped (insert condition fails).
        2: ("beta!", 15.0),
        3: ("gamma", 7.5),
        4: ("delta", 0.0),
        None: ("nullkey", 99.0),
        5: ("n-new", 50.0),
    }


def test_merge_frames_by_source_delete_and_schema(spark):
    t, s = _frames(spark)
    out_df = (
        merge_frames(t, s, on=["k"])
        .when_matched_update(set={"bal": "s.amt"})
        .when_not_matched_by_source_delete(condition="t.bal > 50")
    ).plan()
    # Output schema is exactly the target schema.
    assert [f.name for f in out_df.schema.fields] == ["k", "name", "bal"]
    assert {f.name: f.dataType for f in out_df.schema.fields} == {
        "k": LongType(), "name": StringType(), "bal": DoubleType(),
    }
    out = {r["k"]: r["bal"] for r in out_df.collect()}
    # null-key target has bal 99 > 50 -> deleted by the by-source clause.
    assert out == {1: 100.0, 2: 20.0, 3: 7.5, 4: 0.0}


def test_first_match_wins_clause_order(spark):
    t, s = _frames(spark)
    # Both matched clauses apply to k=2; the FIRST in declaration order wins.
    out = {
        r["k"]: r["bal"]
        for r in (
            merge_frames(t, s, on=["k"])
            .when_matched_update(set={"bal": "1.0"}, condition="s.amt > 0")
            .when_matched_update(set={"bal": "2.0"})
        ).plan().collect()
    }
    assert out[2] == 1.0 and out[1] == 1.0


def test_update_set_star_and_insert_star(spark):
    t = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)],
                              schema="k long, name string, bal double")
    s = spark.createDataFrame([(2, "B", 20.0), (3, "C", 30.0)],
                              schema="k long, name string, bal double")
    out = {
        r["k"]: (r["name"], r["bal"])
        for r in (
            merge_frames(t, s, on=["k"])
            .when_matched_update()       # SET *
            .when_not_matched_insert()   # INSERT *
        ).plan().collect()
    }
    assert out == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("C", 30.0)}


def test_validate_source_unique_raises(spark):
    t, _ = _frames(spark)
    dup = spark.createDataFrame([(1, 1.0, "x"), (1, 2.0, "y")],
                                schema="k long, amt double, tag string")
    b = merge_frames(t, dup, on=["k"]).when_matched_update(set={"bal": "s.amt"})
    with pytest.raises(MergeCardinalityError):
        b.validate_source_unique()
    # Insert-only merges are order-insensitive: no error.
    merge_frames(t, dup, on=["k"]).when_not_matched_insert(
        values={"k": "s.k", "name": "s.tag", "bal": "s.amt"}
    ).validate_source_unique()


def test_no_clauses_raises(spark):
    t, s = _frames(spark)
    with pytest.raises(ValueError):
        merge_frames(t, s, on=["k"]).plan()
    with pytest.raises(ValueError):
        merge_frames(t, s, on=[])


SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("rank", LongType()),
    StructField("score", DoubleType()),
])


def _seed_table(spark, path, n=40, n_buckets=8):
    tbl = LakeTable.create(
        spark, path, SCHEMA, key_col="url", n_buckets=n_buckets, order_col="rank",
    )
    rows = [(f"https://ex.com/p{i}", i, float(i)) for i in range(n)]
    tbl.append(spark.createDataFrame(rows, SCHEMA))
    return tbl


def test_lake_merge_into_bucket_pruned(spark, tmp_path):
    tbl = _seed_table(spark, str(tmp_path / "t1"))
    src = spark.createDataFrame(
        [("https://ex.com/p3", 1000.0), ("https://ex.com/p7", 700.0),
         ("https://ex.com/new", 42.0)],
        schema="url string, score double",
    )
    res = (
        tbl.merge_builder(src)
        .when_matched_update(set={"score": "s.score"})
        .when_not_matched_insert(values={"url": "s.url", "rank": "-1", "score": "s.score"})
        .execute(epoch=77)
    )
    assert not res["skipped"]
    # Pruned: only the buckets the 3 source urls hash to are rewritten.
    assert res["touched_buckets"] is not None
    assert len(res["touched_buckets"]) <= 3
    state = {r["url"]: (r["rank"], r["score"]) for r in tbl.read().collect()}
    assert state["https://ex.com/p3"] == (3, 1000.0)
    assert state["https://ex.com/p7"] == (7, 700.0)
    assert state["https://ex.com/new"] == (-1, 42.0)
    assert state["https://ex.com/p5"] == (5, 5.0)
    assert len(state) == 41
    # Untouched buckets carried by reference: the commit's manifest reuses
    # prior data files.
    snap = tbl.snapshot()
    assert int(snap["summary"]["carried-files"]) > 0

    # Exactly-once: re-applying the same epoch is a no-op.
    res2 = (
        tbl.merge_builder(src)
        .when_matched_delete()
        .execute(epoch=77)
    )
    assert res2["skipped"]
    assert len(tbl.read().collect()) == 41


def test_lake_merge_into_by_source_full_rewrite(spark, tmp_path):
    tbl = _seed_table(spark, str(tmp_path / "t2"), n=20)
    src = spark.createDataFrame(
        [("https://ex.com/p1", 0.0)], schema="url string, score double"
    )
    res = (
        tbl.merge_builder(src)
        .when_matched_update(set={"score": "s.score"})
        .when_not_matched_by_source_delete(condition="t.rank >= 10")
        .execute()
    )
    # BY SOURCE clause -> every bucket examined (touched is None).
    assert res["touched_buckets"] is None
    state = {r["url"]: r["score"] for r in tbl.read().collect()}
    assert len(state) == 10
    assert state["https://ex.com/p1"] == 0.0
    assert "https://ex.com/p15" not in state


def test_lake_merge_into_validates_dup_source(spark, tmp_path):
    tbl = _seed_table(spark, str(tmp_path / "t3"), n=5)
    dup = spark.createDataFrame(
        [("https://ex.com/p1", 1.0), ("https://ex.com/p1", 2.0)],
        schema="url string, score double",
    )
    with pytest.raises(MergeCardinalityError):
        tbl.merge_builder(dup).when_matched_update(set={"score": "s.score"}).execute()


CDC_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("score", DoubleType()),
])


def _cdc_stage(spark, rows):
    """rows: (url, sec, score, op, lsn)"""
    return spark.createDataFrame(
        rows, "url string, sec long, score double, op string, lsn long"
    ).select(
        "url", F.timestamp_seconds("sec").alias("warc_ts"), "score", "op", "lsn",
    )


def test_merge_preserves_unrelated_tombstones(spark, tmp_path):
    """Review finding: a generic-merge bucket rewrite must carry winner
    tombstones, or a late out-of-order CDC event resurrects deleted keys."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "tb"), CDC_SCHEMA, key_col="url", n_buckets=1,
        order_col="warc_ts",
    )
    tbl.merge(_cdc_stage(spark, [
        ("k_del", 10, 1.0, "upsert", 10), ("k_live", 10, 2.0, "upsert", 10),
    ]), epoch=0)
    tbl.merge(_cdc_stage(spark, [("k_del", 20, 0.0, "delete", 20)]), epoch=1)
    # generic merge touching the same (only) bucket, unrelated key
    src = spark.createDataFrame([("k_live", 99.0)], "url string, score double")
    tbl.merge_builder(src).when_matched_update(set={"score": "s.score"}).execute()
    # late event OLDER than the deletion must NOT resurrect k_del
    tbl.merge(_cdc_stage(spark, [("k_del", 15, 5.0, "upsert", 15)]), epoch=2)
    state = {r["url"]: r["score"] for r in tbl.read().collect()}
    assert state == {"k_live": 99.0}
    # but a key the merge explicitly RE-INSERTS drops its tombstone
    src2 = spark.createDataFrame([("k_del", 7.0)], "url string, score double")
    (tbl.merge_builder(src2)
        .when_not_matched_insert(
            values={"url": "s.url", "warc_ts": "timestamp_seconds(30)",
                    "score": "s.score"})
        .execute())
    state = {r["url"]: r["score"] for r in tbl.read().collect()}
    assert state["k_del"] == 7.0


def test_merge_preserves_passthrough_lsn(spark, tmp_path):
    """Review finding: pass-through rows keep their stored (ts, lsn) LWW
    coordinates; a re-delivered older event still loses after a merge."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "pl"), CDC_SCHEMA, key_col="url", n_buckets=1,
        order_col="warc_ts",
    )
    # ts tie: lsn decides. Stored row has lsn=100.
    tbl.merge(_cdc_stage(spark, [("k", 10, 1.0, "upsert", 100)]), epoch=0)
    # generic merge passes k through (no clause matches it)
    src = spark.createDataFrame([("other", 1.0)], "url string, score double")
    tbl.merge_builder(src).when_matched_update(set={"score": "s.score"}).execute()
    # re-delivered event: same ts, LOWER lsn -> must lose the tie-break
    tbl.merge(_cdc_stage(spark, [("k", 10, 666.0, "upsert", 50)]), epoch=1)
    assert {r["url"]: r["score"] for r in tbl.read().collect()} == {"k": 1.0}


def test_tombstone_survives_source_touch_without_insert(spark, tmp_path):
    """Review finding: a merge whose source CONTAINS a tombstoned key but
    never inserts it (update-only clause set, or an insert whose condition
    fails) must keep the tombstone — erasing on mere source presence lets
    a late out-of-order event resurrect the deleted key."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "ts"), CDC_SCHEMA, key_col="url", n_buckets=1,
        order_col="warc_ts",
    )
    tbl.merge(_cdc_stage(spark, [("k", 10, 1.0, "upsert", 10)]), epoch=0)
    tbl.merge(_cdc_stage(spark, [("k", 20, 0.0, "delete", 20)]), epoch=1)
    # update-only merge with k in the source: matches nothing (k is dead)
    src = spark.createDataFrame([("k", 99.0)], "url string, score double")
    tbl.merge_builder(src).when_matched_update(set={"score": "s.score"}).execute()
    assert tbl.read().count() == 0
    # conditional insert whose condition FAILS for k: same story
    (tbl.merge_builder(src)
        .when_not_matched_insert(
            values={"url": "s.url", "warc_ts": "timestamp_seconds(30)",
                    "score": "s.score"},
            condition="s.score < 0")
        .execute())
    assert tbl.read().count() == 0
    # late event OLDER than the deletion must still lose to the tombstone
    tbl.merge(_cdc_stage(spark, [("k", 15, 5.0, "upsert", 15)]), epoch=2)
    assert tbl.read().count() == 0


def test_matched_delete_writes_winner_tombstone(spark, tmp_path):
    """Review finding: rows a MERGE DELETE clause removes must leave a
    winner tombstone (stamped with the new lsn), exactly like CDC deletes —
    otherwise an at-least-once redelivery of an old event resurrects the
    row the merge just deleted."""
    tbl = LakeTable.create(
        spark, str(tmp_path / "td"), CDC_SCHEMA, key_col="url", n_buckets=1,
        order_col="warc_ts",
    )
    tbl.merge(_cdc_stage(spark, [
        ("k", 10, 1.0, "upsert", 10), ("other", 10, 2.0, "upsert", 10),
    ]), epoch=0)
    src = spark.createDataFrame([("k", 0.0)], "url string, score double")
    tbl.merge_builder(src).when_matched_delete().execute()
    assert {r["url"] for r in tbl.read().collect()} == {"other"}
    # at-least-once redelivery of the ORIGINAL insert (same ts, old lsn):
    # the tombstone must win LWW, not vanish with the rewrite
    tbl.merge(_cdc_stage(spark, [("k", 10, 1.0, "upsert", 10)]), epoch=5)
    assert {r["url"] for r in tbl.read().collect()} == {"other"}
    # by-source delete gets the same protection
    src2 = spark.createDataFrame([("other", 0.0)], "url string, score double")
    (tbl.merge_builder(src2)
        .when_matched_update(set={"score": "s.score"})
        .when_not_matched_by_source_delete()
        .execute())
    assert tbl.read().count() == 1  # only 'other' (updated) remains
    tbl.merge(_cdc_stage(spark, [("k", 10, 1.0, "upsert", 10)]), epoch=6)
    state = {r["url"]: r["score"] for r in tbl.read().collect()}
    assert state == {"other": 0.0}
