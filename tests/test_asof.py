"""As-of join + sessionization: handcrafted semantics (tie inclusivity,
missing-version nulls, gap edges) and the single-shuffle plan shape."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.asof import asof_join, session_stats, sessionize


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def enriched(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(5)),    # before any version -> null
            (2, "u1", _ts(10)),   # exactly at v1 -> inclusive match
            (3, "u1", _ts(25)),   # between v1 and v2 -> v1
            (4, "u1", _ts(30)),   # exactly at v2 -> v2
            (5, "u1", _ts(50)),   # after v2 -> v2
            (6, "u2", _ts(40)),   # key with no versions at all -> null
        ],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), 100.0), ("u1", _ts(30), 300.0)],
        "user string, vts timestamp, dim double",
    )
    out = asof_join(
        left, right, key_cols=("user",), left_ts="ts", right_ts="vts",
        value_cols=("dim",),
    )
    return {r["event_id"]: r["dim"] for r in out.collect()}, out


def test_asof_backward_inclusive_semantics(enriched):
    dims, out = enriched
    assert dims == {1: None, 2: 100.0, 3: 100.0, 4: 300.0, 5: 300.0, 6: None}


def test_asof_plan_is_single_shuffle_window(spark, enriched):
    """No range join: the plan must be union -> one keyed window — zero
    cartesian/broadcast-nested-loop joins, exactly one exchange."""
    _, out = enriched
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # it is not a join at all
    assert "Window" in plan


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, _ts(1), 2.0)], "k long, ts timestamp, dim double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, ("k",), "ts", "ts", ("dim",))


def test_sessionize_gap_edges(spark):
    rows = [
        ("u1", _ts(0)), ("u1", _ts(10)),   # gap 10 == gap -> same session
        ("u1", _ts(21)),                   # gap 11 > 10 -> new session
        ("u1", _ts(31)),                   # gap 10 -> same
        ("u2", _ts(0)),                    # other key independent
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    out = sessionize(df, ("user",), "ts", gap_seconds=10)
    got = {(r["user"], r["ts"].second): r["session_idx"] for r in out.collect()}
    assert got == {
        ("u1", 0): 0, ("u1", 10): 0, ("u1", 21): 1, ("u1", 31): 1, ("u2", 0): 0,
    }


def test_sessionize_subsecond_gap(spark):
    """Microsecond precision: a 1.5s gap with gap_seconds=1 must split —
    whole-second truncation would see gap=1 and merge."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [("u", t0), ("u", t0 + dt.timedelta(seconds=1, microseconds=500000))]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    out = sessionize(df, ("user",), "ts", gap_seconds=1)
    assert sorted(r["session_idx"] for r in out.collect()) == [0, 1]


def test_range_join_semantics_and_plan(spark):
    """Inclusive containment across bucket boundaries; pairs produced
    exactly once; the plan is an equi-join (no nested loop)."""
    from data_pipeline_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, "k", _ts(0)), (2, "k", _ts(30)), (3, "k", _ts(59)),
         (4, "k", _ts(31)), (5, "other", _ts(30))],
        "pid long, key string, ts timestamp",
    )
    ranges = spark.createDataFrame(
        [("k", 10, _ts(30), _ts(31)),    # straddles a 15s bucket boundary
         ("k", 20, _ts(0), _ts(59)),     # spans all buckets
         ("other", 30, _ts(0), _ts(59))],
        "key string, rid long, s timestamp, e timestamp",
    )
    out = range_join(
        points, ranges, point_ts="ts", start_ts="s", end_ts="e",
        key_cols=("key",), bucket_seconds=15,
    )
    got = sorted((r["pid"], r["rid"]) for r in out.collect())
    assert got == [
        (1, 20), (2, 10), (2, 20), (3, 20), (4, 10), (4, 20), (5, 30),
    ]
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_range_join_survives_inverted_range(spark):
    """A corrupt range with end < start (epoch-0 end against a far-future
    start) must be dropped, not fed to F.sequence — which would step
    backwards and materialize the whole inverted span as one per-row
    array (executor OOM from a single bad row)."""
    from data_pipeline_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, "k", _ts(30))], "pid long, key string, ts timestamp"
    )
    ranges = spark.createDataFrame(
        [("k", 10, _ts(0), _ts(59)),
         # inverted: start in 2099, end at epoch 0 → ~68B inverted seconds
         ("k", 99, "2099-01-01 00:00:00", "1970-01-01 00:00:00")],
        "key string, rid long, s string, e string",
    ).select("key", "rid", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"))
    out = range_join(
        points, ranges, point_ts="ts", start_ts="s", end_ts="e",
        key_cols=("key",), bucket_seconds=60,
    )
    assert [(r["pid"], r["rid"]) for r in out.collect()] == [(1, 10)]


def test_session_stats_rollup(spark):
    rows = [("u1", _ts(0)), ("u1", _ts(5)), ("u1", _ts(40)), ("u1", _ts(41))]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    out = {
        r["session_idx"]: (r["n_events"], r["duration_sec"])
        for r in session_stats(df, ("user",), "ts", gap_seconds=10).collect()
    }
    assert out == {0: (2, 5), 1: (2, 1)}
