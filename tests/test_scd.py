"""SCD2 history derivation + point-in-time lookup (operators/scd.py)."""

import datetime as dt

import pyspark.sql.functions as F

from data_pipeline_spark.operators.dedup import lww_dedup
from data_pipeline_spark.operators.scd import scd2_history, scd2_lookup


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _log(spark):
    # key "a": v1 at t0 (x), no-op at t10 (x — must collapse), v2 at t20 (y),
    # v3 at t30 (back to x — a *revisit* must open a NEW version, not merge
    # with v1). key "b": single version, tracked value null.
    rows = [
        ("a", _ts(0), 1, "x"),
        ("a", _ts(10), 2, "x"),
        ("a", _ts(20), 3, "y"),
        ("a", _ts(30), 4, "x"),
        ("b", _ts(5), 5, None),
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, lsn long, val string")


def test_scd2_collapses_noops_and_chains_intervals(spark):
    hist = scd2_history(
        _log(spark), key_cols=("key",), order_cols=("ts", "lsn"), tracked_cols=("val",)
    )
    rows = {(r.key, r.version): r for r in hist.collect()}
    assert len(rows) == 4  # a: 3 versions (no-op collapsed), b: 1
    a1, a2, a3 = rows[("a", 1)], rows[("a", 2)], rows[("a", 3)]
    assert (a1.val, a1.valid_from, a1.valid_to, a1.is_current) == ("x", _ts(0), _ts(20), False)
    assert (a2.val, a2.valid_from, a2.valid_to, a2.is_current) == ("y", _ts(20), _ts(30), False)
    assert (a3.val, a3.valid_from, a3.valid_to, a3.is_current) == ("x", _ts(30), None, True)
    b1 = rows[("b", 1)]
    assert (b1.val, b1.valid_from, b1.valid_to, b1.is_current) == (None, _ts(5), None, True)


def test_scd2_null_transitions_are_versions(spark):
    # null → value and value → null are real changes; null → null is not.
    rows = [
        ("k", _ts(0), 1, None),
        ("k", _ts(1), 2, None),
        ("k", _ts(2), 3, "v"),
        ("k", _ts(3), 4, None),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, lsn long, val string")
    hist = scd2_history(df, ("key",), ("ts", "lsn"), ("val",))
    got = [(r.version, r.val) for r in hist.orderBy("version").collect()]
    assert got == [(1, None), (2, "v"), (3, None)]


def test_scd2_current_versions_equal_lww(spark):
    """The is_current slice must agree with LWW dedup on tracked values —
    SCD2 is a strict superset of latest-state."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id", "ts", "event_type"
    )
    hist = scd2_history(ev, ("user_id",), ("ts", "event_id"), ("event_type",))
    current = {
        (r.user_id, r.event_type) for r in hist.where("is_current").collect()
    }
    latest = {
        (r.user_id, r.event_type)
        for r in lww_dedup(ev, ("user_id",), ("ts", "event_id")).collect()
    }
    assert current == latest
    # exactly one current version per key
    assert hist.where("is_current").count() == hist.select("user_id").distinct().count()


def test_scd2_intervals_partition_time(spark):
    """Per key: valid_from(v+1) == valid_to(v) (no gaps, no overlaps) and
    version numbers are 1..n."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id", "ts", "event_type"
    )
    hist = scd2_history(ev, ("user_id",), ("ts", "event_id"), ("event_type",))
    bad_chain = (
        hist.alias("a")
        .join(
            hist.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.version") + 1 == F.col("b.version")),
        )
        .where(F.col("a.valid_to") != F.col("b.valid_from"))
        .count()
    )
    assert bad_chain == 0
    vstats = hist.groupBy("user_id").agg(
        F.min("version").alias("lo"), F.max("version").alias("hi"), F.count("*").alias("n")
    )
    assert vstats.where((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0


def test_scd2_single_shuffle_plan(spark):
    """The lag-detect + lead-close build must reuse one exchange (the filter
    preserves the key distribution) — a second shuffle is the self-join
    regression this module exists to avoid."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_id", "ts", "event_type"
    )
    hist = scd2_history(ev, ("user_id",), ("ts", "event_id"), ("event_type",))
    tree = hist._jdf.queryExecution().executedPlan().toString()
    assert tree.count("Exchange hashpartitioning") == 1, tree


def test_scd2_lookup_matches_interval_semantics(spark):
    hist = scd2_history(
        _log(spark), ("key",), ("ts", "lsn"), ("val",)
    ).withColumnRenamed("val", "val_at")
    probes = spark.createDataFrame(
        [
            ("a", _ts(0), 1),    # exactly at v1 open → x
            ("a", _ts(19), 2),   # inside v1 (after collapsed no-op) → x
            ("a", _ts(20), 3),   # exactly at v2 open → y
            ("a", _ts(99), 4),   # current → x
            ("b", _ts(0), 5),    # before b's first version → null
            ("b", _ts(6), 6),    # inside → null value (version exists)
        ],
        "key string, at timestamp, pid long",
    )
    got = {
        r.pid: r.val_at
        for r in scd2_lookup(hist, probes, ("key",), "at", ("val_at",)).collect()
    }
    assert got == {1: "x", 2: "x", 3: "y", 4: "x", 5: None, 6: None}
