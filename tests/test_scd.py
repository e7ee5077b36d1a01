"""SCD2 history derivation + point-in-time lookup (operators/scd.py)."""

import datetime as dt

import pyspark.sql.functions as F

from data_pipeline_spark.operators.dedup import lww_dedup
from data_pipeline_spark.operators.scd import scd2_apply_batch, scd2_history, scd2_lookup


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


# --- incremental maintenance (scd2_apply_batch) ---


def _hist_rows(h):
    return sorted(
        (r.key, r.version, r.val, r.valid_from, r.valid_to, r.is_current)
        for r in h.collect()
    )


def test_apply_batch_appends_new_versions(spark):
    events = _log(spark)
    first = events.where("ts < timestamp'2024-01-01 00:00:15'")
    rest = events.where("ts >= timestamp'2024-01-01 00:00:15'")
    h0 = scd2_history(first, ("key",), ("ts", "lsn"), ("val",), carry_order=True)
    h1 = scd2_apply_batch(h0, rest, ("key",), ("ts", "lsn"), ("val",))
    full = scd2_history(events, ("key",), ("ts", "lsn"), ("val",), carry_order=True)
    assert _hist_rows(h1) == _hist_rows(full)


def test_apply_batch_late_event_splits_interval(spark):
    # history: x@0 .. y@20; late z@10 must split x's interval into x@[0,10), z@[10,20)
    base = spark.createDataFrame(
        [("k", _ts(0), 1, "x"), ("k", _ts(20), 2, "y")],
        "key string, ts timestamp, lsn long, val string",
    )
    late = spark.createDataFrame(
        [("k", _ts(10), 3, "z")], "key string, ts timestamp, lsn long, val string"
    )
    h0 = scd2_history(base, ("key",), ("ts", "lsn"), ("val",), carry_order=True)
    h1 = scd2_apply_batch(
        h0, late, ("key",), ("ts", "lsn"), ("val",), full_events=base
    )
    got = sorted((r.version, r.val, r.valid_from, r.valid_to) for r in h1.collect())
    assert got == [
        (1, "x", _ts(0), _ts(10)),
        (2, "z", _ts(10), _ts(20)),
        (3, "y", _ts(20), None),
    ]


def test_apply_batch_idempotent_under_redelivery(spark):
    events = _log(spark)
    h0 = scd2_history(events, ("key",), ("ts", "lsn"), ("val",), carry_order=True)
    # redeliver the whole stream (starts AND collapsed no-ops) — all keys
    # are "late" by the high-water test, so the retained log is required;
    # the rebuild must be a no-change
    h1 = scd2_apply_batch(
        h0, events, ("key",), ("ts", "lsn"), ("val",), full_events=events
    )
    assert _hist_rows(h1) == _hist_rows(h0)


def test_apply_batch_fold_order_invariance(spark):
    """Any partition of the stream into batches, folded in any order,
    equals the full-stream history (late events exercise the per-key
    rebuild path)."""
    import random

    rng = random.Random(42)
    rows = []
    for lsn in range(300):
        key = f"k{rng.randrange(12)}"
        rows.append((key, _ts(rng.randrange(10_000)), lsn, rng.choice("abcd")))
    events = spark.createDataFrame(
        rows, "key string, ts timestamp, lsn long, val string"
    )
    full = scd2_history(events, ("key",), ("ts", "lsn"), ("val",), carry_order=True)

    batch_of = [rng.randrange(4) for _ in range(300)]
    batches = [
        spark.createDataFrame(
            [r for r, b in zip(rows, batch_of) if b == i],
            "key string, ts timestamp, lsn long, val string",
        )
        for i in range(4)
    ]
    order = [2, 0, 3, 1]  # arbitrary fold order → plenty of late events
    h = scd2_history(
        batches[order[0]], ("key",), ("ts", "lsn"), ("val",), carry_order=True
    )
    applied = batches[order[0]]
    for i in order[1:]:
        # full_events = the event stream retained so far (the changelog up
        # to and including this batch) — what a real deployment has
        applied = applied.unionByName(batches[i])
        h = scd2_apply_batch(
            h, batches[i], ("key",), ("ts", "lsn"), ("val",), full_events=applied
        ).localCheckpoint()  # materialize per epoch, as a real maintainer does
    assert _hist_rows(h) == _hist_rows(full)


def test_apply_batch_late_without_log_raises(spark):
    base = spark.createDataFrame(
        [("k", _ts(0), 1, "x"), ("k", _ts(20), 2, "y")],
        "key string, ts timestamp, lsn long, val string",
    )
    late = spark.createDataFrame(
        [("k", _ts(10), 3, "z")], "key string, ts timestamp, lsn long, val string"
    )
    h0 = scd2_history(base, ("key",), ("ts", "lsn"), ("val",), carry_order=True)
    import pytest

    with pytest.raises(ValueError, match="late"):
        scd2_apply_batch(h0, late, ("key",), ("ts", "lsn"), ("val",))


def test_apply_batch_inorder_needs_no_log_even_with_collapsed_highwater(spark):
    """A key whose high-water is a COLLAPSED event (x@10) with new events
    strictly after it must fold exactly from starts alone — the case that
    makes the seen_* columns necessary (start-only high-water would
    mis-classify a batch at t15 as in-order... and t15 > 10 IS in-order;
    the dangerous case is t5..t10, covered by the raise test)."""
    base = spark.createDataFrame(
        [("k", _ts(0), 1, "x"), ("k", _ts(10), 2, "x")],  # x@10 collapses
        "key string, ts timestamp, lsn long, val string",
    )
    nxt = spark.createDataFrame(
        [("k", _ts(15), 3, "y")], "key string, ts timestamp, lsn long, val string"
    )
    h0 = scd2_history(base, ("key",), ("ts", "lsn"), ("val",), carry_order=True)
    assert h0.count() == 1  # collapsed
    h1 = scd2_apply_batch(h0, nxt, ("key",), ("ts", "lsn"), ("val",))
    full = scd2_history(
        base.unionByName(nxt), ("key",), ("ts", "lsn"), ("val",), carry_order=True
    )
    assert _hist_rows(h1) == _hist_rows(full)
    # and a batch INSIDE the collapsed span is correctly flagged late
    mid = spark.createDataFrame(
        [("k", _ts(5), 9, "z")], "key string, ts timestamp, lsn long, val string"
    )
    h2 = scd2_apply_batch(
        h1, mid, ("key",), ("ts", "lsn"), ("val",),
        full_events=base.unionByName(nxt),
    )
    full2 = scd2_history(
        base.unionByName(nxt).unionByName(mid),
        ("key",), ("ts", "lsn"), ("val",), carry_order=True,
    )
    assert _hist_rows(h2) == _hist_rows(full2)


def test_scd2_prune_preserves_lookups_at_or_after_cutoff(spark):
    from data_pipeline_spark.operators.scd import scd2_prune

    hist = scd2_history(
        _log(spark), ("key",), ("ts", "lsn"), ("val",)
    ).withColumnRenamed("val", "val_at")
    cutoff = _ts(20)
    pruned = scd2_prune(hist, cutoff)
    # key a: v1 [0,20) ends exactly AT the cutoff → droppable; v2, v3 stay
    got = sorted((r.key, r.version) for r in pruned.collect())
    assert got == [("a", 2), ("a", 3), ("b", 1)]
    probes = spark.createDataFrame(
        [("a", _ts(20), 1), ("a", _ts(25), 2), ("a", _ts(99), 3), ("b", _ts(99), 4)],
        "key string, at timestamp, pid long",
    )
    full_res = {
        r.pid: r.val_at
        for r in scd2_lookup(hist, probes, ("key",), "at", ("val_at",)).collect()
    }
    pruned_res = {
        r.pid: r.val_at
        for r in scd2_lookup(pruned, probes, ("key",), "at", ("val_at",)).collect()
    }
    assert full_res == pruned_res


def test_scd2_lookup_null_mid_history_returns_null(spark):
    """A probe inside a version whose tracked value is NULL must return
    NULL — not the previous version's value carried past. Null-valued
    versions are real SCD2 versions here (delete tombstones, value→null
    transitions), so the lookup wraps values in a struct."""
    rows = [
        ("k", _ts(0), 1, "v"),
        ("k", _ts(10), 2, None),  # tombstone / null transition
        ("k", _ts(20), 3, "w"),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, lsn long, val string")
    hist = scd2_history(
        df, ("key",), ("ts", "lsn"), ("val",)
    ).withColumnRenamed("val", "val_at")
    probes = spark.createDataFrame(
        [("k", _ts(5), 1), ("k", _ts(15), 2), ("k", _ts(25), 3)],
        "key string, at timestamp, pid long",
    )
    got = {
        r.pid: r.val_at
        for r in scd2_lookup(hist, probes, ("key",), "at", ("val_at",)).collect()
    }
    assert got == {1: "v", 2: None, 3: "w"}


def test_apply_batch_keeps_pruned_version_numbering(spark):
    """scd2_prune keeps original version numbers for auditability; the
    incremental fold must not renumber a pruned key's survivors from 1."""
    from data_pipeline_spark.operators.scd import scd2_prune

    base = _log(spark)  # key a → versions 1..3 (x, y, x), key b → 1 (null)
    hist = scd2_history(base, ("key",), ("ts", "lsn"), ("val",), carry_order=True)
    pruned = scd2_prune(hist, _ts(20))  # a's v1 ends AT the cutoff → dropped
    batch = spark.createDataFrame(
        [("a", _ts(40), 9, "z")], "key string, ts timestamp, lsn long, val string"
    )
    h1 = scd2_apply_batch(pruned, batch, ("key",), ("ts", "lsn"), ("val",))
    got = sorted((r.key, r.version, r.val) for r in h1.collect())
    assert got == [("a", 2, "y"), ("a", 3, "x"), ("a", 4, "z"), ("b", 1, None)]
