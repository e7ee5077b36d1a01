"""CDC stream observability (operators/flowstats.py): sequence audit,
gap intervals, redelivery, hot keys, freshness."""

import datetime as dt

import pyspark.sql.functions as F

from data_pipeline_spark.operators.flowstats import (
    freshness_report,
    hot_keys,
    redelivery_audit,
    sequence_audit,
    sequence_gap_intervals,
)


def _stream(spark):
    # partition p0: seqs 1,2,3,7,8,8,20  → gaps (4-6), (9-19); one dup (8)
    # partition p1: seqs 5,6             → clean
    rows = [("p0", s) for s in (1, 2, 3, 7, 8, 8, 20)] + [("p1", 5), ("p1", 6)]
    return spark.createDataFrame(rows, "part string, seq long")


def test_sequence_audit_summary(spark):
    got = {r.part: r for r in sequence_audit(_stream(spark), ("part",), "seq").collect()}
    p0 = got["p0"]
    assert (p0.n_rows, p0.n_distinct, p0.min_seq, p0.max_seq) == (7, 6, 1, 20)
    assert p0.n_missing == 14  # 4,5,6,9..19
    assert p0.n_duplicates == 1
    p1 = got["p1"]
    assert (p1.n_missing, p1.n_duplicates) == (0, 0)


def test_sequence_audit_is_one_hash_agg(spark):
    plan = sequence_audit(_stream(spark), ("part",), "seq")._jdf.queryExecution()
    tree = plan.executedPlan().toString()
    assert "Window" not in tree and "Sort" not in tree.replace("SortAggregate", "")
    # count_distinct plans as two keyed hash-agg phases (dedupe on
    # (part, seq), then roll up per part) — both map-side combinable; the
    # pin is "no window, no sort, bounded exchanges", not exchange count 1.
    assert tree.count("Exchange hashpartitioning") <= 2


def test_gap_intervals_exact_spans(spark):
    got = sorted(
        (r.part, r.gap_from, r.gap_to, r.n_missing)
        for r in sequence_gap_intervals(_stream(spark), ("part",), "seq").collect()
    )
    assert got == [("p0", 4, 6, 3), ("p0", 9, 19, 11)]


def test_gap_intervals_ignore_duplicates(spark):
    # duplicated seq (lag diff 0) must not emit a gap row
    df = _stream(spark).where("part = 'p0' and seq <= 8")
    got = [
        (r.gap_from, r.gap_to)
        for r in sequence_gap_intervals(df, ("part",), "seq").collect()
    ]
    assert got == [(4, 6)]


def test_redelivery_audit(spark):
    got = redelivery_audit(_stream(spark), ("part", "seq")).collect()
    assert [(r.part, r.seq, r.n_deliveries) for r in got] == [("p0", 8, 2)]


def test_hot_keys_counts_share_and_order(spark):
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [(r.k, r.n_changes, r.share) for r in hot_keys(df, ("k",), top_k=3).collect()]
    # ties (b, c) break by key ascending; shares are n/12 rounded to 6dp
    assert got == [
        ("a", 5, round(5 / 12, 6)),
        ("b", 3, round(3 / 12, 6)),
        ("c", 3, round(3 / 12, 6)),
    ]


def test_hot_keys_no_global_sort(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    tree = hot_keys(df, ("k",), 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in tree


def test_freshness_report(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("x", t0),
        ("x", t0 + dt.timedelta(seconds=30)),
        ("y", t0 + dt.timedelta(seconds=90)),  # the high-water mark
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    got = {r.g: r for r in freshness_report(df, ("g",), "ts").collect()}
    assert got["y"].staleness_us == 0 and got["y"].n_events == 1
    assert got["x"].staleness_us == 60_000_000
    assert abs(got["x"].staleness_s - 60.0) < 1e-9
    assert got["x"].latest_ts == t0 + dt.timedelta(seconds=30)


def test_sequence_audit_null_seqs_not_counted_as_duplicates(spark):
    """Review finding: NULL seqs are a producer bug, not redelivery — they
    get their own n_null_seq column; an all-NULL partition reports
    n_missing = 0, not NULL (so '= 0' health checks can't silently pass)."""
    df = spark.createDataFrame(
        [("p1", 1), ("p1", 2), ("p1", None), ("p2", None), ("p2", None)],
        "part string, seq int",
    )
    got = {r["part"]: r for r in sequence_audit(df, ("part",), "seq").collect()}
    p1 = got["p1"]
    assert p1["n_duplicates"] == 0          # no actual redelivery
    assert p1["n_null_seq"] == 1
    assert p1["n_missing"] == 0
    p2 = got["p2"]
    assert p2["n_missing"] == 0             # not NULL
    assert p2["n_null_seq"] == 2 and p2["n_duplicates"] == 0


def test_disorder_report_hand_computed(spark):
    # arrival order 1..5, event times (s): 10, 20, 15, 30, 25
    # lateness vs running hwm:             0,  0,  5,  0,  5  (seconds)
    base = dt.datetime(2026, 1, 1)
    rows = [
        ("p0", i + 1, base + dt.timedelta(seconds=s))
        for i, s in enumerate([10, 20, 15, 30, 25])
    ]
    df = spark.createDataFrame(rows, "part string, seq long, ts timestamp")
    from data_pipeline_spark.operators.flowstats import disorder_report

    r = disorder_report(df, ("part",), "seq", "ts").collect()[0]
    assert r["n_events"] == 5 and r["n_late"] == 2
    assert r["late_frac"] == 0.4
    assert r["max_late_us"] == 5_000_000
    # sorted lateness [0,0,0,5e6,5e6]: p50 -> idx 2.0 = 0;
    # p95 -> idx 3.8 interpolates between two 5e6 values
    assert r["p50_late_us"] == 0.0
    assert r["p95_late_us"] == 5_000_000.0
    assert r["p99_late_us"] == 5_000_000.0


def test_disorder_in_order_stream_is_zero(spark):
    base = dt.datetime(2026, 1, 1)
    rows = [("p0", i, base + dt.timedelta(seconds=i)) for i in range(10)]
    df = spark.createDataFrame(rows, "part string, seq long, ts timestamp")
    from data_pipeline_spark.operators.flowstats import disorder_report

    r = disorder_report(df, ("part",), "seq", "ts").collect()[0]
    assert r["n_late"] == 0 and r["max_late_us"] == 0
    assert r["p99_late_us"] == 0.0


def test_recommend_watermark(spark):
    base = dt.datetime(2026, 1, 1)
    rows = [
        ("p0", i + 1, base + dt.timedelta(seconds=s))
        for i, s in enumerate([10, 20, 15, 30, 25])
    ]
    df = spark.createDataFrame(rows, "part string, seq long, ts timestamp")
    from data_pipeline_spark.operators.flowstats import recommend_watermark

    delay_us, clause = recommend_watermark(df, ("part",), "seq", "ts")
    # p99 = 5e6 us, ×1.5 safety = 7.5e6 → ceil to 8 seconds
    assert delay_us == 7_500_000
    assert clause == "8 seconds"
    import pytest as _pt

    with _pt.raises(ValueError):
        recommend_watermark(df, ("part",), "seq", "ts", percentile=0.9)


def test_burst_report_hand_computed(spark):
    from data_pipeline_spark.operators.flowstats import burst_report

    base = dt.datetime(2026, 3, 1)
    # hourly counts for entity e: h0:4 h1:6 h2:5 h3:5 h4:GAP(0) h5:30
    per_hour = {0: 4, 1: 6, 2: 5, 3: 5, 5: 30}
    rows = [
        ("e", base + dt.timedelta(hours=h, minutes=i))
        for h, k in per_hour.items()
        for i in range(k)
    ]
    df = spark.createDataFrame(rows, "entity string, ts timestamp")
    out = {
        r["window_start"].hour: r.asDict()
        for r in burst_report(
            df, ("entity",), "ts", window="1 hour", trailing=3,
            z_threshold=2.0, min_count=10,
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4, 5}  # h4 densified in as n=0
    assert out[4]["n"] == 0
    # h0: empty baseline; h1: single-row baseline → stddev null → z null
    assert out[0]["zscore"] is None and out[1]["zscore"] is None
    assert not out[0]["is_burst"] and not out[1]["is_burst"]
    # h3: baseline [4,6,5] mean 5 std 1 → z = 0
    assert out[3]["baseline_mean"] == 5.0 and out[3]["baseline_std"] == 1.0
    assert out[3]["zscore"] == 0.0 and not out[3]["is_burst"]
    # h4: n=0 vs baseline [6,5,5] → strongly negative z, no burst
    assert out[4]["zscore"] == -9.2376 and not out[4]["is_burst"]
    # h5: n=30 vs baseline [5,5,0]: mean 10/3, std 2.8868 → z = 9.2376
    assert out[5]["baseline_mean"] == 3.3333
    assert out[5]["baseline_std"] == 2.8868
    assert out[5]["zscore"] == 9.2376 and out[5]["is_burst"]


def test_burst_min_count_and_flat_baseline(spark):
    from data_pipeline_spark.operators.flowstats import burst_report

    base = dt.datetime(2026, 3, 1)

    def run(per_hour, **kw):
        rows = [
            ("e", base + dt.timedelta(hours=h, minutes=i))
            for h, k in per_hour.items()
            for i in range(k)
        ]
        df = spark.createDataFrame(rows, "entity string, ts timestamp")
        return {
            r["window_start"].hour: r
            for r in burst_report(
                df, ("entity",), "ts", trailing=3, z_threshold=2.0, **kw
            ).collect()
        }

    # varied baseline [2,1,2]: z = (8 - 5/3)/0.5774 ≈ 11 ≥ 2, but 8 < 10
    out = run({0: 1, 1: 2, 2: 1, 3: 2, 4: 8}, min_count=10)
    assert out[4]["zscore"] and out[4]["zscore"] > 2.0
    assert not out[4]["is_burst"]  # min_count gates the flag
    out = run({0: 1, 1: 2, 2: 1, 3: 2, 4: 8}, min_count=5)
    assert out[4]["is_burst"]  # same spike flags once past the floor

    # flat baseline [1,1,1]: zero variance → z null → never a burst
    out = run({0: 1, 1: 1, 2: 1, 3: 1, 4: 8}, min_count=1)
    assert out[4]["zscore"] is None and not out[4]["is_burst"]
