"""Adaptive recrawl scheduling (operators/recrawl.py): change-rate
estimation from capture history and budgeted schedule semantics."""

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.recrawl import (
    capture_change_flags,
    recrawl_schedule,
    recrawl_stats,
)

H = 3600


def _caps(spark):
    t = lambda s: datetime.utcfromtimestamp(1_700_000_000 + s)  # noqa: E731
    rows = [
        # fast-changing page: every capture differs, captured hourly,
        # last seen 10h before the high-water mark
        ("u_fast", t(0), "d1"), ("u_fast", t(H), "d2"), ("u_fast", t(2 * H), "d3"),
        # slow page: one change across 12h, fresh at high-water
        ("u_slow", t(0), "e1"), ("u_slow", t(6 * H), "e1"), ("u_slow", t(12 * H), "e2"),
        # static page: never changed
        ("u_static", t(0), "s1"), ("u_static", t(6 * H), "s1"),
        # single capture: nothing known
        ("u_single", t(12 * H), "x1"),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, payload_digest string")


def test_change_flags(spark):
    flags = {
        (r["url"], r["warc_ts"]): r["changed"]
        for r in capture_change_flags(_caps(spark)).collect()
    }
    t = lambda s: datetime.utcfromtimestamp(1_700_000_000 + s)  # noqa: E731
    assert flags[("u_fast", t(0))] is False  # first capture never counts
    assert flags[("u_fast", t(H))] is True
    assert flags[("u_slow", t(6 * H))] is False
    assert flags[("u_slow", t(12 * H))] is True
    assert flags[("u_static", t(6 * H))] is False


def test_stats_semantics(spark):
    s = {r["url"]: r for r in recrawl_stats(_caps(spark)).collect()}
    assert s["u_fast"]["n_captures"] == 3 and s["u_fast"]["n_changes"] == 2
    assert s["u_fast"]["change_period_s"] == pytest.approx(H)  # 2h span / 2
    assert s["u_fast"]["staleness_s"] == pytest.approx(10 * H)
    assert s["u_fast"]["due_score"] == pytest.approx(10.0)  # 10 missed changes
    assert s["u_slow"]["change_period_s"] == pytest.approx(12 * H)
    assert s["u_slow"]["due_score"] == pytest.approx(0.0)  # fresh
    assert s["u_static"]["change_period_s"] is None
    assert s["u_static"]["due_score"] == 0.0
    assert s["u_single"]["span_s"] == 0.0 and s["u_single"]["due_score"] == 0.0


def test_schedule_budget_and_order(spark):
    top = recrawl_schedule(_caps(spark), budget=2).collect()
    assert [r["url"] for r in top][0] == "u_fast"
    assert len(top) == 2


def test_default_period_rotates_cold_pages(spark):
    # without a default, never-changed pages score 0; with one, their
    # staleness starts counting against the synthetic period
    top = recrawl_schedule(_caps(spark), budget=4, default_period_s=float(3 * H))
    s = {r["url"]: r["due_score"] for r in top.collect()}
    assert s["u_static"] == pytest.approx((12 * H - 6 * H) / (3 * H))
    assert s["u_single"] == pytest.approx(0.0)  # captured at the high-water


def test_schedule_is_take_ordered(spark):
    plan = (
        recrawl_schedule(_caps(spark), budget=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_schedule_fetches_politeness(spark):
    plan = spark.createDataFrame(
        [
            ("https://a.com/1", "a.com", 5.0, 2.0),
            ("https://a.com/2", "a.com", 9.0, 2.0),
            ("https://a.com/3", "a.com", 1.0, 2.0),
            ("https://b.com/1", "b.com", 4.0, None),  # no robots delay
            ("https://b.com/2", "b.com", None, None),  # null priority last
        ],
        "url string, host string, priority double, crawl_delay double",
    )
    from data_pipeline_spark.operators.recrawl import schedule_fetches

    got = {r["url"]: r for r in schedule_fetches(plan, default_delay_s=1.5).collect()}
    # a.com: priority order 2 > 1 > 3, spaced by its 2s crawl-delay
    assert got["https://a.com/2"]["fetch_slot"] == 0
    assert got["https://a.com/1"]["scheduled_offset_s"] == 2.0
    assert got["https://a.com/3"]["scheduled_offset_s"] == 4.0
    # b.com runs in parallel from slot 0 with the default delay
    assert got["https://b.com/1"]["fetch_slot"] == 0
    assert got["https://b.com/2"]["scheduled_offset_s"] == 1.5


def test_cap_per_host(spark):
    from data_pipeline_spark.operators.recrawl import cap_per_host

    plan = spark.createDataFrame(
        [(f"https://big.com/{i}", "big.com", float(i)) for i in range(10)]
        + [("https://small.com/1", "small.com", 0.5)],
        "url string, host string, priority double",
    )
    got = cap_per_host(plan, 3).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r["url"])
    assert len(by_host["big.com"]) == 3
    # the kept three are the highest-priority pages
    assert set(by_host["big.com"]) == {f"https://big.com/{i}" for i in (9, 8, 7)}
    assert by_host["small.com"] == ["https://small.com/1"]


def test_cap_per_host_keeps_asserted_urls(spark):
    """Server-asserted/discovery urls carry null or low statistical
    priority; with asserted_col set the fairness cap must keep them ahead
    of high-priority statistical urls — matching the final plan sort."""
    from data_pipeline_spark.operators.recrawl import cap_per_host

    plan = spark.createDataFrame(
        [(f"https://big.com/{i}", "big.com", float(i), False) for i in range(5)]
        + [
            ("https://big.com/new1", "big.com", None, True),
            ("https://big.com/new2", "big.com", 0.1, True),
        ],
        "url string, host string, priority double, server_modified boolean",
    )
    got = cap_per_host(plan, 3, asserted_col="server_modified").collect()
    kept = {r["url"] for r in got}
    assert kept == {
        "https://big.com/new1", "https://big.com/new2", "https://big.com/4"
    }


def test_attach_validators_single_column_cdx(spark):
    """A CDX carrying only one of the two validator headers still
    attaches: the missing one comes back all-null instead of failing with
    UNRESOLVED_COLUMN."""
    from datetime import datetime

    from data_pipeline_spark.operators.recrawl import attach_validators

    stats = spark.createDataFrame(
        [("https://x.org/a", 0.5)], "url string, due_score double"
    )
    cdx_lm = spark.createDataFrame(
        [
            ("https://x.org/a", datetime(2024, 3, 1), "Mon, 01 Mar"),
            ("https://x.org/a", datetime(2024, 3, 5), "Fri, 05 Mar"),
        ],
        "url string, warc_ts timestamp, http_last_modified string",
    )
    row = attach_validators(stats, cdx_lm).collect()[0]
    assert row["last_modified"] == "Fri, 05 Mar" and row["etag"] is None

    cdx_etag = spark.createDataFrame(
        [("https://x.org/a", datetime(2024, 3, 1), 'W/"abc"')],
        "url string, warc_ts timestamp, http_etag string",
    )
    row = attach_validators(stats, cdx_etag).collect()[0]
    assert row["etag"] == 'W/"abc"' and row["last_modified"] is None

    import pytest

    with pytest.raises(ValueError, match="neither"):
        attach_validators(stats, cdx_etag.drop("http_etag"))


def test_same_tick_changes_stay_schedulable(spark):
    """Captures within one timestamp tick with differing digests: span 0
    carries no rate info — the period must be NULL (unknown) so
    apply_default_period can rotate the page back in, never 0 (which made
    due_score 0 forever)."""
    from datetime import datetime

    from data_pipeline_spark.operators.recrawl import (
        apply_default_period,
        recrawl_stats,
    )

    t = datetime(2024, 3, 1, 12, 0, 0)
    caps = spark.createDataFrame(
        [("u", t, "d1"), ("u", t, "d2"),
         ("v", t, "x1"), ("v", datetime(2024, 3, 8), "x2")],
        "url string, warc_ts timestamp, payload_digest string",
    )
    stats = {r["url"]: r for r in recrawl_stats(caps).collect()}
    assert stats["u"]["n_changes"] == 1
    assert stats["u"]["change_period_s"] is None  # unknown, not 0
    assert stats["u"]["due_score"] == 0.0
    assert stats["v"]["change_period_s"] is not None and stats["v"]["change_period_s"] > 0
    rotated = {r["url"]: r for r in
               apply_default_period(recrawl_stats(caps), 86400.0).collect()}
    assert rotated["u"]["due_score"] > 0.0  # schedulable again
