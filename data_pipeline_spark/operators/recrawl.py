"""Adaptive recrawl scheduling from capture history.

A CDC-over-crawls engine controls its own source: which urls to fetch next.
The standard policy (public literature: Cho & Garcia-Molina "Estimating
Frequency of Change", plus every production crawler's revisit scheduler) is
to estimate each page's change rate from its OWN capture history — how many
of its past captures actually changed the payload digest — and crawl pages
whose expected number of missed changes since the last capture is highest.

Everything is two keyed passes, both scale-safe at 10^10 captures:

1. one window ``lag(digest)`` per url (a single keyed shuffle) marks which
   captures changed the payload;
2. one hash aggregation per url folds (n_captures, n_changes, first/last
   ts) — map-side combinable, hot urls collapse before the shuffle;
3. the corpus high-water mark is a 1-row aggregate broadcast back (never a
   global window).

``due_score = staleness / estimated change period`` ≈ expected missed
changes; rank by it and take the crawl budget. Pages with no observed
change get a null period and score 0 — they fall to the back of the queue
rather than being refetched on a guess (tune with ``default_period_s``).

Input is exactly what the engine already has: the CDX index
(sources/warc.py::build_cdx — url, warc_ts, payload_digest) or the lake
table's change feed. No reference-repo counterpart (the reference crawls
on a fixed cadence, src/configs/*.toml politeness only); this is the
round-3 web-scale extension of that fetch planning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def capture_change_flags(
    captures: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    digest: str = "payload_digest",
) -> DataFrame:
    """Per capture: did the payload change vs the PREVIOUS capture of the
    same url? First capture counts as unchanged (it created the page; it
    tells us nothing about change *rate*). Ties on ts break by digest so
    the flag is deterministic under duplicate timestamps."""
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(digest))
    prev = F.lag(F.col(digest)).over(w)
    return captures.withColumn(
        "changed",
        F.when(prev.isNull(), F.lit(False)).otherwise(prev != F.col(digest)),
    )


def recrawl_stats(
    captures: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    digest: str = "payload_digest",
) -> DataFrame:
    """Per-url change-rate estimate + due score (see module docstring).

    Columns: key, n_captures, n_changes, first_ts, last_ts, span_s,
    change_period_s (null until a change was ever observed), staleness_s
    (vs the corpus high-water capture time), due_score (expected missed
    changes; 0.0 when no change was ever observed)."""
    flagged = capture_change_flags(captures, key, ts, digest)
    per_key = flagged.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum(F.col("changed").cast("long")).alias("n_changes"),
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
    )
    hw = per_key.agg(F.max("last_ts").alias("__hw"))
    span = F.unix_micros(F.col("last_ts")) - F.unix_micros(F.col("first_ts"))
    # span > 0: captures landing within one timestamp tick (WARC dates are
    # second-resolution) with differing digests would otherwise yield
    # period 0 -> due_score NULL->0 FOREVER, and apply_default_period skips
    # non-null periods -- the page becomes permanently unschedulable. A
    # zero span carries no rate information; leave the period unknown.
    period = F.when(
        (F.col("n_changes") > 0) & (span > 0),
        (span / F.lit(1_000_000) / F.col("n_changes")),
    )
    staleness = (
        F.unix_micros(F.col("__hw")) - F.unix_micros(F.col("last_ts"))
    ) / F.lit(1_000_000)
    return (
        per_key.crossJoin(F.broadcast(hw))
        .withColumn("span_s", (span / F.lit(1_000_000)).cast("double"))
        .withColumn("change_period_s", period.cast("double"))
        .withColumn("staleness_s", staleness.cast("double"))
        .withColumn(
            "due_score",
            F.coalesce(
                staleness / F.col("change_period_s"), F.lit(0.0)
            ).cast("double"),
        )
        .drop("__hw")
    )


def apply_default_period(stats: DataFrame, default_period_s: float) -> DataFrame:
    """Cold-page rotation: pages with no observed change score against a
    synthetic change period instead of 0, so they re-fetch on policy. One
    shared implementation for :func:`recrawl_schedule` and
    jobs/crawl_plan_job.py."""
    return stats.withColumn(
        "due_score",
        F.when(
            F.col("change_period_s").isNull(),
            F.col("staleness_s") / F.lit(float(default_period_s)),
        ).otherwise(F.col("due_score")),
    )


def recrawl_schedule(
    captures: DataFrame,
    budget: int,
    key: str = "url",
    ts: str = "warc_ts",
    digest: str = "payload_digest",
    default_period_s: float | None = None,
) -> DataFrame:
    """Top-``budget`` urls to fetch next, most-overdue first.

    ``default_period_s`` assigns never-observed-changing pages a synthetic
    change period so cold pages still rotate through the crawl budget
    (otherwise they never re-fetch on their own evidence). The sort is a
    TakeOrderedAndProject at the limit — no global sort materializes."""
    stats = recrawl_stats(captures, key, ts, digest)
    if default_period_s is not None:
        stats = apply_default_period(stats, default_period_s)
    return stats.orderBy(F.col("due_score").desc(), F.col(key)).limit(budget)


def attach_validators(
    stats: DataFrame,
    cdx: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
) -> DataFrame:
    """Join each url's LATEST capture's HTTP validators (ETag /
    Last-Modified, captured by the WARC parser) onto its recrawl stats, so
    the fetch layer can issue conditional GETs (If-None-Match /
    If-Modified-Since) — a 304 costs headers, not the payload. One
    ``max_by`` hash aggregation over the CDX (map-side combinable), one
    key equi-join; columns are null when the server never sent them.

    A CDX may carry only one of the two validator columns (the contract
    makes both optional) — the missing one comes back as all-null rather
    than failing the plan with UNRESOLVED_COLUMN."""
    sources = {"etag": "http_etag", "last_modified": "http_last_modified"}
    aggs = [
        F.max_by(src, F.col(ts)).alias(dst)
        for dst, src in sources.items()
        if src in cdx.columns
    ]
    if not aggs:
        raise ValueError(
            "cdx has neither http_etag nor http_last_modified; "
            "nothing to attach"
        )
    latest = cdx.groupBy(key).agg(*aggs)
    for dst, src in sources.items():
        if src not in cdx.columns:
            latest = latest.withColumn(dst, F.lit(None).cast("string"))
    return stats.join(latest, key, "left")


def schedule_fetches(
    plan: DataFrame,
    default_delay_s: float = 1.0,
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    priority_col: str = "priority",
    key: str = "url",
) -> DataFrame:
    """Politeness scheduling: turn a crawl plan into per-host fetch queues.

    Within each host, urls are slotted in priority order and offset by the
    host's crawl-delay (robots.txt Crawl-delay when present, else
    ``default_delay_s``) — ``scheduled_offset_s`` is when the fetch may
    start relative to the round's t0. Across hosts everything runs in
    parallel (offsets restart per host). The frame is repartitioned by
    host so ONE task owns a host's queue — politeness enforcement is then
    task-local (no cross-executor coordination), which is the only layout
    that holds at 10^5 hosts × 10^3 executors. One keyed window, one
    shuffle."""
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc_nulls_last(), F.col(key)
    )
    delay = (
        F.coalesce(F.col(delay_col).cast("double"), F.lit(float(default_delay_s)))
        if delay_col in plan.columns
        else F.lit(float(default_delay_s))
    )
    slotted = plan.withColumn("fetch_slot", F.row_number().over(w) - 1).withColumn(
        "scheduled_offset_s", F.col("fetch_slot") * delay
    )
    return slotted.repartition(F.col(host_col)).sortWithinPartitions(
        host_col, "fetch_slot"
    )


def cap_per_host(
    plan: DataFrame,
    max_per_host: int,
    host_col: str = "host",
    priority_col: str = "priority",
    key: str = "url",
    asserted_col: str | None = None,
) -> DataFrame:
    """Fairness cap: at most ``max_per_host`` urls per host, keeping each
    host's highest-priority pages. Without it one mega-host's backlog can
    consume the whole global budget (the crawl-scheduling equivalent of
    key skew). One keyed window — same shuffle the politeness slotting
    already pays.

    ``asserted_col``: boolean column (e.g. ``server_modified``) ranked
    ABOVE priority — server-asserted/discovery urls often carry null or
    low statistical priority, and the cap must keep what the final plan
    sort would have put first, not cut it."""
    order = [F.col(priority_col).desc_nulls_last(), F.col(key)]
    if asserted_col is not None:
        order.insert(0, F.col(asserted_col).desc_nulls_last())
    w = Window.partitionBy(host_col).orderBy(*order)
    return (
        plan.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_per_host)
        .drop("__rn")
    )
