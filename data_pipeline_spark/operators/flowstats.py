"""CDC stream observability: sequence-gap audit, redelivery detection,
churn / hot-key statistics, freshness report.

A 10^10-event tail is only trustworthy if the engine can PROVE it saw a
contiguous, once-each stream — and can point at the keys and partitions
that will melt a shuffle before they do. These operators are the audit
side of the ingest path: they consume the same typed change frame the
replay runner does and emit small per-partition / per-key reports.

Reference analog: the pipeline prints ad-hoc row counts after each run
(/root/reference/src/bin/test_full_pipeline.rs:61-96); the engine promotes
that to first-class relational audits with exact semantics.

Scale posture, per operator:

- :func:`sequence_audit` — the SCALE PATH. One map-side-combinable hash
  aggregation per stream partition: n_rows, distinct seqs, min/max, and
  the missing/duplicate counts derived from them. O(1) output per
  partition, no sort, no window — safe when a single stream partition
  holds billions of events.
- :func:`sequence_gap_intervals` — the DIAGNOSTIC twin: exact (from, to)
  gap spans via one keyed window (lag). A window partition sorts all of a
  stream partition's rows, so run it scoped (one partition / one epoch
  range) after :func:`sequence_audit` says *where* to look.
- :func:`redelivery_audit` — duplicate event identities (at-least-once
  redelivery made visible): one hash agg on the identity columns,
  keeping only count > 1 groups.
- :func:`hot_keys` — per-key change counts with share-of-total; the
  evidence that feeds the salted-write path (lake/table.py skew handling)
  and AQE skew-join expectations. Hash agg + global top-k
  (TakeOrderedAndProject — no full sort).
- :func:`freshness_report` — per-group max event time and staleness vs
  the stream's high-water mark; the high-water mark is a 1-row aggregate
  broadcast back, never a global window.
- :func:`disorder_report` / :func:`recommend_watermark` — event-time
  lateness distribution vs the arrival-order high-water mark (the
  quantity a Structured Streaming watermark must cover), and the
  watermark delay that covers its p99. One keyed window per STREAM
  partition (the ordering the tail already guarantees) + one hash agg.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sequence_audit(
    df: DataFrame,
    partition_cols: Sequence[str],
    seq_col: str,
) -> DataFrame:
    """Per-partition contiguity summary — one hash aggregation.

    For each stream partition: ``n_rows``, ``n_distinct`` (distinct seq
    values), ``min_seq``, ``max_seq``, ``n_missing`` (holes in
    [min_seq, max_seq]), ``n_duplicates`` (NON-NULL rows beyond first per
    seq), ``n_null_seq`` (rows with no sequence at all). A clean
    exactly-once, in-order feed has ``n_missing = n_duplicates =
    n_null_seq = 0``. NULL seqs are a producer bug, not a redelivery —
    they get their own column instead of inflating ``n_duplicates``
    (count_distinct ignores NULLs, so n_rows − n_distinct would count
    them as phantom duplicates); an all-NULL partition reports
    ``n_missing = 0``, not NULL, so ``= 0`` health checks cannot
    silently pass it. Dense-rank semantics assume the source assigns
    consecutive integers per partition (Debezium/binlog position within
    a partition).
    """
    partition_cols = list(partition_cols)
    s = F.col(seq_col).cast("long")
    return (
        df.groupBy(*partition_cols)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count(s).cast("long").alias("_n_nonnull"),
            F.count_distinct(s).cast("long").alias("n_distinct"),
            F.min(s).alias("min_seq"),
            F.max(s).alias("max_seq"),
        )
        .select(
            *partition_cols,
            "n_rows",
            "n_distinct",
            "min_seq",
            "max_seq",
            F.coalesce(
                F.col("max_seq") - F.col("min_seq") + 1 - F.col("n_distinct"),
                F.lit(0),
            )
            .cast("long")
            .alias("n_missing"),
            (F.col("_n_nonnull") - F.col("n_distinct"))
            .cast("long")
            .alias("n_duplicates"),
            (F.col("n_rows") - F.col("_n_nonnull"))
            .cast("long")
            .alias("n_null_seq"),
        )
    )


def sequence_gap_intervals(
    df: DataFrame,
    partition_cols: Sequence[str],
    seq_col: str,
) -> DataFrame:
    """Exact gap spans per partition: one row per hole, ``(gap_from,
    gap_to, n_missing)`` inclusive. Diagnostic path — one keyed window
    (sorts each partition's seqs); scope the input to the partitions /
    epoch ranges :func:`sequence_audit` flagged.
    """
    partition_cols = list(partition_cols)
    w = Window.partitionBy(*partition_cols).orderBy("_seq")
    return (
        df.select(*partition_cols, F.col(seq_col).cast("long").alias("_seq"))
        .withColumn("_prev", F.lag("_seq").over(w))
        .where(F.col("_prev").isNotNull() & (F.col("_seq") - F.col("_prev") > 1))
        .select(
            *partition_cols,
            (F.col("_prev") + 1).alias("gap_from"),
            (F.col("_seq") - 1).alias("gap_to"),
            (F.col("_seq") - F.col("_prev") - 1).alias("n_missing"),
        )
    )


def redelivery_audit(
    df: DataFrame,
    identity_cols: Sequence[str],
) -> DataFrame:
    """Event identities delivered more than once: ``identity_cols +
    (n_deliveries)``, count > 1 only. At-least-once transports redeliver;
    the merge path is idempotent to it (LWW + epoch ledger) — this
    operator *measures* it so an upstream regression is visible.
    """
    identity_cols = list(identity_cols)
    return (
        df.groupBy(*identity_cols)
        .agg(F.count("*").cast("long").alias("n_deliveries"))
        .where(F.col("n_deliveries") > 1)
    )


def hot_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 100,
) -> DataFrame:
    """Top-k keys by change count with their share of the whole stream —
    the skew evidence the salted bucketed write consumes.

    One hash agg (map-side combined: a hot key collapses per task before
    the shuffle), a 1-row total broadcast back, and an ordered-limit
    (TakeOrderedAndProject) — no global sort.
    """
    key_cols = list(key_cols)
    counts = df.groupBy(*key_cols).agg(F.count("*").cast("long").alias("n_changes"))
    total = df.groupBy().agg(F.count("*").cast("long").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_changes",
            F.round(F.col("n_changes") / F.col("_total"), 6).alias("share"),
        )
        .orderBy(F.col("n_changes").desc(), *[F.col(c) for c in key_cols])
        .limit(top_k)
    )


def freshness_report(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Per-group freshness vs the stream high-water mark: ``group_cols +
    (n_events, latest_ts, staleness_us, staleness_s)`` — how far each
    group's newest event lags ``max(ts)`` over the whole stream.
    ``staleness_us`` is the exact integer microsecond lag (hash-stable for
    oracles); ``staleness_s`` the float convenience view. The high-water
    mark is a 1-row aggregate joined by broadcast — never a global window.
    """
    group_cols = list(group_cols)
    per_group = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(ts_col).alias("latest_ts"),
    )
    hwm = df.groupBy().agg(F.max(ts_col).alias("_hwm"))
    # cast: parquet TIMESTAMP_NTZ → TIMESTAMP for unix_micros (asof._micros
    # convention)
    lag_us = F.unix_micros(F.col("_hwm").cast("timestamp")) - F.unix_micros(
        F.col("latest_ts").cast("timestamp")
    )
    return per_group.crossJoin(F.broadcast(hwm)).select(
        *group_cols,
        "n_events",
        "latest_ts",
        lag_us.cast("long").alias("staleness_us"),
        (lag_us / F.lit(1_000_000.0)).alias("staleness_s"),
    )


def disorder_report(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    ts_col: str,
) -> DataFrame:
    """Per-partition event-time disorder profile: how late events arrive
    relative to the event-time high-water mark ALREADY SEEN in arrival
    order — exactly the quantity a Structured Streaming watermark must
    cover. An event's lateness is ``max(ts over arrival order so far) -
    own ts`` (0 for in-order events).

    Output per stream partition: ``part_cols + (n_events, n_late,
    late_frac, max_late_us, p50_late_us, p95_late_us, p99_late_us)``.
    Percentiles are exact (``percentile``, linear interpolation — the
    same formula DuckDB's ``quantile_cont`` uses, so the oracle twin is
    value-exact, not approx-vs-approx).

    Scale posture: the running high-water mark is one keyed window per
    STREAM partition ordered by the wire sequence — the same per-partition
    ordering the tail protocol already guarantees, so the sort is cheap
    and bounded by partition, never global. The stats collapse in one
    map-side-combinable hash agg. Run it scoped to an epoch range on a
    10^10-event stream, like :func:`sequence_gap_intervals`.
    """
    part_cols = list(part_cols)
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hwm_us = F.unix_micros(F.max(ts_col).over(w).cast("timestamp"))
    late_us = (hwm_us - F.unix_micros(F.col(ts_col).cast("timestamp"))).cast(
        "long"
    )
    scored = df.select(*part_cols, late_us.alias("_late_us"))
    pct = F.percentile("_late_us", F.lit([0.5, 0.95, 0.99]))
    return scored.groupBy(*part_cols).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("_late_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.round(
            F.sum(F.when(F.col("_late_us") > 0, 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("late_frac"),
        F.max("_late_us").alias("max_late_us"),
        F.round(pct.getItem(0), 3).alias("p50_late_us"),
        F.round(pct.getItem(1), 3).alias("p95_late_us"),
        F.round(pct.getItem(2), 3).alias("p99_late_us"),
    )


def recommend_watermark(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    ts_col: str,
    percentile: float = 0.99,
    safety_factor: float = 1.5,
) -> tuple[int, str]:
    """Watermark delay covering ``percentile`` of observed lateness across
    the whole stream, padded by ``safety_factor`` and rounded up to whole
    seconds — ready for ``withWatermark(ts, f"{s} seconds")``.

    Driver-side result (two scalars): the aggregation collapses to one
    row before collect, so this is metadata-scale like the convergence
    checks elsewhere in the repo.
    """
    rep = disorder_report(df, part_cols, order_col, ts_col)
    # worst partition governs: the watermark is global but lateness is
    # generated per partition.
    p_col = {0.5: "p50_late_us", 0.95: "p95_late_us", 0.99: "p99_late_us"}
    if percentile not in p_col:
        raise ValueError(f"percentile must be one of {sorted(p_col)}")
    worst = rep.agg(F.max(p_col[percentile]).alias("m")).collect()[0]["m"]
    delay_us = int((worst or 0) * safety_factor)
    seconds = max(1, -(-delay_us // 1_000_000))  # ceil, floor 1s
    return delay_us, f"{seconds} seconds"


def burst_report(
    df: DataFrame,
    entity_cols: Sequence[str],
    ts_col: str,
    window: str = "1 hour",
    trailing: int = 24,
    z_threshold: float = 3.0,
    min_count: int = 10,
) -> DataFrame:
    """Per-entity burst detection over tumbling event-time windows: flag
    windows whose count is ``z_threshold`` sample-stddevs above the mean
    of the previous ``trailing`` windows (and at least ``min_count``) —
    the standard early-warning for crawl storms, hot-site churn, or a
    runaway producer, judged per entity so a steady-state-noisy entity
    does not mask a quiet one's spike.

    The per-entity window axis is DENSIFIED first (``sequence(min_ws,
    max_ws)`` → explode → left join, zero-filled), so quiet periods count
    as zeros in the baseline instead of silently collapsing — a sparse
    baseline of observed-only windows would inflate the mean exactly when
    bursts matter most. Baselines with fewer than 2 prior windows or zero
    variance yield a null z-score (never a burst).

    Scale posture: one windowed count (hash agg), one per-entity min/max
    agg, the spine explode (windows-per-entity rows — calendar-bounded,
    orders of magnitude below event count), one keyed equi-join, and ONE
    per-entity window pass for the trailing stats. No global sort, no
    self-join of the stream.
    """
    entity_cols = list(entity_cols)
    counts = (
        df.groupBy(
            *entity_cols, F.window(F.col(ts_col), window).alias("_w")
        )
        .agg(F.count("*").cast("long").alias("n"))
        .select(*entity_cols, F.col("_w.start").alias("window_start"), "n")
    )
    spine = (
        counts.groupBy(*entity_cols)
        .agg(
            F.min("window_start").alias("_lo"),
            F.max("window_start").alias("_hi"),
        )
        .select(
            *entity_cols,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {window}"))
            ).alias("window_start"),
        )
    )
    dense = spine.join(counts, entity_cols + ["window_start"], "left").select(
        *entity_cols,
        "window_start",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy("window_start")
        .rowsBetween(-trailing, -1)
    )
    mean_prev = F.avg("n").over(w)
    std_prev = F.stddev_samp("n").over(w)
    z = F.when(
        std_prev > 0, (F.col("n") - mean_prev) / std_prev
    )  # <2 baseline rows or zero variance → null z, never a burst
    return dense.select(
        *entity_cols,
        "window_start",
        "n",
        F.round(mean_prev, 4).alias("baseline_mean"),
        F.round(std_prev, 4).alias("baseline_std"),
        F.round(z, 4).alias("zscore"),
        (
            F.coalesce(z >= F.lit(float(z_threshold)), F.lit(False))
            & (F.col("n") >= F.lit(int(min_count)))
        ).alias("is_burst"),
    )
