"""Exact phi-heavy hitters via a bounded-memory two-pass plan (X99).

Find every key whose frequency is >= phi * N, EXACTLY, without ever
materializing the full (key, count) relation through a shuffle. At
10^10-change-event scale the natural key (url / user / domain) has
cardinality of the same order as the row count, so the naive
`groupBy(key).count().where(cnt >= phi*N)` shuffles ~N rows to throw
almost all of them away. The classic fix (Misra-Gries '82; mergeable
summaries, Agarwal et al. PODS'12):

- pass 1 — per-partition Misra-Gries summaries with k = ceil(1/phi)
  counters, run inside Arrow-batched ``mapInPandas`` (each batch is
  counted vectorized with ``value_counts``, then merged into the running
  summary by the pointwise-add / subtract-(k+1)th-largest rule, which
  preserves the MG undercount bound <= n_p/(k+1)). Any key with global
  share >= phi has, by pigeonhole, local share >= phi in at least one
  partition, and phi > 1/(k+1) keeps it alive there — so the union of
  partition summaries is a SUPERSET of the true heavy hitters, of size
  <= partitions * k, with ZERO shuffle. The same pass emits each
  partition's row count, so N costs no extra scan.
- pass 2 — the candidate keys (a tiny DataFrame, never collected to the
  driver) are broadcast-semi-joined against the input; only candidate
  rows are counted exactly (a hash agg over a vanishing fraction of N),
  and the exact threshold ceil(phi * N) drops pass-1 false positives.

The output is therefore EXACT — equal to the full-shuffle answer row for
row — which is what makes it oracle-checkable against plain SQL; the
sketch only bounds the memory/shuffle of getting there.

Rows with a NULL key are excluded (documented; a NULL url is a
quarantine case upstream, not a frequency class).

Reference: no counterpart (the Rust pipeline has no frequency analysis;
closest is its per-category batching, /root/reference/src/main.rs:243).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["heavy_hitters"]


def _mg_merge(counters: dict, batch: dict, k: int) -> dict:
    """Mergeable-summaries MG merge: pointwise add, then subtract the
    (k+1)-th largest value and drop non-positive counters."""
    for key, c in batch.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) <= k:
        return counters
    cut = sorted(counters.values(), reverse=True)[k]
    return {key: c - cut for key, c in counters.items() if c > cut}


def heavy_hitters(df: DataFrame, key_col: str, phi: float) -> DataFrame:
    """All keys with count >= ceil(phi * N), exactly.

    Output: (key_col, cnt, share) sorted by nothing (set semantics);
    share = round(cnt / N, 6). N counts non-NULL-key rows.
    """
    if not 0 < phi < 1:
        raise ValueError("need 0 < phi < 1")
    k = max(1, math.ceil(1.0 / phi))
    keyed = df.select(F.col(key_col).cast("string").alias("_k")).where(
        F.col("_k").isNotNull()
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        total = 0
        for pdf in batches:
            vc = pdf["_k"].value_counts()
            total += int(vc.sum())
            counters = _mg_merge(counters, vc.to_dict(), k)
        yield pd.DataFrame(
            {
                "_k": list(counters.keys()) + [None],
                "_ptotal": [0] * len(counters) + [total],
            }
        )

    summary = keyed.mapInPandas(summarize, "_k string, _ptotal long")
    # `summary` feeds two consumers (candidates + N); it is tiny
    # (<= partitions * (k+1) rows) but recomputing it means re-scanning
    # the full input — persist for the duration of the plan.
    summary = summary.persist()
    try:
        candidates = summary.where(F.col("_k").isNotNull()).select("_k").distinct()
        total = summary.groupBy().agg(
            F.sum("_ptotal").cast("double").alias("_n")
        )
        out = (
            keyed.join(F.broadcast(candidates), "_k")
            .groupBy("_k")
            .agg(F.count("*").cast("long").alias("cnt"))
            .crossJoin(F.broadcast(total))
            .where(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("_n")))
            .select(
                F.col("_k").alias(key_col),
                "cnt",
                F.round(F.col("cnt") / F.col("_n"), 6).alias("share"),
            )
        )
        # materialize before unpersist so the summary isn't recomputed
        out = out.localCheckpoint(eager=True)
    finally:
        summary.unpersist()
    return out


def sql_heavy_hitters(input_sql: str, key_col: str, phi: float) -> str:
    """DuckDB twin — the full-shuffle definition the two-pass plan must
    equal exactly."""
    return f"""
WITH hh_src AS (
  SELECT CAST({key_col} AS VARCHAR) AS k FROM ({input_sql})
  WHERE {key_col} IS NOT NULL
), hh_n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM hh_src
), hh_cnt AS (
  SELECT k, CAST(count(*) AS BIGINT) AS cnt FROM hh_src GROUP BY k
)
SELECT c.k AS {key_col}, c.cnt, round(c.cnt / t.n, 6) AS share
FROM hh_cnt c, hh_n t
WHERE c.cnt >= ceil({phi} * t.n)
"""
