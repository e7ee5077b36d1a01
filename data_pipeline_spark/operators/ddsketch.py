"""DDSketch-style mergeable quantile state (X107).

``events_value_quantiles`` answers "what are the percentiles of THIS
query's rows" (exact + GK); a CDC tail also needs quantile STATE that
folds across epochs — page-size / fetch-latency / price distributions
over the corpus lifetime — without rescanning history. DDSketch (Masson,
Lee & Rim, VLDB 2019) buckets values into geometric bins with a fixed
RELATIVE accuracy alpha: the bin of v > 0 is ceil(log_gamma(v)) with
gamma = (1+alpha)/(1-alpha), so any value in a bin differs from the bin
midpoint by at most alpha·v — a guarantee that survives merging, unlike
GK's rank-error bound.

Like its siblings (bloomdedup / cms / hll / sketchstate), the sketch IS
a DataFrame — ``(group..., sgn tinyint, bin int, cnt long)``, one row
per non-empty bucket, sign-split so negatives mirror positives and zero
gets its own bucket:

- built with one map-side-combinable hash agg;
- merged by union → sum (linearity);
- quantiles read by one cumulative-count window over ≤ a-few-hundred
  bucket rows per group, picking the bucket containing rank
  ceil(q·n) in true value order (sgn asc, sgn·bin asc);
- estimate = sgn · 2·gamma^bin/(gamma+1), the bin midpoint in relative
  terms — |est − x_(r)| ≤ alpha·|x_(r)| by construction.

The integer bucket table is engine-portable and oracle-checked in DuckDB
(same ceil(ln(v)/ln(gamma)) arithmetic; a float-boundary flip would need
the two engines' ``ln`` to straddle an exact bucket edge — measure-zero
for continuous data). The float estimate layer is pinned by the
relative-error law in tests.

Reference: no counterpart (the Rust pipeline prints stage timings only,
/root/reference/src/bin/test_memory_efficient_pipeline.rs:112-146).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["dd_histogram", "dd_merge", "dd_quantiles", "sql_dd_histogram"]


def _gamma(alpha: float) -> float:
    if not 0 < alpha < 1:
        raise ValueError("need 0 < alpha < 1")
    return (1.0 + alpha) / (1.0 - alpha)


def dd_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.01,
) -> DataFrame:
    """Sparse DDSketch bucket table ``(group..., sgn, bin, cnt)``. NULL
    and NaN values are excluded (a NaN latency is an upstream quarantine
    case, not a distribution member)."""
    g = _gamma(alpha)
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    sgn = (
        F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    ).cast("tinyint")
    bin_ = (
        F.when(v == 0, F.lit(0))
        .otherwise(F.ceil(F.log(F.abs(v)) / math.log(g)))
        .cast("int")
    )
    return (
        df.where(v.isNotNull() & ~F.isnan(v))
        .select(*groups, sgn.alias("sgn"), bin_.alias("bin"))
        .groupBy(*groups, "sgn", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_merge(*sketches: DataFrame) -> DataFrame:
    """Pointwise sum of bucket tables built with the same alpha —
    linearity: per-epoch sketches fold into a corpus sketch."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def dd_quantiles(
    sketch: DataFrame,
    qs: list[float],
    alpha: float = 0.01,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates per group: ``(group..., q, est)`` with
    |est − x_(ceil(q·n))| ≤ alpha·|x| guaranteed. One window cumsum over
    the bucket rows (hundreds per group, never the data)."""
    g = _gamma(alpha)
    if not qs or not all(0 < q <= 1 for q in qs):
        raise ValueError("need quantiles in (0, 1]")
    groups = list(group_cols or [])
    order = [F.col("sgn").asc(), (F.col("sgn") * F.col("bin")).asc()]
    w = (
        Window.partitionBy(*groups).orderBy(*order)
        if groups
        else Window.partitionBy(F.lit(1)).orderBy(*order)
    )
    wtot = Window.partitionBy(*groups) if groups else Window.partitionBy(F.lit(1))
    cum = sketch.select(
        *groups,
        "sgn",
        "bin",
        F.sum("cnt").over(w).alias("_cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("_prev"),
        F.sum("cnt").over(wtot).alias("_n"),
    )
    mid = (2.0 * F.pow(F.lit(g), F.col("bin"))) / (g + 1.0)
    est = F.round(F.col("sgn").cast("double") * mid, 6)
    out = None
    for q in qs:
        rank = F.greatest(F.ceil(F.lit(float(q)) * F.col("_n")), F.lit(1))
        hit = cum.where((F.col("_prev") < rank) & (rank <= F.col("_cum"))).select(
            *groups, F.lit(float(q)).alias("q"), est.alias("est")
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def sql_dd_histogram(
    rel: str,
    value_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.01,
) -> str:
    """DuckDB twin of :func:`dd_histogram`."""
    g = _gamma(alpha)
    groups = list(group_cols or [])
    gsel = "".join(f"{c}, " for c in groups)
    gby = "".join(f", {c}" for c in groups)
    v = f"CAST({value_col} AS DOUBLE)"
    sgn = f"CAST(CASE WHEN {v} > 0 THEN 1 WHEN {v} < 0 THEN -1 ELSE 0 END AS TINYINT)"
    bin_ = (
        f"CAST(CASE WHEN {v} = 0 THEN 0 "
        f"ELSE ceil(ln(abs({v})) / {math.log(g)!r}) END AS INTEGER)"
    )
    return f"""
SELECT {gsel}sgn, bin, CAST(count(*) AS BIGINT) AS cnt FROM (
  SELECT {gsel}{sgn} AS sgn, {bin_} AS bin
  FROM {rel} WHERE {value_col} IS NOT NULL AND NOT isnan({v})
) GROUP BY sgn, bin{gby}
"""
