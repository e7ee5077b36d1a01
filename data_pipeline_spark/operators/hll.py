"""HyperLogLog register tables: mergeable distinct-count state (X105).

``approx_count_distinct`` answers "how many distinct keys in THIS
query"; a CDC tail needs distinct-count STATE that folds across epochs —
unique urls per domain over the corpus lifetime, unique users per day
over a month of closed days — without re-scanning history. HLL (Flajolet
et al. 2007) is the standard answer, and like the Bloom registry
(membership, operators/bloomdedup.py) and the Count-Min sketch
(frequency, operators/cms.py) it is kept here as a plain DataFrame so
the engine's mergeable-summary discipline stays uniform:

``(group..., idx int, rho int)`` — one row per NON-ZERO register, where
``idx`` is the register index (first 8 md5 hex chars mod 2^p) and
``rho`` the position of the leading 1-bit in a DISJOINT 60-bit md5 slice
(hex chars 9-23 — slice disjointness gives the independence the
estimator needs without bit-twiddling):

- built with one map-side-combinable ``max`` hash agg;
- merged across epochs with the SAME agg (union → max) — the HLL merge
  law, loss-free: merge(HLL(A), HLL(B)) == HLL(A ∪ B) exactly;
- sparse: unset registers are absent (they read as rho 0 at estimate
  time), so small groups cost rows proportional to their cardinality,
  not 2^p.

The ESTIMATE (`hll_estimate`) applies the classic bias-corrected
harmonic mean with the linear-counting small-range regime. The register
table is integer-exact and oracle-checked in DuckDB (`bin()`-based rho
is portable, verified both engines return minimal binary strings); the
float estimate is pinned by accuracy tests against exact distinct counts
(standard error ~1.04/sqrt(2^p)).

Leading-bit math: v = 60-bit slice; rho = 61 - length(bin(v)) for v>0,
61 when v == 0 (all sixty bits zero).

Reference: no counterpart (the Rust pipeline has no cardinality
analysis).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["hll_registers", "hll_merge", "hll_estimate", "sql_hll_registers"]


def _check(p: int) -> None:
    if not 4 <= p <= 16:
        raise ValueError("need 4 <= p <= 16 (16..65536 registers)")


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 9,
    seed: str = "hll",
) -> DataFrame:
    """Sparse HLL register table of a key column, optionally per group:
    ``(group..., idx, rho)``, max-aggregated. NULL keys are excluded."""
    _check(p)
    groups = list(group_cols or [])
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    idx = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % (1 << p)).cast(
        "int"
    )
    v = F.conv(F.substring(h, 9, 15), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(61))
        .otherwise(F.lit(61) - F.length(F.bin(v)))
        .cast("int")
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(*groups, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*groups, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*regs: DataFrame) -> DataFrame:
    """Pointwise max of register tables built with the same (p, seed,
    groups) — the loss-free HLL union law."""
    if not regs:
        raise ValueError("need at least one register table")
    out = regs[0]
    for r in regs[1:]:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    regs: DataFrame, p: int = 9, group_cols: list[str] | None = None
) -> DataFrame:
    """Bias-corrected cardinality estimate per group from a register
    table: harmonic-mean regime with linear counting below 2.5m (the
    original HLL regime switch). Absent registers enter as 2^0 = 1 in
    the harmonic sum and as zero-registers in linear counting — handled
    arithmetically from the non-zero rows, so the sparse table never
    densifies. Output: ``(group..., est double)``."""
    _check(p)
    m = 1 << p
    if m <= 64:
        alpha = 0.673 if m == 16 else (0.697 if m == 32 else 0.709)
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    groups = list(group_cols or [])
    agg = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_inv_nz"),
    )
    # full harmonic sum = sum over set registers + 1.0 per absent register
    inv = F.col("_inv_nz") + (F.lit(m) - F.col("_nz"))
    raw = F.lit(alpha * m * m) / inv
    zeros = F.lit(m) - F.col("_nz")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*groups, est.alias("est"))


def sql_hll_registers(
    rel: str,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 9,
    seed: str = "hll",
) -> str:
    """DuckDB twin of :func:`hll_registers` (both engines' ``bin()``
    return minimal binary strings — verified)."""
    _check(p)
    groups = list(group_cols or [])
    gsel = "".join(f"{g}, " for g in groups)
    gby = "".join(f", {g}" for g in groups)
    h = f"md5('{seed}:' || CAST({key_col} AS VARCHAR))"
    idx = f"CAST(('0x' || substring({h}, 1, 8))::BIGINT % {1 << p} AS INTEGER)"
    v = f"('0x' || substring({h}, 9, 15))::BIGINT"
    rho = f"CAST(CASE WHEN {v} = 0 THEN 61 ELSE 61 - length(bin({v})) END AS INTEGER)"
    return f"""
SELECT {gsel}idx, CAST(max(rho) AS INTEGER) AS rho FROM (
  SELECT {gsel}{idx} AS idx, {rho} AS rho
  FROM {rel} WHERE {key_col} IS NOT NULL
) GROUP BY idx{gby}
"""
