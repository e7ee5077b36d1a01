"""Count-Min sketch: mergeable per-epoch frequency state (X104).

The exact heavy-hitter plan (:mod:`.heavyhitters`) answers "which keys
are frequent"; a CDC tail also needs "how frequent is THIS key" for keys
that are not heavy — per-domain request budgeting, skew-salt sizing,
recrawl prioritization — at 10^10 events, where an exact (key, count)
relation is a shuffle of ~N rows of state. A Count-Min sketch (Cormode &
Muthukrishnan 2005) bounds that state at depth × width counters with a
ONE-SIDED error law (estimate ≥ true count, overshoot ≤ εN with
probability 1-δ), and is a linear sketch: per-epoch sketches merge by
pointwise addition, so a corpus-lifetime frequency table folds epoch by
epoch in O(depth·width) — the same mergeable-summary discipline as the
Bloom registry (operators/bloomdedup.py) and the state certificate
(lake/statecert.py).

Representation — the sketch IS a DataFrame ``(d int, w_idx long, cnt
long)``, one row per NON-ZERO counter:

- built with one explode (depth rows per input row) + one map-side-
  combinable hash agg — no driver state, no UDAF, no per-row Python;
- merged with the SAME agg (union → sum) — linearity;
- sparse: zero counters are never stored, so a generous width costs
  nothing while the epoch is small;
- point estimates are a broadcast equi-join of the queried keys' (d,
  w_idx) probes against the sketch, min over depth — absent counters
  read as 0 (exactly the CMS zero), so estimates of never-seen keys
  are 0, not an error.

Hashing: row ``i``'s position is the first 8 md5 hex chars of
``seed:i:key`` mod width — the repo's engine-portable convention
(operators/sampling.py), so every sketch is oracle-checkable in DuckDB.

``weight_col`` generalizes counts to any non-negative additive weight
(bytes per domain, tokens per source); the one-sided law holds for
non-negative weights.

Reference: no counterpart (closest is the Rust pipeline's per-category
batch sizing, /root/reference/src/main.rs:243 — a static tier table, not
a measured frequency state).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["cms_build", "cms_merge", "cms_estimate", "sql_cms_estimate"]


def _pos(key_col: str, i: int, width: int, seed: str) -> Column:
    h = F.md5(F.concat(F.lit(f"{seed}:{i}:"), F.col(key_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def _check(depth: int, width: int) -> None:
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 16,
    seed: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Sparse Count-Min sketch of a key column: ``(d, w_idx, cnt)``,
    non-zero counters only. One explode + one sum hash agg. NULL keys are
    excluded (a NULL url is a quarantine case upstream, not a frequency
    class); NULL/negative weights are excluded with them."""
    _check(depth, width)
    w = (
        F.lit(1).cast("long")
        if weight_col is None
        else F.col(weight_col).cast("long")
    )
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("d"),
                    _pos(key_col, i, width, seed).alias("w_idx"),
                )
                for i in range(depth)
            ]
        )
    ).alias("_p")
    base = df.where(F.col(key_col).isNotNull())
    if weight_col is not None:
        base = base.where(F.col(weight_col).isNotNull() & (w >= 0))
    return (
        base.select(probes, w.alias("_w"))
        .select("_p.d", "_p.w_idx", "_w")
        .groupBy("d", "w_idx")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Pointwise sum of sketches built with the same (depth, width,
    seed) — CMS linearity: per-epoch sketches fold into a corpus
    sketch."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "w_idx").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 16,
    seed: str = "cms",
) -> DataFrame:
    """Point estimates for each distinct key in ``keys``: min over depth
    of the matched counters, absent counters reading 0. The sketch side
    is broadcast (≤ depth×width rows by construction); the keys side
    never shuffles beyond its own distinct."""
    _check(depth, width)
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("d"),
                    _pos(key_col, i, width, seed).alias("w_idx"),
                )
                for i in range(depth)
            ]
        )
    ).alias("_p")
    q = (
        keys.where(F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
        .select(key_col, probes)
        .select(key_col, "_p.d", "_p.w_idx")
    )
    return (
        q.join(F.broadcast(sketch), ["d", "w_idx"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
    )


def sql_cms_estimate(
    input_rel: str,
    keys_rel: str,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 16,
    seed: str = "cms",
    weight_expr: str = "1",
) -> str:
    """DuckDB twin: build the sketch over ``input_rel`` and estimate each
    distinct key of ``keys_rel`` — same md5 positions, same min-over-depth."""

    def pos(i: int) -> str:
        return (
            f"('0x' || substring(md5('{seed}:{i}:' || "
            f"CAST({key_col} AS VARCHAR)), 1, 8))::BIGINT % {width}"
        )

    build_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS d, {pos(i)} AS w_idx, CAST({weight_expr} AS BIGINT) AS _w "
        f"FROM {input_rel} WHERE {key_col} IS NOT NULL"
        for i in range(depth)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT {key_col}, {i} AS d, {pos(i)} AS w_idx FROM cms_keys"
        for i in range(depth)
    )
    return f"""
WITH cms_sketch AS (
  SELECT d, w_idx, CAST(sum(_w) AS BIGINT) AS cnt FROM ({build_rows})
  GROUP BY d, w_idx
), cms_keys AS (
  SELECT DISTINCT {key_col} FROM {keys_rel} WHERE {key_col} IS NOT NULL
), cms_probes AS ({probe_rows})
SELECT p.{key_col}, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
FROM cms_probes p LEFT JOIN cms_sketch s ON p.d = s.d AND p.w_idx = s.w_idx
GROUP BY p.{key_col}
"""
