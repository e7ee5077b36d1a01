"""KMV (k-minimum-values) theta sketches: mergeable distinct-count state
with SET ALGEBRA — union, intersection, difference, containment (X110/X111).

The HLL register tables (operators/hll.py, X105) fold distinct-count
state across epochs, but HLL unions only: it cannot answer "how many
urls do corpus A and corpus B SHARE", and at 10^10 keys the exact
answer is a full shuffle of both corpora. The KMV/theta sketch (Bar-
Yossef et al. 2002; Beyer et al. 2007 "Distinct-value synopses") keeps
the k smallest hash values per group; because the k-th smallest of a
uniform hash is an order statistic of the distinct-key population,
(k-1)/theta estimates the distinct count, and — the property HLL lacks
— the sketch of A ∪ B is computable from the sketches alone (the k
smallest of the merged value sets), after which membership of the
union's survivors in both sides estimates the INTERSECTION:

    est(|A ∪ B|) = (k-1)/theta_U
    est(|A ∩ B|) = (m/k) · est(|A ∪ B|),  m = |S_U ∩ S_A ∩ S_B|
    est(|A \\ B|) = est(|A ∪ B|) - est(|B|)
    containment(A in B) = est(∩)/est(|A|)

Kept in the engine's uniform mergeable-summary shape — a plain
DataFrame ``(group..., pos int, hv string)`` with one row per surviving
hash, ``pos`` the 1-based rank — so it stores/merges exactly like the
Bloom (membership), CMS (frequency), and HLL (cardinality-union) state
tables:

- built with one distinct + one per-group window top-k (hash values are
  md5 hex: fixed-width, so lexicographic order IS numeric order);
- merged across epochs by the same union → distinct → re-rank law,
  loss-free: merge(KMV(A), KMV(B)) == KMV(A ∪ B) exactly;
- groups with fewer than k distinct keys are stored whole, so the
  estimator is EXACT below k (no small-range bias regime at all).

The sketch table and the pairwise overlap matrix are integer/string
deterministic (seeded md5) and oracle-checked in DuckDB; the float
estimates are plain arithmetic on the k-th hash, identical in both
engines, and additionally pinned by accuracy tests against exact
distinct counts (relative error ~1/sqrt(k-2)).

The overlap matrix (`kmv_overlap`) is the corpus-diagnostics payoff:
pairwise union/intersection/Jaccard/containment between N labeled
corpora from their sketches alone — P pairs × 2k rows of work, never a
shuffle of the corpora themselves. "Your new crawl is 83% contained in
last month's corpus" is one sketch probe, not a 10^10-row join.

Reference: no counterpart (the Rust pipeline has no set-overlap
analysis).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = [
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate",
    "kmv_overlap",
    "sql_kmv_sketch",
    "sql_kmv_overlap",
]

# 15 hex chars = 60 bits: exact in a signed 64-bit long and in a double's
# 53-bit... (60 > 53: the division below rounds, but IDENTICALLY in both
# engines — IEEE754 nearest-even — so the twin stays hash-equal.)
_FRAC_HEX = 15
_FRAC_DEN = float(16**_FRAC_HEX)


def _check(k: int) -> None:
    if not 16 <= k <= 65536:
        raise ValueError("need 16 <= k <= 65536")


def _hv(key_col: str, seed: str) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))


def _frac(hv: Column) -> Column:
    """hv -> (0, 1] uniform fraction from its first 60 bits."""
    return F.conv(F.substring(hv, 1, _FRAC_HEX), 16, 10).cast("double") / F.lit(
        _FRAC_DEN
    )


def _rank_topk(df: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    if not group_cols:
        # Ungrouped: a partitionBy(lit(1)) window would funnel EVERY
        # distinct hash of the corpus through one task. orderBy+limit is
        # TakeOrderedAndProject — per-partition top-k, driver merge of
        # P·k rows — and the subsequent rank window sees only k rows.
        df = df.orderBy("hv").limit(k)
        w = Window.partitionBy(F.lit(1)).orderBy("hv")
        return df.withColumn("pos", F.row_number().over(w).cast("int"))
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        df.withColumn("pos", F.row_number().over(w).cast("int"))
        .where(F.col("pos") <= k)
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """``(group..., pos, hv)``: the k smallest distinct md5 values of
    ``key_col`` per group. NULL keys are excluded (a NULL url is a
    quarantine case upstream, not a distinct value). One distinct hash
    agg + one bounded per-group window."""
    _check(k)
    gcols = list(group_cols or [])
    base = (
        df.where(F.col(key_col).isNotNull())
        .select(*gcols, _hv(key_col, seed).alias("hv"))
        .distinct()
    )
    return _rank_topk(base, gcols, k).select(*gcols, "pos", "hv")


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union → distinct → re-rank: the KMV merge law. Sketches must share
    (k, seed); the result is exactly the sketch of the merged key sets,
    so per-epoch sketches fold into a corpus sketch loss-free."""
    _check(k)
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gcols = [c for c in out.columns if c not in ("pos", "hv")]
    return _rank_topk(out.select(*gcols, "hv").distinct(), gcols, k).select(
        *gcols, "pos", "hv"
    )


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Per-group distinct-count estimate: EXACT row count below k (the
    whole key set was kept), else (k-1)/theta with theta the k-th
    smallest hash as a fraction. One hash agg over ≤k rows per group."""
    _check(k)
    gcols = [c for c in sketch.columns if c not in ("pos", "hv")]
    agg = sketch.groupBy(*gcols).agg(
        F.count("*").alias("_n"), F.max("hv").alias("_kth")
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / _frac(F.col("_kth"))
    )
    return agg.select(*gcols, F.round(est, 4).alias("distinct_est"))


def kmv_overlap(
    sketch: DataFrame,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set algebra between every two groups of one sketch table:
    ``(group_a, group_b, union_est, intersect_est, jaccard,
    containment_a_in_b, containment_b_in_a)`` for group_a < group_b.

    For each pair the union sketch is re-derived from the two member
    sketches (k smallest of the value union — the merge law), theta_U
    read off its k-th value, and m counted as the union survivors
    present in BOTH sides. All work is P pairs × ≤2k rows; the corpora
    themselves are never touched. Estimates are exact whenever the
    union kept fewer than k values."""
    _check(k)
    s = sketch.select(F.col(group_col).alias("g"), "hv")
    pairs = (
        s.select("g").distinct().alias("ga")
        .join(s.select("g").distinct().alias("gb"), F.col("ga.g") < F.col("gb.g"))
        .select(F.col("ga.g").alias("group_a"), F.col("gb.g").alias("group_b"))
    )
    # Tag each sketch row into every pair its group belongs to, then fold
    # per (pair, hv): in_a/in_b membership of the hash in each side.
    a_rows = pairs.join(s, F.col("group_a") == F.col("g")).select(
        "group_a", "group_b", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    b_rows = pairs.join(s, F.col("group_b") == F.col("g")).select(
        "group_a", "group_b", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        a_rows.unionByName(b_rows)
        .groupBy("group_a", "group_b", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("hv")
    union_topk = merged.withColumn("pos", F.row_number().over(w)).where(
        F.col("pos") <= k
    )
    stats = union_topk.groupBy("group_a", "group_b").agg(
        F.count("*").alias("_n"),
        F.max("hv").alias("_kth"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("_m"),
    )
    # Per-group sizes for containment denominators (exact below k).
    sizes = kmv_estimate(sketch.select(F.col(group_col).alias("g"), "pos", "hv"), k)
    union_est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / _frac(F.col("_kth"))
    )
    inter_est = F.when(F.col("_n") < k, F.col("_m").cast("double")).otherwise(
        (F.col("_m").cast("double") / F.lit(float(k))) * union_est
    )
    out = (
        stats.withColumn("union_est", union_est)
        .withColumn("intersect_est", inter_est)
        .join(
            sizes.select(
                F.col("g").alias("group_a"),
                F.col("distinct_est").alias("_size_a"),
            ),
            "group_a",
        )
        .join(
            sizes.select(
                F.col("g").alias("group_b"),
                F.col("distinct_est").alias("_size_b"),
            ),
            "group_b",
        )
    )
    return out.select(
        "group_a",
        "group_b",
        F.round("union_est", 4).alias("union_est"),
        F.round("intersect_est", 4).alias("intersect_est"),
        F.round(F.col("intersect_est") / F.col("union_est"), 6).alias("jaccard"),
        F.round(F.col("intersect_est") / F.col("_size_a"), 6).alias(
            "containment_a_in_b"
        ),
        F.round(F.col("intersect_est") / F.col("_size_b"), 6).alias(
            "containment_b_in_a"
        ),
    )


# --- DuckDB twins (same md5, same rank, same arithmetic) ---


def sql_kmv_sketch(
    input_rel: str,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    seed: str = "kmv",
) -> str:
    gcols = list(group_cols or [])
    gsel = ", ".join(gcols) + ", " if gcols else ""
    part = f"PARTITION BY {', '.join(gcols)} " if gcols else ""
    return f"""
WITH kmv_vals AS (
  SELECT DISTINCT {gsel}md5('{seed}:' || CAST({key_col} AS VARCHAR)) AS hv
  FROM {input_rel} WHERE {key_col} IS NOT NULL
), kmv_ranked AS (
  SELECT {gsel}CAST(row_number() OVER ({part}ORDER BY hv) AS INTEGER) AS pos, hv
  FROM kmv_vals
)
SELECT {gsel}pos, hv FROM kmv_ranked WHERE pos <= {k}
"""


def sql_kmv_overlap(
    input_rel: str,
    key_col: str,
    group_col: str,
    k: int = 256,
    seed: str = "kmv",
) -> str:
    """Twin of kmv_sketch → kmv_overlap in one statement. The fraction
    denominator 16^15 and the <k exact regimes mirror the Spark path
    bit-for-bit (same IEEE754 double ops)."""
    frac = (
        f"(('0x' || substring(_KTH_, 1, {_FRAC_HEX}))::BIGINT"
        f" / CAST({_FRAC_DEN!r} AS DOUBLE))"
    )

    def est(n: str, kth: str) -> str:
        return (
            f"CASE WHEN {n} < {k} THEN CAST({n} AS DOUBLE) "
            f"ELSE CAST({k - 1} AS DOUBLE) / {frac.replace('_KTH_', kth)} END"
        )

    return f"""
WITH sk AS ({sql_kmv_sketch(input_rel, key_col, [group_col], k, seed)}),
sizes AS (
  SELECT {group_col} AS g,
         round({est("count(*)", "max(hv)")}, 4) AS size_est
  FROM sk GROUP BY {group_col}
),
pairs AS (
  SELECT a.g AS group_a, b.g AS group_b
  FROM (SELECT DISTINCT {group_col} AS g FROM sk) a
  JOIN (SELECT DISTINCT {group_col} AS g FROM sk) b ON a.g < b.g
),
tagged AS (
  SELECT p.group_a, p.group_b, s.hv,
         max(CASE WHEN s.{group_col} = p.group_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.{group_col} = p.group_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s
    ON s.{group_col} = p.group_a OR s.{group_col} = p.group_b
  GROUP BY p.group_a, p.group_b, s.hv
),
union_topk AS (
  SELECT *, row_number() OVER (PARTITION BY group_a, group_b ORDER BY hv) AS pos
  FROM tagged
),
stats AS (
  SELECT group_a, group_b, count(*) AS _n, max(hv) AS _kth,
         sum(in_a * in_b) AS _m
  FROM union_topk WHERE pos <= {k}
  GROUP BY group_a, group_b
),
ests AS (
  SELECT group_a, group_b,
         {est("_n", "_kth")} AS union_est,
         CASE WHEN _n < {k} THEN CAST(_m AS DOUBLE)
              ELSE (CAST(_m AS DOUBLE) / {float(k)!r}) * ({est("_n", "_kth")})
         END AS intersect_est
  FROM stats
)
SELECT e.group_a, e.group_b,
       round(e.union_est, 4) AS union_est,
       round(e.intersect_est, 4) AS intersect_est,
       round(e.intersect_est / e.union_est, 6) AS jaccard,
       round(e.intersect_est / sa.size_est, 6) AS containment_a_in_b,
       round(e.intersect_est / sb.size_est, 6) AS containment_b_in_a
FROM ests e
JOIN sizes sa ON sa.g = e.group_a
JOIN sizes sb ON sb.g = e.group_b
"""
