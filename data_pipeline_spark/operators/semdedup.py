"""SemDeDup — semantic deduplication via embedding clusters.

The method of Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540): cluster the
corpus embeddings with k-means, then look for near-duplicate PAIRS only
WITHIN each cluster (cosine >= threshold), and keep exactly one
representative per duplicate relation — the paper's final policy keeps the
example with the LOWEST cosine similarity to its cluster centroid (the
most "atypical" copy preserves diversity), dropping the rest.

Why this scales where naive embedding dedup cannot: the pair search is an
equi-join on ``cluster_id``, so the candidate count is sum(|cluster|^2)
instead of n^2 — exactly the IVF-list trick, and exactly how the paper ran
it on LAION/ C4. On a 10^10-document corpus the clusters are the
partitioning: persist the assigned table bucketed by ``cluster_id`` and
the dedup pass is an embarrassingly parallel per-cluster job with no
global shuffle beyond the one keyed assignment.

Determinism / oracle story (same trick as operators/similarity.ivf_*):
the coarse quantizer is the seeded ``fixed_centroids`` table, so the SAME
float64 literals drive the Spark plan and the DuckDB twin
(:func:`sql_semdedup`), making the whole pipeline — assignment, in-cluster
pair scoring, keep/drop verdicts — hash-checkable cross-engine. A learned
KMeans quantizer drops in via ``quantizer="kmeans"`` for quality (recall
pinned in tests), at the cost of SQL-expressibility.

Drop rule, made exact: for every qualifying pair (cos >= threshold) the
member SEMANTICALLY CLOSER to the centroid loses (higher centroid_sim;
ties lose on larger id). A row is dropped if it loses ANY pair — the
pairwise form of "keep the farthest-from-centroid copy"; like the paper's
implementation it does not chase transitive chains (pairs → components is
available separately via operators/components.py when full closure is
wanted).

The reference repo has no embedding operators at all; this is part of the
LLM-training-data extension surface required by the task brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .similarity import fixed_centroids, ivf_index
from .textdedup import vec_dot, vec_norm


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    seed: int = 42,
    threshold: float = 0.99,
    dim: int | None = None,
    quantizer: str = "fixed",
) -> DataFrame:
    """Per-vector SemDeDup verdicts.

    Returns one row per input vector:
    ``(id_col, cluster_id, centroid_sim [rounded 4dp], kept boolean)`` —
    ``kept=false`` means the row is a semantic duplicate of a same-cluster
    row that the keep policy prefers (lower centroid_sim wins; ties keep
    the smaller id).

    Plan shape: one keyed assignment shuffle (the index build), one
    equi-join on ``cluster_id`` for candidates (never a cartesian), one
    distinct over losers, one left anti-style join for the verdict. All
    vector math is native ``aggregate``/``zip_with`` — zero Python rows.
    """
    centroids, assigned = ivf_index(
        df, vec_col, id_col, n_lists=n_clusters, seed=seed,
        quantizer=quantizer, dim=dim,
    )
    # Re-attach the centroid cosine (assign_to_lists keeps only the argmax
    # list): broadcast the n_clusters-row centroid table, one narrow map.
    scored = (
        assigned.join(
            F.broadcast(centroids.withColumn("_ncent", vec_norm("centroid"))),
            "list_id",
        )
        .withColumn("_nv", vec_norm("v"))
        .withColumn(
            "c_sim", vec_dot("v", "centroid") / (F.col("_nv") * F.col("_ncent"))
        )
        .select(
            "id", "v", "_nv", F.col("list_id").alias("cluster_id"), "c_sim"
        )
    )
    # Within-cluster candidate pairs. Both legs share lineage — rename the
    # right side wholesale before the join (Spark's ambiguous-self-join
    # check trips on column refs otherwise).
    # Norms are hoisted once per VECTOR (the _nv the scoring pass already
    # computed rides along) — recomputing vec_norm per candidate PAIR
    # would multiply the Σc² hot path by two extra O(dim) folds.
    left = scored.select(
        "cluster_id",
        F.col("id").alias("id_a"),
        F.col("v").alias("_va"),
        F.col("_nv").alias("_na"),
        F.col("c_sim").alias("_csim_a"),
    )
    right = scored.select(
        F.col("cluster_id").alias("_b_cluster_id"),
        F.col("id").alias("id_b"),
        F.col("v").alias("_vb"),
        F.col("_nv").alias("_nb"),
        F.col("c_sim").alias("_csim_b"),
    )
    pairs = (
        left.join(
            right,
            (left.cluster_id == right._b_cluster_id)
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn(
            "pair_sim",
            vec_dot("_va", "_vb") / (F.col("_na") * F.col("_nb")),
        )
        .where(F.col("pair_sim") >= F.lit(threshold))
    )
    # The pair member CLOSER to the centroid is dropped (paper: keep the
    # lowest-centroid-sim example); centroid_sim ties drop the larger id.
    # The comparison runs on the 4dp-ROUNDED similarity: near-exact copies
    # (the very thing semantic dedup hunts) have centroid sims equal to
    # ~1e-16 — comparing raw doubles there is deciding on the last ulp,
    # where Spark's fold and the oracle's can legitimately disagree.
    # Rounding makes those ties explicit and the id tiebreak decides them
    # identically on both engines.
    ra, rb = F.round("_csim_a", 4), F.round("_csim_b", 4)
    losers = pairs.select(
        F.when(ra > rb, F.col("id_a"))
        .when(rb > ra, F.col("id_b"))
        .otherwise(F.greatest("id_a", "id_b"))
        .alias("_loser")
    ).distinct()
    return (
        scored.join(losers, scored.id == losers._loser, "left")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            F.round("c_sim", 4).alias("centroid_sim"),
            F.col("_loser").isNull().alias("kept"),
        )
    )


def kept_rows(df: DataFrame, verdicts: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Filter ``df`` to the rows SemDeDup keeps (semi-join on the verdicts)."""
    keep = verdicts.where(F.col("kept")).select(id_col)
    return df.join(keep, id_col, "semi")


def sql_semdedup(
    table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    seed: int = 42,
    threshold: float = 0.99,
    dim: int = 64,
) -> str:
    """DuckDB oracle twin of the FIXED-quantizer :func:`semdedup`.

    Embeds the same seeded centroid float64 literals; the assignment
    argmax, centroid cosine, in-cluster pair score, and loser rule are the
    same left-to-right double arithmetic as the Spark plan, so the driver's
    value hash checks true cross-engine parity of every verdict.
    """
    cents = fixed_centroids(dim, n_clusters, seed)
    values = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )

    def cos(a: str, b: str) -> str:
        dot = (
            f"list_sum(list_transform(range(1, len({a}) + 1), "
            f"i -> {a}[i] * {b}[i]))"
        )
        na = f"sqrt(list_sum(list_transform({a}, x -> x * x)))"
        nb = f"sqrt(list_sum(list_transform({b}, x -> x * x)))"
        return f"{dot} / ({na} * {nb})"

    return f"""
WITH cent(list_id, centroid) AS (VALUES {values}),
base AS (
  SELECT {id_col} AS id,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
ranked AS (
  SELECT b.id, b.v, c.list_id, {cos('b.v', 'c.centroid')} AS c_sim,
         row_number() OVER (
           PARTITION BY b.id
           ORDER BY {cos('b.v', 'c.centroid')} DESC, c.list_id ASC
         ) AS rn
  FROM base b CROSS JOIN cent c
),
scored AS (
  SELECT id, v, list_id AS cluster_id, c_sim FROM ranked WHERE rn = 1
),
pairs AS (
  SELECT a.id AS id_a, a.c_sim AS csim_a, b.id AS id_b, b.c_sim AS csim_b
  FROM scored a JOIN scored b
    ON a.cluster_id = b.cluster_id AND a.id < b.id
  WHERE {cos('a.v', 'b.v')} >= {threshold}
),
losers AS (
  SELECT DISTINCT CASE
    WHEN round(csim_a, 4) > round(csim_b, 4) THEN id_a
    WHEN round(csim_b, 4) > round(csim_a, 4) THEN id_b
    ELSE greatest(id_a, id_b) END AS loser
  FROM pairs
)
SELECT s.id AS {id_col}, s.cluster_id,
       round(s.c_sim, 4) AS centroid_sim,
       l.loser IS NULL AS kept
FROM scored s LEFT JOIN losers l ON s.id = l.loser
"""
