"""Product quantization (PQ) — memory-compressed ANN for 10^10-vector scale.

IVF (operators/similarity.py) bounds how much of the corpus a probe SCANS;
PQ bounds what a scanned vector COSTS: each L2-normalized vector is split
into ``m`` subspaces and each subspace replaced by the index of its nearest
codebook entry — ``m`` small ints (≤1 byte at k≤256) instead of
``4·dim`` float bytes, a 32× compression at the dim-64/m-8 default. Search
uses asymmetric distance computation (ADC): per query, a distance table of
``m × k`` exact sub-distances to every codebook entry is computed ONCE,
then every candidate costs ``m`` table lookups + adds instead of a
``dim``-wide dot product.

Design mirrors the X5 fixed-quantizer pattern that made IVF oracle-
checkable: codebooks are ALWAYS driver-side nested lists (config-scale,
``m × k × dim/m`` floats) embedded as literals in the expressions —
:func:`fixed_codebooks` derives them from a seed (deterministic, the SAME
float64 literals feed the Spark plan and the DuckDB twin), while
:func:`learned_codebooks` fits per-subspace KMeans (quality path, better
recall, identical machinery). Encoding is a pure per-row native expression
— a narrow map, no shuffle, so 10^10 vectors encode at scan speed; scoring
folds left-to-right over the ``m`` table entries on BOTH engines, so the
driver's value hash checks true cross-engine parity.

Squared L2 on normalized vectors is rank-equivalent to cosine
(``||a-b||² = 2 - 2·cos``), so PQ ranks compare directly against the
exact-cosine operators in tests.

The reference repo has no vector search at all; round-2 LLM-data-pipeline
extension (task brief), composing with the IVF family: assign lists with
the coarse quantizer, store PQ codes per list, probe lists and ADC-score
only their codes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def fixed_codebooks(
    dim: int, m: int = 8, k: int = 16, seed: int = 7
) -> list[list[list[float]]]:
    """Seeded codebooks ``[m][k][dim/m]`` (driver-side literals). Entries
    are scaled to the magnitude of a unit vector's subspace coordinates
    (~1/sqrt(dim)) so they tile the region normalized subvectors occupy."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    rng = np.random.default_rng(seed)
    scale = 1.0 / float(np.sqrt(dim))
    return [
        [[float(x) * scale for x in rng.standard_normal(dim // m)]
         for _ in range(k)]
        for _ in range(m)
    ]


def learned_codebooks(
    df: DataFrame, vec_col: str, dim: int, m: int = 8, k: int = 16,
    seed: int = 7,
) -> list[list[list[float]]]:
    """Quality path: per-subspace KMeans over the (normalized) corpus —
    same nested-list shape as :func:`fixed_codebooks`, so encode/search
    are byte-identical machinery with better-placed centroids. ``m`` small
    fits over column-pruned subvectors; run at index-build time."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from .mlutil import strip_training_summary

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    d = dim // m
    nv = _normalized_df(df, vec_col, vec_col, dim).select("nv")
    out = []
    for s in range(m):
        sub = nv.select(
            array_to_vector(F.expr(f"slice(nv, {s * d + 1}, {d})")).alias("_fv")
        )
        model = strip_training_summary(
            KMeans(k=k, seed=seed + s, featuresCol="_fv").fit(sub)
        )
        centers = [[float(x) for x in c] for c in model.clusterCenters()]
        if len(centers) != k:
            # KMeans returns fewer centers on degenerate subspaces (e.g.
            # constant padded dimensions) — a ragged codebook would either
            # IndexError at plan build or silently truncate every other
            # subspace to the deficient length. Fail loudly instead.
            raise ValueError(
                f"subspace {s}: KMeans produced {len(centers)} centers, "
                f"expected k={k} — the subspace has too few distinct "
                f"subvectors; lower k or drop degenerate dimensions"
            )
        out.append(centers)
    return out


def _normalized_df(df: DataFrame, vec_col: str, id_col: str, dim: int,
                   out_id: str = "id", out_v: str = "nv") -> DataFrame:
    """(id, nv) with nv L2-normalized (zero vectors pass through
    unscaled); asserts dim so a wrong configuration fails loudly instead
    of mis-slicing subspaces. The norm is hoisted into its own projected
    column — referenced, not re-folded, inside the divide lambda (Spark
    evaluates lambda bodies per element, so an embedded norm aggregate
    would cost O(dim^2) per row on the scan-speed encode path)."""
    base = df.select(
        F.col(id_col).alias(out_id),
        F.expr(
            f"CASE WHEN size({vec_col}) != {dim} THEN "
            f"raise_error('pq: embedding dim != configured dim={dim}') "
            f"ELSE transform({vec_col}, x -> CAST(x AS DOUBLE)) END"
        ).alias("_v"),
    ).withColumn(
        "_norm", F.expr("sqrt(aggregate(_v, 0D, (a, x) -> a + x * x))")
    )
    return base.select(
        out_id,
        F.expr(
            "CASE WHEN _norm = 0D THEN _v "
            "ELSE transform(_v, x -> x / _norm) END"
        ).alias(out_v),
    )


def _lit_arr(xs) -> str:
    return "array(" + ", ".join(repr(float(x)) for x in xs) + ")"


def _sub_dist(nv: str, s: int, d: int, entry: list[float]) -> str:
    """Squared L2 between subspace ``s`` of ``nv`` and a codebook entry —
    left-to-right fold (deterministic accumulation)."""
    return (
        f"aggregate(zip_with(slice({nv}, {s * d + 1}, {d}), {_lit_arr(entry)}, "
        f"(x, y) -> (x - y) * (x - y)), 0D, (a, t) -> a + t)"
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes) — codes[s] = index of subspace ``s``'s nearest codebook
    entry (ties to the lowest index). One narrow per-row expression: the
    10^10-vector encode is a scan-speed map with no shuffle; persist the
    result (m small ints per vector) as the compressed index."""
    m = len(codebooks)
    k = len(codebooks[0])
    d = len(codebooks[0][0])
    base = _normalized_df(df, vec_col, id_col, m * d)
    # Each subspace's k-distance array is projected ONCE as its own
    # column; the argmin then references the column, so the k folds are
    # never evaluated twice (array_position(expr, array_min(expr)) would
    # duplicate the subtree — higher-order functions sit outside codegen
    # CSE).
    dist_cols = [
        F.expr(
            "array(" + ", ".join(
                _sub_dist("nv", s, d, codebooks[s][j]) for j in range(k)
            ) + ")"
        ).alias(f"_d{s}")
        for s in range(m)
    ]
    ds = base.select("id", *dist_cols)
    codes = [
        F.expr(
            f"CAST(array_position(_d{s}, array_min(_d{s})) - 1 AS INT)"
        ).alias(f"_c{s}")
        for s in range(m)
    ]
    return ds.select("id", *codes).select(
        "id", F.array(*[f"_c{s}" for s in range(m)]).alias("codes")
    )


def _dtab_expr(codebooks, qv: str) -> str:
    """Per-query ADC distance table, flattened [(s, j)] -> m·k doubles."""
    m, k = len(codebooks), len(codebooks[0])
    d = len(codebooks[0][0])
    cells = [
        _sub_dist(qv, s, d, codebooks[s][j])
        for s in range(m)
        for j in range(k)
    ]
    return "array(" + ", ".join(cells) + ")"


def pq_topk(
    codebooks: list[list[list[float]]],
    codes: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, rank, approx_dist). Queries are
    broadcast with their precomputed m·k distance table; every candidate
    costs ``m`` lookups + adds (left-to-right fold — deterministic).
    Compose with IVF for sublinear scans: restrict ``codes`` to the
    probed lists' codes (tests/test_pq.py pins the composition)."""
    m = len(codebooks)
    kc = len(codebooks[0])
    d = len(codebooks[0][0])
    q = _normalized_df(
        queries, vec_col, id_col, m * d, out_id="query_id", out_v="qnv"
    ).select("query_id", F.expr(_dtab_expr(codebooks, "qnv")).alias("_dtab"))
    score = (
        f"aggregate(sequence(1, {m}), 0D, (acc, s) -> "
        f"acc + element_at(_dtab, (s - 1) * {kc} + element_at(codes, s) + 1))"
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("id"))
        .withColumn("approx_dist", F.expr(score))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.col("rank").cast("integer").alias("rank"),
            F.round("approx_dist", 4).alias("approx_dist"),
        )
    )


def pq_topk_rerank(
    codebooks: list[list[list[float]]],
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """Two-stage PQ search: ADC shortlist (``shortlist`` candidates per
    query, compressed codes only) → exact-cosine re-rank of just those
    candidates against the full vectors.

    This is the standard quality fix for pure-ADC ranking (measured in
    BENCH/ann_recall.json: ADC-only recall@10 ≈ 0.12-0.20 at m=8/k=16;
    re-ranked ≈ 1 - shortlist misses). Cost: the full-vector reads are
    Q·shortlist point lookups via an equi-join on the candidate ids — the
    10^10-row corpus is never crossed, only the shortlist rows shuffle.
    Output shape matches :func:`~.similarity.topk_bruteforce`.
    """
    cand = pq_topk(
        codebooks, codes, queries, vec_col, id_col, k=shortlist
    ).select("query_id", "neighbor_id")
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        ).withColumn(
            "_nq", F.expr("sqrt(aggregate(qv, 0D, (a, x) -> a + x * x))")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("_nc", F.expr("sqrt(aggregate(cv, 0D, (a, x) -> a + x * x))"))
    scored = (
        cand.join(c, "neighbor_id")
        .join(q, "query_id")
        .withColumn(
            "cos_sim",
            F.expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, t) -> a + t)")
            / (F.col("_nq") * F.col("_nc")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("integer").alias("rank"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twin (fixed codebooks — the same float64 literals)
# ---------------------------------------------------------------------------

def sql_pq_topk(
    table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    m: int = 8,
    k_codes: int = 16,
    seed: int = 7,
    k: int = 5,
    query_pred: str = "TRUE",
) -> str:
    """DuckDB twin of fixed-codebook encode + ADC search. The codebook CTE
    carries the same literals; encode is the relational argmin (row_number
    over dist asc, code asc — identical tie rule to array_position-of-min);
    the final score folds the same m table entries in index order."""
    cbs = fixed_codebooks(dim, m, k_codes, seed)
    d = dim // m
    values = ", ".join(
        f"({s}, {j}, [{', '.join(repr(x) for x in cbs[s][j])}]::DOUBLE[])"
        for s in range(m)
        for j in range(k_codes)
    )

    def sub_dist(nv: str, s_expr: str, cb: str) -> str:
        # nv[(s)*d + i] is the i-th coordinate of subspace s (s 0-based).
        return (
            f"list_sum(list_transform(range(1, {d} + 1), "
            f"i -> ({nv}[{s_expr} * {d} + i] - {cb}[i]) * "
            f"({nv}[{s_expr} * {d} + i] - {cb}[i])))"
        )

    return f"""
WITH cb(s, j, entry) AS (VALUES {values}),
pq_base AS (
  SELECT {id_col} AS id,
         CASE WHEN sqrt(list_sum(list_transform({vec_col}, x -> CAST(x AS DOUBLE) * x))) = 0
              THEN list_transform({vec_col}, x -> CAST(x AS DOUBLE))
              ELSE list_transform({vec_col}, x -> CAST(x AS DOUBLE) /
                     sqrt(list_sum(list_transform({vec_col}, y -> CAST(y AS DOUBLE) * y))))
         END AS nv
  FROM {table}
), sub_scored AS (
  SELECT b.id, cb.s, cb.j, {sub_dist('b.nv', 'cb.s', 'cb.entry')} AS dist
  FROM pq_base b, cb
), codes AS (
  SELECT id, s, j AS code FROM (
    SELECT id, s, j,
           row_number() OVER (PARTITION BY id, s ORDER BY dist ASC, j ASC) AS rn
    FROM sub_scored
  ) WHERE rn = 1
), code_arr AS (
  SELECT id, list(code ORDER BY s) AS codes FROM codes GROUP BY id
), q AS (
  SELECT id AS query_id, nv AS qnv FROM pq_base WHERE {query_pred}
), dtab AS (
  -- flattened per-query distance table in (s, j) index order
  SELECT q.query_id,
         list({sub_dist('q.qnv', 'cb.s', 'cb.entry')} ORDER BY cb.s, cb.j) AS tab
  FROM q, cb GROUP BY q.query_id, q.qnv
), scored AS (
  SELECT t.query_id, c.id AS neighbor_id,
         list_sum(list_transform(range(1, {m} + 1),
           s -> t.tab[(s - 1) * {k_codes} + c.codes[s] + 1])) AS approx_dist
  FROM dtab t, code_arr c
  WHERE t.query_id <> c.id
), ranked AS (
  SELECT query_id, neighbor_id, approx_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY approx_dist ASC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       round(approx_dist, 4) AS approx_dist
FROM ranked WHERE rank <= {k}
"""
