"""Connected components over near-dup candidate pairs → dedup clusters.

The dedup family (exact / n-gram / MinHash-LSH / SimHash / embedding)
produces PAIRS; a training-data pipeline needs CLUSTERS — "keep one doc
per near-dup group" requires the transitive closure of the pair relation
(A~B, B~C ⇒ one cluster {A,B,C} even though (A,C) was never a candidate).

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — O(log n) rounds
expected, each round two shuffle-based self-aggregations. Deliberately NOT
plain min-label propagation: that needs O(graph diameter) rounds, and a
chained dup cluster (doc A ~ B ~ C ~ ... at shingle drift) makes diameter
linear. Every step is a groupBy + join — no per-node neighbor lists are
ever materialized (a hot node with 10^6 dups would OOM a collect_list).

The reference has no analog (its dedup story is "latest raw file wins");
this is a round-2 brief operator (LLM-data-pipeline family).

Per-iteration driver cost: one scalar aggregate (the convergence
checksum). Iteration state is eagerly checkpointed each round so the
logical plan stays constant-size — persist alone is NOT enough for
iterative DataFrame algorithms (cached data, exponentially growing plan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set as (min, max) pairs, self-loops dropped."""
    return (
        e.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: attach every strictly-larger neighbor to
    min(Γ(u) ∪ {u}). Input/output: canonical undirected pairs."""
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(F.least(F.min("dst"), F.col("src")).alias("m"))
    return _canonical(
        sym.where(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u (over edges directed larger→smaller): attach u and
    all its smaller neighbors to their minimum."""
    d = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))  # u > v
    m = d.groupBy("u").agg(F.min("v").alias("m"))  # all v < u, so min ∪ {u} = min(v)
    return _canonical(
        d.join(m, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .union(m.select(F.col("u").alias("src"), F.col("m").alias("dst")))
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    src_col: str,
    dst_col: str,
    node_col: str | None = None,
    out_col: str = "component",
    max_iterations: int = 50,
) -> DataFrame:
    """Label every node with its component's minimum node id.

    ``nodes``: one column of node ids (``node_col`` defaults to its only
    column) — carried so SINGLETONS (docs with no near-dup candidate) get
    labeled too. Returns ``(node_col, out_col)``.
    """
    node_col = node_col or nodes.columns[0]
    # Checkpoint the INITIAL edge set too: round 1 references `e` several
    # times per star step (sym = e ∪ swap(e), then group + join probe), so
    # a lazy/expensive `pairs` plan (e.g. a MinHash-LSH candidate+verify
    # pipeline) would otherwise be fully re-executed many times.
    e = _canonical(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ).localCheckpoint(eager=True)
    prev_sum = None
    for i in range(max_iterations):
        # localCheckpoint (eager), not persist: persist caches DATA but the
        # logical plan still doubles per round — Catalyst re-analysis goes
        # exponential and stalls the driver by iteration ~3. Checkpointing
        # truncates lineage so every round optimizes a constant-size plan.
        # (Executor loss recomputes from the checkpoint; for multi-hour
        # jobs set spark.checkpoint.dir and swap in .checkpoint().)
        #
        # The convergence digest rides the checkpoint job as a
        # CollectMetrics observation (eager localCheckpoint goes through
        # withAction, which delivers observed metrics) — one job per round
        # instead of checkpoint + separate aggregate.
        from pyspark.sql import Observation

        obs = Observation()
        e = (
            _small_star(_large_star(e))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                # decimal accumulator: a long sum of 64-bit hashes overflows
                # (ANSI mode makes that an error, not a wrap)
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        chk = obs.get
        if prev_sum == (chk["n"], chk["s"]):
            break
        prev_sum = (chk["n"], chk["s"])
    else:
        raise RuntimeError(f"no convergence in {max_iterations} iterations")
    # Fixpoint: stars, stored canonically as (src=root=min, dst=child).
    # Each child has exactly one root; min() is belt-and-braces.
    labels = e.groupBy("dst").agg(F.min("src").alias(out_col))
    out = (
        nodes.select(node_col)
        .distinct()
        .join(labels.withColumnRenamed("dst", node_col), node_col, "left")
        .select(
            node_col,
            F.coalesce(F.col(out_col), F.col(node_col)).alias(out_col),
        )
    )
    return out


def dedup_representatives(
    docs: DataFrame,
    components: DataFrame,
    node_col: str,
    out_col: str = "component",
) -> DataFrame:
    """One row per cluster: the minimum-id member (the component label
    itself), i.e. the canonical survivor of each near-dup group."""
    return docs.join(
        components.where(F.col(node_col) == F.col(out_col)).select(node_col),
        node_col,
    )


def sql_connected_components(
    nodes_sql: str,
    pairs_sql: str,
    src_col: str,
    dst_col: str,
    node_col: str,
    out_col: str = "component",
) -> str:
    """DuckDB twin: recursive-CTE transitive closure + MIN per node.
    O(n·cluster) closure rows — the oracle path, correct at test scale;
    the Spark operator is the scale path.

    Matches the operator's exact semantics when pairs reference ids absent
    from ``nodes``: the closure runs over nodes ∪ pair endpoints (so a
    pair-only id can still be a cluster's min LABEL), but the OUTPUT is
    restricted to the nodes relation."""
    return f"""
WITH RECURSIVE cc_nodes AS (
  SELECT DISTINCT {node_col} AS n FROM ({nodes_sql})
), cc_edges AS (
  SELECT {src_col} AS s, {dst_col} AS d FROM ({pairs_sql}) WHERE {src_col} <> {dst_col}
  UNION
  SELECT {dst_col} AS s, {src_col} AS d FROM ({pairs_sql}) WHERE {src_col} <> {dst_col}
), cc_all AS (
  SELECT n FROM cc_nodes UNION SELECT s AS n FROM cc_edges
), cc_reach(n, r) AS (
  SELECT n, n FROM cc_all
  UNION
  SELECT e.d, cc_reach.r FROM cc_reach JOIN cc_edges e ON e.s = cc_reach.n
)
SELECT n AS {node_col}, MIN(r) AS {out_col} FROM cc_reach
WHERE n IN (SELECT n FROM cc_nodes) GROUP BY n
"""
