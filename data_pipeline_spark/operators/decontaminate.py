"""Benchmark decontamination: drop training documents that overlap an
evaluation set (the GPT-3 appendix-C rule: any shared 13-gram is
contamination; n is configurable because later pipelines use 8-10).

The reference has no analog (its corpus is product pages); this is the
round-2 LLM-training-data extension family — a pre-training corpus that
contains eval-benchmark text inflates downstream scores, so every serious
pipeline runs this between dedup and sampling.

Scale shape (corpus 10^10 docs, benchmark 10^4-10^6 docs):
- Each side becomes DISTINCT token n-grams via the shared shingle builder
  (`textdedup.shingles` — same tokenizer/token space as quality/textstats,
  so an n-gram matches iff the texts match under the engine's own
  normalization).
- The benchmark n-gram set is exploded, deduplicated, and broadcast —
  config-scale next to the corpus (Σ benchmark tokens, not corpus tokens).
- The corpus side explodes its n-grams and hits the broadcast set with an
  equi-join: one map-side pass over the corpus, NO shuffle of corpus data;
  the only aggregation is per-doc hit counting, map-side-combinable, keyed
  by doc id (can't skew beyond a doc's own n-gram count).
- `min_hits` > 1 loosens the rule (require k independent overlapping
  n-grams); 1 is the GPT-3 rule.

For benchmark sets too big to broadcast, pass ``broadcast_bench=False`` —
the same plan with a shuffle equi-join (bench side still the small side,
AQE will usually pick broadcast anyway at runtime).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .textdedup import shingles, sql_shingles


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per contaminated (doc, benchmark doc) pair: how many distinct
    n-grams they share. Returns (doc_id, bench_id, n_hits) — only pairs
    with at least one shared n-gram appear.
    """
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    # shingles() is per-doc distinct, so (bench_id, gram) is already unique
    # — no extra dedup shuffle needed on either engine.
    bench_grams = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(shingles(F.col(bench_text_col), n)).alias("gram"),
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams, "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def contaminated_ids(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    min_hits: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Doc ids to drop: (doc_id, n_hits, n_bench_docs) where n_hits is the
    TOTAL shared-gram count across benchmark docs and n_bench_docs how many
    benchmark documents the doc overlaps."""
    hits = contamination_hits(
        docs, bench, text_col, id_col, bench_text_col, bench_id_col,
        n, broadcast_bench,
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.sum("n_hits").cast("long").alias("n_hits"),
            F.count("*").cast("long").alias("n_bench_docs"),
        )
        .where(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    min_hits: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The corpus minus contaminated documents (left-anti join on the
    contaminated id set — no corpus shuffle; the id set is aggregate-small)."""
    bad = contaminated_ids(
        docs, bench, text_col, id_col, bench_text_col, bench_id_col,
        n, min_hits, broadcast_bench,
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(F.broadcast(bad), id_col, "left_anti")


def sql_contaminated_ids(
    docs_sql: str,
    bench_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    min_hits: int = 1,
) -> str:
    """DuckDB twin of :func:`contaminated_ids` — same shared shingle
    construction (`textdedup.sql_shingles`), same dedup/count semantics."""
    return f"""
WITH dc_docs AS (
  SELECT {id_col} AS doc_id, {sql_shingles(text_col, n)} AS grams
  FROM ({docs_sql})
), dc_doc_grams AS (
  SELECT doc_id, unnest(grams) AS gram FROM dc_docs
), dc_bench AS (
  SELECT {bench_id_col} AS bench_id, {sql_shingles(bench_text_col, n)} AS grams
  FROM ({bench_sql})
), dc_bench_grams AS (
  SELECT bench_id, unnest(grams) AS gram FROM dc_bench
), dc_hits AS (
  SELECT d.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM dc_doc_grams d JOIN dc_bench_grams b USING (gram)
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(n_hits) AS BIGINT) AS n_hits,
       CAST(count(*) AS BIGINT) AS n_bench_docs
FROM dc_hits GROUP BY 1
HAVING sum(n_hits) >= {min_hits}
"""
