"""Benchmark decontamination: drop training documents that overlap an
evaluation set (the GPT-3 appendix-C rule: any shared 13-gram is
contamination; n is configurable because later pipelines use 8-10).

The reference has no analog (its corpus is product pages); this is the
round-2 LLM-training-data extension family — a pre-training corpus that
contains eval-benchmark text inflates downstream scores, so every serious
pipeline runs this between dedup and sampling.

Scale shape (corpus 10^10 docs, benchmark 10^4-10^6 docs):
- Both sides become DISTINCT token n-grams via the shared shingle builder
  (`textdedup.shingles` — same tokenizer/token space as quality/textstats,
  so an n-gram matches iff the texts match under the engine's own
  normalization). Bench docs SHORTER than n tokens have no true n-grams;
  they are matched instead by whole-item token-boundary containment in the
  document's normalized token stream (the GPT-3 handling of short eval
  examples) — that side is tiny by construction, so the containment scan
  is a broadcast map-side pass.
- The benchmark n-gram set is exploded and broadcast — config-scale next
  to the corpus (Σ benchmark tokens, not corpus tokens).
- The corpus side explodes its n-grams and hits the broadcast set with an
  equi-join: one map-side pass over the corpus, NO shuffle of corpus data;
  the only aggregation is per-doc hit counting, map-side-combinable, keyed
  by doc id (can't skew beyond a doc's own n-gram count).
- `min_hits` > 1 loosens the rule: the doc must share at least k DISTINCT
  n-grams with the benchmark (a gram appearing in several bench docs still
  counts once); 1 is the GPT-3 rule. A contained short bench item counts
  as one gram.

Known asymmetry (documented, not silently wrong): a training doc shorter
than n tokens embedded VERBATIM inside a longer benchmark item is not
flagged — it has no true n-grams to match. Such fragments are below the
quality gate's word-count floor anyway; lower ``n`` if they matter.

For benchmark sets too big to broadcast, pass ``broadcast_bench=False`` —
the same plan with a shuffle equi-join (bench side still the small side,
AQE will usually pick broadcast anyway at runtime).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.textstats import sql_tokens, tokens
from .textdedup import shingles, sql_shingles


def _norm(col):
    """Token-normalized text: the shared token stream space-joined, so
    containment/equality agree with the n-gram token space."""
    return F.concat_ws(" ", tokens(F.lower(col)))


def _gram_matches(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str,
    bench_id_col: str,
    n: int,
    broadcast_bench: bool,
) -> DataFrame:
    """(doc_id, bench_id, gram) for every shared n-gram, plus one row per
    (doc, short bench item contained in the doc) with the whole normalized
    bench item as the gram. Distinct per (doc_id, bench_id) by construction
    (shingles are per-doc distinct; containment contributes one row)."""
    b = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        F.col(bench_text_col).alias("_btext"),
        F.size(tokens(F.lower(F.col(bench_text_col)))).alias("_btoks"),
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    bench_grams = b.where(F.col("_btoks") >= n).select(
        "bench_id", F.explode(shingles(F.col("_btext"), n)).alias("gram")
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    long_hits = doc_grams.join(bench_grams, "gram").select(
        "doc_id", "bench_id", "gram"
    )

    short = b.where((F.col("_btoks") > 0) & (F.col("_btoks") < n)).select(
        "bench_id", _norm(F.col("_btext")).alias("gram")
    )
    dnorm = docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(F.lit(" "), _norm(F.col(text_col)), F.lit(" ")).alias("_dn"),
    )
    short_hits = (
        dnorm.crossJoin(F.broadcast(short))
        .where(F.col("_dn").contains(F.concat(F.lit(" "), F.col("gram"), F.lit(" "))))
        .select("doc_id", "bench_id", "gram")
    )
    return long_hits.unionByName(short_hits)


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
    n-grams they share (a contained short bench item counts as 1). Returns
    (doc_id, bench_id, n_hits) — only pairs with ≥1 shared gram appear."""
    return (
        _gram_matches(
            docs, bench, text_col, id_col, bench_text_col, bench_id_col,
            n, broadcast_bench,
        )
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
    """Doc ids to drop: (doc_id, n_hits, n_bench_docs) where n_hits counts
    DISTINCT shared grams (a gram shared with several bench docs counts
    once — min_hits means k independent overlapping grams, not k pairs)
    and n_bench_docs how many benchmark documents the doc overlaps."""
    grams = _gram_matches(
        docs, bench, text_col, id_col, bench_text_col, bench_id_col,
        n, broadcast_bench,
    )
    return (
        grams.groupBy("doc_id")
        .agg(
            F.count_distinct("gram").cast("long").alias("n_hits"),
            F.count_distinct("bench_id").cast("long").alias("n_bench_docs"),
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
    contaminated id set — no corpus shuffle; the id set is aggregate-small).

    Null-safe on the id: a NULL-keyed doc (e.g. a malformed url upstream)
    that is flagged must actually be dropped — a plain equality anti-join
    never matches NULL and would ship the contaminated doc anyway."""
    bad = contaminated_ids(
        docs, bench, text_col, id_col, bench_text_col, bench_id_col,
        n, min_hits, broadcast_bench,
    ).select(F.col("doc_id").alias("_bad_id"))
    return docs.join(
        F.broadcast(bad), F.col(id_col).eqNullSafe(F.col("_bad_id")), "left_anti"
    )


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
    construction (`textdedup.sql_shingles`), same short-bench containment
    rule, same distinct-gram count semantics."""
    b_toks = sql_tokens(f"lower({bench_text_col})")
    d_norm = f"array_to_string({sql_tokens(f'lower({text_col})')}, ' ')"
    return f"""
WITH dc_doc_grams AS (
  SELECT doc_id, unnest(grams) AS gram FROM (
    SELECT {id_col} AS doc_id, {sql_shingles(text_col, n)} AS grams
    FROM ({docs_sql}))
), dc_bench AS (
  SELECT {bench_id_col} AS bench_id, {bench_text_col} AS btext,
         len({b_toks}) AS btoks
  FROM ({bench_sql})
), dc_long_hits AS (
  SELECT d.doc_id, b.bench_id, d.gram
  FROM dc_doc_grams d
  JOIN (SELECT bench_id, unnest(grams) AS gram FROM (
          SELECT bench_id, {sql_shingles('btext', n)} AS grams
          FROM dc_bench WHERE btoks >= {n})) b USING (gram)
), dc_short AS (
  SELECT bench_id, array_to_string({sql_tokens('lower(btext)')}, ' ') AS gram
  FROM dc_bench WHERE btoks > 0 AND btoks < {n}
), dc_short_hits AS (
  SELECT d.doc_id, s.bench_id, s.gram
  FROM (SELECT {id_col} AS doc_id, ' ' || {d_norm} || ' ' AS dn
        FROM ({docs_sql})) d, dc_short s
  WHERE position(' ' || s.gram || ' ' IN d.dn) > 0
), dc_all AS (
  SELECT * FROM dc_long_hits UNION ALL SELECT * FROM dc_short_hits
)
SELECT doc_id,
       CAST(count(DISTINCT gram) AS BIGINT) AS n_hits,
       CAST(count(DISTINCT bench_id) AS BIGINT) AS n_bench_docs
FROM dc_all GROUP BY 1
HAVING count(DISTINCT gram) >= {min_hits}
"""
