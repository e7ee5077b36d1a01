"""Training-data text preparation: token-window chunking and TF-IDF terms.

**Chunking** (`chunk_documents`): every LLM pre-training pipeline slices
documents into fixed token windows (optionally overlapping) before
tokenization/packing. Implemented row-locally — token array → arithmetic
start positions → explode → slice — so it is a pure narrow map (no
shuffle): a 100 TB corpus chunks at scan speed and the output inherits the
input partitioning. Chunk ids are derived arithmetically from the start
offset ((start-1)/step), NOT from an unnest ordinal, so the Spark plan and
the DuckDB twin agree without WITH ORDINALITY support.

**TF-IDF** (`tfidf_keywords`): per-document top-k characteristic terms —
the standard corpus-statistics pass used for stopword discovery, topic
sampling, and domain balancing. Shape: explode lowered tokens → one
(doc, term) hash count (map-side combinable) → term document frequencies
(second hash agg over the FIRST agg's output, so the explode runs once) →
broadcast scalar doc count → smooth idf = ln((N+1)/(df+1)) + 1 → window
top-k per doc with (score desc, term asc) ties. Both shuffles are keyed
aggregations; nothing is quadratic in corpus size.

Token space comes from functions/textstats (one tokenizer everywhere).
The reference repo has neither operation; round-2 LLM-data-pipeline
extensions per the task brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.textstats import sql_tokens, tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between consecutive windows.

    Output: (id_col, chunk_id, n_tokens, chunk) — one row per window,
    ``chunk`` is the window's tokens joined by single spaces (whitespace
    is normalized by construction). Empty documents yield no rows; the
    final window may be shorter than ``chunk_tokens`` but always
    contributes at least one unseen token — starts stop at n - overlap,
    so no window is ever a strict sub-window of its predecessor (a
    degenerate trailing window would inject exact-duplicate training
    content).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    t = tokens(F.col(text_col))
    base = df.select(id_col, t.alias("_t")).where(F.size("_t") > 0)
    # starts = 1, 1+step, ... ≤ max(n - overlap, 1); Spark sequence() is
    # inclusive and n ≥ 1 here. Coverage: the last start exceeds
    # n - overlap - step = n - chunk_tokens, so its window reaches n.
    starts = F.expr(f"sequence(1, greatest(size(_t) - {overlap}, 1), {step})")
    return (
        base.select(id_col, "_t", F.explode(starts).alias("_s"))
        .select(
            id_col,
            ((F.col("_s") - 1) / step).cast("int").alias("chunk_id"),
            F.least(
                F.lit(chunk_tokens), F.size("_t") - F.col("_s") + 1
            ).cast("long").alias("n_tokens"),
            F.expr(f"concat_ws(' ', slice(_t, _s, {chunk_tokens}))").alias("chunk"),
        )
    )


def sql_chunk_documents(
    input_sql: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> str:
    """DuckDB twin (range() is end-exclusive; slice via list_slice)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    return f"""
WITH chk_base AS (
  SELECT {id_col}, {sql_tokens(text_col)} AS t FROM ({input_sql})
), chk_starts AS (
  SELECT {id_col}, t,
         unnest(range(1, greatest(len(t) - {overlap}, 1) + 1, {step})) AS s
  FROM chk_base WHERE len(t) > 0
)
SELECT {id_col},
       CAST((s - 1) / {step} AS INTEGER) AS chunk_id,
       CAST(least({chunk_tokens}, len(t) - s + 1) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(t, s, s + {chunk_tokens} - 1), ' ') AS chunk
FROM chk_starts
"""


def tfidf_keywords(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    Output: (id_col, term, tf, score, rank). Terms are lowercased
    whitespace tokens; idf is the smooth ln((N+1)/(df+1)) + 1; ties rank
    deterministically by (score desc, term asc). Scores rounded to 6dp.
    """
    terms = df.select(
        id_col, F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    # df(term) AND the doc count both derive from the tf relation — the
    # explode output is aggregated once, no second scan of the source; N
    # counts token-bearing docs, the same universe df(term) is drawn from.
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = tf.select(
        F.countDistinct(id_col).cast("double").alias("_n")
    )
    # tf ⋈ dfreq shuffles on term — the vocabulary of a web corpus is far
    # too large to broadcast; only the one-row doc count is broadcast.
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + 1), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", F.col("rank").cast("integer").alias("rank"))
    )


def sql_tfidf_keywords(
    input_sql: str, id_col: str, text_col: str, k: int = 5
) -> str:
    return f"""
WITH tfk_terms AS (
  SELECT {id_col}, unnest({sql_tokens(f'lower({text_col})')}) AS term
  FROM ({input_sql})
), tfk_tf AS (
  SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf
  FROM tfk_terms GROUP BY {id_col}, term
), tfk_df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfk_tf GROUP BY term
), tfk_n AS (
  SELECT CAST(count(DISTINCT {id_col}) AS DOUBLE) AS n FROM tfk_tf
), tfk_scored AS (
  SELECT t.{id_col}, t.term, t.tf,
         round(t.tf * (ln((n.n + 1) / (d.df + 1)) + 1), 6) AS score
  FROM tfk_tf t JOIN tfk_df d USING (term), tfk_n n
), tfk_ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {id_col} ORDER BY score DESC, term ASC) AS rank
  FROM tfk_scored
)
SELECT {id_col}, term, tf, score, CAST(rank AS INTEGER) AS rank
FROM tfk_ranked WHERE rank <= {k}
"""
