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



def _doc_term_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) from lowercased whitespace tokens — the shared
    corpus-statistics base of tfidf_keywords and unigram_surprisal (one
    tokenizer contract, one explode+agg construction)."""
    terms = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    return terms.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )


def _sql_doc_term_freq(input_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`_doc_term_freq` (CTE body, aliased dtf_tf)."""
    return f"""
dtf_terms AS (
  SELECT {id_col}, unnest({sql_tokens(f'lower({text_col})')}) AS term
  FROM ({input_sql})
), dtf_tf AS (
  SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf
  FROM dtf_terms GROUP BY {id_col}, term
)"""


def tfidf_keywords(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    Output: (id_col, term, tf, score, rank). Terms are lowercased
    whitespace tokens; idf is the smooth ln((N+1)/(df+1)) + 1; ties rank
    deterministically by (score desc, term asc). Scores rounded to 6dp.
    """
    tf = _doc_term_freq(df, id_col, text_col)
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
WITH {_sql_doc_term_freq(input_sql, id_col, text_col).strip()}, tfk_tf AS (
  SELECT * FROM dtf_tf
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


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ctx_tokens: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Concat-and-cut sequence packing: the pre-training step that turns a
    chunked/cleaned corpus into fixed-length training sequences. Documents
    are concatenated in deterministic (shard, id) order and the token
    stream is cut every ``ctx_tokens``; each output row maps one document
    onto one pack it overlaps (a long document spans several packs, several
    short documents share one) — the boundary-agnostic packing GPT-style
    pipelines use, expressed exactly (no greedy per-worker state).

    Output: (shard, pack_id, id_col, begin_tok, pack_tokens, doc_tokens) —
    ``begin_tok`` is the 0-based in-document token offset where the pack's
    slice of this document starts. Invariants: per document,
    sum(pack_tokens) == doc_tokens; per (shard, pack), sum(pack_tokens) ==
    ctx_tokens except each shard's final pack. Empty documents are
    excluded.

    Scale shape: one window cumsum per shard (a keyed shuffle + in-shard
    sort — ``n_shards`` bounds sort width and parallelizes the corpus),
    then a narrow span-explode. Nothing is quadratic. ``id_col`` may be
    numeric (shard = id % n_shards) or string (shard = xxhash64 mod —
    string ids order by their own unique value within the shard, so the
    DuckDB twin covers the numeric path and pytest covers strings).
    """
    if ctx_tokens < 1:
        raise ValueError("ctx_tokens must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql.types import NumericType, StringType

    id_type = df.schema[id_col].dataType
    if isinstance(id_type, NumericType):
        shard = (F.col(id_col) % n_shards).cast("integer")
    elif isinstance(id_type, StringType):
        # String keys (e.g. urls) shard by hash — hash COLLISIONS only
        # co-locate two docs in a shard (harmless); ORDER within the shard
        # is by the unique id itself, so packing never cross-attributes
        # documents the way a derived-numeric-key join would.
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("integer")
    else:
        raise ValueError(
            f"id_col must be numeric or string, got {id_type.simpleString()}"
        )
    base = (
        df.select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).cast("long").alias("n"),
        )
        .where(F.col("n") > 0)
        .withColumn("shard", shard)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = base.select(
        "shard",
        id_col,
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("start"),
    ).withColumn("end", F.col("start") + F.col("n"))
    spans = cum.withColumn(
        "pack_id",
        F.explode(
            F.sequence(
                F.expr(f"start div {ctx_tokens}"),
                F.expr(f"(end - 1) div {ctx_tokens}"),
            )
        ),
    )
    c = F.lit(ctx_tokens).cast("long")
    return spans.select(
        "shard",
        F.col("pack_id").cast("long").alias("pack_id"),
        id_col,
        F.greatest(F.lit(0).cast("long"), F.col("pack_id") * c - F.col("start"))
        .alias("begin_tok"),
        (
            F.least(F.col("end"), (F.col("pack_id") + 1) * c)
            - F.greatest(F.col("start"), F.col("pack_id") * c)
        ).cast("long").alias("pack_tokens"),
        F.col("n").alias("doc_tokens"),
    )


def sql_pack_sequences(
    input_sql: str,
    id_col: str,
    text_col: str,
    ctx_tokens: int = 512,
    n_shards: int = 8,
) -> str:
    """DuckDB twin of :func:`pack_sequences` (``//`` is floor division;
    ``range`` is end-exclusive)."""
    if ctx_tokens < 1 or n_shards < 1:
        raise ValueError("need ctx_tokens >= 1 and n_shards >= 1")
    return f"""
WITH pk_base AS (
  SELECT {id_col},
         CAST(len({sql_tokens(text_col)}) AS BIGINT) AS n,
         CAST({id_col} % {n_shards} AS INTEGER) AS shard
  FROM ({input_sql})
  WHERE len({sql_tokens(text_col)}) > 0
), pk_cum AS (
  SELECT shard, {id_col}, n,
         CAST(COALESCE(SUM(n) OVER (
           PARTITION BY shard ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start
  FROM pk_base
), pk_spans AS (
  SELECT *, start + n AS "end",
         unnest(range(start // {ctx_tokens}, (start + n - 1) // {ctx_tokens} + 1))
           AS pack_id
  FROM pk_cum
)
SELECT shard,
       CAST(pack_id AS BIGINT) AS pack_id,
       {id_col},
       greatest(0, pack_id * {ctx_tokens} - start) AS begin_tok,
       least("end", (pack_id + 1) * {ctx_tokens})
         - greatest(start, pack_id * {ctx_tokens}) AS pack_tokens,
       n AS doc_tokens
FROM pk_spans
"""


def unigram_surprisal(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean token surprisal under the corpus's own unigram
    LM — the shape of CCNet/RedPajama perplexity filtering with the model
    trained on the corpus itself (no external LM in this sandbox): p(term)
    = corpus_count(term) / total_tokens, score = mean(-ln p) over the
    document's tokens. Low = boilerplate/common text, high = rare-token
    noise; both tails are the usual filter targets.

    Output: (id_col, n_tokens, surprisal) — surprisal rounded to 6dp.
    Shape: one (doc, term) hash agg (map-side combinable), a term-count
    agg derived from it (the explode runs once), a term-keyed join (the
    vocabulary is never broadcast), a broadcast one-row total, and a final
    doc-keyed agg. Nothing quadratic; every shuffle is keyed.
    """
    tf = _doc_term_freq(df, id_col, text_col)
    cf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    total = cf.select(F.sum("cf").cast("double").alias("_total"))
    return (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                (F.sum(F.col("tf") * -F.log(F.col("cf") / F.col("_total")))
                 / F.sum("tf")), 6
            ).alias("surprisal"),
        )
    )


def sql_unigram_surprisal(input_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`unigram_surprisal`."""
    return f"""
WITH {_sql_doc_term_freq(input_sql, id_col, text_col).strip()}, us_tf AS (
  SELECT * FROM dtf_tf
), us_cf AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM us_tf GROUP BY term
), us_total AS (
  SELECT CAST(sum(cf) AS DOUBLE) AS total FROM us_cf
)
SELECT t.{id_col},
       CAST(sum(t.tf) AS BIGINT) AS n_tokens,
       round(sum(t.tf * -ln(c.cf / n.total)) / sum(t.tf), 6) AS surprisal
FROM us_tf t JOIN us_cf c USING (term), us_total n
GROUP BY t.{id_col}
"""
