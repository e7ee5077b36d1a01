"""DSIR-style data selection: importance resampling on hashed/unigram features.

The method of Xie et al., "Data Selection for Language Models via
Importance Resampling" (DSIR, arXiv:2302.03169): fit cheap bag-of-features
language models to a TARGET domain sample and to the RAW pool, score every
raw document with the log importance weight

    log w(x) = sum_{tokens t in x}  [ ln p_target(t) - ln p_raw(t) ]

and resample the pool proportionally to w — the selected subset is
distributionally close to the target while coming from the (much larger)
raw corpus. The paper hashes n-grams into buckets; here the feature space
is the corpus's own lowercased whitespace unigrams (the shared tokenizer
of functions/textstats — ONE token contract engine-wide), which keeps the
whole computation SQL-expressible for the DuckDB oracle while preserving
the method's shape exactly. Both distributions are add-alpha smoothed over
the RAW vocabulary, so unseen-in-target terms get a finite negative ratio
instead of -inf.

Scale shape (the 100 TB posture): one explode → (doc, term) hash count
(map-side combinable), one term-keyed agg for the two count vectors (the
explode output is aggregated once; the vocabulary is never broadcast and
never collected), one broadcast of the THREE scalars (total raw tokens,
total target tokens, vocab size), a term-keyed join of doc term counts
against the per-term log-ratio, and one doc-keyed agg. Every shuffle is
keyed; nothing is quadratic; no Python rows. The target membership is a
column predicate, so the "target sample" costs a boolean per row, not a
second scan.

Determinism: per-term log-ratios are pure functions of exact BIGINT
counts; the per-doc sum is tf-weighted over <= vocab-size doubles and
rounded to 6dp (the same construction as textprep.unigram_surprisal, hash
-green cross-engine); ranks order by the ROUNDED weight with doc-id ties,
so selection is reproducible bit-for-bit on both engines.

The reference repo has no corpus-selection operators; this is part of the
LLM-training-data extension surface required by the task brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.textstats import sql_tokens, tokens


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document DSIR log importance weights against a target predicate.

    ``target_pred`` marks the target-domain rows (e.g. ``col("lang") ==
    "en"``); every token-bearing document in ``df`` (target rows included —
    selection downstream may exclude them) gets a row

    ``(id_col, n_tokens, log_weight [rounded 6dp])``

    Higher = more target-like. Documents whose text tokenizes to nothing
    carry no unigram evidence and are omitted — matching the oracle, where
    an empty unnest yields no rows. Deliberately NO global rank column: a
    corpus-wide row_number is an unpartitioned window (single-partition
    sort — a 10^10-row scale-killer); selection runs as distributed
    partial top-k in :func:`select_top` instead.
    """
    # ONE explode pass: the target flag rides each token row, so BOTH
    # count vectors come out of a single term-keyed aggregation — no
    # second corpus scan, no target-id semi-join (an earlier draft
    # semi-joined tf against the target ids, which re-derived the explode;
    # at 10^10 docs that is a second full pass over the corpus).
    # coalesce: a NULL predicate result (e.g. lang IS NULL under
    # "lang = 'en'") must count as non-target, exactly like the oracle's
    # CASE ... ELSE 0 — a NULL _tgt would otherwise null cf_t for every
    # term seen in such docs and silently drop those terms' log-ratios.
    terms = df.select(
        F.col(id_col),
        F.coalesce(target_pred, F.lit(False)).cast("int").alias("_tgt"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf"),
        F.max("_tgt").alias("_tgt"),  # constant per doc; max = that constant
    )
    cf = tf.groupBy("term").agg(
        F.sum("tf").cast("long").alias("cf_r"),
        F.sum(F.col("tf") * F.col("_tgt")).cast("long").alias("cf_t"),
    )
    totals = cf.select(
        F.sum("cf_r").cast("double").alias("_tr"),
        F.sum("cf_t").cast("double").alias("_tt"),
        F.count("*").cast("double").alias("_v"),
    )
    a = F.lit(float(alpha))
    ratio = cf.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            F.log((F.col("cf_t") + a) / (F.col("_tt") + a * F.col("_v")))
            - F.log((F.col("cf_r") + a) / (F.col("_tr") + a * F.col("_v")))
        ).alias("log_ratio"),
    )
    return (
        tf.join(ratio, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * F.col("log_ratio")), 6).alias("log_weight"),
        )
    )


def select_top(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    k: int,
) -> DataFrame:
    """The resampling step, deterministic flavor: keep the k most
    target-like documents (DSIR's Gumbel-top-k draw degenerates to rank
    order when reproducibility beats stochasticity — the common production
    choice). ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
    per-partition partial top-k merged on the driver, NOT a global sort —
    then a semi-join carries the ids back to the full rows."""
    keep = (
        weights.orderBy(F.desc("log_weight"), F.asc(id_col))
        .limit(k)
        .select(id_col)
    )
    return df.join(keep, id_col, "semi")


def sql_importance_weights(
    input_sql: str,
    id_col: str,
    text_col: str,
    target_pred_sql: str,
    alpha: float = 0.5,
) -> str:
    """DuckDB oracle twin of :func:`importance_weights` — same tokenizer,
    same BIGINT count vectors, same smoothing arithmetic, same rounded
    ranking keys."""
    return f"""
WITH iw_terms AS (
  SELECT {id_col},
         CASE WHEN {target_pred_sql} THEN 1 ELSE 0 END AS _tgt,
         unnest({sql_tokens(f'lower({text_col})')}) AS term
  FROM ({input_sql})
),
iw_tf AS (
  SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf, max(_tgt) AS _tgt
  FROM iw_terms GROUP BY {id_col}, term
),
iw_cf AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cf_r,
         CAST(sum(tf * _tgt) AS BIGINT) AS cf_t
  FROM iw_tf GROUP BY term
),
iw_totals AS (
  SELECT CAST(sum(cf_r) AS DOUBLE) AS tr,
         CAST(sum(cf_t) AS DOUBLE) AS tt,
         CAST(count(*) AS DOUBLE) AS v
  FROM iw_cf
),
iw_ratio AS (
  SELECT term,
         ln((cf_t + {alpha}) / (tt + {alpha} * v))
           - ln((cf_r + {alpha}) / (tr + {alpha} * v)) AS log_ratio
  FROM iw_cf CROSS JOIN iw_totals
),
iw_scored AS (
  SELECT t.{id_col},
         CAST(sum(t.tf) AS BIGINT) AS n_tokens,
         round(sum(t.tf * r.log_ratio), 6) AS log_weight
  FROM iw_tf t JOIN iw_ratio r USING (term)
  GROUP BY t.{id_col}
)
SELECT {id_col}, n_tokens, log_weight FROM iw_scored
"""
