"""Trained quality classifier: Naive Bayes over unigrams, train/apply split.

The DCLM / FineWeb-style quality filter: take WEAK labels from a cheap
heuristic (here the Gopher rules, functions/quality.py) or a small curated
set, train a unigram Naive Bayes model on them, and let the model
GENERALIZE — scoring every incoming page, including ones the heuristic is
unsure about, with a calibrated log-odds instead of a brittle rule AND.

This is deliberately NOT the same operator as DSIR
(operators/importance.py): DSIR computes importance weights against a
target predicate over the SAME frame it scores — one pass, no artifact.
The classifier here has a train/apply split with a persistable model
(a plain DataFrame → parquet), which is what a CDC ingest loop needs:
train offline on yesterday's corpus, FREEZE, then score each incoming
micro-batch against the frozen model without touching corpus statistics.
The reference has a similar shape in its disabled ML fallback
(/root/reference/naheed_store.rs:602-658: train once, apply per page);
this is the corpus-quality analog.

Scale posture (100 TB):

- **Train** is one explode + one token-keyed, map-side-combinable hash
  agg (hot tokens collapse before the shuffle), a tiny 1-row totals
  aggregate broadcast back, and a 2-scalar prior aggregate. No window,
  no pairwise anything; same shape as DSIR, which is plan-pinned.
- **Score** is one explode + one token-keyed hash agg (per-doc term
  frequencies), one equi-join against the model (vocab-sized — broadcast
  when small; AQE decides), one doc-keyed agg, and one join back to the
  id spine so token-less documents still get the prior. Cost is
  O(corpus tokens), independent of training-corpus size.
- ``hashed=True`` (both sides) replaces terms with xxhash64 ids: the
  shuffle and the model shrink ~5-10x on prose; scores are unchanged
  barring 2^-64 collisions (pinned by parity test).

All native Column expressions — no Python in the hot path. The DuckDB
twins (sql_train_classifier / sql_score_documents) are generated from the
same textstats tokenizer, so the driver oracle checks true cross-engine
parity of the whole train-then-score pipeline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..functions.textstats import sql_tokens, tokens

MODEL_SCHEMA = "term string, llr double, log_prior_odds double"
HASHED_MODEL_SCHEMA = "term bigint, llr double, log_prior_odds double"


def _terms(df: DataFrame, text_col: str, hashed: bool) -> Column:
    t = tokens(F.lower(F.col(text_col)))
    if hashed:
        # Keep the raw 8-byte long (NOT a ~19-char decimal string): the
        # whole point of hashing is that longs shuffle/store smaller than
        # prose tokens. Hashed models carry term:bigint.
        t = F.transform(t, lambda x: F.xxhash64(x))
    return t


def _term_type(hashed: bool) -> str:
    return "bigint" if hashed else "string"


def train_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_pred: Column | None = None,
    alpha: float = 0.5,
    hashed: bool = False,
) -> DataFrame:
    """Train unigram Naive Bayes from a boolean label predicate.

    ``label_pred`` marks the positive (keep-quality) rows; NULL counts as
    negative, exactly like the oracle's ``CASE ... ELSE 0`` (same rule as
    DSIR's target predicate). Returns the model as a DataFrame

        (term, llr, log_prior_odds)

    where ``llr`` is the smoothed log-likelihood ratio
    ``ln((c_pos+a)/(T_pos+aV)) - ln((c_neg+a)/(T_neg+aV))`` over token
    OCCURRENCES and ``log_prior_odds = ln((n_pos+1)/(n_neg+1))`` over
    documents (add-one so a single-class training set stays finite),
    repeated per row so the model is one self-contained artifact that
    round-trips through parquet with no side file. One sentinel row
    (term NULL, llr NULL) always carries the prior, so a model trained
    on a corpus that tokenizes to nothing still scores (with the prior
    alone) instead of degenerating to an empty frame; a NULL join key
    matches no document term, so the sentinel never adds evidence.
    """
    if label_pred is None:
        raise ValueError(
            "label_pred is required: pass a boolean Column marking the "
            "positive (keep-quality) training rows, e.g. "
            "quality.gopher_pass('text') or F.col('label')"
        )
    flag = F.coalesce(label_pred, F.lit(False)).cast("int")
    term_rows = df.select(
        flag.alias("_pos"), F.explode(_terms(df, text_col, hashed)).alias("term")
    )
    cf = term_rows.groupBy("term").agg(
        F.sum("_pos").cast("long").alias("c_pos"),
        F.sum(1 - F.col("_pos")).cast("long").alias("c_neg"),
    )
    totals = cf.select(
        F.sum("c_pos").cast("double").alias("_tp"),
        F.sum("c_neg").cast("double").alias("_tn"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    prior = df.select(flag.alias("_pos")).agg(
        F.log(
            (F.sum("_pos") + F.lit(1.0))
            / (F.sum(1 - F.col("_pos")) + F.lit(1.0))
        ).alias("log_prior_odds")
    )
    a = F.lit(float(alpha))
    term_llr = (
        cf.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(prior))
        .select(
            "term",
            (
                F.log((F.col("c_pos") + a) / (F.col("_tp") + a * F.col("_v")))
                - F.log((F.col("c_neg") + a) / (F.col("_tn") + a * F.col("_v")))
            ).alias("llr"),
            "log_prior_odds",
        )
    )
    sentinel = prior.select(
        F.lit(None).cast(_term_type(hashed)).alias("term"),
        F.lit(None).cast("double").alias("llr"),
        "log_prior_odds",
    )
    return term_llr.unionByName(sentinel)


def score_documents(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
    hashed: bool = False,
) -> DataFrame:
    """Score every row of ``df`` (unique ``id_col``) against a frozen model.

    Columns: id_col, n_tokens, log_odds (prior + sum of tf*llr, 6dp),
    pred (boolean, on the UN-rounded log odds vs ``threshold``). Terms
    unseen in training contribute 0 evidence (the left join's NULL llr);
    documents that tokenize to nothing score exactly the prior — as does
    EVERY document under a model whose training corpus tokenized to
    nothing (the sentinel row keeps the prior alive in a vocabulary-less
    model). ``hashed`` must match the flag the model was trained with.
    """
    tf = (
        df.select(F.col(id_col), F.explode(_terms(df, text_col, hashed)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    evidence = (
        tf.join(model.select("term", "llr"), "term", "left")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.coalesce(F.col("llr"), F.lit(0.0))).alias("_ev"),
        )
    )
    prior = model.select(F.first("log_prior_odds").alias("_prior"))
    raw = F.coalesce(F.col("_ev"), F.lit(0.0)) + F.col("_prior")
    return (
        df.select(F.col(id_col))
        .join(evidence, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.round(raw, 6).alias("log_odds"),
            (raw > F.lit(float(threshold))).alias("pred"),
        )
    )


def top_terms(model: DataFrame, k: int = 20, positive: bool = True) -> DataFrame:
    """The k most discriminative terms for one class — orderBy+limit
    compiles to TakeOrderedAndProject (partial per-partition top-k),
    never a global sort."""
    order = [F.desc("llr") if positive else F.asc("llr"), F.asc("term")]
    return (
        model.filter(F.col("llr").isNotNull())  # drop the prior sentinel
        .select("term", "llr")
        .orderBy(*order)
        .limit(k)
    )


def save_model(model: DataFrame, path: str) -> None:
    """Persist the model (overwrite): a vocab-sized parquet directory."""
    model.write.mode("overwrite").parquet(path)


def load_model(spark: SparkSession, path: str, hashed: bool = False) -> DataFrame:
    schema = HASHED_MODEL_SCHEMA if hashed else MODEL_SCHEMA
    return spark.read.schema(schema).parquet(path)


# ---------------------------------------------------------------------------
# DuckDB twins (driver oracle) — same tokenizer constants via sql_tokens
# ---------------------------------------------------------------------------

def _sql_terms(text_col: str) -> str:
    return sql_tokens(f"lower({text_col})")


def sql_train_classifier(
    input_sql: str, text_col: str, label_sql: str, alpha: float = 0.5
) -> str:
    """CTE body producing (term, llr, log_prior_odds) — the model twin."""
    return f"""
WITH __nb_train AS ({input_sql}),
term_rows AS (
  SELECT CASE WHEN {label_sql} THEN 1 ELSE 0 END AS _pos, t.term AS term
  FROM __nb_train, unnest({_sql_terms(text_col)}) AS t(term)
),
cf AS (
  SELECT term, sum(_pos) AS c_pos, sum(1 - _pos) AS c_neg
  FROM term_rows GROUP BY term
),
tot AS (
  SELECT CAST(sum(c_pos) AS DOUBLE) AS tp, CAST(sum(c_neg) AS DOUBLE) AS tn,
         CAST(count(*) AS DOUBLE) AS v
  FROM cf
),
prior AS (
  SELECT ln((sum(CASE WHEN {label_sql} THEN 1 ELSE 0 END) + 1.0)
           / (sum(CASE WHEN {label_sql} THEN 0 ELSE 1 END) + 1.0))
         AS log_prior_odds
  FROM __nb_train
)
SELECT term,
       ln((c_pos + {alpha}) / (tp + {alpha} * v))
         - ln((c_neg + {alpha}) / (tn + {alpha} * v)) AS llr,
       log_prior_odds
FROM cf, tot, prior
UNION ALL
SELECT NULL, NULL, log_prior_odds FROM prior
"""


def sql_score_documents(
    score_sql: str,
    model_sql: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.0,
) -> str:
    """Twin of score_documents over a model CTE (e.g. sql_train_classifier's
    output) and a to-score relation."""
    return f"""
WITH model AS ({model_sql}),
__nb_score AS ({score_sql}),
tf AS (
  SELECT {id_col}, t.term AS term, count(*) AS tf
  FROM __nb_score, unnest({_sql_terms(text_col)}) AS t(term)
  GROUP BY 1, 2
),
ev AS (
  SELECT tf.{id_col}, sum(tf.tf) AS n_tokens,
         sum(tf.tf * coalesce(m.llr, 0.0)) AS _ev
  FROM tf LEFT JOIN model m USING (term)
  GROUP BY 1
),
prior AS (SELECT first(log_prior_odds) AS _prior FROM model)
SELECT s.{id_col},
       CAST(coalesce(ev.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(coalesce(ev._ev, 0.0) + prior._prior, 6) AS log_odds,
       (coalesce(ev._ev, 0.0) + prior._prior) > {threshold} AS pred
FROM __nb_score s LEFT JOIN ev USING ({id_col}), prior
"""
