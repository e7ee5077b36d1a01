"""CCNet-style n-gram language-model perplexity scoring (X98).

CCNet / RedPajama filter web text by perplexity under a small n-gram LM
trained on a trusted reference corpus (Wikipedia in the paper); docs land
in head/middle/tail quality buckets by score. The reference pipeline has
no LM stage at all — this is part of the beyond-reference training-data
surface (`unigram_surprisal` is the degenerate unigram case; this module
adds the real thing: a CONDITIONAL model with a train/score split).

Model: interpolated (Jelinek-Mercer) bigram LM over lowercased
whitespace tokens,

    p(w2 | w1) = l2 * c(w1,w2)/c1(w1) + l1 * c(w2)/N + l0 * 1/(V+1)

where c(w1,w2) and c1(w1) = sum_w2 c(w1,w2) are training bigram counts,
c(w2)/N the training unigram distribution, and the uniform floor spreads
l0 over the V seen types plus one unseen bucket, so every probability is
strictly positive with zero special-casing. Unseen history -> the
conditional term is 0 (not undefined); unseen token -> unigram term 0.
Everything is exact closed-form arithmetic over counts — SQL-expressible
end-to-end, so the whole train+score pipeline has a DuckDB value-hash
twin (no external LM exists in this sandbox, and a learned LM would not
be oracle-checkable anyway).

Train/score split: the training partition is selected by the repo's
deterministic md5 hash sample (`operators/sampling.py`) — the same
engine-portable predicate DuckDB replays verbatim — so "train on a
reference slice, score the whole corpus" is part of the contract, not a
fixture.

Scale posture (the 100 TB story):
- training = one explode + two keyed hash aggs (bigram counts; unigram
  counts); the history table c1 derives from the bigram table, so the
  explode runs once. Map-side combine collapses hot tokens before
  shuffle.
- scoring collapses each doc's repeated bigrams FIRST (groupBy doc,w1,w2
  — bounded by distinct bigrams per doc, not tokens), then joins the
  count tables on their natural keys. The vocabulary is NEVER broadcast
  and never collected — web-scale vocab is far too large; both joins are
  plain equi-joins AQE can re-plan. Only the one-row (N, V) scalar frame
  is broadcast.
- per-doc score = one keyed hash agg; docs with < 2 tokens surface with
  n_bigrams = 0 and NULL score via one left join against the doc spine
  (no doc silently dropped — at curation scale a dropped doc is a
  corruption, not a convenience).

Reference: no counterpart (the Rust pipeline stops at scrape/normalize;
see /root/reference/src/processors/*). CCNet: Wenzek et al., LREC 2020.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.textstats import sql_tokens, tokens
from .sampling import keep_predicate, sql_keep_predicate

__all__ = ["bigram_perplexity", "sql_bigram_perplexity"]

# Bigram list of token array `t` (0 rows when size < 2). Spark arrays are
# 0-based under [] indexing; element_at is 1-based — sequence(2, n) with
# element_at(i-1)/element_at(i) mirrors DuckDB's 1-based range(2, n+1)
# exactly, and the size guard dodges sequence()'s descending-range trap
# (sequence(2, 1) yields [2, 1], not empty).
_BIGRAMS = (
    "CASE WHEN size({t}) >= 2 THEN "
    "transform(sequence(2, size({t})), i -> "
    "struct(element_at({t}, i - 1) AS w1, element_at({t}, i) AS w2)) "
    "ELSE array() END"
)


def bigram_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_fraction: float = 0.5,
    seed: str = "lmtrain",
    l2: float = 0.7,
    l1: float = 0.25,
) -> DataFrame:
    """Score every document's cross-entropy under an interpolated bigram
    LM trained on a deterministic hash-sampled reference partition.

    Output: (id_col, n_bigrams, xent, ppl) — xent = mean -ln p over the
    doc's bigrams (nats, 6dp), ppl = exp(xent) (6dp); both NULL when the
    doc has fewer than 2 tokens. l0 = 1 - l2 - l1 is the uniform-floor
    weight.
    """
    if not (0 < l2 and 0 < l1 and l2 + l1 < 1):
        raise ValueError("need l2 > 0, l1 > 0, l2 + l1 < 1")
    toked = df.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("t")
    )
    train = toked.where(keep_predicate(id_col, train_fraction, seed))

    uni = (
        train.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cu"))
    )
    big = (
        train.select(F.explode(F.expr(_BIGRAMS.format(t="t"))).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c12"))
    )
    hist = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    scalars = uni.agg(
        F.sum("cu").cast("double").alias("_n"),
        F.count("*").cast("double").alias("_v"),
    )

    doc_big = (
        toked.select(
            F.col(id_col), F.explode(F.expr(_BIGRAMS.format(t="t"))).alias("b")
        )
        .select(id_col, "b.w1", "b.w2")
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").cast("long").alias("k"))
    )
    l0 = 1.0 - l2 - l1
    p = (
        F.lit(l2)
        * F.when(
            F.col("c1") > 0,
            F.coalesce(F.col("c12"), F.lit(0)) / F.col("c1"),
        ).otherwise(0.0)
        + F.lit(l1) * F.coalesce(F.col("cu") / F.col("_n"), F.lit(0.0))
        + F.lit(l0) / (F.col("_v") + 1)
    )
    scored = (
        doc_big.join(big, ["w1", "w2"], "left")
        .join(hist, "w1", "left")
        .join(uni, doc_big["w2"] == uni["w"], "left")
        .crossJoin(F.broadcast(scalars))
        .select(F.col(id_col), F.col("k"), (F.col("k") * -F.log(p)).alias("nll"))
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.round(F.sum("nll") / F.sum("k"), 6).alias("xent"),
        )
        # ppl from the ROUNDED xent: both engines then exponentiate the
        # identical 6dp value, so cross-engine float drift can't be
        # amplified through exp() at a rounding boundary.
        .withColumn("ppl", F.round(F.exp("xent"), 6))
    )
    spine = toked.select(F.col(id_col))
    return spine.join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        "xent",
        "ppl",
    )


def sql_bigram_perplexity(
    input_sql: str,
    id_col: str,
    text_col: str,
    train_fraction: float = 0.5,
    seed: str = "lmtrain",
    l2: float = 0.7,
    l1: float = 0.25,
) -> str:
    """DuckDB twin of :func:`bigram_perplexity` (1-based list indexing;
    range(2, n+1) is end-exclusive and empty for n < 2)."""
    l0 = 1.0 - l2 - l1
    keep = sql_keep_predicate(id_col, train_fraction, seed)
    return f"""
WITH lm_toked AS (
  SELECT {id_col}, {sql_tokens(f'lower({text_col})')} AS t
  FROM ({input_sql})
), lm_train AS (
  SELECT * FROM lm_toked WHERE {keep}
), lm_uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cu
  FROM (SELECT unnest(t) AS w FROM lm_train) GROUP BY w
), lm_big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM (
    SELECT t[i - 1] AS w1, t[i] AS w2
    FROM (SELECT t, unnest(range(2, len(t) + 1)) AS i FROM lm_train)
  ) GROUP BY w1, w2
), lm_hist AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm_big GROUP BY w1
), lm_scalars AS (
  SELECT CAST(sum(cu) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v
  FROM lm_uni
), lm_doc_big AS (
  SELECT {id_col}, w1, w2, CAST(count(*) AS BIGINT) AS k
  FROM (
    SELECT {id_col}, t[i - 1] AS w1, t[i] AS w2
    FROM (SELECT {id_col}, t, unnest(range(2, len(t) + 1)) AS i FROM lm_toked)
  ) GROUP BY {id_col}, w1, w2
), lm_scored AS (
  SELECT d.{id_col},
         CAST(sum(d.k) AS BIGINT) AS n_bigrams,
         round(sum(d.k * -ln(
             {l2} * CASE WHEN h.c1 > 0 THEN coalesce(b.c12, 0) / h.c1 ELSE 0 END
           + {l1} * coalesce(u.cu / s.n, 0)
           + {l0} / (s.v + 1)
         )) / sum(d.k), 6) AS xent
  FROM lm_doc_big d
  LEFT JOIN lm_big b USING (w1, w2)
  LEFT JOIN lm_hist h USING (w1)
  LEFT JOIN lm_uni u ON d.w2 = u.w
  CROSS JOIN lm_scalars s
  GROUP BY d.{id_col}
)
SELECT t.{id_col},
       CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       sc.xent,
       round(exp(sc.xent), 6) AS ppl
FROM lm_toked t LEFT JOIN lm_scored sc USING ({id_col})
"""
