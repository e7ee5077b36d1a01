"""Per-url content-change magnitude + epoch-over-epoch corpus drift.

Two observability operators a CDC-over-crawls engine needs beyond the
boolean "did the digest change" signal (operators/recrawl.py):

1. ``version_deltas`` — HOW MUCH each new capture of a url changed vs its
   previous capture: token-set Jaccard similarity, token-count delta, and
   a churn class (new / unchanged / minor / major / rewrite). This is the
   signal that separates a template tweak (ads rotated, timestamps
   re-rendered: similarity ~0.95) from a real content update, and it
   feeds recrawl scheduling, storage-dedup policy (skip near-identical
   re-ships before the merge), and corpus QA. The reference has no
   counterpart (it overwrites blindly, minio_client.rs:219-228); this is
   the round-3 web-scale extension of its "latest wins" rule.

2. ``corpus_drift`` — distribution shift between consecutive ingest
   epochs: Jensen-Shannon divergence of the unigram token distributions,
   plus new-token (OOV) and lost-token mass. At 10^10 events/epoch this is
   the cheapest early-warning that a crawl batch changed character
   (language mix flipped, a spam network landed, an extractor regressed)
   BEFORE the batch pollutes downstream training data.

Scale posture (the part that must survive 100 TB):

- ``version_deltas`` is ONE keyed window shuffle (lag of the token set per
  url) over arrays of distinct tokens — the same shape as the recrawl
  change-flag pass. ``hashed=True`` shuffles 64-bit xxhash64 token ids
  instead of strings (~5-10x fewer bytes on prose; Jaccard is unchanged
  barring 2^-64 collisions) — use it at scale, keep strings for oracles.
- ``corpus_drift`` never joins epochs pairwise and never collects the
  vocabulary: per-(epoch, token) counts come from one map-side-combinable
  hash agg; each epoch's counts feed BOTH its own pair and the next
  epoch's pair via a union + second keyed agg (still one shuffle, token
  keyed); pair totals are a tiny per-pair aggregate broadcast back. Hot
  tokens ("the") collapse map-side before any shuffle.

Both are pure native Column expressions — no Python in the hot path; the
DuckDB twins in __spark_entry__ are generated from the same textstats
token regexes, so the driver checks true cross-engine parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from data_pipeline_spark.functions import textstats as TS

# Churn thresholds on raw (un-rounded) Jaccard — integer-ratio doubles are
# bit-identical across engines, so the class never flips cross-engine.
MINOR_MIN = 0.7
MAJOR_MIN = 0.3


def version_token_sets(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    text: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Narrow map: per capture, the DISTINCT lowercase whitespace-token set
    of the payload (textstats.tokens semantics — the twin-checked
    tokenizer) plus a deterministic tie-break fingerprint. ``hashed``
    replaces each token with its xxhash64 (longs shuffle ~5-10x smaller
    than prose tokens; set semantics are unchanged barring 2^-64
    collisions — pinned by tests/test_contentdelta.py parity)."""
    # NULL payloads (a fetch that produced nothing) count as the EMPTY
    # token set, exactly like empty-string text — without the coalesce,
    # lag(toks) after a NULL capture is NULL and the next capture would
    # misreport churn='new' on a url that has history.
    toks = F.coalesce(
        F.array_distinct(TS.tokens(F.lower(F.col(text)))),
        F.array().cast("array<string>"),
    )
    if hashed:
        toks = F.transform(toks, lambda t: F.xxhash64(t))
    return df.select(
        F.col(key),
        F.col(ts),
        toks.alias("toks"),
        TS.fingerprint(F.col(text)).alias("__fp"),
    )


def version_deltas(
    df: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    text: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Per capture: change magnitude vs the PREVIOUS capture of the same
    url. One keyed window shuffle; ties on ``ts`` break by content
    fingerprint so lag order is deterministic under duplicate timestamps
    (same rule as recrawl.capture_change_flags).

    Columns: key, ts, n_tokens (distinct), token_delta (vs prev; null on
    first), jaccard (token-set similarity vs prev, 6dp; null on first;
    1.0 when both sets are empty), churn:
      'new'        first capture of the url
      'unchanged'  identical token set (exact, not threshold)
      'minor'      jaccard >= 0.7   (template noise, small edits)
      'major'      jaccard >= 0.3   (substantial rewrite)
      'rewrite'    jaccard <  0.3   (effectively a different page)
    """
    v = version_token_sets(df, key, ts, text, hashed)
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col("__fp"))
    prev = F.lag("toks").over(w)
    n_inter = F.size(F.array_intersect(F.col("toks"), prev))
    n_union = F.size(F.array_union(F.col("toks"), prev))
    jac = F.when(n_union == 0, F.lit(1.0)).otherwise(
        n_inter.cast("double") / n_union
    )
    n_tok = F.size("toks").cast("long")
    out = v.select(
        F.col(key),
        F.col(ts),
        n_tok.alias("n_tokens"),
        (n_tok - F.lag(F.size("toks").cast("long")).over(w)).alias("token_delta"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(F.round(jac, 6))
        .alias("jaccard"),
        F.when(prev.isNull(), F.lit("new"))
        .when(n_inter == n_union, F.lit("unchanged"))
        .when(jac >= MINOR_MIN, F.lit("minor"))
        .when(jac >= MAJOR_MIN, F.lit("major"))
        .otherwise(F.lit("rewrite"))
        .alias("churn"),
    )
    return out


def token_distribution(
    df: DataFrame, epoch: str = "epoch", text: str = "text"
) -> DataFrame:
    """Unigram occurrence counts per (epoch, token) — one explode + one
    map-side-combinable hash agg. The distribution is over token
    OCCURRENCES (not distinct per doc): that is what shifts when a spam
    network or a language flips the corpus character."""
    return (
        df.select(
            F.col(epoch).cast("long").alias("epoch"),
            F.explode(TS.tokens(F.lower(F.col(text)))).alias("token"),
        )
        .groupBy("epoch", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def corpus_drift(
    df: DataFrame, epoch: str = "epoch", text: str = "text"
) -> DataFrame:
    """Distribution shift per consecutive epoch pair (prev -> cur).

    For each epoch e with a predecessor e-1 present in the data:
      js_divergence  Jensen-Shannon divergence (nats, 0..ln 2) between the
                     unigram distributions of e-1 and e
      oov_mass       probability mass of e's tokens unseen in e-1
      lost_mass      probability mass of e-1's tokens absent from e
      cur_tokens / prev_tokens    occurrence totals
      cur_vocab / prev_vocab / new_vocab   distinct-token counts

    Shape: counts agg (token-keyed, map-side combinable) -> union of
    (cur, prev-shifted) -> ONE more token-keyed agg -> tiny per-pair
    totals broadcast back. Epochs are never joined pairwise and the
    vocabulary never leaves the executors."""
    counts = token_distribution(df, epoch, text)
    cur = counts.select(
        F.col("epoch").alias("pair"),
        "token",
        F.col("n").alias("cur_n"),
        F.lit(0).cast("long").alias("prev_n"),
    )
    prev = counts.select(
        (F.col("epoch") + 1).alias("pair"),
        "token",
        F.lit(0).cast("long").alias("cur_n"),
        F.col("n").alias("prev_n"),
    )
    merged = (
        cur.unionByName(prev)
        .groupBy("pair", "token")
        .agg(F.sum("cur_n").alias("cur_n"), F.sum("prev_n").alias("prev_n"))
    )
    totals = merged.groupBy("pair").agg(
        F.sum("cur_n").alias("cur_total"), F.sum("prev_n").alias("prev_total")
    )
    # Pairs where either side is empty are boundary artifacts (the first
    # epoch has no predecessor; the shifted last epoch has no successor).
    totals = totals.filter((F.col("cur_total") > 0) & (F.col("prev_total") > 0))
    j = merged.join(F.broadcast(totals), "pair")
    p = F.col("cur_n").cast("double") / F.col("cur_total")
    q = F.col("prev_n").cast("double") / F.col("prev_total")
    m = (p + q) / 2
    contrib = (
        F.when(F.col("cur_n") > 0, p * F.log(p / m)).otherwise(F.lit(0.0)) * 0.5
        + F.when(F.col("prev_n") > 0, q * F.log(q / m)).otherwise(F.lit(0.0)) * 0.5
    )
    return (
        j.groupBy("pair")
        .agg(
            F.round(F.sum(contrib), 6).alias("js_divergence"),
            F.round(
                F.sum(F.when(F.col("prev_n") == 0, p).otherwise(F.lit(0.0))), 6
            ).alias("oov_mass"),
            F.round(
                F.sum(F.when(F.col("cur_n") == 0, q).otherwise(F.lit(0.0))), 6
            ).alias("lost_mass"),
            F.max("cur_total").alias("cur_tokens"),
            F.max("prev_total").alias("prev_tokens"),
            F.sum((F.col("cur_n") > 0).cast("long")).alias("cur_vocab"),
            F.sum((F.col("prev_n") > 0).cast("long")).alias("prev_vocab"),
            F.sum(
                ((F.col("cur_n") > 0) & (F.col("prev_n") == 0)).cast("long")
            ).alias("new_vocab"),
        )
        .withColumnRenamed("pair", "epoch")
    )
