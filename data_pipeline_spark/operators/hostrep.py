"""Host/domain reputation rollup: per-host corpus quality facts and a
keep/review/block curation verdict.

Web-scale curation pipelines decide at DOMAIN granularity before document
granularity — a host whose pages are mostly exact duplicates or mostly
low-quality text gets blocked or down-sampled wholesale (cf. the UT1/
Gopher-style domain gating in published corpus pipelines). This rollup
produces, per host:

* ``n_docs``           documents observed
* ``avg_quality``      mean heuristic quality score (functions/textstats)
* ``dup_ratio``        fraction of docs whose exact text fingerprint
                       occurs more than once CORPUS-WIDE (cross-host
                       mirrors count against both hosts)
* ``top_lang``         most frequent predicted language (lang-id n-gram
                       heuristic; ties broken lexicographically)
* ``top_lang_share``   its share of the host's docs
* ``verdict``          'block' | 'review' | 'keep' from the thresholds

Plan shape at 10^10 docs: ONE map-side-combinable hash agg over text
fingerprints (a mirror page on 10^6 hosts collapses per partition before
the shuffle), a fingerprint-keyed equi-join back (AQE splits hot
fingerprints), then two keyed hash aggs — (host, lang) counts and the
host rollup; the top-lang pick is a min(struct(-count, lang)) per host,
not a window over all docs. No all-pairs, no per-row Python, no collect.

Verdicts compare ROUNDED (4 dp) aggregates so the decision is identical
in the DuckDB twin (float summation-order noise cannot flip a verdict
without also flipping the value hash).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import textstats as TS

# Thresholds (rounded-value comparisons; mirrored verbatim in the twin).
BLOCK_DUP_RATIO = 0.5
REVIEW_DUP_RATIO = 0.2
REVIEW_AVG_QUALITY = 0.35

_VERDICT_SQL = (
    "CASE WHEN dup_ratio >= {block_dup} THEN 'block' "
    "WHEN dup_ratio >= {review_dup} OR avg_quality < {review_q} "
    "THEN 'review' ELSE 'keep' END"
)


def host_reputation(
    df: DataFrame, host_col: str, text_col: str
) -> DataFrame:
    """Per-host reputation rollup (see module docstring for columns)."""
    # coalesce: a NULL text fingerprints to NULL, and NULL keys never
    # equi-join -- those docs would silently vanish from the rollup (a
    # host of all-failed extractions got NO verdict instead of 'review').
    # Empty-string text groups together, which is the right dup semantics.
    fp = TS.fingerprint(F.coalesce(F.col(text_col), F.lit(""))).alias("_fp")
    d = df.select(
        F.col(host_col).alias("host"),
        fp,
        TS.quality_score(F.col(text_col)).alias("_q"),
        TS.lang_id(F.col(text_col)).alias("_lang"),
    )
    fp_counts = d.groupBy("_fp").agg(F.count("*").alias("_fpn"))
    docs = d.join(fp_counts, "_fp").select(
        "host", "_q", "_lang", (F.col("_fpn") > 1).cast("int").alias("_dup")
    )
    rollup = docs.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("_q"), 4).alias("avg_quality"),
        F.round(F.avg("_dup"), 4).alias("dup_ratio"),
    )
    lang_counts = docs.groupBy("host", "_lang").agg(F.count("*").alias("_n"))
    top_lang = lang_counts.groupBy("host").agg(
        F.min(
            F.struct((-F.col("_n")).alias("nn"), F.col("_lang").alias("l"))
        ).alias("_m"),
        F.sum("_n").alias("_tot"),
    ).select(
        "host",
        F.col("_m.l").alias("top_lang"),
        F.round(-F.col("_m.nn") / F.col("_tot"), 4).alias("top_lang_share"),
    )
    verdict = _VERDICT_SQL.format(
        block_dup=BLOCK_DUP_RATIO,
        review_dup=REVIEW_DUP_RATIO,
        review_q=REVIEW_AVG_QUALITY,
    )
    return rollup.join(top_lang, "host").select(
        "host", "n_docs", "avg_quality", "dup_ratio", "top_lang",
        "top_lang_share", F.expr(verdict).alias("verdict"),
    )


def sql_host_reputation(input_sql: str, host_col: str, text_col: str) -> str:
    """DuckDB twin (same fingerprints/score/lang-id constants, same
    rounded-threshold verdict; top lang via min over (-count, lang))."""
    verdict = _VERDICT_SQL.format(
        block_dup=BLOCK_DUP_RATIO,
        review_dup=REVIEW_DUP_RATIO,
        review_q=REVIEW_AVG_QUALITY,
    )
    return f"""
WITH hr_docs AS (
  SELECT {host_col} AS host,
         {TS.sql_fingerprint(f'coalesce({text_col}, %r)' % '')} AS _fp,
         {TS.sql_quality_score(text_col)} AS _q,
         {TS.sql_lang_id(text_col)} AS _lang
  FROM ({input_sql})
), hr_fpn AS (
  SELECT _fp, count(*) AS _fpn FROM hr_docs GROUP BY _fp
), hr_flagged AS (
  SELECT d.host, d._q, d._lang,
         CASE WHEN f._fpn > 1 THEN 1 ELSE 0 END AS _dup
  FROM hr_docs d JOIN hr_fpn f USING (_fp)
), hr_rollup AS (
  SELECT host, count(*) AS n_docs,
         round(avg(_q), 4) AS avg_quality,
         round(avg(_dup), 4) AS dup_ratio
  FROM hr_flagged GROUP BY host
), hr_lang AS (
  SELECT host, _lang, count(*) AS _n FROM hr_flagged GROUP BY host, _lang
), hr_top AS (
  SELECT host,
         struct_extract(min(row(-_n, _lang)), 2) AS top_lang,
         round(-struct_extract(min(row(-_n, _lang)), 1)
               / (sum(_n) * 1.0), 4) AS top_lang_share
  FROM hr_lang GROUP BY host
)
SELECT r.host, r.n_docs, r.avg_quality, r.dup_ratio,
       t.top_lang, t.top_lang_share,
       {verdict} AS verdict
FROM hr_rollup r JOIN hr_top t USING (host)
"""
