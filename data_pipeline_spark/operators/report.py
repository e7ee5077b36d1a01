"""Corpus report card: the "datasheet for the dataset" in one pass
(X118).

Every corpus release needs the same dozen numbers — size, token mass
(by a counter that doesn't lie across scripts), language mix, quality
distribution, duplication level, Gopher pass rate — and at 10^10 docs
each ad-hoc notebook query is a full scan. This operator computes the
whole card in ONE aggregation pass over the corpus (a narrow projection
of per-doc signals → one global agg + one per-lang agg), emitting a
tidy long-format frame ``(metric, dimension, value)`` that drops
straight into a dashboard or a release note:

- ``rows`` / ``chars_total`` / ``tokens_ws_total`` / ``tokens_ml_total``
  (whitespace vs script-calibrated X117 — the delta itself is a
  diagnostic: a large gap means unspaced-script mass that whitespace
  budget math would starve);
- ``exact_dup_ratio``: 1 − distinct(fingerprint)/rows (normalized
  text fingerprints, X-family `doc_fingerprint`);
- ``quality_mean`` and ``gopher_pass_rate`` (functions/quality.py's
  rule gate);
- ``lang_share`` per language (dimension = the language).

Everything is native expressions composed from the functions the
contracts already oracle-check (textstats / quality), and the report
itself has a DuckDB twin so the whole card is hash-verifiable.

Reference: no counterpart (the Rust pipeline reports row counts per
run only, src/pipeline/mod.rs logging).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.quality import gopher_pass
from ..functions.textstats import (
    fingerprint,
    multilingual_token_count,
    quality_score,
    token_count,
)

__all__ = ["corpus_report", "per_doc_signals", "sql_corpus_report"]


def per_doc_signals(
    df: DataFrame, text_col: str = "text", lang_col: str | None = "lang"
) -> DataFrame:
    """The narrow per-document projection every report derives from:
    ``(lang?, _chars, _ws, _ml, _q, _gopher, _fp)`` — all native
    expressions (shared with the maintained ReportStore, X119)."""
    t = F.col(text_col)
    return df.select(
        *([F.col(lang_col)] if lang_col else []),
        F.length(t).alias("_chars"),
        token_count(t).alias("_ws"),
        multilingual_token_count(t).alias("_ml"),
        quality_score(t).alias("_q"),
        gopher_pass(text_col).cast("int").alias("_gopher"),
        fingerprint(t).alias("_fp"),
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """``(metric string, dimension string, value double)`` — global
    metrics carry dimension 'all'; ``lang_share`` carries the language.
    Values rounded to 6dp. One narrow projection + two hash aggs."""
    per_doc = per_doc_signals(df, text_col, lang_col)
    g = per_doc.agg(
        F.count("*").alias("rows"),
        F.sum("_chars").cast("double").alias("chars_total"),
        F.sum("_ws").cast("double").alias("tokens_ws_total"),
        F.sum("_ml").cast("double").alias("tokens_ml_total"),
        F.avg("_q").alias("quality_mean"),
        F.avg("_gopher").alias("gopher_pass_rate"),
        (
            F.lit(1.0)
            - F.countDistinct("_fp").cast("double") / F.count("*")
        ).alias("exact_dup_ratio"),
    )
    metrics = [
        "rows", "chars_total", "tokens_ws_total", "tokens_ml_total",
        "quality_mean", "gopher_pass_rate", "exact_dup_ratio",
    ]
    long_rows = g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("metric"),
                        F.lit("all").alias("dimension"),
                        F.round(F.col(m).cast("double"), 6).alias("value"),
                    )
                    for m in metrics
                ]
            )
        ).alias("r")
    ).select("r.metric", "r.dimension", "r.value")
    if not lang_col:
        return long_rows
    total = per_doc.count()
    shares = (
        per_doc.groupBy(F.col(lang_col).alias("dimension"))
        .agg(
            F.round(F.count("*").cast("double") / F.lit(float(total)), 6)
            .alias("value")
        )
        .select(F.lit("lang_share").alias("metric"), "dimension", "value")
    )
    return long_rows.unionByName(shares)


def sql_corpus_report(
    input_rel: str,
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> str:
    """DuckDB twin of :func:`corpus_report` (same composed expressions)."""
    from ..functions.quality import sql_gopher_pass
    from ..functions.textstats import (
        sql_fingerprint,
        sql_multilingual_token_count,
        sql_quality_score,
        sql_token_count,
    )

    per_doc = f"""
  SELECT {lang_col + ',' if lang_col else ''}
    length({text_col}) AS _chars,
    {sql_token_count(text_col)} AS _ws,
    {sql_multilingual_token_count(text_col)} AS _ml,
    {sql_quality_score(text_col)} AS _q,
    CASE WHEN {sql_gopher_pass(text_col)} THEN 1 ELSE 0 END AS _gopher,
    {sql_fingerprint(text_col)} AS _fp
  FROM {input_rel}
"""
    globals_sql = """
  SELECT count(*) AS rows,
    CAST(sum(_chars) AS DOUBLE) AS chars_total,
    CAST(sum(_ws) AS DOUBLE) AS tokens_ws_total,
    CAST(sum(_ml) AS DOUBLE) AS tokens_ml_total,
    avg(_q) AS quality_mean,
    avg(_gopher) AS gopher_pass_rate,
    1.0 - CAST(count(DISTINCT _fp) AS DOUBLE) / count(*) AS exact_dup_ratio
  FROM report_docs
"""
    metrics = [
        "rows", "chars_total", "tokens_ws_total", "tokens_ml_total",
        "quality_mean", "gopher_pass_rate", "exact_dup_ratio",
    ]
    rows = "\nUNION ALL\n".join(
        f"SELECT '{m}' AS metric, 'all' AS dimension, "
        f"round(CAST({m} AS DOUBLE), 6) AS value FROM report_globals"
        for m in metrics
    )
    out = f"""
WITH report_docs AS ({per_doc}),
report_globals AS ({globals_sql})
{rows}
"""
    if lang_col:
        out += f"""
UNION ALL
SELECT 'lang_share' AS metric, {lang_col} AS dimension,
  round(CAST(count(*) AS DOUBLE)
        / (SELECT count(*) FROM report_docs), 6) AS value
FROM report_docs GROUP BY {lang_col}
"""
    return out
