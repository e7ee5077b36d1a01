"""Exact repeated-span (substring) dedup across the corpus.

The LLM-training-data operator from Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" (arXiv:2107.06499,
"ExactSubstr"): any span of >= k consecutive tokens that occurs more than
once in the whole corpus is removed from every document except the span's
first occurrence.  The paper builds a corpus-wide suffix array on one big
machine; this module re-expresses the same semantics Spark-first with
hashing, which distributes:

* tokenize each document (whitespace), emit every k-token window with its
  0-based position — a NARROW map (explode factor ~= tokens per doc, no
  shuffle);
* fingerprint each window (md5 of the joined tokens) and find fingerprints
  with more than one occurrence in ONE map-side-combinable hash
  aggregation — a boilerplate sentence on 10^9 pages collapses to one row
  per partition before the shuffle, exactly like
  :func:`~data_pipeline_spark.operators.textdedup.line_dedup`;
* keep each duplicated span's first occurrence (min (doc id, position));
  every other occurrence marks its k covered token positions for removal
  via a fingerprint-keyed equi-join (AQE skew-join splits hot
  fingerprints) — never an all-pairs comparison;
* rebuild each document from its surviving tokens in original order.

Differences from the suffix-array formulation, by design:

* spans are k-token windows, so a duplicated run of length m >= k is
  covered by its m - k + 1 overlapping windows — removal of the full run
  falls out of the per-window marking (the union of covered positions IS
  the run);
* self-overlapping repeats inside one document ("x x x" with k=2) keep
  only the first window's tokens; later overlapping windows are removed
  even where they overlap the kept window — deterministic, and identical
  in the DuckDB twin;
* documents are rebuilt from the surviving token stream with NEWLINES
  preserved: each token rejoins prefixed by a single '\\n' when the
  whitespace run that originally preceded it contained a newline, else a
  single space (horizontal whitespace runs collapse; fingerprints are
  whitespace-insensitive either way). Line structure must survive because
  downstream line-based quality rules (dup_line_frac, Gopher's per-line
  heuristics) judge the post-strip text — a rebuild that flattened the
  document to one line would silently disable them.

Reference parity: the reference pipeline has no substring dedup (its dedup
is per-key LWW, /root/reference/src/stores/mod.rs); this operator is part
of the beyond-reference training-data family (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(col: Column) -> Column:
    """Whitespace tokens with empties dropped (array<string>)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit(""))


def _sql_tokens(col: str) -> str:
    """DuckDB twin of :func:`_tokens`."""
    return (
        f"list_filter(string_split_regex(trim({col}), '\\s+'), t -> t <> '')"
    )


def _tokens_with_sep(col: Column) -> Column:
    """array<struct<tok,nl>>: same token stream as :func:`_tokens` (one
    entry per ``\\S+`` run, same order — positions align), plus whether the
    whitespace run PRECEDING the token contained a newline. Drives the
    newline-preserving rebuild."""
    return F.transform(
        F.regexp_extract_all(col, F.lit(r"(\s*)(\S+)"), 0),
        lambda w: F.struct(
            F.regexp_replace(w, r"^\s+", "").alias("tok"),
            F.regexp_extract(w, r"^(\s*)", 1).contains("\n").alias("nl"),
        ),
    )


def span_occurrences(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Every k-token window: (_id, _p 0-based position, _g joined gram).

    Narrow map: split + one ``transform(sequence(...))`` explode per doc.
    Documents shorter than k tokens emit nothing.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = df.select(
        F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("_toks")
    )
    return (
        toks.where(F.size("_toks") >= k)
        .select(
            "_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_toks) - {k}), p -> "
                    f"named_struct('p', p, "
                    f"'g', array_join(slice(_toks, p + 1, {k}), ' ')))"
                )
            ).alias("_o"),
        )
        .select("_id", F.col("_o.p").alias("_p"), F.col("_o.g").alias("_g"))
    )


def dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_occs: int = 2,
) -> DataFrame:
    """Report duplicated k-token spans: (gram, n_docs, n_occs, first_doc).

    One hash aggregation over the window stream; ``first_doc`` is the
    smallest document id containing the span (the winner
    :func:`span_dedup` preserves).  Grouping is by the gram text so the
    report is readable; the strip path groups by md5 fingerprint (at
    10^10 windows you never shuffle k*words of text per row).
    """
    occ = span_occurrences(df, id_col, text_col, k)
    return (
        occ.groupBy(F.col("_g").alias("gram"))
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count("*").alias("n_occs"),
            F.min("_id").alias("first_doc"),
        )
        .where(F.col("n_occs") >= min_occs)
    )


def sql_dup_spans(
    input_sql: str, id_col: str, text_col: str, k: int = 5, min_occs: int = 2
) -> str:
    """DuckDB twin of :func:`dup_spans`."""
    return f"""
WITH ds_tok AS (
  SELECT {id_col} AS _id, {_sql_tokens(text_col)} AS _toks FROM ({input_sql})
), ds_pos AS (
  SELECT _id, _toks, unnest(range(0, len(_toks) - {k} + 1)) AS _p
  FROM ds_tok WHERE len(_toks) >= {k}
)
SELECT array_to_string(_toks[_p + 1 : _p + {k}], ' ') AS gram,
       count(DISTINCT _id) AS n_docs,
       count(*) AS n_occs,
       min(_id) AS first_doc
FROM ds_pos
GROUP BY 1
HAVING count(*) >= {min_occs}
"""


def span_dedup(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """ExactSubstr removal: strip every duplicated k-token span occurrence
    except the corpus-wide first (min (doc id, position)); return
    (id_col, text_col) with documents rebuilt from surviving tokens,
    newline structure preserved (see module docstring).

    Plan shape: windows (narrow map) -> ONE map-side-combinable hash agg
    on the md5 fingerprint (occurrence count + first occurrence via
    min(struct(id, p))) -> fingerprint equi-join marks losing occurrences
    -> position explode + distinct marks covered token indexes -> one
    left_anti join + per-doc ordered reassembly.  No all-pairs anywhere;
    every shuffle is keyed (fingerprint, then (doc, position), then doc).
    """
    occ = span_occurrences(df, id_col, text_col, k).withColumn(
        "_fp", F.md5("_g")
    )
    dup_first = (
        occ.groupBy("_fp")
        .agg(
            F.count("*").alias("_n"),
            F.min(
                F.struct(F.col("_id").alias("i"), F.col("_p").alias("x"))
            ).alias("_m"),
        )
        .where(F.col("_n") > 1)
    )
    losing = (
        occ.join(dup_first, "_fp")
        .where(
            ~(
                (F.col("_id") == F.col("_m.i"))
                & (F.col("_p") == F.col("_m.x"))
            )
        )
        .select("_id", "_p")
    )
    removed = losing.select(
        "_id", F.explode(F.expr(f"sequence(_p, _p + {k - 1})")).alias("_ti")
    ).distinct()
    tokpos = (
        df.select(
            F.col(id_col).alias("_id"),
            _tokens_with_sep(F.col(text_col)).alias("_toks"),
        )
        .select("_id", F.posexplode("_toks").alias("_ti", "_t"))
        .select(
            "_id", "_ti",
            F.col("_t.tok").alias("_tok"), F.col("_t.nl").alias("_nl"),
        )
    )
    # every token rejoins prefixed by its original separator class
    # ('\n' vs ' '); the leading prefix of the first survivor is trimmed
    assembled = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_ti", "_nl", "_tok"))),
            lambda s: F.concat(
                F.when(s["_nl"], F.lit("\n")).otherwise(F.lit(" ")),
                s["_tok"],
            ),
        ),
        "",
    )
    rebuilt = (
        tokpos.join(removed, ["_id", "_ti"], "left_anti")
        .groupBy("_id")
        .agg(F.regexp_replace(assembled, r"^\s+", "").alias("_text"))
    )
    return (
        df.select(id_col)
        .distinct()
        .join(rebuilt.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col, F.coalesce(F.col("_text"), F.lit("")).alias(text_col)
        )
    )


def sql_span_dedup(
    input_sql: str, id_col: str, text_col: str, k: int = 5
) -> str:
    """DuckDB twin of :func:`span_dedup` (window row_number picks the same
    first occurrence as Spark's min(struct(id, p)); the rebuild is the
    same newline-preserving separator-class rejoin)."""
    return f"""
WITH sd_tok AS (
  SELECT {id_col} AS _id, {_sql_tokens(text_col)} AS _toks,
         regexp_extract_all({text_col}, '(\\s*)(\\S+)', 0) AS _ws
  FROM ({input_sql})
), sd_pos AS (
  SELECT _id, _toks, unnest(range(0, len(_toks) - {k} + 1)) AS _p
  FROM sd_tok WHERE len(_toks) >= {k}
), sd_gram AS (
  SELECT _id, _p, md5(array_to_string(_toks[_p + 1 : _p + {k}], ' ')) AS _fp
  FROM sd_pos
), sd_marked AS (
  SELECT _id, _p,
         count(*) OVER (PARTITION BY _fp) AS _n,
         row_number() OVER (PARTITION BY _fp ORDER BY _id, _p) AS _rn
  FROM sd_gram
), sd_removed AS (
  SELECT DISTINCT _id, _ti FROM (
    SELECT _id, unnest(range(_p, _p + {k})) AS _ti
    FROM sd_marked WHERE _n > 1 AND _rn > 1)
), sd_tokpos AS (
  SELECT _id, unnest(range(0, len(_ws))) AS _ti, _ws FROM sd_tok
), sd_kept AS (
  SELECT t._id, t._ti,
         regexp_replace(t._ws[t._ti + 1], '^\\s+', '') AS _tok,
         contains(regexp_extract(t._ws[t._ti + 1], '^(\\s*)', 1), chr(10)) AS _nl
  FROM sd_tokpos t
  LEFT JOIN sd_removed r ON t._id = r._id AND t._ti = r._ti
  WHERE r._ti IS NULL
), sd_rebuilt AS (
  SELECT _id, regexp_replace(
           string_agg(CASE WHEN _nl THEN chr(10) ELSE ' ' END || _tok,
                      '' ORDER BY _ti),
           '^\\s+', '') AS _text
  FROM sd_kept GROUP BY _id
)
SELECT d.{id_col}, coalesce(r._text, '') AS {text_col}
FROM (SELECT DISTINCT {id_col} FROM ({input_sql})) d
LEFT JOIN sd_rebuilt r ON d.{id_col} = r._id
"""
