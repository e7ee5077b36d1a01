"""Within-document repetition metrics and Gopher-style quality rules.

Training-data curation needs per-document *repetition* signals (boilerplate
and spam pages repeat themselves) and a *rule filter* in the style of the
Gopher paper (Rae et al. 2021, §A1.1 "Quality filtering") — word-count
bounds, mean word length, symbol ratios, bullet/ellipsis line fractions,
alphabetic-word fraction, stopword floor. All of it is expressible as
native Column expressions (zero Python UDFs), so it runs inside
whole-stage codegen and the filter predicate is just a boolean column.

Two layers:

- **Row-local expressions** — `dup_line_frac`, `dup_ngram_frac`,
  `gopher_flags`/`gopher_pass`: linear per document, computed straight in
  the projection. These take a *column name* (not a Column) because the
  Spark side is built with SQL-parsed lambdas via ``F.expr`` — the safe
  form for higher-order functions in PySpark 4.1, where two python-lambda
  HOFs under one expression tree mis-bind their lambda variables (see
  ``operators/textdedup.py`` and the P10 note in ``functions/parse.py``).
- **`repetition_stats`** — adds the top-n-gram character fraction, which
  needs a per-(doc, gram) count: explode → map-side-combinable hash agg →
  per-doc max(struct) → broadcast-size join back. Never materializes a
  per-doc gram map in one row, so a pathological 100 MB document can't
  blow a single task.

Every expression has a DuckDB twin (`sql_*`) generated from the same
constants, which is what the driver's oracle gate runs.

Reference: the reference repo has no quality filtering at all (its only
text gate is the validation filter H14/P14); this family is a round-2
LLM-data-pipeline extension per the task brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .textstats import EDGE_WS_RE, STOPWORDS, WS_SPLIT_RE, _sql_in_list

# ---------------------------------------------------------------------------
# Shared constants (regexes are RAW — dialect quoting applied per engine).
# The tokenizer regexes come from textstats so quality metrics and
# token_count/fingerprint share ONE token space.
# ---------------------------------------------------------------------------

WS_RE = WS_SPLIT_RE
NEWLINE_RE = r"\r?\n"  # CRLF corpora must not keep '\r' glued to lines
BULLET_RE = r"^[-*•‣▪]"  # -, *, •, ‣, ▪
ELLIPSIS_RE = r"(\.\.\.|…)$"  # ... or …
ALPHA_RE = r"[A-Za-z]"
HASH_SYMBOL_RE = r"#"
ELLIPSIS_SYMBOL_RE = r"(\.\.\.|…)"

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2

FLAG_NAMES = (
    "word_count_ok",
    "mean_word_len_ok",
    "symbol_ratio_ok",
    "bullet_lines_ok",
    "ellipsis_lines_ok",
    "alpha_words_ok",
    "stopwords_ok",
)


def _sq(regex: str) -> str:
    """Raw regex → Spark-SQL string literal (backslashes are escapes)."""
    return "'" + regex.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _dq(regex: str) -> str:
    """Raw regex → DuckDB string literal (backslashes are literal)."""
    return "'" + regex.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# Dialect expression builders. Each returns an expression STRING; the Spark
# side is wrapped in F.expr by the public API below.
# ---------------------------------------------------------------------------

def _edge_trim(expr: str, duck: bool) -> str:
    """Strip ALL edge whitespace (SQL trim() is space-only — a leading
    newline/tab would otherwise make phantom empty tokens/lines)."""
    if duck:
        return f"regexp_replace({expr}, {_dq(EDGE_WS_RE)}, '', 'g')"
    return f"regexp_replace({expr}, {_sq(EDGE_WS_RE)}, '')"


def _tokens(col: str, duck: bool) -> str:
    """Whitespace tokens, empty text → empty array (textstats semantics).

    The duck branch IS textstats.sql_tokens — one construction, not a
    hand-synced copy, so the quality twins and the textstats twins can
    never fork the shared token space."""
    if duck:
        from .textstats import sql_tokens

        return sql_tokens(col)
    t = _edge_trim(col, duck)
    return (
        f"CASE WHEN length({t}) = 0 THEN CAST(array() AS array<string>) "
        f"ELSE split({t}, {_sq(WS_RE)}) END"
    )


def _lines(col: str, duck: bool) -> str:
    """Non-empty whitespace-trimmed lines (CRLF-safe)."""
    if duck:
        return (
            f"list_filter(list_transform(string_split_regex({col}, {_dq(NEWLINE_RE)}), "
            f"x -> {_edge_trim('x', duck)}), x -> x <> '')"
        )
    return (
        f"filter(transform(split({col}, {_sq(NEWLINE_RE)}), "
        f"x -> {_edge_trim('x', duck)}), x -> x <> '')"
    )


def _ngrams(col: str, n: int, duck: bool) -> str:
    """Space-joined word n-grams; fewer than n tokens → empty array."""
    t = _tokens(col, duck)
    if n == 1:
        return t
    if duck:
        return (
            f"CASE WHEN len({t}) < {n} THEN []::VARCHAR[] "
            f"ELSE list_transform(range(1, len({t}) - {n} + 2), "
            f"i -> array_to_string(list_slice({t}, i, i + {n} - 1), ' ')) END"
        )
    # sequence(1, k) with k < 1 would generate a DESCENDING sequence in
    # Spark, so the short-text case must be guarded, not clamped.
    return (
        f"CASE WHEN size({t}) < {n} THEN CAST(array() AS array<string>) "
        f"ELSE transform(sequence(1, size({t}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({t}, i, {n}))) END"
    )


def _dup_frac(arr: str, duck: bool) -> str:
    """1 - distinct/total over an array; empty → 0.0. Rounded to 6."""
    size, dedup = ("len", "list_distinct") if duck else ("size", "array_distinct")
    return (
        f"CASE WHEN {size}({arr}) = 0 THEN 0.0 "
        f"ELSE round(1.0 - CAST({size}({dedup}({arr})) AS double) / {size}({arr}), 6) END"
    )


def _regexp_count(col: str, regex: str, duck: bool) -> str:
    if duck:
        return f"len(regexp_extract_all({col}, {_dq(regex)}))"
    return f"regexp_count({col}, {_sq(regex)})"


def _frac(num: str, den: str, duck: bool) -> str:
    """num/den as double, den floored at 1, rounded to 6."""
    return f"round(CAST({num} AS double) / greatest({den}, 1), 6)"


def _match_frac(arr: str, regex: str, duck: bool) -> str:
    """Fraction of array elements matching regex (0 if empty)."""
    if duck:
        kept = f"len(list_filter({arr}, x -> regexp_matches(x, {_dq(regex)})))"
        return _frac(kept, f"len({arr})", duck)
    kept = f"size(filter({arr}, x -> x rlike {_sq(regex)}))"
    return _frac(kept, f"size({arr})", duck)


def _mean_word_len(col: str, duck: bool) -> str:
    t = _tokens(col, duck)
    if duck:
        total = f"coalesce(list_sum(list_transform({t}, x -> length(x))), 0)"
        return (
            f"CASE WHEN len({t}) = 0 THEN 0.0 "
            f"ELSE round(CAST({total} AS double) / len({t}), 6) END"
        )
    total = f"aggregate({t}, 0, (a, x) -> a + length(x))"
    return (
        f"CASE WHEN size({t}) = 0 THEN 0.0 "
        f"ELSE round(CAST({total} AS double) / size({t}), 6) END"
    )


def _stopword_count(col: str, duck: bool) -> str:
    t = _tokens(f"lower({col})", duck)
    inlist = _sql_in_list(STOPWORDS)
    if duck:
        return f"len(list_filter({t}, x -> x IN ({inlist})))"
    return f"size(filter({t}, x -> x IN ({inlist})))"


def _gopher_flag_exprs(col: str, duck: bool) -> dict[str, str]:
    t = _tokens(col, duck)
    ln = _lines(col, duck)
    size = "len" if duck else "size"
    nw = f"{size}({t})"
    symbols = (
        f"({_regexp_count(col, HASH_SYMBOL_RE, duck)}"
        f" + {_regexp_count(col, ELLIPSIS_SYMBOL_RE, duck)})"
    )
    alpha = (
        f"len(list_filter({t}, x -> regexp_matches(x, {_dq(ALPHA_RE)})))"
        if duck
        else f"size(filter({t}, x -> x rlike {_sq(ALPHA_RE)}))"
    )
    mwl = _mean_word_len(col, duck)
    return {
        "word_count_ok": f"({nw} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})",
        "mean_word_len_ok": (
            f"({mwl} BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} "
            f"AND {GOPHER_MAX_MEAN_WORD_LEN})"
        ),
        "symbol_ratio_ok": (
            f"({_frac(symbols, nw, duck)} <= {GOPHER_MAX_SYMBOL_WORD_RATIO})"
        ),
        "bullet_lines_ok": (
            f"({_match_frac(ln, BULLET_RE, duck)} <= {GOPHER_MAX_BULLET_LINE_FRAC})"
        ),
        "ellipsis_lines_ok": (
            f"({_match_frac(ln, ELLIPSIS_RE, duck)} <= {GOPHER_MAX_ELLIPSIS_LINE_FRAC})"
        ),
        "alpha_words_ok": (
            f"({_frac(alpha, nw, duck)} >= {GOPHER_MIN_ALPHA_WORD_FRAC})"
        ),
        "stopwords_ok": f"({_stopword_count(col, duck)} >= {GOPHER_MIN_STOPWORDS})",
    }


# ---------------------------------------------------------------------------
# Public Spark API (column-name in, Column out)
# ---------------------------------------------------------------------------

def dup_line_frac(col: str) -> Column:
    """Fraction of non-empty trimmed lines that repeat an earlier line."""
    return F.expr(_dup_frac(_lines(col, duck=False), duck=False))


def dup_ngram_frac(col: str, n: int) -> Column:
    """Fraction of word n-grams that are duplicates (0 if < n tokens)."""
    return F.expr(_dup_frac(_ngrams(col, n, duck=False), duck=False))


def gopher_flags(col: str) -> dict[str, Column]:
    """Per-rule boolean columns, declaration order = FLAG_NAMES."""
    return {k: F.expr(v) for k, v in _gopher_flag_exprs(col, duck=False).items()}


def gopher_pass(col: str) -> Column:
    """AND of all Gopher rules — the keep/drop filter predicate."""
    exprs = _gopher_flag_exprs(col, duck=False)
    return F.expr(" AND ".join(exprs[k] for k in FLAG_NAMES))


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document repetition profile.

    Columns: dup_line_frac, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
    top_ngram_char_frac (chars covered by the single most frequent word
    n-gram / total chars, capped at 1 — the Gopher §A1.1 signal).

    Scale shape: the row-local fractions ride the projection; the top-gram
    pass is explode → (id, gram) hash count (map-side combinable) →
    per-id max(struct(count, gram)) → join back on id. No per-doc state
    ever exceeds one (gram, count) pair past the first aggregation.
    """
    base = df.select(
        id_col,
        dup_line_frac(text_col).alias("dup_line_frac"),
        dup_ngram_frac(text_col, 1).alias("dup_word_frac"),
        dup_ngram_frac(text_col, 2).alias("dup_2gram_frac"),
        dup_ngram_frac(text_col, 3).alias("dup_3gram_frac"),
        F.length(text_col).cast("long").alias("_n_chars"),
    )
    grams = df.select(
        id_col, F.explode(F.expr(_ngrams(text_col, n, duck=False))).alias("g")
    )
    counts = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    # max over struct(c, g): highest count, ties to the greatest gram —
    # deterministic in both engines (binary string comparison).
    top = counts.groupBy(id_col).agg(
        F.max(F.struct(F.col("c"), F.col("g"))).alias("m")
    ).select(
        id_col, (F.col("m.c") * F.length("m.g")).alias("_top_chars")
    )
    return (
        base.join(top, id_col, "left")
        .select(
            id_col,
            "dup_line_frac",
            "dup_word_frac",
            "dup_2gram_frac",
            "dup_3gram_frac",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.coalesce(F.col("_top_chars"), F.lit(0)).cast("double")
                    / F.greatest(F.col("_n_chars"), F.lit(1)),
                ),
                6,
            ).alias("top_ngram_char_frac"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------

def sql_dup_line_frac(col: str) -> str:
    return _dup_frac(_lines(col, duck=True), duck=True)


def sql_dup_ngram_frac(col: str, n: int) -> str:
    return _dup_frac(_ngrams(col, n, duck=True), duck=True)


def sql_gopher_flags(col: str) -> dict[str, str]:
    return _gopher_flag_exprs(col, duck=True)


def sql_gopher_pass(col: str) -> str:
    exprs = _gopher_flag_exprs(col, duck=True)
    return "(" + " AND ".join(exprs[k] for k in FLAG_NAMES) + ")"


def sql_repetition_stats(
    input_sql: str, id_col: str, text_col: str, n: int = 2
) -> str:
    """Twin of repetition_stats over an input relation (SQL string)."""
    return f"""
WITH repq_base AS (
  SELECT {id_col},
         {sql_dup_line_frac(text_col)} AS dup_line_frac,
         {sql_dup_ngram_frac(text_col, 1)} AS dup_word_frac,
         {sql_dup_ngram_frac(text_col, 2)} AS dup_2gram_frac,
         {sql_dup_ngram_frac(text_col, 3)} AS dup_3gram_frac,
         length({text_col}) AS _n_chars
  FROM ({input_sql})
), repq_grams AS (
  SELECT {id_col}, unnest({_ngrams(text_col, n, duck=True)}) AS g
  FROM ({input_sql})
), repq_counts AS (
  SELECT {id_col}, g, count(*) AS c FROM repq_grams GROUP BY {id_col}, g
), repq_top AS (
  SELECT {id_col}, c * length(g) AS _top_chars FROM (
    SELECT *, row_number() OVER (
      PARTITION BY {id_col} ORDER BY c DESC, g DESC) AS rn
    FROM repq_counts) WHERE rn = 1
)
SELECT b.{id_col}, b.dup_line_frac, b.dup_word_frac, b.dup_2gram_frac,
       b.dup_3gram_frac,
       round(least(1.0, CAST(coalesce(t._top_chars, 0) AS double)
                        / greatest(b._n_chars, 1)), 6) AS top_ngram_char_frac
FROM repq_base b LEFT JOIN repq_top t USING ({id_col})
"""
