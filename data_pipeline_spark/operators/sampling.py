"""Deterministic hash-based (stratified) sampling.

Training-data pipelines mix sources by quota ("2% of Common Crawl, 20% of
books, ..."): the sample must be (a) deterministic across reruns and
engines — a resumable CDC replay cannot re-flip coins per epoch, (b) a
pure per-row predicate — no shuffle, no global state, survives any
partitioning, and (c) consistent for the same key — every replica/version
of a url lands on the same side of the cut, so sampling commutes with
LWW dedup.

Mechanism: ``md5(seed || ':' || key)`` is uniform over hex strings; its
first 8 hex chars compare lexicographically exactly as the 32-bit integer
they encode, so ``prefix < threshold_hex(fraction)`` keeps a ``fraction``
slice of the keyspace with zero engine-specific hashing (md5 is identical
in Spark and DuckDB — same portability trick as operators/textdedup.py).
Different seeds give independent samples; per-stratum thresholds give
stratified quotas via one CASE expression.

Edge encoding: fraction ≥ 1 → threshold ``'g'`` (sorts above every hex
char: keeps all); fraction ≤ 0 → ``'00000000'`` (below every key: keeps
none). The predicate therefore never needs a special case in the plan.

Scale shape: a scan-level filter — pushes into the parquet scan's
post-scan predicate, no shuffle, no UDF, trivially correct at any
parallelism. The reference repo has no sampling; round-2 extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

HEX_SPACE = 16 ** 8  # first 8 md5 hex chars = 32 bits


def threshold_hex(fraction: float) -> str:
    """Fraction of the keyspace → comparable threshold string."""
    n = int(round(fraction * HEX_SPACE))
    if n >= HEX_SPACE:
        # includes fractions rounding UP to 1.0 (e.g. 1 - 1e-12): the
        # 9-char '100000000' would compare lexicographically BELOW most
        # 8-hex keys and silently keep ~6% instead of ~all
        return "g"  # > 'f...' for any hex string: keep everything
    if n <= 0:
        return "00000000"
    return format(n, "08x")


def sample_bucket(key_col: str, seed: str) -> Column:
    """The comparable 8-hex-char bucket of a key (column name in)."""
    return F.expr(_bucket(key_col, seed, duck=False))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash."""
    return df.where(keep_predicate(key_col, fraction, seed))


def keep_predicate(key_col: str, fraction: float, seed: str = "sample") -> Column:
    return F.expr(_predicate(key_col, fraction, seed, duck=False))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Per-stratum quota sampling (e.g. per-language / per-domain mix)."""
    return df.where(
        F.expr(
            _stratified_predicate(
                key_col, stratum_col, fractions, default_fraction, seed,
                duck=False,
            )
        )
    )


# ---------------------------------------------------------------------------
# Dialect builders + DuckDB twins
# ---------------------------------------------------------------------------

def _slit(s: str, duck: bool) -> str:
    """String value → quoted SQL literal (caller-supplied strata/seeds may
    contain quotes; never interpolate them raw)."""
    if duck:
        return "'" + s.replace("'", "''") + "'"
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bucket(key_col: str, seed: str, duck: bool) -> str:
    cast = "VARCHAR" if duck else "string"
    seed_lit = _slit(f"{seed}:", duck)
    return f"substring(md5(concat({seed_lit}, CAST({key_col} AS {cast}))), 1, 8)"


def _predicate(key_col: str, fraction: float, seed: str, duck: bool) -> str:
    return f"({_bucket(key_col, seed, duck)} < '{threshold_hex(fraction)}')"


def _stratified_predicate(
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float,
    seed: str,
    duck: bool,
) -> str:
    whens = " ".join(
        f"WHEN {_slit(s, duck)} THEN '{threshold_hex(f)}'"
        for s, f in fractions.items()
    )
    case = (
        f"CASE {stratum_col} {whens} "
        f"ELSE '{threshold_hex(default_fraction)}' END"
    )
    return f"({_bucket(key_col, seed, duck)} < {case})"


def sql_keep_predicate(key_col: str, fraction: float, seed: str = "sample") -> str:
    return _predicate(key_col, fraction, seed, duck=True)


def sql_stratified_predicate(
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "sample",
) -> str:
    return _stratified_predicate(
        key_col, stratum_col, fractions, default_fraction, seed, duck=True
    )


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    text_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    seed: str = "budget",
) -> DataFrame:
    """Domain mixing by TOKEN budget: per stratum, keep documents in
    deterministic hash order until the stratum's token budget is reached
    ("30B tokens of web, 5B of code"). Fraction-based sampling (above)
    fixes a share of DOCUMENTS; training mixtures are specified in tokens,
    and per-doc token counts vary by orders of magnitude across domains —
    this keeps the spec exact.

    Each stratum keeps every document whose PRECEDING cumulative token
    count is under its budget, so the crossing document is included (the
    realized budget overshoots by at most one document) and a zero budget
    keeps nothing. Order is ``(md5(seed:key), key)`` — deterministic
    across reruns and engines, independent across seeds, and unbiased
    w.r.t. content. Shape: one window cumsum per stratum (a keyed shuffle;
    strata are few) — the same plan class as sequence packing; no
    collect, nothing quadratic.
    """
    from pyspark.sql import Window

    from ..functions.textstats import tokens

    n = F.size(tokens(F.col(text_col))).cast("long")
    base = df.withColumn("_n_tok", n).withColumn(
        "_b", sample_bucket(key_col, seed)
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy("_b", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    whens = F.lit(default_budget).cast("long")
    for s, b in sorted(budgets.items()):
        whens = F.when(F.col(stratum_col) == s, F.lit(b).cast("long")).otherwise(whens)
    kept = (
        base.withColumn("_prev", F.coalesce(F.sum("_n_tok").over(w), F.lit(0)))
        .where(F.col("_prev") < whens)
        .drop("_n_tok", "_b", "_prev")
    )
    return kept


def sql_token_budget_sample(
    input_sql: str,
    key_col: str,
    stratum_col: str,
    text_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    seed: str = "budget",
) -> str:
    """DuckDB twin of :func:`token_budget_sample` (md5 order is identical
    across engines — same portability trick as the fraction predicates).
    Emits all input columns."""
    from ..functions.textstats import sql_tokens

    whens = " ".join(
        f"WHEN {_slit(s, True)} THEN {int(b)}"
        for s, b in sorted(budgets.items())
    )
    case = f"CASE {stratum_col} {whens} ELSE {int(default_budget)} END"
    bucket = _bucket(key_col, seed, duck=True)
    return f"""
WITH tbs_base AS (
  SELECT *,
         CAST(len({sql_tokens(text_col)}) AS BIGINT) AS _n_tok,
         {bucket} AS _b
  FROM ({input_sql})
), tbs_cum AS (
  SELECT *, CAST(COALESCE(SUM(_n_tok) OVER (
    PARTITION BY {stratum_col} ORDER BY _b, {key_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS _prev
  FROM tbs_base
)
SELECT * EXCLUDE (_n_tok, _b, _prev) FROM tbs_cum WHERE _prev < {case}
"""
