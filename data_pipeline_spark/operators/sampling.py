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
    multilingual: bool = False,
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

    ``multilingual=True`` counts tokens with
    :func:`functions.textstats.multilingual_token_count` instead of
    whitespace splitting — on a mixed-language corpus the whitespace
    counter sees an unspaced CJK/Thai document as ONE token, so those
    languages would consume almost none of their budget (X117).
    """
    from pyspark.sql import Window

    from ..functions.textstats import multilingual_token_count, tokens

    if multilingual:
        n = multilingual_token_count(F.col(text_col))
    else:
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
    multilingual: bool = False,
) -> str:
    """DuckDB twin of :func:`token_budget_sample` (md5 order is identical
    across engines — same portability trick as the fraction predicates).
    Emits all input columns."""
    from ..functions.textstats import (
        sql_multilingual_token_count,
        sql_tokens,
    )

    n_tok = (
        sql_multilingual_token_count(text_col)
        if multilingual
        else f"CAST(len({sql_tokens(text_col)}) AS BIGINT)"
    )
    whens = " ".join(
        f"WHEN {_slit(s, True)} THEN {int(b)}"
        for s, b in sorted(budgets.items())
    )
    case = f"CASE {stratum_col} {whens} ELSE {int(default_budget)} END"
    bucket = _bucket(key_col, seed, duck=True)
    return f"""
WITH tbs_base AS (
  SELECT *,
         {n_tok} AS _n_tok,
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


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample",
    stratum_col: str | None = None,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement, derandomized (X103):
    Efraimidis-Spirakis priority sampling. Each row draws a deterministic
    uniform u from md5(seed:key) and gets priority u^(1/w); the top-k
    priorities are EXACTLY a w-proportional without-replacement draw
    (Efraimidis & Spirakis 2006). Unlike DSIR's ``select_top`` (pure rank
    order, collapses onto the head of the weight distribution), every
    positive-weight row keeps a proportional chance — the standard way to
    downsample a corpus by quality score while preserving diversity.

    Ranking uses ``ln(u)/w`` (monotone in u^(1/w)), ROUNDED to 6 dp with
    key tie-break — the repo's cross-engine float convention
    (operators/importance.py). Rows with NULL or non-positive weight are
    dropped (zero-weight rows have zero inclusion probability; negative
    weights are a caller bug surfaced by omission, documented here).

    Plan shape: global flavor compiles to TakeOrderedAndProject (per-
    partition partial top-k, no global sort); per-stratum flavor is one
    window row_number — a single keyed shuffle.

    Output: input columns + ``_priority`` (the rounded ranking key).
    """
    if k <= 0:
        raise ValueError("need k >= 1")
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{seed}:"), F.col(key_col).cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            + 1.0
        )
        / HEX_SPACE
    )
    pri = F.round(
        F.log(u) / F.col(weight_col).cast("double"), 6
    ).alias("_priority")
    base = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col).cast("double") > 0)
    ).withColumn("_priority", pri)
    if stratum_col is None:
        return base.orderBy(F.desc("_priority"), F.asc(key_col)).limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.desc("_priority"), F.asc(key_col)
    )
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def sql_weighted_sample(
    input_sql: str,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample",
    stratum_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`weighted_sample` — same md5 uniform, same
    rounded ln(u)/w priority, same tie-break."""
    u = (
        f"(('0x' || substring(md5('{seed}:' || CAST({key_col} AS VARCHAR)),"
        f" 1, 8))::BIGINT + 1.0) / {HEX_SPACE}"
    )
    pri = f"round(ln({u}) / CAST({weight_col} AS DOUBLE), 6)"
    guard = (
        f"{weight_col} IS NOT NULL AND CAST({weight_col} AS DOUBLE) > 0"
    )
    if stratum_col is None:
        return f"""
SELECT *, {pri} AS _priority FROM ({input_sql})
WHERE {guard}
ORDER BY _priority DESC, {key_col} ASC LIMIT {int(k)}
"""
    return f"""
WITH ws_base AS (
  SELECT *, {pri} AS _priority FROM ({input_sql}) WHERE {guard}
), ws_rn AS (
  SELECT *, row_number() OVER (
    PARTITION BY {stratum_col} ORDER BY _priority DESC, {key_col} ASC
  ) AS _rn FROM ws_base
)
SELECT * EXCLUDE (_rn) FROM ws_rn WHERE _rn <= {int(k)}
"""


# -- leakage-safe train/val/test splits (X115) -------------------------------


def _split_case(
    entity_col: str, fractions: dict[str, float], seed: str, duck: bool
) -> str:
    """CASE expression assigning each ENTITY's hash bucket to a named
    split by cumulative thresholds."""
    if len(fractions) < 2:
        raise ValueError("need at least two splits")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("split fractions must be non-negative")
    names = list(fractions)
    b = _bucket(entity_col, seed, duck)
    cum, whens = 0.0, []
    for name in names[:-1]:
        cum += fractions[name]
        whens.append(f"WHEN {b} < '{threshold_hex(cum)}' THEN {_slit(name, duck)}")
    return f"CASE {' '.join(whens)} ELSE {_slit(names[-1], duck)} END"


def assign_split(
    df: DataFrame,
    entity_col: str,
    fractions: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, LEAKAGE-SAFE train/val/test assignment: the split
    is a pure function of the ENTITY (pass the host/domain, not the
    url), so every page of a site lands in ONE split — near-duplicate
    pages and template twins within a host can never straddle train and
    eval, which is the classic contamination path a row-wise
    ``randomSplit`` walks straight into. Fractions are keyspace shares
    of ENTITIES (hosts), not rows; they must sum to 1. One narrow
    expression, no shuffle, stable across reruns/partitionings — a
    re-crawled page months later still routes to the same split."""
    return df.withColumn(
        split_col, F.expr(_split_case(entity_col, fractions, seed, duck=False))
    )


def sql_assign_split(
    entity_col: str,
    fractions: dict[str, float],
    seed: str = "split",
) -> str:
    """DuckDB twin of the :func:`assign_split` expression (one column)."""
    return _split_case(entity_col, fractions, seed, duck=True)


def split_leakage(
    df: DataFrame, entity_col: str, split_col: str = "split"
) -> DataFrame:
    """Audit: entities present in more than one split (MUST be empty —
    one hash agg)."""
    return (
        df.groupBy(entity_col)
        .agg(F.countDistinct(split_col).alias("n_splits"))
        .where(F.col("n_splits") > 1)
    )


def split_neardup_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str = "split",
    **lsh_kwargs,
) -> DataFrame:
    """Cross-split NEAR-duplicate audit: entity-hash splits
    (:func:`assign_split`) guarantee a host's pages share a split, but
    syndicated/mirrored content crosses hosts — a press release on 40
    sites can land its copies in train AND eval, which no entity
    discipline catches. This runs the MinHash-LSH near-dup detector
    (operators/textdedup.py — band equi-join, never all-pairs) over the
    split corpus and returns the verified pairs that STRADDLE splits:
    ``(id_a, id_b, jaccard, split_a, split_b)``, empty == no leakage.
    The fix for flagged pairs is a policy choice (drop the eval copy,
    or collapse near-dup clusters to one split via
    operators/components.py cluster ids); the audit makes the leak
    visible before a benchmark number does."""
    from .textdedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(df, text_col, id_col, **lsh_kwargs)
    s = df.select(F.col(id_col), F.col(split_col))
    return (
        pairs.join(
            s.select(
                F.col(id_col).alias("id_a"), F.col(split_col).alias("split_a")
            ),
            "id_a",
        )
        .join(
            s.select(
                F.col(id_col).alias("id_b"), F.col(split_col).alias("split_b")
            ),
            "id_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
    )
