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
