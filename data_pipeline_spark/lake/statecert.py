"""Order-independent table-state equivalence certificate (X101).

The north rule's correctness gate is "final table state equals the
reference state after full replay" — at 10^10 rows neither side can be
collected, sorted, or row-diffed wholesale. This module turns state
equivalence into a CERTIFICATE: per hash-bucket, ``(row count, modular
sum of portable 60-bit row hashes)``. Equal certificates ⇒ equal states
(up to a ~2^-60-per-bucket collision, documented); unequal certificates
name the buckets that differ, so the row-level drill-down rescans ONLY
those buckets — two O(n) column-pruned aggregations plus a diff that is
O(differing buckets), never a full-table join.

Portability: the row hash is ``md5`` of a canonical field encoding
(name=value, NUL for NULL, unit-separator joins), first 15 hex chars as
a 60-bit integer — identical in Spark (``conv(hex,16,10)``) and DuckDB
(``('0x'||hex)::BIGINT``), so every certificate is oracle-checkable.
Sums accumulate in ``decimal(38,0)`` (Spark) / ``HUGEINT`` (DuckDB) —
no overflow under ANSI mode — then reduce mod 2^61-1.

The sum is a MULTISET hash: duplicate rows contribute twice, row order
never matters, and the per-bucket layout matches how a replayed lake
table is actually stored (hash buckets), so certificates can be computed
bucket-local with zero shuffle beyond the one hash agg.

Float caveat: ``cast(double as string)`` renders differently across
engines; canonicalize float columns (e.g. ``cast(x as decimal(18,6))``)
before certifying, or leave them out of ``cols``.

Reference analog: the Rust pipeline verifies runs by printing row counts
(/root/reference/src/bin/test_full_pipeline.rs:61-96); this is that
check made sound (content, not count) and scale-safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "row_hash",
    "state_checksum",
    "compare_states",
    "state_diff",
    "update_checksum",
    "sql_state_checksum",
]

MOD = 2305843009213693951  # 2^61 - 1 (Mersenne prime)
_SEP = "\x1f"  # unit separator — cannot collide with "name=" prefixes
_NULL = "\x00"  # NULL marker, distinct from empty string


def _canon(cols: list[str]) -> Column:
    """Canonical row encoding: `name=value` fields joined by \\x1f, NULL
    rendered as `name\\x00` (distinct from empty string and from any
    value). Field names in the encoding make (a=1,b=) vs (a=,b=1)
    distinct even though the joined values would collide."""
    return F.concat_ws(
        _SEP,
        *[
            F.coalesce(
                F.concat(F.lit(c + "="), F.col(c).cast("string")),
                F.lit(c + _NULL),
            )
            for c in cols
        ],
    )


def row_hash(cols: list[str]) -> Column:
    """Portable 60-bit row hash: first 15 md5 hex chars as an integer.
    Engine-portable (md5 + substring only — DuckDB twin:
    ``('0x' || substring(md5(...),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(_canon(cols)), 1, 15), 16, 10).cast("long")


def _bucket(key_col: str, n_buckets: int) -> Column:
    """Portable bucket id: first 8 md5 hex chars of the key mod n.
    NULL keys land in a real bucket (sentinel encoding), never NULL."""
    h = F.md5(
        F.concat(
            F.lit("bkt:"),
            F.coalesce(F.col(key_col).cast("string"), F.lit(_NULL)),
        )
    )
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets).alias(
        "bucket"
    )


def state_checksum(
    df: DataFrame,
    key_col: str,
    cols: list[str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-bucket certificate ``(bucket, n_rows, checksum)`` of a table
    state. One column-pruned scan + one map-side-combinable hash agg;
    output is ≤ n_buckets rows regardless of input size."""
    cols = sorted(df.columns) if cols is None else list(cols)
    return (
        df.select(_bucket(key_col, n_buckets), row_hash(cols).alias("_h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("_h").cast("decimal(38,0)")) % MOD)
            .cast("long")
            .alias("checksum"),
        )
    )


def compare_states(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    cols: list[str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Bucket-level comparison of two states: full-outer join of the two
    certificates. ``(bucket, a_rows, b_rows, a_checksum, b_checksum,
    match)`` — a bucket absent on one side reads as 0 rows / 0 sum.
    Cost: two aggregation scans + an n_buckets-row join."""
    if cols is None:
        cols = sorted(set(a.columns) & set(b.columns))
    ca = state_checksum(a, key_col, cols, n_buckets).alias("a")
    cb = state_checksum(b, key_col, cols, n_buckets).alias("b")
    zero = F.lit(0).cast("long")
    return (
        ca.join(cb, F.col("a.bucket") == F.col("b.bucket"), "full_outer")
        .select(
            F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
            F.coalesce(F.col("a.n_rows"), zero).alias("a_rows"),
            F.coalesce(F.col("b.n_rows"), zero).alias("b_rows"),
            F.coalesce(F.col("a.checksum"), zero).alias("a_checksum"),
            F.coalesce(F.col("b.checksum"), zero).alias("b_checksum"),
        )
        .withColumn(
            "match",
            (F.col("a_rows") == F.col("b_rows"))
            & (F.col("a_checksum") == F.col("b_checksum")),
        )
    )


def state_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    cols: list[str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Row-level drill-down: keyed diff ``(key, a_rows, b_rows, status)``
    with status ``a_only`` / ``b_only`` / ``changed``, computed ONLY over
    buckets whose certificates disagree. The collected mismatch list is
    metadata-scale (≤ n_buckets ids); the rescan reads just those
    buckets, so the diff costs O(differing data), not O(table).

    Duplicate keys are handled as multisets: a key whose per-key (count,
    hash-sum) differs reports ``changed``. A per-bucket hash collision
    (≈2^-60) would hide that bucket's rows; acceptable for a certificate,
    documented here."""
    if cols is None:
        cols = sorted(set(a.columns) & set(b.columns))
    cmpdf = compare_states(a, b, key_col, cols, n_buckets)
    bad = [r["bucket"] for r in cmpdf.where(~F.col("match")).collect()]
    if not bad:
        spark = a.sparkSession
        return spark.createDataFrame(
            [], f"{key_col} string, a_rows long, b_rows long, status string"
        )

    def per_key(df: DataFrame) -> DataFrame:
        return (
            df.select(
                _bucket(key_col, n_buckets),
                F.col(key_col).cast("string").alias("_k"),
                row_hash(cols).alias("_h"),
            )
            .where(F.col("bucket").isin(bad))
            .groupBy("_k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.sum(F.col("_h").cast("decimal(38,0)")) % MOD)
                .cast("long")
                .alias("s"),
            )
        )

    ka, kb = per_key(a).alias("a"), per_key(b).alias("b")
    zero = F.lit(0).cast("long")
    return (
        ka.join(kb, F.col("a._k") == F.col("b._k"), "full_outer")
        .where(
            F.col("a._k").isNull()
            | F.col("b._k").isNull()
            | (F.col("a.n") != F.col("b.n"))
            | (F.col("a.s") != F.col("b.s"))
        )
        .select(
            F.coalesce(F.col("a._k"), F.col("b._k")).alias(key_col),
            F.coalesce(F.col("a.n"), zero).alias("a_rows"),
            F.coalesce(F.col("b.n"), zero).alias("b_rows"),
            F.when(F.col("a._k").isNull(), F.lit("b_only"))
            .when(F.col("b._k").isNull(), F.lit("a_only"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


def update_checksum(
    cert: DataFrame,
    changes: DataFrame,
    key_col: str,
    cols: list[str],
    n_buckets: int = 64,
    change_type_col: str = "_change_type",
) -> DataFrame:
    """O(changes) certificate refresh off a row-level change feed (X102).

    The modular-sum checksum is an ABELIAN-GROUP hash, so it updates
    algebraically: inserts/update-postimages add their row hash, deletes/
    update-preimages subtract theirs, counts adjust ±1 — one hash agg over
    the CHANGES (``snapshot_diff`` / ``LakeTable.change_feed`` semantics:
    ``insert`` / ``delete`` / ``update_preimage`` / ``update_postimage``),
    then an ≤ n_buckets-row join against the old certificate. Re-certifying
    a 10^10-row table after an epoch costs O(epoch), never a rescan; the
    law ``update_checksum(cert(pre), diff(pre, post)) == cert(post)`` is
    pinned by tests and by the ``cdc_cert_incremental`` oracle contract.

    ``cols`` must be the exact column list the base certificate was built
    with (no default here — a mismatch must be impossible to get silently).
    Unknown change types raise at execution time rather than corrupting
    the certificate. Buckets whose row count returns to zero drop from the
    output, matching :func:`state_checksum` on the post state."""
    sign = (
        F.when(
            F.col(change_type_col).isin("insert", "update_postimage"), F.lit(1)
        )
        .when(
            F.col(change_type_col).isin("delete", "update_preimage"), F.lit(-1)
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("update_checksum: unknown change type "),
                    F.col(change_type_col),
                )
            ).cast("int")
        )
    )
    delta = (
        changes.select(
            _bucket(key_col, n_buckets),
            row_hash(cols).alias("_h"),
            sign.alias("_s"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("_s").cast("long").alias("dn"),
            F.sum((F.col("_h") * F.col("_s")).cast("decimal(38,0)")).alias("ds"),
        )
        .alias("d")
    )
    c = cert.alias("c")
    zero_l = F.lit(0).cast("long")
    zero_d = F.lit(0).cast("decimal(38,0)")
    raw = F.coalesce(F.col("c.checksum").cast("decimal(38,0)"), zero_d) + F.coalesce(
        F.col("d.ds"), zero_d
    )
    return (
        c.join(delta, F.col("c.bucket") == F.col("d.bucket"), "full_outer")
        .select(
            F.coalesce(F.col("c.bucket"), F.col("d.bucket")).alias("bucket"),
            (
                F.coalesce(F.col("c.n_rows"), zero_l)
                + F.coalesce(F.col("d.dn"), zero_l)
            ).alias("n_rows"),
            (((raw % MOD) + MOD) % MOD).cast("long").alias("checksum"),
        )
        .where(F.col("n_rows") != 0)
    )


def sql_state_checksum(
    rel: str, key_col: str, cols: list[str], n_buckets: int = 64
) -> str:
    """DuckDB twin of :func:`state_checksum` over relation ``rel``
    (a table name or parenthesized subquery)."""
    fields = " || chr(31) || ".join(
        f"coalesce('{c}=' || CAST({c} AS VARCHAR), '{c}' || chr(0))" for c in cols
    )
    bkt = (
        f"('0x' || substring(md5('bkt:' || "
        f"coalesce(CAST({key_col} AS VARCHAR), chr(0))), 1, 8))::BIGINT"
        f" % {n_buckets}"
    )
    return f"""
SELECT {bkt} AS bucket,
       count(*) AS n_rows,
       CAST(sum(('0x' || substring(md5({fields}), 1, 15))::BIGINT)
            % {MOD} AS BIGINT) AS checksum
FROM {rel} GROUP BY 1"""
