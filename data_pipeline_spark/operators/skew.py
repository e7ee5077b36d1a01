"""Explicit skew handling: hot-key detection + salted repartition.

The reference has no parallelism, so skew shows up only as "hot categories
take longer in the serial loop" (SURVEY.md §4.1). At 10^10 change events,
hot domains (a few sites producing most pages) become hot *shuffle keys*.
Policy here (north_rule: "skew handled explicitly"):

- Aggregations (LWW dedup) use ``max_by`` hash aggregation — map-side combine
  already defuses hot keys; nothing extra needed.
- Shuffles whose key we choose (bucketed merge writes) get a salt column so a
  hot bucket spreads over several tasks/files.
- Joins rely on AQE skew-join splitting (enabled in session.py) plus
  broadcast of small sides.

:func:`detect_hot_keys` measures actual key frequencies (from epoch stats —
cheap: one partial-agg pass) so salting is applied from evidence, not guesses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def detect_hot_keys(
    df: DataFrame, key_col: str, threshold_ratio: float = 0.05, max_keys: int = 100
) -> list:
    """Keys carrying more than ``threshold_ratio`` of all rows.

    One aggregation (map-side combinable). Returns at most ``max_keys`` —
    a driver-side list of scalars, never row data.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("_n"))
    total = df.count()
    if total == 0:
        return []
    hot = (
        counts.where(F.col("_n") >= total * threshold_ratio)
        .orderBy(F.desc("_n"))
        .limit(max_keys)
        .select(key_col)
        .collect()
    )
    return [r[0] for r in hot]


def with_salt(df: DataFrame, salt_buckets: int, salt_from: list[str] | None = None):
    """Add a ``_salt`` column in [0, salt_buckets).

    Deterministic (hash of columns) rather than rand() so retried tasks
    produce identical output — required for exactly-once replay. The salt
    must VARY WITHIN a key to spread it, so it hashes all columns by default
    (never just the key column).
    """
    cols = [F.col(c) for c in (salt_from or df.columns)]
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.lit(0x5A17), *cols), F.lit(salt_buckets))
    )


def salted_repartition(
    df: DataFrame, key_col: str, n_partitions: int, salt_buckets: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Repartition by (key, salt) so one hot key spans ``salt_buckets`` tasks.

    Use before per-key-partitioned writes or non-combinable per-key work; for
    combinable aggregations prefer plain ``groupBy`` (partial agg wins).
    """
    salted = with_salt(df, salt_buckets, salt_from)
    return salted.repartition(n_partitions, F.col(key_col), F.col("_salt")).drop("_salt")
