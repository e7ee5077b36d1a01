"""Per-key last-writer-wins dedup (D1) + duplicate-detection family.

The reference's only dedup is coarse "newest raw file wins"
(/root/reference/src/storage/minio_client.rs:219-228). The engine refines it
to per-url LWW by ``(warc_ts, lsn)`` — the heart of CDC replay: applying the
log in any order yields the same winner per key, so replay is deterministic
under reordering.

Two implementations:

- :func:`lww_dedup` — ``groupBy(key).agg(max_by(struct(payload), struct(ts,
  lsn)))``. This is the **scale path**: hash aggregation with map-side partial
  combine, so a hot url collapses to one row per map task *before* the
  shuffle. A hot key costs O(rows/key / n_tasks) per task — no salting needed
  for the dedup itself.
- :func:`lww_dedup_window` — ``row_number() over (partition by key order by
  ts desc, lsn desc) = 1``. SQL-expressible twin (used for oracle parity);
  at scale it shuffles *all* rows of a hot key into one partition — kept for
  verification, not for the hot path.

Extra training-data dedup operators (exact / near-dup) live in
:mod:`data_pipeline_spark.operators.textdedup`.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def lww_dedup(
    df: DataFrame,
    key_cols: Sequence[str] = ("url",),
    order_cols: Sequence[str] = ("warc_ts", "lsn"),
    count_col: str | None = None,
) -> DataFrame:
    """One row per key: the one with the greatest (order_cols) tuple.

    ``max_by`` over a struct gives lexicographic last-writer-wins with total
    tie-breaking (always include ``lsn`` last — equal ``warc_ts`` must not be
    ambiguous, SURVEY.md §7.4).

    ``count_col``: optionally append a long column counting the versions
    each winner superseded (rides the same single aggregation).
    """
    key_cols = list(key_cols)
    payload_cols = [c for c in df.columns if c not in key_cols]
    aggs = [
        F.max_by(
            F.struct(*[F.col(c) for c in payload_cols]),
            F.struct(*[F.col(c) for c in order_cols]),
        ).alias("_winner")
    ]
    if count_col is not None:
        aggs.append(F.count("*").cast("long").alias(count_col))
    out = df.groupBy(*key_cols).agg(*aggs)
    return out.select(
        *key_cols,
        *[F.col(f"_winner.{c}").alias(c) for c in payload_cols],
        *([count_col] if count_col is not None else []),
    )


def lww_dedup_window(
    df: DataFrame,
    key_cols: Sequence[str] = ("url",),
    order_cols: Sequence[str] = ("warc_ts", "lsn"),
) -> DataFrame:
    """row_number()==1 variant — identical result, SQL-expressible (D1)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
