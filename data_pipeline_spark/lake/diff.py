"""Snapshot diff: the row-level change-data-feed core as a pure
DataFrame operator.

``snapshot_diff(pre, post, key_col)`` emits the net row-level changes
that transform ``pre`` into ``post`` — ``_change_type`` of ``insert`` /
``update_preimage`` / ``update_postimage`` / ``delete`` — exactly the
semantics of :meth:`LakeTable.change_feed` (which delegates here after
bucket-pruning its two snapshot scans). Factored out so the diff
semantics are independently usable (compare any two relations by key)
and oracle-checkable against a SQL twin.

Plan shape: ONE full-outer equi-join; presence via explicit literals so
null join keys can't fake a match (a null-key row on either side surfaces
as delete/insert rather than silently vanishing); unchanged rows drop via
a null-safe row-image equality filter; the 1-or-2 output rows per changed
key come from exploding a CASE-built array — no second pass, no union of
per-change-type legs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    pre: DataFrame, post: DataFrame, key_col: str
) -> DataFrame:
    """Net row-level changes from ``pre`` to ``post``, keyed by
    ``key_col``. Both inputs must share a schema; output = that schema
    (key first) + ``_change_type``."""
    payload = [c for c in pre.columns if c != key_col]
    if set(post.columns) != set(pre.columns):
        raise ValueError(
            f"pre/post schemas differ: {sorted(pre.columns)} vs "
            f"{sorted(post.columns)}"
        )
    p = pre.withColumn("__p_present", F.lit(True)).alias("p")
    c = post.withColumn("__c_present", F.lit(True)).alias("c")
    j = p.join(c, F.col(f"p.{key_col}") == F.col(f"c.{key_col}"), "full_outer")

    def img(side: str) -> Column:
        return F.struct(*[F.col(f"{side}.{col}") for col in [key_col] + payload])

    pre_there = F.coalesce(F.col("p.__p_present"), F.lit(False))
    post_there = F.coalesce(F.col("c.__c_present"), F.lit(False))

    def tagged(side: str, tag: str) -> Column:
        return F.struct(
            *[F.col(f"{side}.{col}").alias(col) for col in [key_col] + payload],
            F.lit(tag).alias("_change_type"),
        )

    # Unchanged keys fall through every branch -> NULL array -> explode
    # drops the row.
    changes = (
        F.when(pre_there & ~post_there, F.array(tagged("p", "delete")))
        .when(~pre_there & post_there, F.array(tagged("c", "insert")))
        .when(
            pre_there & post_there & ~img("p").eqNullSafe(img("c")),
            F.array(tagged("p", "update_preimage"), tagged("c", "update_postimage")),
        )
    )
    return j.select(F.explode(changes).alias("_r")).select("_r.*")
