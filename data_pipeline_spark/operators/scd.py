"""SCD Type-2 history derivation from a change log, plus point-in-time lookup.

A CDC engine that only materializes "latest state" (D1 LWW) loses the
dimension history warehouses actually query: *what was this url's record
when the event happened?* SCD2 is the standard answer — one row per
(key, version interval) with ``valid_from`` / ``valid_to`` bounds — and
deriving it from the change log is a pure event-time computation.

The reference pipeline stores only latest-state product rows (its lake
write is overwrite-newest, /root/reference/src/storage/minio_client.rs:219-228);
history derivation is part of the engine's CDC extension surface, in the
same family as the net-change feed (lake/diff.py) and as-of join
(operators/asof.py).

Scale posture — ONE keyed shuffle, no self-join:

- The naive SCD2 build is "join each version to the next version per key"
  (a self-join, two shuffles, and quadratic under hot keys). This module
  instead sorts each key's versions once (window partitioned by key),
  detects tracked-attribute changes with null-safe ``lag`` compares,
  filters to version starts, and takes ``lead(valid_from)`` for the
  closing bound — the filter preserves the hash distribution, so Catalyst
  reuses the exchange: both Window nodes sit on a single shuffle (pinned
  in tests/test_plans.py).
- Versions-per-key is bounded in practice (and enforceable upstream by
  changelog compaction, sources/logcompact.py); a pathological hot key
  behaves like any keyed window — salt upstream or compact first.
- Consecutive events whose tracked columns are unchanged collapse into
  one interval (true SCD2: a no-op update does not open a new version).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .asof import asof_join


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    tracked_cols: Sequence[str],
    valid_from_col: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 version intervals.

    Parameters
    ----------
    df : change events, one row per version event.
    key_cols : entity identity (e.g. ``url``).
    order_cols : total per-key event order (e.g. ``(warc_ts, lsn)``); the
        FIRST order column is the event-time axis used for the validity
        bounds, the rest are tie-breakers.
    tracked_cols : attributes whose change opens a new version; events
        where every tracked column is null-safe-equal to the previous
        event's are collapsed into the open interval.
    valid_from_col : column carrying the version's effective time; defaults
        to ``order_cols[0]``.

    Returns one row per version: ``key_cols + tracked_cols + (valid_from,
    valid_to, version, is_current)``. ``valid_to`` is exclusive and null on
    the current version; ``version`` numbers from 1 in event order.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)
    tracked_cols = list(tracked_cols)
    ts = valid_from_col or order_cols[0]

    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    first_row = F.lag(F.lit(1)).over(w).isNull()
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    starts = df.withColumn("_new_version", first_row | changed).where(
        F.col("_new_version")
    )
    # The filter keeps the hash distribution on key_cols, so this second
    # window reuses the first one's exchange (one shuffle total).
    out = (
        starts.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("version", F.row_number().over(w).cast("long"))
        .withColumn("is_current", F.lead(F.lit(1)).over(w).isNull())
    )
    return out.select(
        *key_cols, *tracked_cols, "valid_from", "valid_to", "version", "is_current"
    )


def scd2_lookup(
    history: DataFrame,
    probes: DataFrame,
    key_cols: Sequence[str],
    probe_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Point-in-time lookup: each probe row gains the tracked values of the
    version whose ``[valid_from, valid_to)`` interval contains its
    timestamp (null when the probe precedes the first version).

    Built on :func:`asof_join` (union + keyed sort + running ``last``), so
    it is ONE shuffle with no range-join row explosion — a probe at exactly
    ``valid_from`` matches the version taking effect at that instant,
    which is precisely the interval semantics (``valid_to`` exclusive).
    """
    return asof_join(
        probes,
        history,
        key_cols=tuple(key_cols),
        left_ts=probe_ts,
        right_ts="valid_from",
        value_cols=tuple(value_cols),
    )
