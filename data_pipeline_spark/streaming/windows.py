"""Streaming windowed aggregation + custom stateful LWW operator.

Two Structured Streaming building blocks beyond the merge tailer:

- :func:`windowed_event_rollup` — event-time tumbling-window aggregation
  with a watermark, the idiomatic late-data pattern (SURVEY.md §2.8: the
  CDC merge itself needs no watermark because LWW is order-insensitive, but
  *analytics over the change stream* do — the watermark bounds state while
  late events inside it still land in their window).
- :func:`deduplicated_change_stream` — at-least-once tails redeliver events
  after connector restarts; ``dropDuplicatesWithinWatermark`` on
  ``(url, lsn)`` drops the redeliveries with WATERMARK-BOUNDED state (plain
  streaming dropDuplicates would keep every key ever seen — unusable on an
  unbounded stream).
- :func:`stateful_current_versions` — ``applyInPandasWithState``: per-key
  state carrying the current LWW winner across micro-batches, emitting a
  row whenever a key's winner CHANGES. This is the custom-stateful-operator
  form of the engine's dedup: where the merge materializes winners into the
  lake, this streams the winner transitions (e.g. to feed a cache
  invalidator) without any table at all.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ROLLUP_SCHEMA = (
    "window_start timestamp, window_end timestamp, op string, n long, n_keys long"
)


def windowed_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Tumbling event-time window: change-event counts + distinct-key counts
    per (window, op). Works on a batch OR streaming DataFrame; on a stream
    the watermark lets Spark finalize + evict windows older than
    ``watermark`` while still accepting late events inside it."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("url").alias("n_keys"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n",
            "n_keys",
        )
    )


def deduplicated_change_stream(
    changes: DataFrame,
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("url", "lsn"),
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Drop redelivered change events from an at-least-once tail.

    A WAL/binlog tail replayed after a connector restart redelivers events;
    the lake merge itself is immune (LWW + epoch-idempotent commits), but
    stream-side consumers (rollups, winner-transition streams) would
    double-count. ``(url, lsn)`` identifies an event uniquely — dedup on it
    with ``dropDuplicatesWithinWatermark``, which (unlike plain
    ``dropDuplicates`` on a stream) EVICTS seen-key state once it falls
    behind the watermark, so state is O(events inside the watermark), not
    O(all events ever) — the only formulation that survives an unbounded
    10^10-event stream. Batch DataFrames degrade to plain dropDuplicates
    (same result; no state to bound).
    """
    cols = list(keys)
    if not changes.isStreaming:
        return changes.dropDuplicates(cols)
    return changes.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)


# State carries the winner's timestamp as RAW integer microseconds, not a
# timestamp: round-tripping a timestamp through state applies
# driver-local-timezone conversions (datetime.fromtimestamp) that shift the
# restored value on non-UTC hosts, corrupting cross-batch LWW comparisons.
# Integers round-trip exactly on any host.
def sessionized_event_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
    key: str = "url",
) -> DataFrame:
    """Event-time SESSION windows per key — Spark's native
    ``session_window`` (dynamic-length windows that close after ``gap`` of
    key silence), the streaming twin of the batch
    :func:`~data_pipeline_spark.operators.asof.sessionize` gaps-and-islands
    plan. On a stream the watermark bounds open-session state; late events
    inside it still extend/merge their session. Works on batch DataFrames
    too (same plan minus the watermark)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
        )
    )


WINNER_STATE_SCHEMA = "warc_ts_us long, lsn long, op string"
WINNER_CHANGE_SCHEMA = (
    "url string, warc_ts timestamp, lsn long, op string, changed boolean"
)


def _ts_to_us(ts: Any) -> int:
    """pandas.Timestamp / datetime (session-tz-naive) → integer micros."""
    if hasattr(ts, "value"):  # pandas.Timestamp: ns since epoch
        return int(ts.value) // 1_000
    import datetime as dt

    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _winner_update_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-url state = current (warc_ts, lsn, op) winner. Emits one row per
    batch per key whose winner changed (LWW semantics identical to the
    batch engine: lexicographic (warc_ts, lsn), deletes win like any other
    event). Comparisons run on integer micros end-to-end — no timezone
    reinterpretation across batches/restarts."""
    if state.exists:
        ts_us, lsn, op = state.get
        cur: tuple[Any, ...] | None = (int(ts_us), int(lsn), op)
    else:
        cur = None
    changed = False
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            cand = (_ts_to_us(row.warc_ts), int(row.lsn), str(row.op))
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                cur = cand
                changed = True
    if cur is not None:
        state.update((cur[0], cur[1], cur[2]))
    if changed and cur is not None:
        yield pd.DataFrame(
            [
                {
                    "url": key[0],
                    # naive ns-since-epoch Timestamp: exact inverse of
                    # _ts_to_us, independent of host timezone.
                    "warc_ts": pd.Timestamp(cur[0] * 1_000),
                    "lsn": cur[1],
                    "op": cur[2],
                    "changed": True,
                }
            ]
        )


def stateful_current_versions(changes: DataFrame) -> DataFrame:
    """``applyInPandasWithState`` over the change stream: emit each url's
    NEW winner whenever a micro-batch changes it. State is one tiny tuple
    per url (bounded by keyspace, no timeout needed for correctness; add
    one if the key space itself churns)."""
    return (
        changes.select("url", "warc_ts", "lsn", "op")
        .groupBy("url")
        .applyInPandasWithState(
            _winner_update_fn,
            outputStructType=WINNER_CHANGE_SCHEMA,
            stateStructType=WINNER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
