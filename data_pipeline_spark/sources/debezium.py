"""Debezium-envelope CDC adapter (the de-facto open wire format for
binlog/WAL tails; format documented at https://debezium.io).

The engine's replay path consumes a typed change frame
(``sources.changelog.CHANGE_COLUMNS``); real-world CDC tails usually
arrive as Debezium JSON envelopes on a Kafka topic:

    {"payload": {"before": <row|null>, "after": <row|null>,
                 "source": {"lsn": <int64>, "ts_ms": <int64>, ...},
                 "op": "c"|"u"|"d"|"r", "ts_ms": <int64>}}

This module maps that envelope onto the change frame and back with native
``from_json``/``to_json`` column expressions — zero Python in the row
path, so parsing stays inside whole-stage codegen and scales with the
topic's partition count. Wiring a live tail is one line each way:

    raw = spark.readStream.format("kafka")...  # value: binary
    changes = parse_debezium(raw.select(F.col("value").cast("string")), ROW_DDL)

The reference has no wire format (its "tail" is paginated HTTP JSON,
/root/reference/src/fetcher/unified_fetcher.rs:23-102); Debezium is the
CDC-native generalization of the same ingest boundary, the way
SURVEY.md §0 maps page-fetch batches onto change-event batches.

Binary columns (e.g. ``html``) ride base64-encoded, which is exactly
Debezium's bytes encoding; Spark's JSON reader/writer already speaks it.
Timestamps are serialized with microsecond precision (``_TS_FMT``) — the
default millisecond JSON format would silently truncate ``warc_ts`` and
break the byte-identical LWW replay invariant on microsecond ties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType

# Debezium op → engine op. "r" (snapshot read) applies as an upsert, same
# as "c": replaying a snapshot into an empty table is the bootstrap path.
_DBZ_TO_ENGINE = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}
_ENGINE_TO_DBZ = {"insert": "c", "update": "u", "delete": "d"}

# Microsecond-precision timestamps in the JSON payload (see module doc).
# NTZ columns get the same precision without a zone offset.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_JSON_OPTS = {
    "timestampFormat": _TS_FMT,
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def envelope_schema(row_ddl: str) -> StructType:
    """The Debezium envelope schema for a given row payload DDL, e.g.
    ``row_ddl="url string, warc_ts timestamp, html binary, lang string"``."""
    row = StructType.fromDDL(row_ddl)
    return StructType.fromDDL(
        "payload struct<"
        f"before:struct<{row.toDDL()}>,"
        f"after:struct<{row.toDDL()}>,"
        "source:struct<lsn:bigint,ts_ms:bigint>,"
        "op:string,ts_ms:bigint>"
    )


def _map_expr(mapping: dict[str, str], col: Column) -> Column:
    expr = F.lit(None).cast("string")
    for src, dst in reversed(list(mapping.items())):
        expr = F.when(col == src, F.lit(dst)).otherwise(expr)
    return expr


def parse_debezium(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    keep_corrupt: bool = False,
    extra_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Debezium JSON envelopes → the engine's typed change frame.

    Output columns: ``op`` (insert/update/delete), the payload row columns
    (from ``after``, or ``before`` for deletes — Debezium deletes carry
    only the pre-image), ``lsn`` (source.lsn, the LWW tie-breaker), and
    ``source_ts`` (source.ts_ms as a timestamp).

    Rows that fail to parse or carry an unknown op are dropped, unless
    ``keep_corrupt`` — then they surface with op NULL and the raw envelope
    in ``_corrupt`` (the P16 quarantine convention, parse.py): at 10^10
    events a poison message must quarantine, never kill the tail.

    ``extra_cols``: transport-side columns of ``df`` (e.g. Kafka's
    ``partition``/``offset``) selected through unchanged — the envelope
    value doesn't carry them, the consumer does.

    NULL values (Kafka log-compaction tombstones — Debezium emits one
    after every delete) are dropped up front in BOTH modes: they carry no
    payload, and without this filter ``_corrupt = when(op.isNull(),
    value)`` would itself be NULL for them, so the quarantine filter
    would pass an all-null ghost row into the change frame.
    """
    df = df.where(F.col(value_col).isNotNull())
    parsed = F.from_json(F.col(value_col), envelope_schema(row_ddl), _JSON_OPTS)
    p = parsed["payload"]
    op = _map_expr(_DBZ_TO_ENGINE, p["op"])
    row = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    out = df.select(
        *extra_cols,
        op.alias("op"),
        row.alias("_row"),
        p["source"]["lsn"].alias("lsn"),
        F.timestamp_millis(p["source"]["ts_ms"]).alias("source_ts"),
        F.when(op.isNull(), F.col(value_col)).alias("_corrupt"),
    )
    cols = [*extra_cols, "op", "_row.*", "lsn", "source_ts"]
    if keep_corrupt:
        return out.select(*cols, "_corrupt")
    return out.where(F.col("_corrupt").isNull()).select(*cols)


def to_debezium(
    df: DataFrame,
    payload_cols: list[str],
    op_col: str = "op",
    lsn_col: str = "lsn",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """The inverse: engine change frame → Debezium envelope JSON strings
    (column ``value``), for exporting a lake changelog back to the wire.

    Inserts/updates carry the row as ``after``; deletes carry it as
    ``before`` with ``after`` null (the engine holds no separate pre-image
    for updates, so ``before`` is null there — Debezium's shape when the
    source lacks REPLICA IDENTITY FULL). ``source.ts_ms`` is ``ts_col``
    in epoch millis; the full-precision timestamp rides inside the row
    payload itself.
    """
    row = F.struct(*[F.col(c) for c in payload_cols])
    null_row = F.lit(None).cast(
        "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}"
                             for f in df.select(*payload_cols).schema.fields) + ">"
    )
    is_del = F.col(op_col) == "delete"
    envelope = F.struct(
        F.struct(
            F.when(is_del, row).otherwise(null_row).alias("before"),
            F.when(is_del, null_row).otherwise(row).alias("after"),
            F.struct(
                F.col(lsn_col).cast("bigint").alias("lsn"),
                # cast: unix_millis needs TIMESTAMP; NTZ sources (e.g. raw
                # parquet scans) are interpreted in the session zone.
                F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
            ).alias("source"),
            _map_expr(_ENGINE_TO_DBZ, F.col(op_col)).alias("op"),
            F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
        ).alias("payload")
    )
    return df.select(F.to_json(envelope, _JSON_OPTS).alias("value"))
