"""Debezium wire-format adapter: lossless round trip, delete pre-images,
poison-message quarantine, and plan shape (no Python in the row path).

The reference has no wire format (its tail is paginated HTTP JSON,
unified_fetcher.rs:23-102); Debezium is the CDC-native ingest boundary a
binlog/WAL tail actually arrives on.
"""

import pyspark.sql.functions as F

from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.sources.debezium import (
    envelope_schema,
    parse_debezium,
    to_debezium,
)

PAYLOAD = ["url", "warc_ts", "html", "lang", "schema_version"]
ROW_DDL = (
    "url string, warc_ts timestamp, html binary, lang string, schema_version int"
)


def _wire(spark, n=400, **kw):
    ch = gen_changes(spark, n, events_per_epoch=200, seed=11, **kw)
    return ch, to_debezium(
        ch, payload_cols=PAYLOAD, op_col="op", lsn_col="lsn", ts_col="warc_ts"
    )


def test_roundtrip_identity(spark):
    """engine frame → envelope JSON → engine frame is the identity on
    every payload column — binary html (base64), microsecond timestamps,
    ops including deletes."""
    ch, wire = _wire(spark, 400)
    back = parse_debezium(wire, ROW_DDL)
    orig = [tuple(r) for r in ch.select("op", *PAYLOAD, "lsn").orderBy("lsn").collect()]
    rt = [tuple(r) for r in back.select("op", *PAYLOAD, "lsn").orderBy("lsn").collect()]
    assert orig == rt
    assert {r["op"] for r in back.select("op").distinct().collect()} == {
        "insert", "update", "delete",
    }


def test_delete_carries_preimage_only(spark):
    """Deletes ride as before-image with after null (Debezium's shape);
    parse recovers the key from `before`."""
    ch, wire = _wire(spark, 300)
    n_del = ch.where("op = 'delete'").count()
    assert n_del > 0
    raw = wire.select(
        F.from_json("value", envelope_schema(ROW_DDL)).alias("e")
    ).select("e.payload.*")
    dels = raw.where("op = 'd'")
    assert dels.count() == n_del
    assert dels.where("after IS NOT NULL").count() == 0
    assert dels.where("before.url IS NULL").count() == 0
    back = parse_debezium(wire, ROW_DDL).where("op = 'delete'")
    assert back.where("url IS NULL").count() == 0


def test_snapshot_read_op_applies_as_insert(spark):
    """Debezium op 'r' (snapshot read) bootstraps like an insert."""
    row = (
        '{"payload":{"before":null,"after":{"url":"https://a.example/1",'
        '"warc_ts":"2024-01-01T00:00:00.000000Z","html":null,"lang":"en",'
        '"schema_version":1},"source":{"lsn":5,"ts_ms":1704067200000},'
        '"op":"r","ts_ms":1704067200000}}'
    )
    df = spark.createDataFrame([(row,)], "value string")
    out = parse_debezium(df, ROW_DDL).collect()
    assert len(out) == 1 and out[0]["op"] == "insert" and out[0]["lsn"] == 5


def test_poison_messages_quarantine_not_kill(spark):
    """Unparseable JSON or unknown ops never kill the tail: dropped by
    default, surfaced with the raw envelope under keep_corrupt (the P16
    quarantine convention)."""
    _, wire = _wire(spark, 50)
    junk = spark.createDataFrame(
        [("this is not json",), ('{"payload":{"op":"zz"}}',)], "value string"
    )
    mixed = wire.unionByName(junk)
    assert parse_debezium(mixed, ROW_DDL).count() == 50
    kept = parse_debezium(mixed, ROW_DDL, keep_corrupt=True)
    assert kept.count() == 52
    bad = kept.where("_corrupt IS NOT NULL")
    assert bad.count() == 2
    assert {r["_corrupt"] for r in bad.collect()} == {
        "this is not json", '{"payload":{"op":"zz"}}',
    }


def test_parsed_tail_feeds_lww_replay(spark):
    """The parsed frame drops straight into the engine's LWW path: winners
    from the wire equal winners from the typed log."""
    from data_pipeline_spark.operators.dedup import lww_dedup

    ch, wire = _wire(spark, 500)
    back = parse_debezium(wire, ROW_DDL)
    w_direct = lww_dedup(
        ch.select("url", "lsn", "warc_ts", "op"),
        key_cols=("url",), order_cols=("warc_ts", "lsn"),
    )
    w_wire = lww_dedup(
        back.select("url", "lsn", "warc_ts", "op"),
        key_cols=("url",), order_cols=("warc_ts", "lsn"),
    )
    a = sorted(tuple(r) for r in w_direct.collect())
    b = sorted(tuple(r) for r in w_wire.collect())
    assert a == b


def test_no_python_in_row_path(spark):
    """Envelope parse/build is pure native expressions — BatchEvalPython
    must not appear in either plan (UDFs would cap the tail's throughput)."""
    ch, wire = _wire(spark, 50)
    for df in (wire, parse_debezium(wire, ROW_DDL)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_roundtrip_adversarial_payload_content(spark):
    """JSON-escaping gauntlet: quotes, backslashes, newlines, tabs, unicode
    (CJK/emoji/RTL), control chars, HTML with entities, long strings — all
    must survive envelope → parse byte-identically (url AND html bytes)."""
    nasty = [
        'plain',
        'quote " inside',
        "back\\slash and \\\" escaped",
        "new\nline and \t tab and \r cr",
        "unicode: 汉字 и кириллица و عربى",
        "emoji 🎉🚀 and zero-width​ chars",
        "control \x01\x02\x1f chars",
        '<html lang="en"><body>R&amp;D &lt;tags&gt; \'quotes\'</body></html>',
        "{}[]:, json-ish punctuation",
        "x" * 5000,
        "",  # empty string (stays a string, not null)
    ]
    rows = [
        (
            "insert" if i % 3 else "delete",
            f"https://adv.example/{i}?q=\"{i}\"&x=\\{i}",
            i,
            s.encode("utf-8"),
            s,
        )
        for i, s in enumerate(nasty)
    ]
    df = spark.createDataFrame(
        rows, "op string, url string, lsn bigint, html binary, text string"
    ).withColumn("warc_ts", F.timestamp_millis(F.col("lsn") * 1000 + 123))
    wire = to_debezium(
        df, payload_cols=["url", "warc_ts", "html", "text"],
        op_col="op", lsn_col="lsn", ts_col="warc_ts",
    )
    back = parse_debezium(
        wire, "url string, warc_ts timestamp, html binary, text string"
    )
    orig = [tuple(r) for r in df.select(
        "op", "url", "warc_ts", "html", "text", "lsn").orderBy("lsn").collect()]
    rt = [tuple(r) for r in back.select(
        "op", "url", "warc_ts", "html", "text", "lsn").orderBy("lsn").collect()]
    assert orig == rt


def test_wire_schema_evolution_old_envelopes_widen_with_nulls(spark):
    """Schema drift over the wire: envelopes written before a payload
    column existed parse under the WIDENED row DDL with nulls in the new
    column (from_json's missing-field semantics), so one parse handles a
    mixed-version stream — the registry's schema_version column rides the
    payload and drives table evolution downstream as usual."""
    ch_v1 = gen_changes(spark, 60, events_per_epoch=30, seed=41)
    wire_v1 = to_debezium(  # fetch_status NOT serialized: pre-evolution wire
        ch_v1, payload_cols=PAYLOAD, op_col="op", lsn_col="lsn", ts_col="warc_ts"
    )
    ch_v2 = gen_changes(
        spark, 60, events_per_epoch=30, seed=42, evolve_at_epoch=0
    ).withColumn("lsn", F.col("lsn") + 1000)  # disjoint lsn space vs v1
    wire_v2 = to_debezium(
        ch_v2, payload_cols=PAYLOAD + ["fetch_status"],
        op_col="op", lsn_col="lsn", ts_col="warc_ts",
    )
    widened = ROW_DDL + ", fetch_status int"
    mixed = wire_v1.unionByName(wire_v2)
    out = parse_debezium(mixed, widened)
    assert out.count() == 120
    # old envelopes: new column null; new envelopes: populated for non-deletes
    joined_old = out.join(ch_v1.select("lsn"), "lsn", "left_semi")
    assert joined_old.where("fetch_status IS NOT NULL").count() == 0
    joined_new = out.join(ch_v2.select("lsn"), "lsn", "left_semi")
    assert joined_new.where("fetch_status IS NOT NULL").count() > 0
    # narrow parse of a wide envelope also works (column pruning, not error)
    narrow = parse_debezium(wire_v2, ROW_DDL)
    assert narrow.count() == 60 and "fetch_status" not in narrow.columns


def test_transport_cols_pass_through(spark):
    """extra_cols: the consumer's transport coordinates (Kafka partition/
    offset) ride through the parse unchanged — the envelope value doesn't
    carry them, and corrupt envelopes keep theirs so the DLQ can name the
    exact offsets it swallowed."""
    _, wire = _wire(spark, 40)
    from pyspark.sql.window import Window

    kafka = wire.withColumn(
        "partition", (F.crc32("value") % 2).cast("long")
    ).withColumn(
        "offset",
        F.row_number().over(
            Window.partitionBy("partition").orderBy("value")
        ).cast("long"),
    )
    junk = spark.createDataFrame(
        [(9, 99, "not json")], "partition long, offset long, value string"
    )
    out = parse_debezium(
        kafka.unionByName(junk), ROW_DDL, keep_corrupt=True,
        extra_cols=["partition", "offset"],
    )
    assert out.columns[:2] == ["partition", "offset"]
    assert out.count() == 41
    bad = out.where("_corrupt IS NOT NULL").collect()
    assert len(bad) == 1
    assert (bad[0]["partition"], bad[0]["offset"]) == (9, 99)
    # transport coords are exactly the input's, envelope columns intact
    good = out.where("_corrupt IS NULL")
    assert good.where("url IS NULL").count() == 0
    assert good.select("partition", "offset").distinct().count() == 40


def test_null_value_tombstones_dropped(spark):
    """Kafka log-compaction tombstones (NULL value — Debezium emits one
    after every delete) carry no payload and must be dropped in BOTH
    modes, never pass as all-null ghost rows or fake quarantine hits."""
    ch, wire = _wire(spark, 100)
    with_tomb = wire.unionByName(
        spark.range(5).select(F.lit(None).cast("string").alias("value"))
    )
    dropped = parse_debezium(with_tomb, ROW_DDL)
    assert dropped.count() == 100
    assert dropped.where("op IS NULL").count() == 0
    kept = parse_debezium(with_tomb, ROW_DDL, keep_corrupt=True)
    assert kept.count() == 100
    assert kept.where("_corrupt IS NOT NULL").count() == 0
