"""Streaming wire tail: a Debezium landing zone streamed into the lake
equals the batch path on the same envelopes, poison dead-letters per
micro-batch, incremental file arrivals apply exactly once, restart is a
no-op."""

import pyspark.sql.functions as F

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.sources.debezium import to_debezium
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log
from data_pipeline_spark.streaming.wiretail import WireTailer

PAYLOAD = ["url", "warc_ts", "html", "lang", "schema_version"]
ROW_DDL = (
    "url string, warc_ts timestamp, html binary, lang string, schema_version int"
)


def _state(table):
    df = table.read()
    cols = sorted(df.columns)
    return sorted(str(tuple(r)) for r in df.select(*cols).collect())


def test_wire_stream_equals_batch_replay_with_poison(spark, tmp_path):
    ch = gen_changes(spark, 600, events_per_epoch=200, seed=23)
    wire = to_debezium(
        ch, payload_cols=PAYLOAD, op_col="op", lsn_col="lsn", ts_col="warc_ts"
    )
    wire_dir = str(tmp_path / "wire")
    junk = spark.createDataFrame([("junk not json",)], "value string")
    wire.unionByName(junk).coalesce(3).write.mode("overwrite").text(wire_dir)

    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_w"), reg, n_buckets=4)
    tailer = WireTailer(
        spark, wire_dir, ROW_DDL, table, str(tmp_path / "scp"),
        registry=reg, quarantine_dir=str(tmp_path / "dlq"),
    )
    metrics = tailer.run_available()
    assert sum(m["quarantined"] for m in metrics) == 1
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    assert dlq.count() == 1
    assert dlq.first()["raw"] == "junk not json"

    # truth: the typed log replayed by the batch engine
    log_dir = str(tmp_path / "log")
    changelog.write_log(ch, log_dir)
    t2 = make_table_for_log(spark, str(tmp_path / "t_b"), reg, n_buckets=4)
    ReplayRunner(spark, log_dir, t2, CheckpointStore(str(tmp_path / "cp")), reg).run()
    assert _state(table) == _state(t2)

    # restart with nothing new: every batch already merged, no-op
    n_before = len(
        WireTailer(
            spark, wire_dir, ROW_DDL, table, str(tmp_path / "scp"), registry=reg
        ).run_available()
    )
    assert _state(table) == _state(t2)


def test_wire_stream_incremental_file_arrivals(spark, tmp_path):
    """Files dropped after the first drain apply on the next — exactly
    once, same final state as one-shot."""
    ch = gen_changes(spark, 400, events_per_epoch=200, seed=24)
    a = ch.where(F.col("lsn") < 200)
    b = ch.where(F.col("lsn") >= 200)
    wire_dir = str(tmp_path / "wire")
    kw = dict(payload_cols=PAYLOAD, op_col="op", lsn_col="lsn", ts_col="warc_ts")
    to_debezium(a, **kw).coalesce(1).write.mode("overwrite").text(wire_dir)

    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_i"), reg, n_buckets=4)

    def drain():
        return WireTailer(
            spark, wire_dir, ROW_DDL, table, str(tmp_path / "scp"), registry=reg
        ).run_available()

    drain()
    to_debezium(b, **kw).coalesce(1).write.mode("append").text(wire_dir)
    drain()

    log_dir = str(tmp_path / "log")
    changelog.write_log(ch, log_dir)
    t2 = make_table_for_log(spark, str(tmp_path / "t_one"), reg, n_buckets=4)
    ReplayRunner(spark, log_dir, t2, CheckpointStore(str(tmp_path / "cp")), reg).run()
    assert _state(table) == _state(t2)


def test_wire_poison_taxonomy_and_default_dlq(spark, tmp_path):
    """Review findings: a parsed envelope with a NULL key (or unknown op)
    must dead-letter — not form a null-key LWW group; the DLQ record must
    carry a replayable payload, not raw=NULL; and with no quarantine_dir
    the DLQ defaults under the checkpoint dir instead of dropping rows."""
    ch = gen_changes(spark, 60, events_per_epoch=60, seed=5)
    bad_key = ch.limit(1).withColumn("url", F.lit(None).cast("string"))
    # (an unknown ENGINE op never reaches split_poison via this adapter:
    # to_debezium maps it to a null op code and parse_debezium flags the
    # envelope corrupt — so the post-parse poison cases are key and lsn)
    bad_lsn = (
        ch.orderBy("lsn").limit(2).orderBy(F.desc("lsn")).limit(1)
        .withColumn("lsn", F.lit(None).cast("long"))
    )
    wire = to_debezium(
        ch.unionByName(bad_key).unionByName(bad_lsn),
        payload_cols=PAYLOAD, op_col="op", lsn_col="lsn", ts_col="warc_ts",
    )
    wire_dir = str(tmp_path / "wire")
    wire.coalesce(1).write.mode("overwrite").text(wire_dir)

    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t"), reg, n_buckets=4)
    cp = str(tmp_path / "scp")
    metrics = WireTailer(
        spark, wire_dir, ROW_DDL, table, cp, registry=reg  # no quarantine_dir
    ).run_available()
    assert sum(m["quarantined"] for m in metrics) == 2
    import os

    dlq = spark.read.parquet(os.path.join(cp, "dlq"))
    rows = {r["_reason"]: r for r in dlq.collect()}
    assert set(rows) == {"null_key", "null_lsn"}
    # replayable: the parsed row is serialized back, never a NULL payload
    assert all(r["raw"] is not None and r["raw"].startswith("{")
               for r in rows.values())
    assert '"lsn":' in rows["null_key"]["raw"]
    # the table holds exactly the clean events' final state (no null key)
    assert table.read().where(F.col("url").isNull()).count() == 0
