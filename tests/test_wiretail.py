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
