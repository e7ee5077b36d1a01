"""Wire egress (lake/export.py): change feed → Debezium envelopes with
true before-images, cursor-tracked exactly-once export, and a full
round trip — a replica fed ONLY by exported wire files converges to the
source table."""

import json
import os

import pyspark.sql.functions as F

from data_pipeline_spark.lake.export import changes_to_envelopes, export_changes_wire
from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.sources.debezium import envelope_schema, parse_debezium
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

PAYLOAD = ["url", "warc_ts", "html", "lang", "text"]
ROW_DDL = (
    "url string, warc_ts timestamp, html binary, lang string, text string"
)


def _replayed_table(spark, tmp_path, tag, n, max_epochs=None, seed=31):
    ch = gen_changes(spark, n, events_per_epoch=n // 4, seed=seed)
    log_dir = str(tmp_path / f"log_{tag}")
    changelog.write_log(ch, log_dir)
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / f"t_{tag}"), reg, n_buckets=4)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / f"cp_{tag}")), reg
    )
    runner.run(max_epochs=max_epochs)
    return table, runner


def test_export_has_before_images_and_cursor(spark, tmp_path):
    table, runner = _replayed_table(spark, tmp_path, "a", 800, max_epochs=1)
    out_dir = str(tmp_path / "wire")

    # bootstrap export: everything is an insert, before always null
    res1 = export_changes_wire(table, out_dir, PAYLOAD)
    assert res1["from"] is None and res1["rows"] > 0
    parsed1 = spark.read.text(res1["dir"]).select(
        F.from_json("value", envelope_schema(ROW_DDL)).alias("e")
    ).select("e.payload.*")
    assert parsed1.where("op != 'c'").count() == 0
    assert parsed1.where("before IS NOT NULL").count() == 0

    # nothing new => no-op, cursor stable
    assert export_changes_wire(table, out_dir, PAYLOAD)["rows"] == -1

    # apply the rest; incremental export carries u with BOTH images, d with before
    runner.run()
    res2 = export_changes_wire(table, out_dir, PAYLOAD)
    assert res2["from"] == res1["to"] and res2["to"] > res2["from"]
    parsed2 = spark.read.text(res2["dir"]).select(
        F.from_json("value", envelope_schema(ROW_DDL)).alias("e")
    ).select("e.payload.*")
    ups = parsed2.where("op = 'u'")
    assert ups.count() > 0
    assert ups.where("before IS NULL OR after IS NULL").count() == 0
    assert ups.where("before.url != after.url").count() == 0
    dels = parsed2.where("op = 'd'")
    if dels.count():
        assert dels.where("after IS NOT NULL").count() == 0
    cur = json.load(open(os.path.join(out_dir, "_cursor.json")))
    assert cur["snapshot_id"] == res2["to"]


def test_wire_replica_converges_to_source(spark, tmp_path):
    """Round trip: a replica lake table fed ONLY by exported envelopes
    (parse_debezium → merge) equals the source after two export cycles."""
    table, runner = _replayed_table(spark, tmp_path, "b", 800, max_epochs=1)
    out_dir = str(tmp_path / "wire_b")
    reg = SchemaRegistry()
    replica = make_table_for_log(spark, str(tmp_path / "replica"), reg, n_buckets=4)

    def apply_export(res, epoch):
        wire = spark.read.text(res["dir"])
        changes = parse_debezium(wire, ROW_DDL)
        from data_pipeline_spark.streaming.runner import stage_changes

        staged = stage_changes(spark, changes, replica)
        replica.merge(staged, epoch=epoch)

    res1 = export_changes_wire(table, out_dir, PAYLOAD)
    apply_export(res1, 0)
    runner.run()
    res2 = export_changes_wire(table, out_dir, PAYLOAD)
    apply_export(res2, 1)

    cols = sorted(c for c in table.read().columns)
    a = sorted(str(tuple(r)) for r in table.read().select(*cols).collect())
    b = sorted(str(tuple(r)) for r in replica.read().select(*cols).collect())
    assert a == b


def test_stale_partial_export_swept_on_retry(spark, tmp_path):
    """Crash between data write and cursor write, then MORE commits land:
    the retry exports a wider interval under a new name — the stale dir
    must be removed or tree-readers double-consume the overlap."""
    table, runner = _replayed_table(spark, tmp_path, "c", 400, max_epochs=1)
    out_dir = str(tmp_path / "wire_c")
    res1 = export_changes_wire(table, out_dir, PAYLOAD)
    # simulate the crash: roll the cursor back (data dir stays)
    os.remove(os.path.join(out_dir, "_cursor.json"))
    runner.run()  # more commits land before the retry
    res2 = export_changes_wire(table, out_dir, PAYLOAD)
    dirs = [d for d in os.listdir(out_dir) if d.startswith("commits=")]
    assert dirs == [os.path.basename(res2["dir"])]  # stale res1 dir swept
    assert res1["dir"] != res2["dir"]
