"""Capstone integration: one event stream crosses EVERY round-3 surface and
all four views of it must agree.

wire-in (Debezium JSON lines) → parse → lsn-packed epoch log → audited
replay (+DLQ wired, clean here) → lake latest state; the SAME log also
maintains the SCD2 history store; the lake's change feed exports back to
the wire and feeds a replica. Then:

- lake state == direct replay of the source frame (wire transport lossless),
- SCD2 current slice == lake state, deletes as tombstone versions,
- wire-fed replica == lake state (egress lossless),
- checkpoint records carry the lsn-continuity audit with no gaps.
"""

import pyspark.sql.functions as F

from data_pipeline_spark.lake.export import export_changes_wire
from data_pipeline_spark.lake.scdstore import Scd2Store
from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.sources.debezium import parse_debezium, to_debezium
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import (
    ReplayRunner,
    make_table_for_log,
    stage_changes,
)

PAYLOAD = ["url", "warc_ts", "html", "lang", "schema_version"]
ROW_DDL = (
    "url string, warc_ts timestamp, html binary, lang string,"
    " schema_version int"
)


def _replay(spark, log_dir, root, **kw):
    reg = SchemaRegistry()
    table = make_table_for_log(spark, f"{root}/t", reg, n_buckets=8)
    cp = CheckpointStore(f"{root}/cp")
    ReplayRunner(spark, log_dir, table, cp, reg, **kw).run()
    return table, cp


def _state(table):
    return sorted(
        (r.url, r.lang, r.text)
        for r in table.read().select("url", "lang", "text").collect()
    )


def test_full_stack_four_views_agree(spark, tmp_path):
    root = str(tmp_path)
    src = gen_changes(spark, 3000, events_per_epoch=1000, seed=61)

    # --- wire in: source → Debezium JSON lines → parse → epoch log ---
    wire_dir = f"{root}/wire_in"
    to_debezium(src, payload_cols=PAYLOAD).coalesce(4).write.text(wire_dir)
    parsed = parse_debezium(spark.read.text(wire_dir), ROW_DDL)
    log_df = parsed.drop("source_ts").withColumn(
        "epoch", (F.col("lsn") / 1000).cast("int")
    )
    ingested_log = f"{root}/log"
    changelog.write_log(log_df, ingested_log)

    # --- audited replay of the ingested log ---
    table, cp = _replay(
        spark, ingested_log, f"{root}/ing",
        audit_sequence=True, quarantine_dir=f"{root}/dlq",
    )

    # --- reference: direct replay of the source frame, no wire hop ---
    direct_log = f"{root}/direct_log"
    changelog.write_log(src, direct_log)
    ref_table, _ = _replay(spark, direct_log, f"{root}/ref")
    assert _state(table) == _state(ref_table)  # wire transport lossless

    # --- audit: contiguous lsns, nothing quarantined ---
    for e in cp.committed_epochs():
        rec = cp.get(e)
        assert rec["quarantined"] == 0
        assert rec["seq_missing_est"] == 0
        assert rec["seq_gap_from_prev"] in (None, 0)

    # --- SCD2 history off the same log: current slice == lake state ---
    store = Scd2Store(
        spark, ingested_log, f"{root}/scd",
        key_cols=("url",), order_cols=("warc_ts", "lsn"),
        tracked_cols=("op", "lang"),
    )
    store.refresh()
    current = store.read().where("is_current")
    live_hist = sorted(
        (r.url, r.lang) for r in current.where("op != 'delete'").collect()
    )
    live_lake = sorted(
        (r.url, r.lang) for r in table.read().select("url", "lang").collect()
    )
    assert live_hist == live_lake
    # deleted urls: absent from the lake, present as tombstone versions
    dead = {r.url for r in current.where("op = 'delete'").collect()}
    assert dead and dead.isdisjoint({u for u, _ in live_lake})

    # --- wire out: change feed → envelopes → wire-fed replica ---
    # export payload = table columns (schema_version is registry metadata,
    # not a lake column)
    out_payload = ["url", "warc_ts", "html", "lang", "text"]
    res = export_changes_wire(table, f"{root}/wire_out", out_payload)
    assert res["rows"] > 0
    replica_changes = parse_debezium(
        spark.read.text(res["dir"]),
        "url string, warc_ts timestamp, html binary, lang string, text string",
    ).withColumnRenamed("source_ts", "_sts")
    reg2 = SchemaRegistry()
    replica = make_table_for_log(spark, f"{root}/replica", reg2, n_buckets=4)
    staged = stage_changes(
        spark,
        replica_changes.select(
            "op", "url", "lsn", "warc_ts", "html", "lang", "text"
        ),
        replica,
    )
    replica.merge(staged, epoch=0)
    assert _state(replica) == _state(table)  # egress lossless
