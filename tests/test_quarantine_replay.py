"""Dead-letter quarantine in the replay runner: poison rows (null key,
null lsn, unknown op) are isolated per epoch with provenance, the table
equals a replay of the clean subset, and the default path is unchanged."""

import os

import pyspark.sql.functions as F

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import (
    ReplayRunner,
    make_table_for_log,
    split_poison,
)


_NULLABLE_DDL = (
    "op string, url string, lsn bigint, warc_ts timestamp, html binary,"
    " lang string, schema_version int, fetch_status int, epoch int"
)


def _poisoned_log(spark, tmp_path):
    ch = gen_changes(spark, 800, events_per_epoch=400, seed=21)
    # poison: null url (epoch 0), unknown op + null lsn (epoch 1)
    bad = spark.createDataFrame(
        [
            ("insert", None, 100000, None, None, "en", 1, None, 0),
            ("upsertt", "https://p.example/x", 100001, None, None, "en", 1, None, 1),
            ("insert", "https://p.example/y", None, None, None, "en", 1, None, 1),
        ],
        schema=_NULLABLE_DDL,
    )
    log_dir = str(tmp_path / "log")
    changelog.write_log(ch.unionByName(bad), log_dir)
    clean_dir = str(tmp_path / "clean_log")
    changelog.write_log(ch, clean_dir)
    return log_dir, clean_dir


def _replay(spark, tmp_path, log_dir, tag, **kw):
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / f"t_{tag}"), reg, n_buckets=4)
    results = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / f"cp_{tag}")), reg, **kw
    ).run()
    return table, results


def test_split_poison_reasons(spark):
    ch = gen_changes(spark, 50, events_per_epoch=50, seed=3)
    bad = spark.createDataFrame(
        [
            ("insert", None, 900, None, None, "en", 1, None, 0),
            ("zzz", "https://a/x", 901, None, None, "en", 1, None, 0),
            (None, "https://a/y", 902, None, None, "en", 1, None, 0),
            ("insert", "https://a/z", None, None, None, "en", 1, None, 0),
        ],
        schema=_NULLABLE_DDL,
    )
    good, poison = split_poison(ch.unionByName(bad), "url")
    assert good.count() == 50
    reasons = {r["lsn"]: r["_reason"] for r in poison.collect()}
    assert reasons[900] == "null_key"
    assert reasons[901] == "unknown_op"
    assert reasons[902] == "unknown_op"  # null op is an unknown op
    assert reasons[None] == "null_lsn"


def test_quarantined_replay_matches_clean_replay(spark, tmp_path):
    log_dir, clean_dir = _poisoned_log(spark, tmp_path)
    tq, results = _replay(spark, tmp_path, log_dir, "q", quarantine_dir=str(tmp_path / "dlq"))
    tc, _ = _replay(spark, tmp_path, clean_dir, "c")

    cols = sorted(tc.read().columns)
    a = sorted(str(tuple(r)) for r in tq.read().select(*cols).collect())
    b = sorted(str(tuple(r)) for r in tc.read().select(*cols).collect())
    assert a == b

    # metrics carry per-epoch counts; DLQ dirs carry the rows + reasons
    by_epoch = {r["epoch"]: r for r in results}
    assert by_epoch[0]["quarantined"] == 1
    assert by_epoch[1]["quarantined"] == 2
    dlq0 = spark.read.parquet(str(tmp_path / "dlq" / "epoch=0"))
    assert [r["_reason"] for r in dlq0.collect()] == ["null_key"]
    dlq1 = spark.read.parquet(str(tmp_path / "dlq" / "epoch=1"))
    assert sorted(r["_reason"] for r in dlq1.collect()) == ["null_lsn", "unknown_op"]


def test_default_replay_unchanged_and_metrics_zero(spark, tmp_path):
    """Without quarantine_dir the runner is byte-for-byte the old behavior
    and reports quarantined=0."""
    ch = gen_changes(spark, 400, events_per_epoch=200, seed=8)
    log_dir = str(tmp_path / "log")
    changelog.write_log(ch, log_dir)
    table, results = _replay(spark, tmp_path, log_dir, "d")
    assert all(r["quarantined"] == 0 for r in results if not r["skipped"])
    assert not os.path.exists(str(tmp_path / "dlq"))
    assert table.read().count() > 0


def test_streaming_tailer_quarantine_parity(spark, tmp_path):
    """The streaming path dead-letters the same poison the batch path does,
    keyed by batch id; final table equals the clean-log batch replay."""
    from data_pipeline_spark.streaming.tailer import ChangeLogTailer

    log_dir, clean_dir = _poisoned_log(spark, tmp_path)
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_s"), reg, n_buckets=4)
    tailer = ChangeLogTailer(
        spark, log_dir, table, str(tmp_path / "scp"), registry=reg,
        quarantine_dir=str(tmp_path / "sdlq"),
    )
    metrics = tailer.run_available()
    assert sum(m["quarantined"] for m in metrics) == 3

    tc, _ = _replay(spark, tmp_path, clean_dir, "sc")
    cols = sorted(tc.read().columns)
    a = sorted(str(tuple(r)) for r in table.read().select(*cols).collect())
    b = sorted(str(tuple(r)) for r in tc.read().select(*cols).collect())
    assert a == b
    dlq = spark.read.parquet(str(tmp_path / "sdlq"))
    assert dlq.count() == 3 and set(
        r["_reason"] for r in dlq.collect()
    ) == {"null_key", "null_lsn", "unknown_op"}
