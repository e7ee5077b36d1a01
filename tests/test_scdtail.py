"""Streaming SCD2 maintenance (streaming/scdtail.py): availableNow drain ==
full derivation, incremental arrivals, exactly-once re-execution."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.scdstore import Scd2Store
from data_pipeline_spark.operators.scd import scd2_history
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.scdtail import Scd2Tailer

ARGS = dict(key_cols=("url",), order_cols=("warc_ts", "lsn"), tracked_cols=("lang",))


def _rows(df):
    return sorted(
        (r.url, r.version, r.lang, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    )


def _full(spark, log_dir):
    return scd2_history(
        spark.read.parquet(log_dir).select("url", "lang", "warc_ts", "lsn"),
        ARGS["key_cols"], ARGS["order_cols"], ARGS["tracked_cols"],
        carry_order=True,
    )


def test_stream_drain_equals_full_then_incremental(spark, tmp_path):
    log = str(tmp_path / "log")
    changelog.write_log(gen_changes(spark, 2000, events_per_epoch=1000, seed=47), log)
    store = Scd2Store(spark, log, str(tmp_path / "state"), **ARGS)
    tailer = Scd2Tailer(spark, log, store, str(tmp_path / "cp"))
    tailer.run_available()
    assert _rows(store.read()) == _rows(_full(spark, log))

    # more events land; a second drain picks up ONLY the new files
    extra = (
        gen_changes(spark, 800, events_per_epoch=800, seed=48)
        .withColumn("epoch", F.col("epoch") + 2)
        .withColumn("lsn", F.col("lsn") + 30_000)
    )
    changelog.write_log(extra, log)
    tailer.run_available()
    assert _rows(store.read()) == _rows(_full(spark, log))

    # nothing new: restart is a structural no-op
    meta_before = store._meta()
    tailer.run_available()
    assert store._meta()["version"] == meta_before["version"]


def test_reexecuted_micro_batch_skips(spark, tmp_path):
    log = str(tmp_path / "log")
    changelog.write_log(gen_changes(spark, 1000, events_per_epoch=1000, seed=49), log)
    store = Scd2Store(spark, log, str(tmp_path / "state"), **ARGS)
    tailer = Scd2Tailer(spark, log, store, str(tmp_path / "cp"))
    batch = spark.read.parquet(log)
    tailer._apply_batch(batch, 0)
    v = store._meta()["version"]
    tailer._apply_batch(batch, 0)  # crash-replay with the same batch_id
    assert store._meta()["version"] == v
    assert _rows(store.read()) == _rows(_full(spark, log))


def test_refold_after_lost_stamp_is_idempotent(spark, tmp_path):
    """Crash between data commit and the stream_batch stamp: the batch
    re-folds on the new state — all its keys are 'late', rebuild from the
    retained log, history unchanged."""
    log = str(tmp_path / "log")
    changelog.write_log(gen_changes(spark, 1000, events_per_epoch=1000, seed=50), log)
    store = Scd2Store(spark, log, str(tmp_path / "state"), **ARGS)
    tailer = Scd2Tailer(spark, log, store, str(tmp_path / "cp"))
    batch = spark.read.parquet(log)
    tailer._apply_batch(batch, 0)
    before = _rows(store.read())
    tailer._apply_batch(batch, 1)  # same rows, NEW id (stamp was lost)
    assert _rows(store.read()) == before


def test_prune_between_batches_keeps_stream_ledger(spark, tmp_path):
    """The stream_batch ledger rides inside Scd2Store._commit's meta, so
    any other commit (e.g. prune between micro-batches) carries it
    through instead of erasing it and forcing a full late-key refold."""
    log = str(tmp_path / "log")
    changelog.write_log(gen_changes(spark, 1000, events_per_epoch=1000, seed=51), log)
    store = Scd2Store(spark, log, str(tmp_path / "state"), **ARGS)
    tailer = Scd2Tailer(spark, log, store, str(tmp_path / "cp"))
    tailer._apply_batch(spark.read.parquet(log), 0)
    assert store._meta()["stream_batch"] == 0
    cutoff = store.read().where("valid_to is not null").agg(
        F.expr("percentile(cast(valid_to as double), 0.5)")
    ).first()[0]
    import datetime as dt

    store.prune(dt.datetime.fromtimestamp(cutoff))
    assert store._meta()["stream_batch"] == 0  # survived the prune commit
    # crash-replay of batch 0 still skips after the prune
    v = store._meta()["version"]
    tailer._apply_batch(spark.read.parquet(log), 0)
    assert store._meta()["version"] == v


def test_stream_schema_merges_mid_log_column(spark, tmp_path):
    """A tracked column first appearing mid-log must be visible to the
    STREAM schema (mergeSchema), or every event would fold with it
    null-filled and the history would record it as permanently NULL."""
    log = str(tmp_path / "log")
    e0 = spark.createDataFrame(
        [("insert", "u1", 1, "2024-01-01 00:00:00")],
        "op string, url string, lsn long, warc_ts string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn("epoch", F.lit(0))
    e1 = spark.createDataFrame(
        [("update", "u1", 2, "2024-01-01 00:01:00", "en")],
        "op string, url string, lsn long, warc_ts string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn("epoch", F.lit(1))
    changelog.write_log(e0, log)
    changelog.write_log(e1, log)
    store = Scd2Store(spark, log, str(tmp_path / "state"), **ARGS)
    tailer = Scd2Tailer(spark, log, store, str(tmp_path / "cp"))
    tailer.run_available()
    got = sorted(
        (r.version, r.lang, r.is_current) for r in store.read().collect()
    )
    assert got == [(1, None, False), (2, "en", True)]
