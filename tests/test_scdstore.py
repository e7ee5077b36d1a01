"""Maintained SCD2 history store (lake/scdstore.py): epoch-by-epoch
maintenance, exactly-once resume, crash safety."""

import json
import os

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.scdstore import Scd2Store
from data_pipeline_spark.operators.scd import scd2_history
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes

ARGS = dict(
    key_cols=("url",), order_cols=("warc_ts", "lsn"), tracked_cols=("op", "lang")
)


def _rows(df):
    return sorted(
        (r.url, r.version, r.op, r.lang, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    )


@pytest.fixture
def log_dir(spark, tmp_path):
    # function-scoped: two tests append their own epoch 3 to the log
    d = str(tmp_path / "log")
    changelog.write_log(gen_changes(spark, 3000, events_per_epoch=1000, seed=17), d)
    return d


def test_maintained_equals_full_derivation(spark, log_dir, tmp_path):
    store = Scd2Store(spark, log_dir, str(tmp_path / "state"), **ARGS)
    res = store.refresh()
    assert res["applied"] == [0, 1, 2]
    full = scd2_history(
        spark.read.parquet(log_dir).select("url", "op", "lang", "warc_ts", "lsn"),
        ARGS["key_cols"], ARGS["order_cols"], ARGS["tracked_cols"],
        carry_order=True,
    )
    assert _rows(store.read()) == _rows(full)
    assert res["versions"] == full.count()
    # delete events are tombstone VERSIONS (op among tracked_cols): history
    # keeps them queryable, with intervals closed by the next version
    assert store.read().where("op = 'delete'").count() > 0


def test_refresh_is_incremental_and_idempotent(spark, log_dir, tmp_path):
    store = Scd2Store(spark, log_dir, str(tmp_path / "state"), **ARGS)
    store.refresh()
    again = store.refresh()
    assert again["applied"] == []  # nothing new → zero work, state untouched
    assert store.cursor == 2


def test_resume_after_new_epochs(spark, log_dir, tmp_path):
    state = str(tmp_path / "state")
    store = Scd2Store(spark, log_dir, state, **ARGS)
    store.refresh()
    # a new epoch arrives (same generator, shifted epoch id)
    extra = (
        gen_changes(spark, 1000, events_per_epoch=1000, seed=18)
        .withColumn("epoch", F.col("epoch") + 3)
        .withColumn("lsn", F.col("lsn") + 10_000)
    )
    changelog.write_log(extra, log_dir)
    res = store.refresh()
    assert res["applied"] == [3]
    full = scd2_history(
        spark.read.parquet(log_dir).select("url", "op", "lang", "warc_ts", "lsn"),
        ARGS["key_cols"], ARGS["order_cols"], ARGS["tracked_cols"],
        carry_order=True,
    )
    assert _rows(store.read()) == _rows(full)


def test_crash_between_data_and_meta_recovers(spark, log_dir, tmp_path):
    """A state-vN dir that meta never pointed to (crash between rename and
    meta swap) must be swept, not wedge the next commit."""
    state = str(tmp_path / "state")
    store = Scd2Store(spark, log_dir, state, **ARGS)
    store.refresh()
    before = _rows(store.read())
    meta = json.load(open(store._meta_path))
    # simulate the orphan: copy live state under the NEXT version name
    import shutil

    orphan = os.path.join(state, f"state-v{meta['version'] + 1}")
    shutil.copytree(os.path.join(state, meta["data"]), orphan)
    assert _rows(store.read()) == before  # reader follows meta only
    # next commit sweeps the orphan and proceeds
    extra = (
        gen_changes(spark, 500, events_per_epoch=500, seed=19)
        .withColumn("epoch", F.col("epoch") + 3)
        .withColumn("lsn", F.col("lsn") + 50_000)
    )
    changelog.write_log(extra, log_dir)
    res = store.refresh()
    assert res["applied"] == [3]
    assert store.cursor == 3


def test_prune_persists_and_reapplies(spark, log_dir, tmp_path):
    store = Scd2Store(spark, log_dir, str(tmp_path / "state"), **ARGS)
    store.refresh()
    before = store.read().count()
    # median closed-interval end as the cutoff → a real subset is pruned
    cutoff = store.read().where("valid_to is not null").agg(
        F.expr("percentile(cast(valid_to as double), 0.5)")
    ).first()[0]
    import datetime as dt

    cutoff_ts = dt.datetime.fromtimestamp(cutoff)
    remaining = store.prune(cutoff_ts)
    assert 0 < remaining < before
    assert store.read().where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.lit(cutoff_ts))
    ).count() == 0
    assert store.retention_cutoff is not None
    # new epoch arrives: refresh must keep enforcing the standing cutoff
    extra = (
        gen_changes(spark, 1000, events_per_epoch=1000, seed=41)
        .withColumn("epoch", F.col("epoch") + 3)
        .withColumn("lsn", F.col("lsn") + 77_000)
    )
    changelog.write_log(extra, log_dir)
    store.refresh()
    assert store.cursor == 3
    assert store.read().where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.lit(cutoff_ts))
    ).count() == 0


def test_tracked_column_added_mid_log(spark, tmp_path):
    """Schema evolution: a tracked column that first appears in epoch 1
    reads as typed nulls in epoch 0 — early versions carry null, its first
    real value opens a version."""
    log = str(tmp_path / "log")
    e0 = spark.createDataFrame(
        [("insert", "u1", 1, "2024-01-01 00:00:00", "en")],
        "op string, url string, lsn long, warc_ts string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn("epoch", F.lit(0))
    e1 = spark.createDataFrame(
        [("update", "u1", 2, "2024-01-01 00:01:00", "en", "news")],
        "op string, url string, lsn long, warc_ts string, lang string,"
        " category string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn("epoch", F.lit(1))
    changelog.write_log(e0, log)
    changelog.write_log(e1, log)
    store = Scd2Store(
        spark, log, str(tmp_path / "state"),
        key_cols=("url",), order_cols=("warc_ts", "lsn"),
        tracked_cols=("lang", "category"),
    )
    res = store.refresh()
    assert res["applied"] == [0, 1]
    got = sorted(
        (r.version, r.lang, r.category, r.is_current)
        for r in store.read().collect()
    )
    assert got == [(1, "en", None, False), (2, "en", "news", True)]


def test_prune_rejects_unparseable_cutoff(spark, log_dir, tmp_path):
    """An unparseable cutoff would become NULL in to_timestamp and the
    prune predicate would then silently delete every closed version —
    fail fast instead, state untouched."""
    store = Scd2Store(spark, log_dir, str(tmp_path / "state"), **ARGS)
    store.refresh()
    before = _rows(store.read())
    with pytest.raises(ValueError, match="cutoff"):
        store.prune("2024-13-45")  # month 13: not a timestamp
    with pytest.raises(ValueError, match="cutoff"):
        store.prune(1700000000)  # raw epoch seconds: pass a datetime
    assert _rows(store.read()) == before
    assert store.retention_cutoff is None


def test_prune_cutoff_in_same_commit_as_data(spark, log_dir, tmp_path):
    """The standing cutoff rides the SAME meta swap as the pruned data —
    exactly one meta write per prune (no window where pruning is applied
    but no cutoff persists)."""
    import data_pipeline_spark.lake.scdstore as scdstore_mod

    store = Scd2Store(spark, log_dir, str(tmp_path / "state"), **ARGS)
    store.refresh()
    cutoff = store.read().where("valid_to is not null").agg(
        F.expr("percentile(cast(valid_to as double), 0.5)")
    ).first()[0]
    import datetime as dt

    writes = []
    orig = scdstore_mod._atomic_write

    def spy(path, data):
        writes.append(path)
        return orig(path, data)

    scdstore_mod._atomic_write = spy
    try:
        store.prune(dt.datetime.fromtimestamp(cutoff))
    finally:
        scdstore_mod._atomic_write = orig
    meta_writes = [p for p in writes if p.endswith("meta.json")]
    assert len(meta_writes) == 1
    assert store.retention_cutoff is not None


def test_refresh_grouped_commits_equal_per_epoch(spark, log_dir, tmp_path):
    """The fold is batching-invariant: landing all pending epochs in ONE
    commit (epochs_per_commit=None) produces the identical history with a
    single O(history) rewrite instead of one per epoch."""
    per_epoch = Scd2Store(spark, log_dir, str(tmp_path / "s1"), **ARGS)
    per_epoch.refresh()
    grouped = Scd2Store(spark, log_dir, str(tmp_path / "s2"), **ARGS)
    res = grouped.refresh(epochs_per_commit=None)
    assert res["applied"] == [0, 1, 2]
    assert grouped.cursor == 2
    assert grouped._meta()["version"] == 1  # one commit for the backlog
    assert per_epoch._meta()["version"] == 3
    assert _rows(grouped.read()) == _rows(per_epoch.read())
