"""Changelog compaction: replay equivalence (the load-bearing property),
size shrink, tombstone handling, schema evolution across the fold, and
checkpoint-ledger compatibility."""

import os

import pyspark.sql.functions as F

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.sources.logcompact import compact_log
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log


def _nullsafe_sort(rows):
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


def _final_state(spark, tmp_path, log_dir, tag):
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / f"table_{tag}"), reg, n_buckets=4)
    ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / f"cp_{tag}")), reg
    ).run()
    df = table.read()
    cols = sorted(df.columns)
    return _nullsafe_sort(tuple(r) for r in df.select(*cols).collect())


def _gen_log(spark, tmp_path, n=2000, **kw):
    log_dir = str(tmp_path / "log")
    changelog.write_log(
        gen_changes(spark, n, events_per_epoch=400, seed=13, **kw), log_dir
    )
    return log_dir


def test_compacted_replay_equals_original(spark, tmp_path):
    """fold(fold(prefix) ∪ suffix) == fold(whole log): final lake state
    identical, with hot keys and deletes in play."""
    log_dir = _gen_log(spark, tmp_path, hot_key_share=30)
    out_dir = str(tmp_path / "compacted")
    stats = compact_log(spark, log_dir, out_dir, upto_epoch=2)
    assert stats["prefix_epochs"] == 3 and stats["suffix_epochs"] == 2
    # compaction shrank the prefix: winners < events in epochs 0-2
    prefix_events = (
        spark.read.parquet(log_dir).where(F.col("epoch") <= 2).count()
    )
    assert stats["winners"] < prefix_events
    assert _final_state(spark, tmp_path, out_dir, "c") == _final_state(
        spark, tmp_path, log_dir, "o"
    )


def test_compaction_across_schema_evolution(spark, tmp_path):
    """Prefix spans registry v1→v2 (fetch_status appears mid-log): the
    folded epoch carries the superset schema and the evolved replay still
    matches."""
    log_dir = _gen_log(spark, tmp_path, evolve_at_epoch=2)
    out_dir = str(tmp_path / "compacted")
    compact_log(spark, log_dir, out_dir, upto_epoch=3)
    assert _final_state(spark, tmp_path, out_dir, "c") == _final_state(
        spark, tmp_path, log_dir, "o"
    )


def test_drop_tombstones_only_safe_from_genesis(spark, tmp_path):
    """drop_tombstones removes delete winners; replay-from-empty is still
    identical (delete-to-empty is a no-op)."""
    log_dir = _gen_log(spark, tmp_path)
    out_dir = str(tmp_path / "compacted")
    stats = compact_log(
        spark, log_dir, out_dir, upto_epoch=4, drop_tombstones=True
    )
    assert stats["dropped_tombstones"] > 0 and stats["suffix_epochs"] == 0
    assert _final_state(spark, tmp_path, out_dir, "c") == _final_state(
        spark, tmp_path, log_dir, "o"
    )


def test_checkpoint_ledger_skips_compacted_epoch(spark, tmp_path):
    """A consumer that already applied the prefix resumes on the compacted
    log without reapplying: the folded epoch keeps the last prefix id, so
    the exactly-once ledger skips it and only the suffix applies."""
    log_dir = _gen_log(spark, tmp_path)
    out_dir = str(tmp_path / "compacted")
    compact_log(spark, log_dir, out_dir, upto_epoch=2)

    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "table_r"), reg, n_buckets=4)
    cp = CheckpointStore(str(tmp_path / "cp_r"))
    runner = ReplayRunner(spark, log_dir, table, cp, reg)
    runner.run(max_epochs=3)  # applies original epochs 0,1,2

    # switch the SAME consumer (same checkpoints, same table) to the
    # compacted log and finish
    results = ReplayRunner(spark, out_dir, table, cp, reg).run()
    by_epoch = {r["epoch"]: r for r in results}
    assert by_epoch[2]["skipped"] is True  # ledger hit, not reapplied
    assert not by_epoch[3]["skipped"] and not by_epoch[4]["skipped"]

    want = _final_state(spark, tmp_path, log_dir, "o")
    df = table.read()
    got = _nullsafe_sort(tuple(r) for r in df.select(*sorted(df.columns)).collect())
    assert got == want


def test_compact_rerun_is_idempotent(spark, tmp_path):
    """A partial/failed compaction re-run must not double the folded epoch
    (write_log appends; the folded dir is swept first)."""
    log_dir = _gen_log(spark, tmp_path)
    out_dir = str(tmp_path / "compacted")
    s1 = compact_log(spark, log_dir, out_dir, upto_epoch=2)
    s2 = compact_log(spark, log_dir, out_dir, upto_epoch=2)
    assert s1["winners"] == s2["winners"]
    n = spark.read.parquet(out_dir).where(F.col("epoch") == 2).count()
    assert n == s1["winners"]
