"""Per-epoch lsn-continuity audit in the replay runner (audit_sequence):
zero-extra-job stats riding the merge observation, resume re-seeding."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log


@pytest.fixture(scope="module")
def holey_log(spark, tmp_path_factory):
    """3 epochs of 1000 contiguous lsns, with a 100-lsn hole inside epoch 1
    (1500-1599) and epoch 1's tail dropped (1900-1999) so a 100-lsn gap
    opens BETWEEN epochs 1 and 2."""
    d = str(tmp_path_factory.mktemp("audit") / "log")
    df = gen_changes(spark, 3000, events_per_epoch=1000, seed=31).where(
        ~F.col("lsn").between(1500, 1599) & ~F.col("lsn").between(1900, 1999)
    )
    changelog.write_log(df, d)
    return d


def _run(spark, log_dir, root, **kw):
    reg = SchemaRegistry()
    table = make_table_for_log(spark, f"{root}/t", reg, n_buckets=8)
    cp = CheckpointStore(f"{root}/cp")
    runner = ReplayRunner(spark, log_dir, table, cp, reg, **kw)
    return runner, cp


def test_audit_records_holes_and_gaps(spark, holey_log, tmp_path):
    runner, cp = _run(spark, holey_log, str(tmp_path), audit_sequence=True)
    runner.run()
    r0, r1, r2 = (cp.get(e) for e in (0, 1, 2))
    assert (r0["lsn_min"], r0["lsn_max"]) == (0, 999)
    assert r0["seq_missing_est"] == 0 and r0["seq_gap_from_prev"] is None
    assert (r1["lsn_min"], r1["lsn_max"]) == (1000, 1899)
    assert r1["seq_missing_est"] == 100  # the 1500-1599 hole
    assert r1["seq_gap_from_prev"] == 0
    assert r2["seq_gap_from_prev"] == 100  # the dropped 1900-1999 tail
    assert r2["seq_missing_est"] == 0


def test_audit_reseeds_on_resume(spark, holey_log, tmp_path):
    runner, cp = _run(spark, holey_log, str(tmp_path), audit_sequence=True)
    runner.run(max_epochs=2)  # stop before epoch 2
    # fresh runner instance (process restart): high-water must come from
    # the checkpoint record, not in-memory state
    runner2 = ReplayRunner(
        spark, holey_log, runner.table, cp, runner.registry, audit_sequence=True
    )
    runner2.run()
    assert cp.get(2)["seq_gap_from_prev"] == 100


def test_audit_off_by_default(spark, holey_log, tmp_path):
    runner, cp = _run(spark, holey_log, str(tmp_path))
    runner.run(max_epochs=1)
    assert "lsn_max" not in cp.get(0)
