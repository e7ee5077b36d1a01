"""Key-scoped repair of a bad epoch range (streaming/repair.py):
recompute → WAP branch → audit → publish."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.audit import min_rows
from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.repair import REPAIR_EPOCH_BASE, repair_keys
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

BAD = [2, 3]


def _replay(spark, log_dir, root):
    reg = SchemaRegistry()
    table = make_table_for_log(spark, f"{root}/table", reg, n_buckets=8)
    cp = CheckpointStore(f"{root}/cp")
    ReplayRunner(spark, log_dir, table, cp, reg).run()
    return table, cp


def _rows(table):
    return sorted(
        (r.url, r.lang, r.text) for r in table.read().select("url", "lang", "text").collect()
    )


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    """good log; bad log = same log with lang mangled in epochs 2-3 (the
    'broken transform was live for two epochs' scenario); both replayed."""
    root = str(tmp_path_factory.mktemp("repair"))
    good_log = f"{root}/good_log"
    bad_log = f"{root}/bad_log"
    changelog.write_log(
        gen_changes(spark, 4000, events_per_epoch=1000, seed=11), good_log
    )
    log = spark.read.parquet(good_log)
    mangled = log.withColumn(
        "lang",
        F.when(
            F.col("epoch").isin(BAD) & F.col("lang").isNotNull(), F.lit("zz")
        ).otherwise(F.col("lang")),
    )
    changelog.write_log(mangled, bad_log, mode="overwrite")
    good_table, _ = _replay(spark, good_log, f"{root}/good")
    bad_table, bad_cp = _replay(spark, bad_log, f"{root}/bad")
    return {
        "root": root,
        "good_log": good_log,
        "good_table": good_table,
        "bad_table": bad_table,
        "bad_cp": bad_cp,
    }


def test_repair_restores_reference_state(spark, world):
    # sanity: the corruption is visible before repair
    assert _rows(world["bad_table"]) != _rows(world["good_table"])

    metrics = repair_keys(
        spark,
        world["good_log"],  # the corrected source of truth
        world["bad_table"],
        world["bad_cp"],
        bad_epochs=BAD,
        repair_id=1,
    )
    assert metrics["published"] and metrics["audit_ok"]
    assert metrics["n_affected_keys"] > 0
    assert metrics["repair_epoch"] == REPAIR_EPOCH_BASE + 1
    # repaired state == the state a clean replay would have produced,
    # including keys whose (warc_ts, lsn) winner sits INSIDE the bad range
    # (staged must win the exact tie against the stored bad row)
    assert _rows(world["bad_table"]) == _rows(world["good_table"])


def test_repair_is_idempotent(spark, world):
    again = repair_keys(
        spark,
        world["good_log"],
        world["bad_table"],
        world["bad_cp"],
        bad_epochs=BAD,
        repair_id=1,
    )
    assert again["skipped"] and not again["published"]
    assert _rows(world["bad_table"]) == _rows(world["good_table"])


def test_repair_refuses_unapplied_epochs(spark, world):
    with pytest.raises(ValueError, match="not applied"):
        repair_keys(
            spark,
            world["good_log"],
            world["bad_table"],
            world["bad_cp"],
            bad_epochs=[999],
        )


def test_failed_audit_keeps_branch_and_main(spark, world):
    before = _rows(world["bad_table"])
    version_before = world["bad_table"].meta["current_snapshot_id"]
    metrics = repair_keys(
        spark,
        world["good_log"],
        world["bad_table"],
        world["bad_cp"],
        bad_epochs=BAD,
        repair_id=7,
        checks=[min_rows(10**9)],  # impossible → audit must fail
    )
    assert not metrics["audit_ok"] and not metrics["published"]
    assert world["bad_table"].meta["current_snapshot_id"] == version_before
    assert _rows(world["bad_table"]) == before
    # branch kept for forensics
    assert "repair-7" in world["bad_table"].meta.get("branches", {})
    world["bad_table"].drop_branch("repair-7")


def test_fix_hook_transforms_history(spark, world):
    metrics = repair_keys(
        spark,
        world["good_log"],
        world["bad_table"],
        world["bad_cp"],
        bad_epochs=[2],
        repair_id=9,
        fix=lambda df: df.withColumn("lang", F.upper("lang")),
    )
    assert metrics["published"]
    langs = {
        r.lang
        for r in world["bad_table"].read().select("lang").where("lang is not null").collect()
    }
    assert any(v == v.upper() and v.isalpha() for v in langs)
