"""DLQ requeue (streaming/repair.py::requeue_quarantine): quarantined rows
re-enter the log after a fix and converge to the on-time outcome."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.repair import requeue_quarantine
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log


def _replay(spark, log_dir, root, **kw):
    reg = SchemaRegistry()
    table = make_table_for_log(spark, f"{root}/t", reg, n_buckets=8)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(f"{root}/cp"), reg, **kw
    )
    runner.run()
    return table, runner


def _rows(table):
    return sorted(
        (r.url, r.lang, r.text)
        for r in table.read().select("url", "lang", "text").collect()
    )


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    """clean log; poisoned twin where every 50th event's op is the unknown
    alias 'upsert' (quarantined on replay)."""
    root = str(tmp_path_factory.mktemp("requeue"))
    clean = gen_changes(spark, 3000, events_per_epoch=1000, seed=53)
    poisoned = clean.withColumn(
        "op",
        F.when(
            (F.col("lsn") % 50 == 0) & (F.col("op") == "update"), F.lit("upsert")
        ).otherwise(F.col("op")),
    )
    changelog.write_log(clean, f"{root}/clean_log")
    changelog.write_log(poisoned, f"{root}/log")
    clean_table, _ = _replay(spark, f"{root}/clean_log", f"{root}/clean")
    return {"root": root, "clean_table": clean_table}


def test_requeue_converges_to_on_time_outcome(spark, world):
    root = world["root"]
    table, runner = _replay(
        spark, f"{root}/log", f"{root}/poisoned", quarantine_dir=f"{root}/dlq"
    )
    assert _rows(table) != _rows(world["clean_table"])  # rows were withheld

    res = requeue_quarantine(
        spark,
        f"{root}/dlq",
        f"{root}/log",
        as_epoch=3,
        fix=lambda df: df.withColumn(
            "op", F.when(F.col("op") == "upsert", F.lit("update")).otherwise(F.col("op"))
        ),
    )
    assert res["requeued"] > 0 and res["as_epoch"] == 3
    runner.run()  # picks up the requeued epoch through the normal path
    assert _rows(table) == _rows(world["clean_table"])


def test_requeue_refuses_existing_epoch(spark, world):
    with pytest.raises(ValueError, match="already exists"):
        requeue_quarantine(spark, f"{world['root']}/dlq", f"{world['root']}/log", as_epoch=1)


def test_requeue_refuses_unhealed_rows(spark, world):
    with pytest.raises(ValueError, match="still poison"):
        requeue_quarantine(
            spark, f"{world['root']}/dlq", f"{world['root']}/log", as_epoch=9
        )  # no fix: 'upsert' is still an unknown op