"""No-op-update suppression (lake/merge.py::filter_unchanged +
ReplayRunner(skip_unchanged_cols=...)): unchanged re-crawls must not be
re-applied, changed rows and deletes must, and the final CONTENT must match
an unsuppressed replay exactly (only the winning warc_ts may stay older —
the documented trade)."""

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ev(op, url, lsn, minute, body, lang="en", epoch=0):
    return (
        op, url, lsn, T0.replace(minute=minute),
        body.encode() if body is not None else None, lang, 1, epoch,
    )


DDL = (
    "op string, url string, lsn long, warc_ts timestamp, html binary,"
    " lang string, schema_version int, epoch int"
)


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("suplog"))
    e0 = [
        _ev("insert", f"https://x.org/{i}", i, 1, f"<html>v1-{i}</html>", epoch=0)
        for i in range(6)
    ]
    e1 = (
        # identical payload re-crawled later → suppress
        [_ev("update", f"https://x.org/{i}", 10 + i, 30, f"<html>v1-{i}</html>", epoch=1)
         for i in range(3)]
        # genuinely changed → apply
        + [_ev("update", f"https://x.org/{i}", 10 + i, 30, f"<html>v2-{i}</html>", epoch=1)
           for i in (3, 4)]
        # delete must always pass through
        + [_ev("delete", "https://x.org/5", 15, 30, None, epoch=1)]
    )
    changelog.write_log(spark.createDataFrame(e0 + e1, DDL), d)
    return d


def _run(spark, log_dir, tmp_path, name, **kw):
    reg = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / f"t_{name}"), reg, n_buckets=4)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / f"cp_{name}")),
        reg, **kw,
    )
    return runner.run(), table


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_suppression_metrics_and_content_parity(spark, log_dir, tmp_path, mode):
    res_s, t_s = _run(
        spark, log_dir, tmp_path, f"s_{mode}",
        merge_mode=mode, skip_unchanged_cols=["text", "lang"],
    )
    res_p, t_p = _run(spark, log_dir, tmp_path, f"p_{mode}", merge_mode=mode)

    # epoch 0: nothing stored yet, nothing suppressible
    assert res_s[0]["suppressed_unchanged"] == 0
    assert res_s[0]["staged_before_suppress"] == 6
    # epoch 1: the 3 identical re-crawls are suppressed; 2 changed + 1
    # delete pass through
    assert res_s[1]["suppressed_unchanged"] == 3
    assert res_s[1]["staged_before_suppress"] == 6

    content = lambda t: {  # noqa: E731
        r["url"]: (r["text"], r["lang"])
        for r in t.read().select("url", "text", "lang").collect()
    }
    assert content(t_s) == content(t_p)
    assert len(content(t_s)) == 5  # the delete landed
    got = content(t_s)
    assert got["https://x.org/3"][0] and "v2-3" in got["https://x.org/3"][0]

    # the suppressed keys keep their ORIGINAL warc_ts (documented trade)
    ts = {r["url"]: r["warc_ts"] for r in t_s.read().select("url", "warc_ts").collect()}
    assert ts["https://x.org/0"].minute == 1
    assert ts["https://x.org/3"].minute == 30


def test_suppressed_rerun_still_exactly_once(spark, log_dir, tmp_path):
    res1, table = _run(
        spark, log_dir, tmp_path, "once", skip_unchanged_cols=["text", "lang"]
    )
    reg = SchemaRegistry()
    from data_pipeline_spark.lake.table import LakeTable

    t2 = LakeTable.load(spark, str(tmp_path / "t_once"))
    r2 = ReplayRunner(
        spark, log_dir, t2, CheckpointStore(str(tmp_path / "cp_once")), reg,
        skip_unchanged_cols=["text", "lang"],
    ).run()
    assert all(m.get("skipped") for m in r2)


def test_filter_unchanged_all_suppressed_epoch_commits_empty(spark, tmp_path):
    """An epoch that is 100% no-ops still commits (exactly-once ledger
    advances) but merges zero rows."""
    d = str(tmp_path / "log")
    e0 = [_ev("insert", f"https://y.org/{i}", i, 1, f"<b>{i}</b>", epoch=0) for i in range(3)]
    e1 = [_ev("update", f"https://y.org/{i}", 10 + i, 30, f"<b>{i}</b>", epoch=1) for i in range(3)]
    changelog.write_log(spark.createDataFrame(e0 + e1, DDL), d)
    res, table = _run(
        spark, d, tmp_path, "empty", skip_unchanged_cols=["text", "lang"]
    )
    assert res[1]["suppressed_unchanged"] == 3
    assert 1 in table.committed_epochs()
    assert table.read().count() == 3
