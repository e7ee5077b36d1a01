"""Snapshot reconciliation (streaming/repair.py::reconcile_snapshot): a
replica healed against an authoritative source snapshot — drift from
missed deletes, missed inserts, diverged values, and spurious future-dated
rows must all converge; re-runs are exactly-once; a healed table stages
zero corrections."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.audit import min_rows
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.streaming.repair import (
    RECONCILE_EPOCH_BASE,
    reconcile_snapshot,
)

SCHEMA = "url string, warc_ts timestamp, lsn long, val double"


def _ts(col):
    return F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
        secs=col
    )


def _frame(spark, rows):
    """rows: (op, url, lsn, val)"""
    df = spark.createDataFrame(
        [(o, u, int(l), float(v)) for o, u, l, v in rows],
        "op string, url string, lsn long, val double",
    )
    return df.withColumn("warc_ts", _ts(F.col("lsn")))


@pytest.fixture()
def drifted(spark, tmp_path):
    """A replica that has drifted from its source in all four ways."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([], SCHEMA).schema,
        key_col="url", n_buckets=8,
    )
    t.merge(_frame(spark, [
        ("insert", "u_ok", 1, 1.0),        # consistent
        ("insert", "u_stale", 2, 2.0),     # source later updated; replica missed it
        ("insert", "u_gone", 3, 3.0),      # source deleted it; replica missed it
        ("insert", "u_future", 900, 4.0),  # spurious future-dated replica row
    ]), epoch=0, mode="mor")
    # authoritative source state "now"
    source = _frame(spark, [
        ("x", "u_ok", 1, 1.0),
        ("x", "u_stale", 10, 2.5),
        ("x", "u_new", 11, 7.0),           # replica never saw this insert
        ("x", "u_future", 12, 4.5),        # truth disagrees with the future row
    ]).drop("op")
    return t, source


def _state(table):
    return {
        r["url"]: (round(r["val"], 6), r["lsn"])
        for r in table.read().select("url", "val", "lsn").collect()
    }


def test_reconcile_heals_all_drift(spark, drifted):
    t, source = drifted
    res = reconcile_snapshot(spark, source, t, reconcile_id=1)
    assert res["published"] and res["audit_ok"]
    got = _state(t)
    assert set(got) == {"u_ok", "u_stale", "u_new", "u_future"}
    assert got["u_stale"][0] == 2.5
    assert got["u_new"][0] == 7.0
    # the future-dated row is corrected even though its stored ts beats the
    # snapshot's: the correction is stamped at the per-key high-water
    assert got["u_future"][0] == 4.5
    # a second sweep with a fresh id finds nothing to change
    res2 = reconcile_snapshot(spark, source, t, reconcile_id=2)
    assert res2.get("staged_rows") in (0, None) or res2["staged_rows"] == 0
    assert _state(t) == got


def test_reconcile_is_exactly_once(spark, drifted):
    t, source = drifted
    res = reconcile_snapshot(spark, source, t, reconcile_id=5)
    assert res["reconcile_epoch"] == RECONCILE_EPOCH_BASE + 5
    before = _state(t)
    # same id re-run (crash replay): ledger skips, state unchanged
    res2 = reconcile_snapshot(spark, source, t, reconcile_id=5)
    assert res2["skipped"]
    assert _state(t) == before


def test_reconcile_audit_gate_keeps_branch(spark, drifted):
    t, source = drifted
    res = reconcile_snapshot(
        spark, source, t, reconcile_id=9,
        checks=[min_rows(10_000)], publish=True,
    )
    assert not res["audit_ok"] and not res["published"]
    # main untouched; the staged branch holds the corrections for forensics
    assert set(_state(t)) == {"u_ok", "u_stale", "u_gone", "u_future"}
    branch_rows = {
        r["url"] for r in t.read(ref="reconcile-9").select("url").collect()
    }
    assert "u_new" in branch_rows and "u_gone" not in branch_rows


def test_partial_snapshot_rejected(spark, drifted):
    t, source = drifted
    with pytest.raises(ValueError, match="missing"):
        reconcile_snapshot(spark, source.drop("val"), t, reconcile_id=3)


def test_reconcile_sees_mor_winners_not_stale_versions(spark, tmp_path):
    """MoR table with a WRONGFUL tombstone stacked on a real row: the raw
    with_system scan still holds the superseded insert whose payload equals
    the snapshot — diffing against unresolved versions masks the divergence
    and the key is never healed. Reconcile must diff per-key WINNERS."""
    t = LakeTable.create(
        spark, str(tmp_path / "mor_t"),
        spark.createDataFrame([], SCHEMA).schema,
        key_col="url", n_buckets=4,
    )
    t.merge(_frame(spark, [("insert", "u_kept", 1, 1.0),
                           ("insert", "u_wronged", 2, 2.0)]),
            epoch=0, mode="mor")
    # wrongful delete lands as a LATER MoR version; no compaction runs
    t.merge(_frame(spark, [("delete", "u_wronged", 10, 0.0)]),
            epoch=1, mode="mor")
    assert set(_state(t)) == {"u_kept"}
    source = _frame(spark, [("x", "u_kept", 1, 1.0),
                            ("x", "u_wronged", 2, 2.0)]).drop("op")
    res = reconcile_snapshot(spark, source, t, reconcile_id=9)
    assert res["published"], res
    got = _state(t)
    assert set(got) == {"u_kept", "u_wronged"}
    assert got["u_wronged"][0] == 2.0
    # healed table: a second sweep stages nothing
    res2 = reconcile_snapshot(spark, source, t, reconcile_id=10)
    assert (res2.get("staged_rows") or 0) == 0
