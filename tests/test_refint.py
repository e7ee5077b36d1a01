"""Cross-stream CDC audits (operators/refint.py): orphan detection after
replay and multi-writer conflict resolution — hand-planted streams with
every reason / resolution branch exercised."""

import pytest

from data_pipeline_spark.operators.refint import conflict_audit, orphan_audit

CHILD_DDL = "ck string, fk string, lsn long, op string"
PARENT_DDL = "pk string, lsn long, op string"


def test_orphan_audit_reasons(spark):
    parents = spark.createDataFrame(
        [
            ("p1", 1, "insert"),
            ("p2", 1, "insert"),
            ("p2", 3, "delete"),
            ("p3", 1, "insert"),
        ],
        PARENT_DDL,
    )
    children = spark.createDataFrame(
        [
            ("c1", "p1", 1, "insert"),            # fine
            ("c2", "p2", 1, "insert"),            # parent_deleted
            ("c3", "p4", 1, "insert"),            # parent_missing
            ("c4", "p1", 1, "insert"),
            ("c4", "p1", 2, "delete"),            # child deleted → excluded
            ("c5", "p3", 1, "insert"),
            ("c5", "p2", 2, "update"),            # repointed → parent_deleted
            ("c6", "p2", 1, "insert"),
            ("c6", "p1", 2, "update"),            # repointed to live → fine
        ],
        CHILD_DDL,
    )
    got = {
        r["ck"]: (r["fk"], r["reason"])
        for r in orphan_audit(
            children, parents, ("ck",), fk_col="fk", parent_key_col="pk"
        ).collect()
    }
    assert got == {
        "c2": ("p2", "parent_deleted"),
        "c3": ("p4", "parent_missing"),
        "c5": ("p2", "parent_deleted"),
    }


def test_orphan_audit_empty_when_consistent(spark):
    parents = spark.createDataFrame([("p1", 1, "insert")], PARENT_DDL)
    children = spark.createDataFrame([("c1", "p1", 1, "insert")], CHILD_DDL)
    assert (
        orphan_audit(
            children, parents, ("ck",), fk_col="fk", parent_key_col="pk"
        ).count()
        == 0
    )


W_DDL = "pk string, lsn long, op string, price double"


def test_conflict_audit_resolution(spark):
    w1 = spark.createDataFrame(
        [
            ("k1", 5, "update", 10.0),
            ("k2", 5, "update", 10.0),
            ("k3", 1, "insert", 1.0),   # only writer → excluded
            ("k4", 5, "update", 1.0),
            ("k5", 9, "delete", None),
        ],
        W_DDL,
    )
    w2 = spark.createDataFrame(
        [
            ("k1", 7, "update", 20.0),  # higher seq → wins, images differ
            ("k2", 3, "update", 10.0),  # same image → contended, no conflict
            ("k5", 9, "update", 4.0),   # seq tie → lowest writer (1) wins
        ],
        W_DDL,
    )
    w3 = spark.createDataFrame(
        [("k4", 5, "update", 2.0)],     # seq tie with w1 → w1 wins
        W_DDL,
    )
    got = {
        r["pk"]: r.asDict()
        for r in conflict_audit(
            [(1, w1), (2, w2), (3, w3)], ("pk",), "lsn", "op", ("price",)
        ).collect()
    }
    assert set(got) == {"k1", "k2", "k4", "k5"}  # k3: single writer
    assert got["k1"]["is_conflict"] and got["k1"]["winner_writer"] == 2
    assert got["k1"]["price"] == 20.0 and got["k1"]["winner_seq"] == 7
    assert not got["k2"]["is_conflict"] and got["k2"]["winner_writer"] == 1
    assert got["k4"]["is_conflict"] and got["k4"]["winner_writer"] == 1
    assert got["k4"]["price"] == 1.0
    assert got["k5"]["is_conflict"] and got["k5"]["winner_writer"] == 1
    assert got["k5"]["final_op"] == "delete" and got["k5"]["price"] is None
    assert all(r["n_writers"] == 2 for r in got.values())


def test_conflict_audit_requires_streams(spark):
    with pytest.raises(ValueError):
        conflict_audit([], ("pk",), "lsn", "op", ("price",))


def test_audit_plans_stay_hash_agg(spark):
    """No window, no cartesian, no per-row Python in either audit plan."""
    parents = spark.createDataFrame([("p1", 1, "insert")], PARENT_DDL)
    children = spark.createDataFrame([("c1", "p1", 1, "insert")], CHILD_DDL)
    plans = [
        orphan_audit(children, parents, ("ck",), fk_col="fk", parent_key_col="pk")
        ._jdf.queryExecution().executedPlan().toString(),
        conflict_audit([(1, spark.createDataFrame([("k1", 5, "update", 1.0)], W_DDL))],
                       ("pk",), "lsn", "op", ("price",))
        ._jdf.queryExecution().executedPlan().toString(),
    ]
    for plan in plans:
        assert "CartesianProduct" not in plan
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
