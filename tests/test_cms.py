"""Count-Min sketch (X104): one-sided error law, exactness without
collisions, merge linearity, weighted mode, never-seen keys, DuckDB twin
parity, plan pins."""

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
    sql_cms_estimate,
)

D, W_SMALL, W_BIG = 4, 64, 1 << 16


@pytest.fixture(scope="module")
def events(spark):
    # zipf-ish: key k{i} occurs (120 - i) times, i in 0..119, + nulls
    rows = [(f"k{i}", j) for i in range(120) for j in range(120 - i)]
    rows += [(None, 0)] * 10
    return spark.createDataFrame(rows, "key string, j long")


def _true_counts(events):
    return {
        r["key"]: r["n"]
        for r in events.where(F.col("key").isNotNull())
        .groupBy("key").agg(F.count("*").alias("n")).collect()
    }


def test_one_sided_and_exact_when_wide(spark, events):
    true = _true_counts(events)
    keys = events.select("key").distinct()
    for width, require_exact in ((W_SMALL, False), (W_BIG, True)):
        sk = cms_build(events, "key", D, width)
        est = {
            r["key"]: r["est"]
            for r in cms_estimate(sk, keys, "key", D, width).collect()
        }
        assert set(est) == set(true)  # nulls excluded both sides
        assert all(est[k] >= true[k] for k in true)  # NEVER undercounts
        if require_exact:
            assert est == true  # min-over-depth kills lone collisions
        else:
            assert sum(est.values()) > sum(true.values())  # real collisions


def test_merge_linearity(spark, events):
    a = events.where(F.col("j") % 2 == 0)
    b = events.where(F.col("j") % 2 == 1)
    merged = cms_merge(
        cms_build(a, "key", D, W_SMALL), cms_build(b, "key", D, W_SMALL)
    )
    direct = cms_build(events, "key", D, W_SMALL)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_weighted_and_never_seen(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7), ("c", None)], "key string, w long"
    )
    sk = cms_build(df, "key", D, W_BIG, weight_col="w")
    keys = df.sparkSession.createDataFrame(
        [("a",), ("b",), ("zzz",)], "key string"
    )
    est = {r["key"]: r["est"] for r in cms_estimate(sk, keys, "key", D, W_BIG).collect()}
    assert est == {"a": 15, "b": 7, "zzz": 0}  # null-weight row excluded


def test_duckdb_twin_parity(spark, events):
    got = sorted(
        map(
            tuple,
            cms_estimate(
                cms_build(events, "key", D, W_SMALL),
                events.select("key"),
                "key",
                D,
                W_SMALL,
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.register("t", events.toPandas())
    want = sorted(
        map(tuple, con.sql(sql_cms_estimate("t", "t", "key", D, W_SMALL)).fetchall())
    )
    assert got == want


def test_guards_and_plan(spark, events):
    with pytest.raises(ValueError):
        cms_build(events, "key", depth=0)
    with pytest.raises(ValueError):
        cms_merge()
    build_plan = (
        cms_build(events, "key", D, W_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in build_plan
    assert build_plan.count("Exchange") == 1  # one agg shuffle, map-side combined
    est_plan = (
        cms_estimate(
            cms_build(events, "key", D, W_SMALL), events.select("key"), "key", D, W_SMALL
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in est_plan  # sketch broadcast, keys stay put
