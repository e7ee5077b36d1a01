"""HLL register tables (X105): merge law (loss-free union), estimate
accuracy vs exact distinct, grouped mode, DuckDB twin parity, plan pins."""

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.hll import (
    hll_estimate,
    hll_merge,
    hll_registers,
    sql_hll_registers,
)

P = 9  # 512 registers, ~4.6% standard error


@pytest.fixture(scope="module")
def users(spark):
    # 3 domains with very different cardinalities + nulls
    return spark.range(0, 30000).select(
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 9000).cast("string")))
        .alias("user"),
        F.when(F.col("id") % 3 == 0, "a.com")
        .when(F.col("id") % 3 == 1, "b.com")
        .otherwise("c.com")
        .alias("domain"),
    )


def test_estimate_accuracy(spark, users):
    est = hll_estimate(hll_registers(users, "user", p=P), p=P).collect()[0]["est"]
    true = users.select("user").distinct().count() - 1  # minus the null row
    assert abs(est - true) / true < 0.15  # ~3 sigma at p=9


def test_merge_is_lossfree_union(spark, users):
    a = users.where(F.col("domain") == "a.com")
    b = users.where(F.col("domain") != "a.com")
    merged = hll_merge(
        hll_registers(a, "user", p=P), hll_registers(b, "user", p=P)
    )
    direct = hll_registers(users, "user", p=P)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_grouped_and_small_range(spark, users):
    regs = hll_registers(users, "user", ["domain"], p=P)
    ests = {
        r["domain"]: r["est"]
        for r in hll_estimate(regs, p=P, group_cols=["domain"]).collect()
    }
    for dom in ("a.com", "b.com", "c.com"):
        true = (
            users.where(F.col("domain") == dom)
            .where(F.col("user").isNotNull())
            .select("user").distinct().count()
        )
        assert abs(ests[dom] - true) / true < 0.15, dom
    # linear-counting regime: tiny cardinality is near-exact
    tiny = users.limit(40).where(F.col("user").isNotNull())
    est = hll_estimate(hll_registers(tiny, "user", p=P), p=P).collect()[0]["est"]
    true = tiny.select("user").distinct().count()
    assert abs(est - true) <= 2


def test_duckdb_twin_parity(spark, users):
    got = sorted(
        map(tuple, hll_registers(users, "user", ["domain"], p=P).collect())
    )
    con = duckdb.connect()
    con.register("t", users.toPandas())
    want = sorted(
        map(tuple, con.sql(sql_hll_registers("t", "user", ["domain"], p=P)).fetchall())
    )
    assert got == want


def test_guards_and_plan(spark, users):
    with pytest.raises(ValueError):
        hll_registers(users, "user", p=2)
    with pytest.raises(ValueError):
        hll_merge()
    plan = (
        hll_registers(users, "user", p=P)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 1  # one agg shuffle, map-side max
