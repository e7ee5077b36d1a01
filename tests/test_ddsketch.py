"""DDSketch quantile state (X107): relative-error law vs exact order
statistics, merge linearity, sign/zero handling, grouped mode, DuckDB
twin parity, plan pins."""

import math

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.ddsketch import (
    dd_histogram,
    dd_merge,
    dd_quantiles,
    sql_dd_histogram,
)

ALPHA = 0.02
QS = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]


@pytest.fixture(scope="module")
def values(spark):
    # heavy-tailed positives + negatives + zeros + null/nan noise
    return spark.range(0, 5000).select(
        F.when(F.col("id") % 97 == 0, 0.0)
        .when(F.col("id") % 11 == 0, -F.exp((F.col("id") % 50) / 6.0))
        .when(F.col("id") % 53 == 0, None)
        .when(F.col("id") % 59 == 0, F.lit(float("nan")))
        .otherwise(F.exp((F.col("id") % 80) / 7.0))
        .alias("v"),
        (F.col("id") % 3).alias("grp"),
    )


def _exact(rows, q):
    xs = sorted(rows)
    r = max(math.ceil(q * len(xs)), 1)
    return xs[r - 1]


def test_relative_error_law(spark, values):
    clean = [
        r["v"] for r in values.collect()
        if r["v"] is not None and not math.isnan(r["v"])
    ]
    sk = dd_histogram(values, "v", alpha=ALPHA)
    ests = {r["q"]: r["est"] for r in dd_quantiles(sk, QS, ALPHA).collect()}
    for q in QS:
        x = _exact(clean, q)
        if x == 0:
            assert abs(ests[q]) < 1e-9
        else:
            assert abs(ests[q] - x) <= ALPHA * abs(x) * 1.000001, (q, ests[q], x)


def test_merge_linearity_and_groups(spark, values):
    a = values.where(F.col("id") % 2 == 0)
    b = values.where(F.col("id") % 2 == 1)
    merged = dd_merge(
        dd_histogram(a, "v", ["grp"], ALPHA), dd_histogram(b, "v", ["grp"], ALPHA)
    )
    direct = dd_histogram(values, "v", ["grp"], ALPHA)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # grouped quantiles obey the law per group
    ests = {
        (r["grp"], r["q"]): r["est"]
        for r in dd_quantiles(direct, [0.5], ALPHA, ["grp"]).collect()
    }
    for grp in (0, 1, 2):
        rows = [
            r["v"] for r in values.where(F.col("grp") == grp).collect()
            if r["v"] is not None and not math.isnan(r["v"])
        ]
        x = _exact(rows, 0.5)
        assert abs(ests[(grp, 0.5)] - x) <= ALPHA * abs(x) * 1.000001


def test_duckdb_twin_parity(spark, values):
    got = sorted(map(tuple, dd_histogram(values, "v", ["grp"], ALPHA).collect()))
    con = duckdb.connect()
    con.register("t", values.toPandas())
    want = sorted(
        map(tuple, con.sql(sql_dd_histogram("t", "v", ["grp"], ALPHA)).fetchall())
    )
    assert got == want


def test_guards_and_plan(spark, values):
    with pytest.raises(ValueError):
        dd_histogram(values, "v", alpha=1.5)
    with pytest.raises(ValueError):
        dd_quantiles(dd_histogram(values, "v"), [0.0])
    with pytest.raises(ValueError):
        dd_merge()
    plan = (
        dd_histogram(values, "v", alpha=ALPHA)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 1  # one map-side-combinable agg
