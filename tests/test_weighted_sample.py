"""Weighted sampling without replacement (X103): determinism,
weight-proportional inclusion, guard semantics, DuckDB twin parity,
plan pins."""

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.sampling import (
    HEX_SPACE,
    sql_weighted_sample,
    weighted_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (f"d{i:03d}", "heavy" if i % 10 == 0 else "light",
             100.0 if i % 10 == 0 else 1.0)
            for i in range(200)
        ],
        "id string, cls string, w double",
    )


def test_deterministic_across_layouts(spark, docs):
    a = sorted(r["id"] for r in weighted_sample(docs, "id", "w", 20).collect())
    b = sorted(
        r["id"]
        for r in weighted_sample(
            docs.orderBy(F.rand(3)).repartition(7), "id", "w", 20
        ).collect()
    )
    assert a == b and len(a) == 20


def test_weight_proportional_inclusion(spark, docs):
    """Across 300 seeds (one job: explode a seed array), a 100x-weight row
    must be included far more often than a 1x row — and not always
    (it's a random draw, not top-k by weight)."""
    seeds = [f"s{i}" for i in range(300)]
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("seed"), F.lit(":"), F.col("id"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / HEX_SPACE
    from pyspark.sql import Window

    w = Window.partitionBy("seed").orderBy(
        F.desc("pri"), F.asc("id")
    )
    incl = (
        docs.withColumn("seed", F.explode(F.array(*[F.lit(s) for s in seeds])))
        .withColumn("pri", F.round(F.log(u) / F.col("w"), 6))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .groupBy("cls")
        .agg((F.count("*") / (len(seeds) * 20.0)).alias("share"))
    )
    shares = {r["cls"]: r["share"] for r in incl.collect()}
    # 20 heavy rows carry 2000 of 2180 total weight (~92%); light ~8%
    assert shares["heavy"] > 0.80
    assert 0.01 < shares.get("light", 0) < 0.20


def test_guards_and_strata(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("b", "x", 0.0), ("c", "x", -2.0), ("d", "x", None),
         ("e", "y", 5.0), ("f", "y", 5.0), ("g", "y", 5.0)],
        "id string, s string, w double",
    )
    got = weighted_sample(df, "id", "w", 2, stratum_col="s").collect()
    by_s = {}
    for r in got:
        by_s.setdefault(r["s"], []).append(r["id"])
    assert by_s["x"] == ["a"]  # zero/negative/null weights dropped
    assert len(by_s["y"]) == 2
    with pytest.raises(ValueError):
        weighted_sample(df, "id", "w", 0)


def test_duckdb_twin_parity(spark, docs):
    for stratum in (None, "cls"):
        got = sorted(
            (r["id"], r["_priority"])
            for r in weighted_sample(
                docs, "id", "w", 15, stratum_col=stratum
            ).collect()
        )
        con = duckdb.connect()
        con.register("t", docs.toPandas())
        want = sorted(
            (r[0], r[-1])
            for r in con.sql(
                sql_weighted_sample("SELECT * FROM t", "id", "w", 15,
                                    stratum_col=stratum)
            ).fetchall()
        )
        assert got == want, f"stratum={stratum}"


def test_plan_pins(spark, docs):
    plan = (
        weighted_sample(docs, "id", "w", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # partial top-k, no global sort
    assert "BatchEvalPython" not in plan
