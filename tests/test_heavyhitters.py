"""Two-pass exact heavy hitters (X99): exact-equality vs the full
shuffle answer under forced MG eviction, merge-bound unit tests, DuckDB
twin parity, plan pins."""

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.heavyhitters import (
    _mg_merge,
    heavy_hitters,
    sql_heavy_hitters,
)


def test_mg_merge_bound_and_superset():
    # adversarial stream: 1 hot key among floods of singletons
    k = 5
    counters = {}
    n = 0
    for i in range(200):
        batch = {f"s{i}a": 1, f"s{i}b": 1, f"s{i}c": 1, "hot": 2}
        n += 5
        counters = _mg_merge(counters, batch, k)
    assert len(counters) <= k
    # hot's true count is 400 = 2n/5 > n/(k+1): MG must retain it, and the
    # undercount is bounded by n/(k+1)
    assert "hot" in counters
    assert counters["hot"] >= 400 - n // (k + 1)


def _skewed_rows():
    rows = [("hot",)] * 500 + [("warm",)] * 120 + [("mild",)] * 60
    rows += [(f"u{i}",) for i in range(2000)]  # singleton flood
    return rows


def test_exact_vs_full_shuffle_under_eviction(spark):
    # phi = 0.04 -> k = 25 counters vs 2003 distinct keys: eviction churns
    # constantly; result must STILL equal the full groupBy answer exactly
    df = spark.createDataFrame(_skewed_rows(), "k string").repartition(8)
    got = sorted(
        (r["k"], r["cnt"], r["share"])
        for r in heavy_hitters(df, "k", phi=0.04).collect()
    )
    import math

    n = 2680
    full = (
        df.groupBy("k").count()
        .where(F.col("count") >= math.ceil(0.04 * n))
        .collect()
    )
    exp = sorted(
        (r["k"], r["count"], round(r["count"] / n, 6)) for r in full
    )
    assert got == exp
    assert [g[0] for g in got] == ["hot", "warm"]  # mild 60 < 0.04*2680


def test_null_keys_excluded_and_phi_guard(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), (None,), (None,), ("b",)], "k string"
    )
    out = heavy_hitters(df, "k", phi=0.5).collect()
    # N = 4 non-null rows; threshold 2: only 'a' (3)
    assert [(r["k"], r["cnt"], r["share"]) for r in out] == [("a", 3, 0.75)]
    for bad in (0.0, 1.0, -1, 2):
        with pytest.raises(ValueError):
            heavy_hitters(df, "k", phi=bad)


def test_duckdb_twin_parity(spark):
    rows = _skewed_rows()
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = sorted(tuple(r) for r in heavy_hitters(df, "k", phi=0.02).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(sql_heavy_hitters("SELECT k FROM t", "k", 0.02)).fetchall()
    )
    assert got == want


def test_verify_join_is_broadcast(spark):
    df = spark.createDataFrame(_skewed_rows(), "k string").repartition(4)
    keyed = df.select(F.col("k").cast("string").alias("_k")).where(
        F.col("_k").isNotNull()
    )
    # the pass-2 shape before checkpointing: candidate join must broadcast
    # the candidate side, and the sketch pass is Arrow (MapInPandas), not
    # row-at-a-time Python
    cands = spark.createDataFrame([("hot",), ("warm",)], "_k string")
    plan = (
        keyed.join(F.broadcast(cands), "_k")
        .groupBy("_k").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert heavy_hitters(df, "k", phi=0.04).columns == ["k", "cnt", "share"]
