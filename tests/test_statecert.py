"""State-equivalence certificate (X101): soundness on equal states,
sensitivity to every mutation class, multiset/NULL semantics, DuckDB
twin parity, drill-down completeness, plan pins."""

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.lake.statecert import (
    compare_states,
    row_hash,
    sql_state_checksum,
    state_checksum,
    state_diff,
)

N_B = 16


@pytest.fixture(scope="module")
def state(spark):
    return spark.createDataFrame(
        [(i, f"u{i}", i % 7, None if i % 11 == 0 else f"v{i}") for i in range(400)],
        "k long, name string, grp long, val string",
    )


def _mutate(df):
    """update k%97==0, delete k%101==0 (k>0), insert 3 new keys."""
    upd = F.when(F.col("k") % 97 == 0, F.concat(F.col("name"), F.lit("!"))).otherwise(
        F.col("name")
    )
    survivors = df.where((F.col("k") % 101 != 0) | (F.col("k") == 0)).withColumn(
        "name", upd
    )
    extra = df.sparkSession.createDataFrame(
        [(9001, "new1", 0, "x"), (9002, "new2", 1, None), (9003, "new3", 2, "y")],
        "k long, name string, grp long, val string",
    )
    return survivors.unionByName(extra)


def test_equal_states_identical_certificates(spark, state):
    shuffled = state.orderBy(F.rand(7)).repartition(3)  # order/layout-blind
    cmpdf = compare_states(state, shuffled, "k", n_buckets=N_B)
    assert cmpdf.count() <= N_B
    assert cmpdf.where(~F.col("match")).count() == 0


def test_mutations_flagged_and_localized(spark, state):
    mutated = _mutate(state)
    cmpdf = compare_states(state, mutated, "k", n_buckets=N_B)
    bad = cmpdf.where(~F.col("match"))
    assert bad.count() > 0
    # every mutated key's bucket is flagged; untouched buckets still match
    assert cmpdf.where(F.col("match")).count() + bad.count() == cmpdf.count()


def test_drilldown_exactly_the_mutations(spark, state):
    mutated = _mutate(state)
    rows = {
        (r["k"], r["status"])
        for r in state_diff(state, mutated, "k", n_buckets=N_B).collect()
    }
    want = (
        {(str(k), "changed") for k in range(0, 400, 97) if k > 0}
        | {(str(k), "a_only") for k in range(101, 400, 101)}
        | {(str(k), "b_only") for k in (9001, 9002, 9003)}
    )
    # k=0: 0%97==0 -> name updated, and 0%101 survives the delete -> changed
    want |= {("0", "changed")}
    assert rows == want


def test_multiset_and_null_semantics(spark):
    a = spark.createDataFrame([(1, "x"), (1, "x"), (2, None)], "k long, v string")
    dup_dropped = spark.createDataFrame([(1, "x"), (2, None)], "k long, v string")
    null_vs_empty = spark.createDataFrame([(1, "x"), (1, "x"), (2, "")], "k long, v string")
    assert compare_states(a, dup_dropped, "k").where(~F.col("match")).count() > 0
    assert compare_states(a, null_vs_empty, "k").where(~F.col("match")).count() > 0
    # field boundaries: (ab, c) != (a, bc)
    p = spark.createDataFrame([(1, "ab", "c")], "k long, x string, y string")
    q = spark.createDataFrame([(1, "a", "bc")], "k long, x string, y string")
    assert compare_states(p, q, "k").where(~F.col("match")).count() > 0


def test_duckdb_twin_parity(spark, state):
    got = sorted(
        map(tuple, state_checksum(state, "k", ["k", "name", "grp", "val"], N_B).collect())
    )
    con = duckdb.connect()
    con.register("t", state.toPandas())
    want = sorted(
        map(tuple, con.sql(sql_state_checksum("t", "k", ["k", "name", "grp", "val"], N_B)).fetchall())
    )
    assert got == want


def test_empty_and_disjoint(spark, state):
    empty = state.limit(0)
    cmpdf = compare_states(state, empty, "k", n_buckets=N_B)
    assert cmpdf.where(F.col("b_rows") != 0).count() == 0
    assert cmpdf.where(~F.col("match")).count() == cmpdf.count()
    assert state_diff(state, empty, "k", n_buckets=N_B).where(
        F.col("status") != "a_only"
    ).count() == 0
    # no-mismatch fast path returns an empty frame without a join job
    assert state_diff(state, state, "k", n_buckets=N_B).count() == 0


def test_incremental_update_law(spark, state):
    """update_checksum(cert(pre), diff(pre, post)) == cert(post), incl.
    buckets emptied by deletes and buckets born from inserts."""
    from data_pipeline_spark.lake.diff import snapshot_diff
    from data_pipeline_spark.lake.statecert import update_checksum

    cols = ["k", "name", "grp", "val"]
    post = _mutate(state)
    changes = snapshot_diff(state, post, "k")
    got = update_checksum(
        state_checksum(state, "k", cols, N_B), changes, "k", cols, N_B
    )
    want = state_checksum(post, "k", cols, N_B)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # delete EVERYTHING -> empty certificate (emptied buckets drop)
    wipe = snapshot_diff(state, state.limit(0), "k")
    assert update_checksum(
        state_checksum(state, "k", cols, N_B), wipe, "k", cols, N_B
    ).count() == 0


def test_incremental_rejects_unknown_change_type(spark, state):
    from data_pipeline_spark.lake.statecert import update_checksum

    cols = ["k", "name", "grp", "val"]
    bad = state.limit(1).withColumn("_change_type", F.lit("upsert"))
    with pytest.raises(Exception, match="unknown change type"):
        update_checksum(
            state_checksum(state, "k", cols, N_B), bad, "k", cols, N_B
        ).collect()


def test_plan_pins(spark, state):
    plan = (
        state_checksum(state, "k", n_buckets=N_B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan  # all-native row hashing
    assert "HashAggregate" in plan  # one hash agg, map-side combinable
    assert "Exchange" in plan and plan.count("Exchange") == 1  # single shuffle
