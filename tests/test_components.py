"""Connected components (large-star/small-star) vs a union-find oracle,
plus the DuckDB recursive-CTE twin used by the contract query."""

import random

import duckdb
import pytest

from data_pipeline_spark.operators.components import (
    connected_components,
    dedup_representatives,
    sql_connected_components,
)


def union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def _run(spark, n_nodes, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "id_a long, id_b long"
    ).where("id_a is not null")
    out = connected_components(nodes, pairs, "id_a", "id_b", "doc_id")
    return {r["doc_id"]: r["component"] for r in out.collect()}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    assert _run(spark, n, edges) == union_find(n, edges)


def test_long_chain(spark):
    """Diameter == n: the topology that makes plain min-label propagation
    take O(n) rounds; large-star/small-star must converge in O(log n)."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, n, edges)
    assert got == {i: 0 for i in range(n)}


def test_singletons_and_empty_edges(spark):
    assert _run(spark, 5, []) == {i: i for i in range(5)}
    # two pairs + singletons
    got = _run(spark, 6, [(4, 2), (2, 0)])
    assert got == {0: 0, 1: 1, 2: 0, 3: 3, 4: 0, 5: 5}


def test_self_loops_and_duplicates_ignored(spark):
    got = _run(spark, 4, [(1, 1), (2, 3), (3, 2), (2, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 2}


def test_representatives(spark):
    nodes = spark.createDataFrame([(i, f"d{i}") for i in range(6)],
                                  "doc_id long, text string")
    pairs = spark.createDataFrame([(4, 2), (2, 0)], "id_a long, id_b long")
    comp = connected_components(nodes.select("doc_id"), pairs, "id_a", "id_b")
    reps = dedup_representatives(nodes, comp, "doc_id")
    assert sorted(r["doc_id"] for r in reps.collect()) == [0, 1, 3, 5]


def test_sql_twin_matches_spark(spark):
    rng = random.Random(13)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
    got = _run(spark, n, edges)
    con = duckdb.connect()
    con.execute("CREATE TABLE nodes AS SELECT unnest(range(60)) AS doc_id")
    con.execute("CREATE TABLE pairs (id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", edges)
    sql = sql_connected_components(
        "SELECT doc_id FROM nodes", "SELECT * FROM pairs",
        "id_a", "id_b", "doc_id",
    )
    oracle = {int(r[0]): int(r[1]) for r in con.execute(sql).fetchall()}
    assert got == oracle == union_find(n, edges)


def test_pair_only_node_labels_and_output(spark):
    """Pairs may reference ids absent from `nodes` (e.g. a filtered doc in
    a stale candidate pair): output is restricted to `nodes`, but a
    pair-only id still participates in labeling (it can be the min)."""
    import duckdb

    nodes = spark.createDataFrame([(5,), (7,)], "doc_id long")
    pairs = spark.createDataFrame([(5, 2), (2, 7)], "id_a long, id_b long")
    out = connected_components(nodes, pairs, "id_a", "id_b", "doc_id")
    got = {r["doc_id"]: r["component"] for r in out.collect()}
    assert got == {5: 2, 7: 2}  # label is the pair-only min; no row for 2
    con = duckdb.connect()
    con.execute("CREATE TABLE n AS SELECT unnest([5, 7]) AS doc_id")
    con.execute("CREATE TABLE p (id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", [(5, 2), (2, 7)])
    sql = sql_connected_components(
        "SELECT doc_id FROM n", "SELECT * FROM p", "id_a", "id_b", "doc_id"
    )
    assert {int(a): int(b) for a, b in con.execute(sql).fetchall()} == got
