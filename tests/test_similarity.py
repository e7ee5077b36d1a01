"""Unit tests for similarity search: exact brute-force top-k and the
LSH-bucketed scale path (recall vs the exact answer)."""

import math

import pytest

from data_pipeline_spark.operators import similarity as SIM
from data_pipeline_spark.operators import textdedup as TD


def _vec(i, dim=8):
    # Deterministic unit-ish vectors spread on a ring in 2 coords + noise dims.
    return [
        math.cos(i * 0.37), math.sin(i * 0.37),
        math.cos(i * 1.13) * 0.1, math.sin(i * 1.13) * 0.1,
        0.05 * ((i * 7919) % 13 - 6), 0.05 * ((i * 104729) % 11 - 5),
        0.01, 0.02,
    ]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [(i, _vec(i)) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_topk_bruteforce_matches_python_oracle(vecs):
    queries = vecs.where("vec_id % 20 = 0")
    got = SIM.topk_bruteforce(vecs, queries, "embedding", "vec_id", k=3).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for q in (0, 20, 40):
        expected = sorted(
            ((cos(_vec(q), _vec(i)), i) for i in range(60) if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        got_ids = [nid for _, nid in sorted(by_query[q])]
        assert got_ids == [i for _, i in expected]


def test_cosine_sim_repeat_stable(vecs):
    """cosine_sim underpins every similarity/ANN path; pin that repeated
    evaluations of the same plan are bit-identical AND match a Python
    left-to-right accumulation — guards the PySpark 4.1 sibling-lambda
    HOF mis-binding (cosine_sim is structured as one fold for this)."""
    import pyspark.sql.functions as F

    def python_cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    pairs = (
        vecs.alias("a")
        .crossJoin(vecs.alias("b"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .where((F.col("a.vec_id") + F.col("b.vec_id")) % 7 == 0)
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            TD.cosine_sim(F.col("a.embedding"), F.col("b.embedding")).alias("cs"),
        )
    )
    runs = [sorted(map(tuple, pairs.collect())) for _ in range(3)]
    assert runs[0] == runs[1] == runs[2]
    for ia, ib, cs in runs[0]:
        assert cs == pytest.approx(python_cos(_vec(ia), _vec(ib)), abs=1e-12)


def test_topk_ranks_are_dense_and_bounded(vecs):
    out = SIM.topk_bruteforce(vecs, vecs.limit(5), "embedding", "vec_id", k=4).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3, 4]


def test_lsh_bucket_pairs_recall_vs_exact(spark, vecs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in TD.neardup_embedding_pairs(vecs, "embedding", "vec_id", 0.98).collect()
    }
    assert exact, "fixture should contain close ring neighbors"
    approx = {
        (r["id_a"], r["id_b"])
        for r in SIM.lsh_bucket_pairs(
            vecs, "embedding", "vec_id", n_planes=6, n_tables=4, threshold=0.98
        ).collect()
    }
    # Verified candidates are a subset of the exact answer...
    assert approx <= exact
    # ...with decent recall from 4 independent hash tables.
    assert len(approx) >= 0.6 * len(exact)


def test_lsh_signatures_deterministic(spark, vecs):
    planes = SIM.hyperplanes(spark, dim=8, n_planes=6, n_tables=2, seed=7)
    a = sorted(map(tuple, SIM.lsh_signatures(vecs, planes).collect()))
    b = sorted(map(tuple, SIM.lsh_signatures(vecs, planes).collect()))
    assert a == b


def test_ivf_fixed_quantizer_full_probe_is_exact(spark, vecs):
    """The deterministic fixed-centroid quantizer (the oracle-checkable
    contract path) with nprobe = n_lists must reproduce brute force exactly
    — the approximation lives ONLY in probing fewer lists."""
    from data_pipeline_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
        topk_bruteforce,
    )

    queries = vecs.where("vec_id % 20 = 0")
    truth = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in topk_bruteforce(vecs, queries, k=4).collect()
    }
    centroids, assigned = ivf_index(vecs, n_lists=4, seed=42, quantizer="fixed")
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(centroids, assigned, queries, k=4, nprobe=4).collect()
    }
    assert got == truth


def test_ivf_recall_against_bruteforce(spark):
    """IVF with enough probes must recover the exact top-k on clustered
    data (recall ≥ 0.9 across queries; = 1.0 with nprobe = n_lists)."""
    import numpy as np

    from data_pipeline_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
        topk_bruteforce,
    )

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(8):  # 8 well-separated clusters
        center = rng.standard_normal(16) * 10
        for _ in range(30):
            rows.append((vid, [float(x) for x in center + rng.standard_normal(16) * 0.3]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    import pyspark.sql.functions as F
    queries = df.where(F.col("vec_id") % 24 == 0)

    exact = topk_bruteforce(df, queries, k=5)
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }

    centroids, assigned = ivf_index(df, n_lists=8, seed=42)
    approx = ivf_topk(centroids, assigned, queries, k=5, nprobe=2)
    got = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, recall

    # Full probe = exact.
    full = ivf_topk(centroids, assigned, queries, k=5, nprobe=8)
    got_full = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert got_full == truth


def test_ivf_fixed_dim_mismatch_fails_loudly(spark):
    """A wrong explicit dim must raise, not silently dump every vector
    into list 0 (zip_with NULL-pads, all centroid sims go NULL)."""
    import pytest as _pytest

    from data_pipeline_spark.operators.similarity import ivf_index

    df = spark.createDataFrame(
        [(1, [0.1] * 8), (2, [0.2] * 8)], "vec_id long, embedding array<double>"
    )
    _, assigned = ivf_index(df, n_lists=2, quantizer="fixed", dim=4)
    with _pytest.raises(Exception, match="dim"):
        assigned.collect()
    # correct dim still works
    _, ok = ivf_index(df, n_lists=2, quantizer="fixed", dim=8)
    assert ok.count() == 2
