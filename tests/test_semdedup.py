"""SemDeDup: cluster-scoped semantic dedup verdicts (operators/semdedup.py)."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.semdedup import kept_rows, semdedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


@pytest.fixture(scope="module")
def corpus(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
        if i % 4 == 0:  # an exact-direction duplicate for every 4th vector
            rows.append((1000 + i, [float(x * 1.02) for x in v]))
    return _vecs(spark, rows)


def test_duplicates_drop_exactly_one_per_pair(spark, corpus):
    out = semdedup(corpus, dim=16, n_clusters=4, threshold=0.99).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(out) == corpus.count()  # one verdict per input vector
    for i in range(0, 40, 4):
        a, b = by_id[i], by_id[1000 + i]
        # a scaled copy has the same direction -> same cluster, and exactly
        # one of the two survives
        assert a.cluster_id == b.cluster_id
        assert {a.kept, b.kept} == {True, False}


def test_non_duplicates_survive(spark, corpus):
    out = semdedup(corpus, dim=16, n_clusters=4, threshold=0.99)
    # random 16-dim gaussians are nowhere near cos 0.99 of each other:
    # every row without a planted copy is kept
    planted = {i for i in range(0, 40, 4)} | {1000 + i for i in range(0, 40, 4)}
    for r in out.collect():
        if r.vec_id not in planted:
            assert r.kept, r


def test_keep_policy_prefers_farthest_from_centroid(spark):
    # two vectors on the same ray: identical centroid_sim at 4dp -> the tie
    # rule keeps the smaller id; a third vector far away is untouched
    rows = [
        (1, [1.0] * 8),
        (2, [1.01] * 8),
        (3, [-1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0]),
    ]
    out = {r.vec_id: r for r in semdedup(_vecs(spark, rows), dim=8,
                                         n_clusters=2, threshold=0.99).collect()}
    assert out[1].kept and not out[2].kept
    assert out[3].kept


def test_kept_rows_filters_corpus(spark, corpus):
    verdicts = semdedup(corpus, dim=16, n_clusters=4, threshold=0.99)
    kept = kept_rows(corpus, verdicts)
    n_dups = 10  # one loser per planted pair
    assert kept.count() == corpus.count() - n_dups
    assert kept.columns == corpus.columns


def test_candidate_join_is_cluster_scoped(spark, corpus):
    # the pair search must be an equi-join on cluster_id, never a cartesian
    plan = semdedup(corpus, dim=16, n_clusters=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_kmeans_quantizer_path(spark, corpus):
    # learned quantizer: same verdict semantics, clusters from pyspark.ml
    out = semdedup(corpus, dim=16, n_clusters=4, threshold=0.99,
                   quantizer="kmeans")
    dropped = out.where(~F.col("kept")).count()
    assert dropped == 10  # every planted pair still loses exactly one side
