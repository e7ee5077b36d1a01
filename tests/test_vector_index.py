"""Persistent incremental IVF vector index (operators/vector_index.py).

Pins: incremental adds == one-shot ivf_index build (same fixed quantizer →
identical topk results), exactly-once epochs, physical list pruning reads
only probed directories, compaction preserves state + ledger, param freeze.
"""

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.similarity import ivf_index, ivf_topk
from data_pipeline_spark.operators.vector_index import IVFVectorIndex

DIM = 16


def _vecs(spark, ids, seed=7):
    rng = np.random.default_rng(seed)
    rows = [(int(i), [float(x) for x in rng.standard_normal(DIM)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _topk_map(df):
    return {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in df.collect()
    }


def test_incremental_adds_equal_one_shot_build(spark, tmp_path):
    all_vecs = _vecs(spark, range(60))
    queries = all_vecs.where(F.col("vec_id") % 20 == 0)

    idx = IVFVectorIndex.create(spark, str(tmp_path / "ivf"), dim=DIM, n_lists=4)
    idx.add(all_vecs.where(F.col("vec_id") < 30), epoch=0)
    idx.add(all_vecs.where(F.col("vec_id") >= 30), epoch=1)
    got = _topk_map(idx.topk(queries, k=3, nprobe=2))

    cents, assigned = ivf_index(
        all_vecs, n_lists=4, seed=42, quantizer="fixed", dim=DIM
    )
    want = _topk_map(ivf_topk(cents, assigned, queries, k=3, nprobe=2))
    assert got == want and got
    # Pruning off must give the same answer too.
    assert _topk_map(idx.topk(queries, k=3, nprobe=2, prune_lists=False)) == want


def test_exactly_once_and_cold_reload(spark, tmp_path):
    path = str(tmp_path / "ivf2")
    idx = IVFVectorIndex.create(spark, path, dim=DIM, n_lists=4)
    assert idx.add(_vecs(spark, range(10)), epoch=0) == 0
    assert idx.add(_vecs(spark, range(10)), epoch=0) is None  # replay no-op
    cold = IVFVectorIndex.load(spark, path)
    assert cold.committed_epochs() == {0}
    assert cold.assigned().count() == 10


def test_probe_reads_only_probed_list_dirs(spark, tmp_path):
    path = str(tmp_path / "ivf3")
    idx = IVFVectorIndex.create(spark, path, dim=DIM, n_lists=4)
    idx.add(_vecs(spark, range(80)), epoch=0)
    one_query = _vecs(spark, [0])
    res = idx.topk(one_query, k=3, nprobe=1)
    files = res.inputFiles()
    # nprobe=1 and one query → exactly one list directory scanned.
    lists_touched = {p.split("list_id=")[1].split("/")[0] for p in files if "list_id=" in p}
    assert len(lists_touched) == 1
    # And the restricted scan still returns k results ranked 1..k.
    assert [r["rank"] for r in res.where(F.col("query_id") == 0).collect()] == [1, 2, 3]


def test_compact_preserves_state_and_ledger(spark, tmp_path):
    path = str(tmp_path / "ivf4")
    idx = IVFVectorIndex.create(spark, path, dim=DIM, n_lists=4)
    idx.add(_vecs(spark, range(20)), epoch=0)
    idx.add(_vecs(spark, range(20, 40)), epoch=1)
    before = {r["id"]: r["list_id"] for r in idx.assigned().collect()}
    res = idx.compact()
    assert res["compacted"] and res["dirs_merged"] == 2
    assert {r["id"]: r["list_id"] for r in idx.assigned().collect()} == before
    assert idx.committed_epochs() == {0, 1}
    assert idx.add(_vecs(spark, range(20)), epoch=0) is None  # ledger intact
    assert sorted(os.listdir(os.path.join(path, "lists"))) == ["epoch=compact-1"]
    # Later add lands in its own dir; nothing clobbered.
    idx.add(_vecs(spark, range(40, 45)), epoch=2)
    assert idx.assigned().count() == 45


def test_param_freeze_and_dim_guard(spark, tmp_path):
    path = str(tmp_path / "ivf5")
    IVFVectorIndex.create(spark, path, dim=DIM, n_lists=4)
    with pytest.raises(ValueError, match="frozen"):
        IVFVectorIndex.create(spark, path, dim=DIM, n_lists=8)
    idx = IVFVectorIndex.load(spark, path)
    bad = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="dim"):
        idx.add(bad, epoch=0)


def test_empty_add_does_not_brick_the_index(spark, tmp_path):
    """A zero-row epoch must stay in the ledger (exactly-once) without
    leaving an unreadable schema-less partition dir (review regression)."""
    path = str(tmp_path / "ivfempty")
    idx = IVFVectorIndex.create(spark, path, dim=DIM, n_lists=4)
    idx.add(_vecs(spark, range(10)), epoch=0)
    empty = _vecs(spark, range(10)).where(F.col("vec_id") > 1000)
    assert idx.add(empty, epoch=1) == 1
    assert idx.add(empty, epoch=1) is None  # still exactly-once
    # Every read path survives the empty epoch.
    assert idx.assigned().count() == 10
    res = idx.topk(_vecs(spark, [0]), k=3, nprobe=2)
    assert res.count() == 3
    assert idx.compact() == {"compacted": False, "dirs": 1}
    cold = IVFVectorIndex.load(spark, path)
    assert cold.assigned().count() == 10 and cold.committed_epochs() == {0, 1}


def test_vector_compact_name_never_collides(spark, tmp_path):
    path = str(tmp_path / "ivfooo")
    idx = IVFVectorIndex.create(spark, path, dim=DIM, n_lists=4)
    idx.add(_vecs(spark, range(5)), epoch=2)
    idx.add(_vecs(spark, range(5, 10)), epoch=5)
    assert idx.compact()["dir"] == "compact-5"
    idx.add(_vecs(spark, range(10, 15)), epoch=3)  # out-of-order backfill
    res = idx.compact()
    assert res["compacted"] and res["dir"] == "compact-5-2"
    assert idx.assigned().count() == 15
    assert idx.committed_epochs() == {2, 3, 5}


def test_compact_drop_ids_removes_vectors(spark, tmp_path):
    """Takedown sidecar: compact(drop_ids=...) removes the embeddings, so
    the purged vector stops appearing in ANN results; dropping everything
    leaves a readable (empty) index that accepts later adds."""
    idx = IVFVectorIndex.create(spark, str(tmp_path / "vdrop"), dim=DIM,
                                n_lists=4)
    idx.add(_vecs(spark, range(10)), epoch=0)
    idx.add(_vecs(spark, range(10, 20), seed=8), epoch=1)
    res = idx.compact(drop_ids=[3, 15])
    assert res["compacted"] is True and res["dropped_ids"] == 2
    assert idx.assigned().count() == 18
    assert idx.assigned().where(F.col("id").isin([3, 15])).count() == 0
    got = idx.topk(_vecs(spark, range(10)), k=18, nprobe=4)
    assert got.where(F.col("neighbor_id").isin([3, 15])).count() == 0
    # Drop everything: index stays readable and accepts new epochs.
    idx.compact(drop_ids=list(range(20)))
    assert idx.assigned().count() == 0
    idx.add(_vecs(spark, [99]), epoch=2)
    assert idx.assigned().count() == 1
