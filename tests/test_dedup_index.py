"""Incremental MinHash/LSH dedup index (operators/dedup_index.py).

Pins: incremental-over-epochs == full recompute on the union corpus (same
signature-agreement metric), exactly-once epoch commits, the pre-commit
materialization contract (no self-pairs after commit), cold reload, param
freezing, estimate-vs-exact Jaccard sanity, and stop-shingle freezing.
"""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.dedup_index import (
    MinHashDedupIndex,
    _sig_agree_expr,
)
from data_pipeline_spark.operators.textdedup import minhash_signature, shingles

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls "
    "softly on the quiet green meadow near the old stone bridge"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def corpus(spark):
    """Three near-dup clusters + singletons, split across two batches."""
    batch1 = _docs(spark, [
        (1, BASE),
        (2, BASE + " tonight"),                      # near-dup of 1
        (3, "completely different words about spark partitions and shuffles here"),
        (4, "yet another unrelated document mentioning benchmarks and parquet files"),
    ])
    batch2 = _docs(spark, [
        (5, BASE + " again tonight"),                # near-dup of 1/2 (cross-batch)
        (6, "completely different words about spark partitions and shuffles here!"),  # near-dup of 3
        (7, "a fresh singleton document with nothing in common with the others at all"),
        (8, BASE),                                   # exact dup of 1 (cross-batch)
    ])
    return batch1, batch2


def _full_recompute_pairs(spark, idx, docs):
    """Oracle: same signatures + bands + agreement metric, one shot over
    the union corpus — what a non-incremental run would report in total."""
    sigs = idx._sign(docs, "doc_id", "text")
    bands = idx._band_keys(sigs)
    cand = (
        bands.alias("x").join(bands.alias("y"), on=["band", "key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    out = (
        cand.join(sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn("est_jaccard", F.round(_sig_agree_expr("sig_a", "sig_b", idx.meta["num_hashes"]), 6))
        .where(F.col("est_jaccard") >= idx.meta["threshold"])
        .select("id_a", "id_b", "est_jaccard")
    )
    return {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out.collect()}


def test_incremental_equals_full_recompute(spark, tmp_path, corpus):
    batch1, batch2 = corpus
    idx = MinHashDedupIndex.create(spark, str(tmp_path / "idx"), num_hashes=24, bands=6)
    p1 = {(r["id_a"], r["id_b"]): r["est_jaccard"]
          for r in idx.update(batch1, epoch=0).collect()}
    p2 = {(r["id_a"], r["id_b"]): r["est_jaccard"]
          for r in idx.update(batch2, epoch=1).collect()}
    assert not (set(p1) & set(p2)), "old-old pairs must not be re-reported"
    union = _full_recompute_pairs(spark, idx, batch1.unionByName(batch2))
    assert {**p1, **p2} == union
    # The interesting pairs actually surfaced.
    assert (1, 8) in union and union[(1, 8)] == 1.0  # exact dup across batches
    assert (1, 5) in p2 or (2, 5) in p2              # cross-batch near-dup
    assert (3, 6) in p2                              # cross-batch near-dup


def test_exactly_once_epoch_and_cold_reload(spark, tmp_path, corpus):
    batch1, batch2 = corpus
    path = str(tmp_path / "idx2")
    idx = MinHashDedupIndex.create(spark, path, num_hashes=24, bands=6)
    idx.update(batch1, epoch=0)
    assert idx.update(batch1, epoch=0).count() == 0  # replay is a no-op
    assert idx.committed_epochs() == {0}
    # Cold reload sees the same state; next epoch works off it.
    idx2 = MinHashDedupIndex.load(spark, path)
    assert idx2.committed_epochs() == {0}
    pairs = idx2.update(batch2, epoch=1).collect()
    assert any(r["id_a"] == 1 and r["id_b"] == 8 for r in pairs)
    # Signatures of both batches are stored exactly once.
    assert idx2.stored_sigs().count() == 8
    assert idx2.stored_sigs().select("doc_id").distinct().count() == 8


def test_pairs_materialized_before_commit_no_self_pairs(spark, tmp_path, corpus):
    batch1, _ = corpus
    idx = MinHashDedupIndex.create(spark, str(tmp_path / "idx3"), num_hashes=24, bands=6)
    pairs = idx.update(batch1, epoch=0)
    # Collected AFTER the commit: the plan must not see the batch twice.
    rows = pairs.collect()
    assert all(r["id_a"] != r["id_b"] for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_duplicates_probe_is_read_only(spark, tmp_path, corpus):
    batch1, batch2 = corpus
    idx = MinHashDedupIndex.create(spark, str(tmp_path / "idx4"), num_hashes=24, bands=6)
    idx.update(batch1, epoch=0)
    probe = idx.duplicates(batch2).collect()
    assert any(r["id_a"] == 1 and r["id_b"] == 8 for r in probe)
    assert idx.committed_epochs() == {0}  # nothing committed
    assert MinHashDedupIndex.load(spark, str(tmp_path / "idx4")).committed_epochs() == {0}


def test_param_freeze_and_create_if_not_exists(spark, tmp_path):
    path = str(tmp_path / "idx5")
    MinHashDedupIndex.create(spark, path, num_hashes=24, bands=6)
    again = MinHashDedupIndex.create(spark, path, num_hashes=24, bands=6)
    assert again.meta["num_hashes"] == 24
    with pytest.raises(ValueError, match="frozen"):
        MinHashDedupIndex.create(spark, path, num_hashes=12, bands=4)
    with pytest.raises(ValueError, match="divisible"):
        MinHashDedupIndex.create(spark, str(tmp_path / "idx6"), num_hashes=10, bands=4)


def test_estimate_tracks_exact_jaccard(spark):
    """Signature agreement is the unbiased MinHash Jaccard estimator —
    with enough hashes it must sit near the exact value."""
    a, b = BASE, BASE + " tonight"
    df = spark.createDataFrame([(a, b)], "a string, b string")
    row = df.select(
        minhash_signature(F.col("a"), num_hashes=96).alias("sa"),
        minhash_signature(F.col("b"), num_hashes=96).alias("sb"),
        shingles(F.col("a")).alias("ga"),
        shingles(F.col("b")).alias("gb"),
    ).select(
        F.round(_sig_agree_expr("sa", "sb", 96), 6).alias("est"),
        (
            F.size(F.array_intersect("ga", "gb")).cast("double")
            / F.size(F.array_union("ga", "gb")).cast("double")
        ).alias("exact"),
    ).collect()[0]
    assert abs(row["est"] - row["exact"]) < 0.15


def test_stop_shingles_frozen_and_applied(spark, tmp_path):
    """A frozen stop-shingle list removes boilerplate from the Jaccard
    space consistently across epochs."""
    boiler = "copyright footer all rights reserved"
    docs1 = _docs(spark, [(1, "alpha beta gamma delta " + boiler),
                          (2, "epsilon zeta eta theta " + boiler)])
    stop = MinHashDedupIndex.bootstrap_stop_shingles(
        docs1, "text", "doc_id", n=3, max_df=1
    )
    assert any("copyright" in s for s in stop)
    idx = MinHashDedupIndex.create(
        spark, str(tmp_path / "idx7"), num_hashes=24, bands=6, stop_shingles=stop
    )
    # Docs sharing ONLY boilerplate must not pair.
    assert idx.update(docs1, epoch=0).count() == 0
    # Real near-dups (beyond boilerplate) still pair in a later epoch.
    docs2 = _docs(spark, [(3, "alpha beta gamma delta " + boiler + " x")])
    pairs = idx.update(docs2, epoch=1).collect()
    assert any({r["id_a"], r["id_b"]} == {1, 3} for r in pairs)


def test_compact_merges_epochs_preserving_ledger(spark, tmp_path, corpus):
    """Compaction merges per-epoch dirs into one while the exactly-once
    ledger, stored state, and subsequent updates are unchanged."""
    import os

    batch1, batch2 = corpus
    path = str(tmp_path / "idxc")
    idx = MinHashDedupIndex.create(spark, path, num_hashes=24, bands=6)
    idx.update(batch1, epoch=0)
    idx.update(batch2, epoch=1)
    before = {(r["doc_id"], tuple(r["sig"])) for r in idx.stored_sigs().collect()}

    res = idx.compact()
    assert res["compacted"] and res["dirs_merged"] == 2
    assert {(r["doc_id"], tuple(r["sig"])) for r in idx.stored_sigs().collect()} == before
    assert idx.committed_epochs() == {0, 1}          # ledger preserved
    assert idx.update(batch1, epoch=0).count() == 0   # replay still a no-op
    assert sorted(os.listdir(os.path.join(path, "sigs"))) == ["epoch=compact-1"]
    # Idempotent: nothing to merge now.
    assert idx.compact() == {"compacted": False, "dirs": 1}

    # A later epoch commits into its own dir and does NOT clobber the
    # compacted one; a second compact merges both.
    b3 = _docs(spark, [(9, "a brand new third batch document with its own words")])
    idx.update(b3, epoch=2)
    assert idx.stored_sigs().count() == 9
    cold = MinHashDedupIndex.load(spark, path)
    assert cold.stored_sigs().count() == 9
    res2 = idx.compact()
    assert res2["compacted"] and res2["dirs_merged"] == 2
    assert idx.stored_sigs().count() == 9
    assert idx.committed_epochs() == {0, 1, 2}


def test_max_bucket_bounds_candidates_without_losing_dups(spark, tmp_path):
    """50 identical new docs against an indexed copy: candidates are
    bounded by the cap, yet EVERY new doc is still flagged as a duplicate
    (pairs with the cluster's low-id representatives)."""
    path = str(tmp_path / "idxcap")
    idx = MinHashDedupIndex.create(spark, path, num_hashes=24, bands=6)
    idx.update(_docs(spark, [(0, BASE)]), epoch=0)
    clones = _docs(spark, [(i, BASE) for i in range(1, 51)])

    pairs = idx.update(clones, epoch=1, max_bucket=3).collect()
    flagged = set()
    for r in pairs:
        flagged.add(r["id_a"]); flagged.add(r["id_b"])
        assert r["est_jaccard"] == 1.0
    assert set(range(1, 51)) <= flagged      # every clone caught
    # Bounded: each new doc pairs with <= cap representatives per band,
    # nowhere near the uncapped 50*51/2 = 1275 pairs.
    assert len(pairs) <= 50 * 3


# -- property: ANY batch split is equivalent to one-shot ---------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_word = st.sampled_from(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
)
_text = st.lists(_word, min_size=4, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(_text, min_size=2, max_size=10),
    cut=st.integers(min_value=0, max_value=9),
)
def test_property_any_split_equals_full_recompute(spark, tmp_path_factory, texts, cut):
    """For ARBITRARY small-vocabulary corpora (dup-heavy by construction)
    and an arbitrary batch boundary, updating in two epochs reports exactly
    the pairs a one-shot recompute would, with identical scores."""
    path = str(tmp_path_factory.mktemp("idxprop"))
    docs = _docs(spark, list(enumerate(texts)))
    k = min(cut, len(texts))
    b1 = docs.where(F.col("doc_id") < k)
    b2 = docs.where(F.col("doc_id") >= k)
    idx = MinHashDedupIndex.create(spark, path, num_hashes=12, bands=4)
    got = {}
    if k > 0:
        got.update({(r["id_a"], r["id_b"]): r["est_jaccard"]
                    for r in idx.update(b1, epoch=0).collect()})
    if k < len(texts):
        got.update({(r["id_a"], r["id_b"]): r["est_jaccard"]
                    for r in idx.update(b2, epoch=1).collect()})
    assert got == _full_recompute_pairs(spark, idx, docs)


def test_compact_name_never_collides_with_prior_compact(spark, tmp_path):
    """Out-of-order epoch ids must not make a second compaction reuse (and
    destroy) the first compaction's directory (review regression)."""
    import os

    path = str(tmp_path / "idxooo")
    idx = MinHashDedupIndex.create(spark, path, num_hashes=12, bands=4)
    idx.update(_docs(spark, [(1, "first epoch words here")]), epoch=2)
    idx.update(_docs(spark, [(2, "second epoch words here")]), epoch=5)
    assert idx.compact()["compacted"]
    # Backfill an EARLIER epoch id (valid: not in the ledger).
    idx.update(_docs(spark, [(3, "backfilled epoch words here")]), epoch=3)
    res = idx.compact()
    # First compaction took "compact-5" (max epoch unchanged since) — the
    # second must pick a fresh name, not overwrite-and-sweep its own source.
    assert res["compacted"] and res["dir"] == "compact-5-2"
    assert idx.stored_sigs().count() == 3
    assert idx.committed_epochs() == {2, 3, 5}
    dirs = os.listdir(os.path.join(path, "sigs"))
    assert len(dirs) == 1  # one merged dir, fully readable
    assert MinHashDedupIndex.load(spark, path).stored_sigs().count() == 3


def test_stored_representative_survives_bucket_cap(spark, tmp_path):
    """A flood of new clones with lexically smaller ids must NOT evict the
    stored copy from the capped bucket — every clone must be old-adjacent
    (review regression: curate drops only docs paired with OLD sides)."""
    path = str(tmp_path / "idxevict")
    idx = MinHashDedupIndex.create(
        spark, path, num_hashes=12, bands=4, id_type="string"
    )
    idx.update(
        spark.createDataFrame([("zzz://shipped/page", BASE)], "doc_id string, text string"),
        "doc_id", "text", epoch=0,
    )
    clones = spark.createDataFrame(
        [(f"aaa://new/{i:03d}", BASE) for i in range(30)], "doc_id string, text string"
    )
    pairs = idx.update(clones, "doc_id", "text", epoch=1, max_bucket=3).collect()
    old_adjacent = {
        r["id_a"] if r["id_b"] == "zzz://shipped/page" else r["id_b"]
        for r in pairs
        if "zzz://shipped/page" in (r["id_a"], r["id_b"])
    }
    assert old_adjacent == {f"aaa://new/{i:03d}" for i in range(30)}


def test_fully_boilerplate_docs_are_unindexable_not_identical(spark, tmp_path):
    """Two docs whose every shingle is stop-listed must NOT pair as perfect
    duplicates via the fold-identity signature (review regression)."""
    boiler = "copyright footer all rights reserved today"
    stop = MinHashDedupIndex.bootstrap_stop_shingles(
        _docs(spark, [(1, boiler), (2, boiler)]), "text", "doc_id", n=3, max_df=1
    )
    idx = MinHashDedupIndex.create(
        spark, str(tmp_path / "idxboil"), num_hashes=12, bands=4, stop_shingles=stop
    )
    idx.update(_docs(spark, [(1, boiler)]), epoch=0)
    assert idx.update(_docs(spark, [(2, boiler)]), epoch=1).count() == 0
    # Unindexable docs are excluded from storage too.
    assert idx.stored_sigs().count() == 0


def test_reshipped_id_emits_one_pair_and_compact_keeps_latest(spark, tmp_path):
    """Re-shipping an id stores a second signature version; pair emission
    stays one row per pair (best score), and compaction LWW-resolves to the
    newest version (review regression)."""
    path = str(tmp_path / "idxreship")
    idx = MinHashDedupIndex.create(spark, path, num_hashes=12, bands=4)
    idx.update(_docs(spark, [(1, BASE)]), epoch=0)
    idx.update(_docs(spark, [(1, BASE + " revised tonight")]), epoch=1)  # re-ship
    assert idx.stored_sigs().count() == 2  # both versions until compaction
    pairs = idx.update(_docs(spark, [(2, BASE)]), epoch=2).collect()
    assert len([r for r in pairs if {r["id_a"], r["id_b"]} == {1, 2}]) == 1
    idx.compact()
    resolved = idx.stored_sigs().collect()
    by_id = {r["doc_id"]: r["_iepoch"] for r in resolved}
    assert len(resolved) == len(by_id)  # one row per id
    assert by_id[1] == 1  # the newest version won


def test_compact_drop_ids_removes_derived_state(spark, tmp_path):
    """Takedown sidecar: compact(drop_ids=...) removes the doc's signature
    and band keys, so a later near-identical batch no longer matches it;
    works even with a single epoch dir (forces the rewrite)."""
    idx = MinHashDedupIndex.create(
        spark, str(tmp_path / "di"), num_hashes=24, bands=6
    )
    idx.update(_docs(spark, [(1, BASE), (2, "totally different words " * 8)]),
               epoch=0)
    res = idx.compact(drop_ids=[1])
    assert res["compacted"] is True and res["dropped_ids"] == 1
    assert idx.stored_sigs().select("doc_id").rdd.isEmpty() is False
    assert idx.stored_sigs().where(F.col("doc_id") == 1).count() == 0
    # A near-dup of the purged doc arrives later: no pair against id 1.
    pairs = idx.update(_docs(spark, [(9, BASE + " tail")]), epoch=1)
    assert pairs.where((F.col("id_a") == 1) | (F.col("id_b") == 1)).count() == 0
    # Ledger intact: replaying epoch 0 is still a no-op.
    again = idx.update(_docs(spark, [(1, BASE)]), epoch=0)
    assert again.count() == 0
    assert idx.stored_sigs().where(F.col("doc_id") == 1).count() == 0
