"""Content-addressed manifest segments (lake/table.py files_of/_write_manifest).

At 10^6 data files a flat per-snapshot manifest makes every commit write
O(total files) of metadata. Since format 2 the manifest is a manifest LIST of
per-(spec, bucket) content-addressed segment files: a commit touching k of B
buckets rewrites k segments + one small list, and untouched buckets' segments
hash identically so they are referenced, not rewritten (the Iceberg
manifest-list → shared-manifest layout). These tests pin: segment reuse
across MoR commits, exact files_of round-trip, legacy flat/inline manifest
compat, expiry GC of exclusively-referenced segments, and the orphan-segment
sweep.
"""

import json
import os

import pytest

from data_pipeline_spark.lake.table import LakeTable


def _mk_table(spark, path, n_buckets=8):
    return LakeTable.create(
        spark,
        path,
        spark.createDataFrame([], "url string, v long").schema,
        key_col="url",
        n_buckets=n_buckets,
    )


def _stage(spark, keys, base):
    return spark.createDataFrame(
        [(u, base + i, "upsert", base + i) for i, u in enumerate(keys)],
        "url string, v long, op string, lsn long",
    )


@pytest.fixture(scope="module")
def seg_table(spark, tmp_path_factory):
    """Epoch 0 touches (almost surely) every bucket; epoch 1 touches few."""
    path = str(tmp_path_factory.mktemp("segtab"))
    t = _mk_table(spark, path)
    t.merge(
        _stage(spark, [f"https://e0.example/item/{i}" for i in range(400)], 0),
        epoch=0, mode="mor", ts_col="v",
    )
    t.merge(
        _stage(spark, [f"https://e1.example/item/{i}" for i in range(3)], 1000),
        epoch=1, mode="mor", ts_col="v",
    )
    return t


def test_commit_reuses_untouched_bucket_segments(seg_table):
    t = seg_table
    snaps = t.meta["snapshots"]
    s0, s1 = snaps[0], snaps[1]
    segs0, segs1 = set(t._segments_of(s0)), set(t._segments_of(s1))
    assert segs0 and segs1
    files0 = {f["path"] for f in t.files_of(s0)}
    touched = {f["bucket"] for f in t.files_of(s1) if f["path"] not in files0}
    assert 0 < len(touched) < t.n_buckets  # 3 keys can't fill 8 buckets
    # Exactly the touched buckets get new segments; the rest are shared.
    assert len(segs1 - segs0) == len(touched)
    assert len(segs0 & segs1) == t.n_buckets - len(touched)


def test_files_of_round_trip_and_read(seg_table):
    t = seg_table
    cur = t._current_snapshot()
    files = t.files_of(cur)
    assert len({f["path"] for f in files}) == len(files) == cur["n_files"]
    assert all(os.path.exists(os.path.join(t.path, f["path"])) for f in files)
    # A cold handle reconstructs the same list from segment files.
    cold = LakeTable.load(t.spark, t.path)
    cold_files = cold.files_of(cold._current_snapshot())
    key = lambda f: f["path"]  # noqa: E731
    assert sorted(cold_files, key=key) == sorted(files, key=key)
    assert t.read().count() == 403


def test_legacy_flat_and_inline_manifests_still_read(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "legacy"), n_buckets=2)
    t.merge(_stage(spark, ["https://a/1", "https://a/2"], 0),
            epoch=0, mode="mor", ts_col="v")
    cur = t._current_snapshot()
    files = [dict(f) for f in t.files_of(cur)]
    # Format 1: the manifest is a flat JSON list.
    with open(os.path.join(t.path, cur["manifest"]), "w", encoding="utf-8") as f:
        json.dump(files, f)
    t._manifest_cache.clear()
    t._segment_cache.clear()
    assert sorted(f["path"] for f in t.files_of(cur)) == sorted(
        f["path"] for f in files
    )
    # Pre-manifest: files inline in the snapshot dict.
    inline = {k: v for k, v in cur.items() if k != "manifest"}
    inline["files"] = files
    assert t.files_of(inline) is files or t.files_of(inline) == files
    assert t.read().count() == 2


def test_expiry_gcs_exclusive_segments_keeps_shared(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "exp"), n_buckets=4)
    t.merge(_stage(spark, [f"https://e0/i/{i}" for i in range(200)], 0),
            epoch=0, mode="mor", ts_col="v")
    t.merge(_stage(spark, ["https://e1/i/0"], 1000),
            epoch=1, mode="mor", ts_col="v")
    t.merge(_stage(spark, ["https://e2/i/0"], 2000),
            epoch=2, mode="mor", ts_col="v")
    all_refs = [set(t._segments_of(s)) for s in t.meta["snapshots"]]
    t.expire_snapshots(keep_last=1)
    kept = set(t._segments_of(t._current_snapshot()))
    meta_dir = os.path.join(t.path, "metadata")
    on_disk = {
        f"metadata/{fn}"
        for fn in os.listdir(meta_dir)
        if fn.startswith("seg-") and fn.endswith(".json")
    }
    # Every kept-referenced segment survives; every surviving segment is
    # referenced (exclusively-dropped ones are gone).
    assert kept <= on_disk
    assert on_disk == kept
    # Dropped snapshots really had exclusive segments that are now gone.
    dropped_only = set().union(*all_refs[:-1]) - all_refs[-1]
    assert dropped_only and not (dropped_only & on_disk)
    assert t.read().count() == 202


def test_orphan_segment_and_manifest_sweep(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "orph"), n_buckets=2)
    t.merge(_stage(spark, ["https://a/1"], 0), epoch=0, mode="mor", ts_col="v")
    # Crash residue: a segment and a manifest list no snapshot references.
    orphans = [
        os.path.join(t.path, "metadata", "seg-deadbeefdeadbeefdead.json"),
        os.path.join(t.path, "metadata", "manifest-9999.json"),
    ]
    for p in orphans:
        with open(p, "w", encoding="utf-8") as f:
            f.write("[]")
        old = os.path.getmtime(p) - 10
        os.utime(p, (old, old))
    live = set(t._segments_of(t._current_snapshot()))
    removed = t.remove_orphan_files(grace_seconds=5.0)
    assert removed >= 2
    for p in orphans:
        assert not os.path.exists(p)
    for seg in live:
        assert os.path.exists(os.path.join(t.path, seg))
    assert os.path.exists(
        os.path.join(t.path, t._current_snapshot()["manifest"])
    )
    assert t.read().count() == 1
