"""Manifest-level per-file key Bloom filters (lake/bloom.py).

Within a bucket, every commit's file spans the full hash-distributed key
range, so min/max never prunes across commits — the bloom must. These tests
pin: JVM/Python position parity (the bloom is built JVM-side but probed
driver-side), no false negatives, within-bucket commit pruning, the
stats-only commit contract (empty change delta), and absent-key prune rate.
"""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.bloom import (
    build_file_blooms,
    choose_m,
    key_positions,
    might_contain,
)
from data_pipeline_spark.lake.table import LakeTable


def test_positions_match_jvm(spark):
    """The driver-side probe must compute the exact bit positions the
    distributed build wrote, or pruning silently false-negatives."""
    keys = ["https://a.example/p/1", "", "é-multibyte-ключ", "x" * 100]
    m, k = 8192, 5
    df = spark.createDataFrame([(s,) for s in keys], "k string").select(
        "k",
        *[
            F.pmod(F.xxhash64(F.col("k"), F.lit(i).cast("long")), F.lit(m)).alias(f"p{i}")
            for i in range(k)
        ],
    )
    for r in df.collect():
        assert [r[f"p{i}"] for i in range(k)] == key_positions(r["k"], m, k)


def test_choose_m_word_aligned_and_capped():
    assert choose_m(0) == 64
    assert choose_m(100) == ((100 * 10 + 63) // 64) * 64
    assert choose_m(10**9) == 1 << 17


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    """MoR table with three disjoint-key commits: every bucket holds files
    from up to three commits, so point lookups exercise within-bucket
    pruning. Returns (table, keys_by_epoch)."""
    path = str(tmp_path_factory.mktemp("bloomtab"))
    table = LakeTable.create(
        spark, path, spark.createDataFrame([], "url string, v long").schema,
        key_col="url", n_buckets=4,
    )
    keys = {}
    for epoch in range(3):
        ks = [f"https://e{epoch}.example/item/{i}" for i in range(200)]
        keys[epoch] = ks
        staged = spark.createDataFrame(
            [(u, epoch * 1000 + i, "upsert", epoch * 1000 + i) for i, u in enumerate(ks)],
            "url string, v long, op string, lsn long",
        )
        table.merge(staged, epoch=epoch, mode="mor", ts_col="v")
    return table, keys


def test_build_blooms_stats_only_commit(spark, bloom_table):
    table, keys = bloom_table
    pre = table.meta["current_snapshot_id"]
    res = table.build_blooms()
    files = table.files_of(table._current_snapshot())
    assert res["built"] == len(files) and res["built"] > 0
    assert all("bloom" in f for f in files)
    # Stats commit carries the same data files: empty incremental delta.
    assert table.read_changes(pre).count() == 0
    # Data unchanged and readable.
    assert table.read().count() == sum(len(v) for v in keys.values())


def test_no_false_negatives_and_within_bucket_pruning(spark, bloom_table):
    table, keys = bloom_table
    if "bloom" not in table.files_of(table._current_snapshot())[0]:
        table.build_blooms()
    files = table.files_of(table._current_snapshot())
    n_commits = len({f["path"].split("/")[1] for f in files})
    assert n_commits >= 3
    # Every live key must still be found (no false negatives), and the
    # pruned scan should touch fewer files than the bucket holds across
    # commits — the whole point of the bloom.
    sampled = keys[0][:5] + keys[1][:5] + keys[2][:5]
    for u in sampled:
        got = table.lookup(u).collect()
        assert len(got) == 1 and got[0]["url"] == u
    pruned_counts = [len(table.read(key_equals=u).inputFiles()) for u in sampled]
    bucket_files = max(
        len([f for f in files if f["bucket"] == b]) for b in range(table.n_buckets)
    )
    assert bucket_files >= 3  # MoR: one file per commit per touched bucket
    # On average the bloom prunes to ~1 file (its own commit) + rare fps.
    assert sum(pruned_counts) / len(pruned_counts) < bucket_files


def test_absent_keys_prune_almost_everything(spark, bloom_table):
    table, _ = bloom_table
    if "bloom" not in table.files_of(table._current_snapshot())[0]:
        table.build_blooms()
    absent = [f"https://nowhere.example/missing/{i}" for i in range(200)]
    touched = sum(
        1
        for u in absent
        for f in table.files_of(table._current_snapshot())
        if might_contain(f["bloom"], u)
    )
    n_files = len(table.files_of(table._current_snapshot()))
    # fpp ≈ 1.2% per file at 10 bits/key, k=5 → expect ≪ 5% of file probes.
    assert touched <= 0.05 * 200 * n_files


def test_new_commit_files_lack_bloom_but_stay_readable(spark, bloom_table):
    table, keys = bloom_table
    if "bloom" not in table.files_of(table._current_snapshot())[0]:
        table.build_blooms()
    u = "https://e9.example/late/1"
    staged = spark.createDataFrame(
        [(u, 9999, "upsert", 9999)], "url string, v long, op string, lsn long"
    )
    table.merge(staged, epoch=99, mode="mor", ts_col="v")
    # The new file has no bloom yet → conservatively kept → key found.
    got = table.lookup(u).collect()
    assert len(got) == 1 and got[0]["v"] == 9999
    # Incremental build only processes the new file.
    res = table.build_blooms()
    assert res["built"] == 1
    assert all("bloom" in f for f in table.files_of(table._current_snapshot()))


def test_build_on_empty_and_keyless_schema(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "empty"), spark.createDataFrame([], "url string, v long").schema,
        key_col="url", n_buckets=2,
    )
    assert table.build_blooms()["built"] == 0
    # Schema group without the key column yields no blooms (graceful).
    assert build_file_blooms(
        spark, [([], spark.createDataFrame([], "x long").schema)], "url"
    ) == {}


def test_build_blooms_under_percent_encoded_path(spark, tmp_path):
    """input_file_name() percent-encodes URIs — a table dir with a space
    must still get blooms attached (review regression)."""
    path = str(tmp_path / "my tables" / "t")
    table = LakeTable.create(
        spark, path, spark.createDataFrame([], "url string, v long").schema,
        key_col="url", n_buckets=2,
    )
    staged = spark.createDataFrame(
        [(f"https://x.example/{i}", i, "upsert", i) for i in range(20)],
        "url string, v long, op string, lsn long",
    )
    table.merge(staged, epoch=0, mode="mor", ts_col="v")
    res = table.build_blooms()
    files = table.files_of(table._current_snapshot())
    assert res["built"] == len(files) > 0
    assert all("bloom" in f for f in files)
