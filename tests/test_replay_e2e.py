"""Minimum end-to-end slice (SURVEY.md §7.2) + exactly-once / resume / LWW.

Golden replay: seeded synthetic change log → epoch-by-epoch replay →
final lake-table state must equal a single-process Python dict oracle that
applies the same LWW/upsert/delete semantics. Then: duplicate-epoch
idempotency, crash-resume, and out-of-order determinism.
"""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.functions.extract import extract_text
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.plans.registry import SchemaRegistry
from data_pipeline_spark.sources import changelog
from data_pipeline_spark.sources.datagen import gen_changes
from data_pipeline_spark.streaming.checkpoint import CheckpointStore
from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

N_EVENTS = 3000
EVENTS_PER_EPOCH = 500


def python_oracle(rows):
    """Single-process replay oracle: the GLOBAL per-url (warc_ts, lsn) LWW
    winner decides each key's final state — a winning delete removes the
    key. Independent of epoch batching: the engine's conditional merge +
    tombstones must land on exactly this state however the log was split
    into epochs (SURVEY.md §7.4 deterministic-replay requirement)."""
    winners = {}
    for r in rows:
        cur = winners.get(r["url"])
        if cur is None or (r["warc_ts"], r["lsn"]) > (cur["warc_ts"], cur["lsn"]):
            winners[r["url"]] = r
    state = {}
    for url, r in winners.items():
        if r["op"] != "delete":
            state[url] = {
                "url": url,
                "warc_ts": r["warc_ts"],
                "text": extract_text(bytes(r["html"]).decode("utf-8")),
                "lang": r["lang"],
            }
    return state


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("log"))
    df = gen_changes(spark, N_EVENTS, events_per_epoch=EVENTS_PER_EPOCH, seed=42)
    changelog.write_log(df, d)
    return d


def _fresh_runner(spark, log_dir, tmp_path, name):
    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / f"table_{name}"), registry, n_buckets=8)
    cps = CheckpointStore(str(tmp_path / f"cp_{name}"))
    return ReplayRunner(spark, log_dir, table, cps, registry), table, cps


def _table_state(table):
    rows = table.read().select("url", "warc_ts", "text", "lang").collect()
    return {r["url"]: (r["warc_ts"], r["text"], r["lang"]) for r in rows}


def test_full_replay_matches_oracle(spark, log_dir, tmp_path):
    runner, table, _ = _fresh_runner(spark, log_dir, tmp_path, "main")
    results = runner.run()
    assert len(results) == N_EVENTS // EVENTS_PER_EPOCH
    assert all(not r["skipped"] for r in results)

    raw = [r.asDict() for r in changelog.read_log(spark, log_dir).collect()]
    expected = python_oracle(raw)
    actual = _table_state(table)

    assert set(actual) == set(expected)
    for url, (ts, text, lang) in actual.items():
        exp = expected[url]
        assert ts == exp["warc_ts"], url
        assert text == exp["text"], url  # byte-identical text invariant
        assert lang == exp["lang"], url


def test_duplicate_epoch_is_noop(spark, log_dir, tmp_path):
    runner, table, cps = _fresh_runner(spark, log_dir, tmp_path, "idem")
    runner.run()
    v_before = table.meta["version"]
    state_before = _table_state(table)

    # Re-apply epoch 0 through the lake-level ledger (simulates a lost
    # checkpoint dir: merge must still no-op via the snapshot summary).
    df = changelog.read_epoch(spark, log_dir, 0)
    from data_pipeline_spark.operators.dedup import lww_dedup

    staged = lww_dedup(df.drop("epoch", "schema_version", "fetch_status"))
    res = table.merge(staged, epoch=0)
    assert res["skipped"] is True
    assert table.meta["version"] == v_before
    assert _table_state(table) == state_before

    # And through the runner (checkpoint fast path).
    r = runner.apply_epoch(0)
    assert r["skipped"] is True


def test_crash_resume(spark, log_dir, tmp_path):
    runner, table, cps = _fresh_runner(spark, log_dir, tmp_path, "resume")
    # "Crash" after 2 epochs.
    runner.run(max_epochs=2)
    assert cps.last_epoch() == 1
    # Resume with a fresh runner over reloaded table state.
    table2 = LakeTable.load(spark, table.path)
    runner2 = ReplayRunner(spark, log_dir, table2, cps, SchemaRegistry())
    results = runner2.run()
    applied = [r for r in results if not r["skipped"]]
    skipped = [r for r in results if r["skipped"]]
    assert len(skipped) == 2 and len(applied) == N_EVENTS // EVENTS_PER_EPOCH - 2

    # Final state identical to a straight-through run.
    runner3, table3, _ = _fresh_runner(spark, log_dir, tmp_path, "straight")
    runner3.run()
    assert _table_state(table2) == _table_state(table3)


def test_order_insensitive_lww(spark, tmp_path):
    """Equal warc_ts rows must resolve by lsn regardless of input order."""
    from data_pipeline_spark.operators.dedup import lww_dedup, lww_dedup_window

    rows = [
        ("u1", "2024-01-01 00:00:00", 5, "e5"),
        ("u1", "2024-01-01 00:00:00", 9, "e9"),
        ("u1", "2024-01-01 00:00:00", 7, "e7"),
        ("u2", "2024-01-02 00:00:00", 1, "a1"),
        ("u2", "2024-01-01 00:00:00", 2, "a2"),
    ]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(perm, "url string, warc_ts string, lsn long, v string")
        df = df.withColumn("warc_ts", F.to_timestamp("warc_ts"))
        got = {r["url"]: r["v"] for r in lww_dedup(df).collect()}
        assert got == {"u1": "e9", "u2": "a1"}
        got_w = {r["url"]: r["v"] for r in lww_dedup_window(df).collect()}
        assert got_w == got


def test_epoch_batching_invariance(spark, tmp_path):
    """Final state must not depend on how the log is split into epochs:
    a later epoch carrying an older (warc_ts, lsn) event must not clobber
    a newer stored row, and a winning delete must stay deleted even when an
    older event for that key arrives in a later epoch (tombstones)."""
    states = []
    for name, epoch_size in (("small", 200), ("large", 1000)):
        log_dir = str(tmp_path / f"log_{name}")
        df = gen_changes(spark, 2000, events_per_epoch=epoch_size, seed=99)
        changelog.write_log(df, log_dir)
        runner, table, _ = _fresh_runner(spark, log_dir, tmp_path, f"batch_{name}")
        runner.run()
        states.append(_table_state(table))
    assert states[0] == states[1]


def test_mor_matches_cow_and_compact(spark, log_dir, tmp_path):
    """merge-on-read replay must land on the same final state as
    copy-on-write; compact() collapses versions without changing state."""
    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_mor"), registry, n_buckets=8)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / "cp_mor")),
        registry, merge_mode="mor",
    )
    runner.run()
    assert table._current_snapshot()["needs_resolve"] is True

    cow_runner, cow_table, _ = _fresh_runner(spark, log_dir, tmp_path, "cow_ref")
    cow_runner.run()
    assert _table_state(table) == _table_state(cow_table)

    files_before = len(table.files_of(table._current_snapshot()))
    state_before = _table_state(table)
    table.compact()
    assert table._current_snapshot()["needs_resolve"] is False
    assert len(table.files_of(table._current_snapshot())) < files_before
    assert _table_state(table) == state_before

    # Tombstone GC after the replay horizon.
    table.compact(drop_tombstones=True)
    from data_pipeline_spark.lake.table import DELETED_COL
    import pyspark.sql.functions as F
    raw = table.read(with_system=True)
    assert raw.where(F.coalesce(F.col(DELETED_COL), F.lit(False))).count() == 0
    assert _table_state(table) == state_before


def test_stale_handle_commit_conflict(spark, log_dir, tmp_path):
    """A second handle that loaded metadata before another handle committed
    must NOT be able to commit (it would resurrect expired snapshots whose
    files are gone) — icelite's analog of Iceberg optimistic concurrency."""
    from data_pipeline_spark.lake.table import CommitConflictError

    runner, table, _ = _fresh_runner(spark, log_dir, tmp_path, "conflict")
    runner.run()

    stale = LakeTable.load(spark, table.path)
    table.expire_snapshots(keep_last=1)  # advances the on-disk version

    with pytest.raises(CommitConflictError):
        stale._commit(files=stale.files_of(stale._current_snapshot()), summary={"operation": "noop"})
    with pytest.raises(CommitConflictError):
        stale.expire_snapshots(keep_last=1)

    state_before = _table_state(table)
    stale.refresh()
    assert stale.meta["version"] == table.meta["version"]
    stale._commit(files=stale.files_of(stale._current_snapshot()), summary={"operation": "noop"})
    assert _table_state(stale) == state_before


def test_metadata_stays_small_files_live_in_manifests(spark, log_dir, tmp_path):
    """Commits write O(current files) manifest bytes; the metadata document
    itself carries no file paths — at 10^10-scale history lengths the
    metadata JSON must stay metadata-sized."""
    import json as _json
    import os as _os

    runner, table, _ = _fresh_runner(spark, log_dir, tmp_path, "manifest")
    runner.run()

    meta_dir = _os.path.join(table.path, "metadata")
    version = int(open(_os.path.join(meta_dir, "version-hint.text")).read())
    meta = _json.load(open(_os.path.join(meta_dir, f"v{version}.metadata.json")))
    for snap in meta["snapshots"]:
        assert "files" not in snap
        assert snap["manifest"].startswith("metadata/manifest-")
        assert _os.path.exists(_os.path.join(table.path, snap["manifest"]))
        assert snap["n_files"] == len(table.files_of(snap))
    # The document mentions no data files at all.
    raw = open(_os.path.join(meta_dir, f"v{version}.metadata.json")).read()
    assert ".parquet" not in raw


def test_partial_compaction_by_dirty_buckets(spark, log_dir, tmp_path):
    """compact(buckets=...) collapses only the chosen buckets (O(dirty)
    maintenance), preserves logical state, and keeps reads correct while
    the table-level resolve flag stays conservative."""
    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_pc"), registry, n_buckets=8)
    ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / "cp_pc")),
        registry, merge_mode="mor",
    ).run()
    state = _table_state(table)

    dirty = table.dirty_buckets()
    assert dirty, "MoR replay should leave multi-file buckets"
    half = dirty[: max(1, len(dirty) // 2)]
    files_before = len(table.files_of(table._current_snapshot()))
    table.compact(buckets=half)
    assert table._current_snapshot()["needs_resolve"] is True  # conservative
    assert _table_state(table) == state
    # The compacted buckets collapsed to one file each.
    per_bucket = {}
    for f in table.files_of(table._current_snapshot()):
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert all(per_bucket[b] == 1 for b in half)
    assert len(table.files_of(table._current_snapshot())) < files_before

    # Full compaction afterwards clears the flag, same state.
    table.compact()
    assert table._current_snapshot()["needs_resolve"] is False
    assert _table_state(table) == state


def test_snapshot_tags_survive_expiry(spark, log_dir, tmp_path):
    """Iceberg-style refs: a tagged snapshot stays readable (and its files
    stay on disk) through expire_snapshots; dropping the tag releases it."""
    runner, table, _ = _fresh_runner(spark, log_dir, tmp_path, "tags")
    first = runner.apply_epoch(0)
    sid = first["snapshot_id"]
    tagged_rows = table.read(snapshot_id=sid).count()
    runner.run()

    table.tag("train-run-1", sid)
    assert table.ref("train-run-1") == sid
    table.expire_snapshots(keep_last=1)
    # tagged snapshot still in history and readable by ref
    assert table.snapshot(sid) is not None
    assert table.read(ref="train-run-1").count() == tagged_rows

    # reload from disk: refs persist
    t2 = LakeTable.load(spark, table.path)
    assert t2.read(ref="train-run-1").count() == tagged_rows

    t2.drop_tag("train-run-1")
    t2.expire_snapshots(keep_last=1)
    assert t2.snapshot(sid) is None
    with pytest.raises(ValueError, match="unknown ref"):
        t2.read(ref="train-run-1")


def test_python_xxhash64_matches_jvm(spark):
    """The driver-side bucket router must agree with F.xxhash64 bit-for-bit
    (strings incl. unicode + empty + >32-byte, and integral keys)."""
    from data_pipeline_spark.lake.xxhash import spark_xxhash64

    strs = [
        "", "a", "abc", "https://example.org/x?y=1",
        "u" * 31, "v" * 32, "w" * 100, "päge/ünïcode/✓", "tab\tnew\nline",
    ]
    ints = [0, 1, -1, 42, 2**31, -(2**31), 2**62, -(2**62)]
    sdf = spark.createDataFrame([(s,) for s in strs], "k string").select(
        "k", F.xxhash64("k").alias("h")
    )
    for r in sdf.collect():
        assert spark_xxhash64(r["k"]) == r["h"], r["k"]
    idf = spark.createDataFrame([(i,) for i in ints], "k long").select(
        "k", F.xxhash64("k").alias("h")
    )
    for r in idf.collect():
        assert spark_xxhash64(r["k"]) == r["h"], r["k"]


def test_read_changes_incremental_scan(spark, log_dir, tmp_path):
    """read_changes(from, to) over MoR commits yields exactly the later
    epochs' staged winner/tombstone rows — the lake as a change stream."""
    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_inc"), registry, n_buckets=8)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / "cp_inc")),
        registry, merge_mode="mor",
    )
    first = runner.apply_epoch(0)
    snap_after_0 = first["snapshot_id"]
    runner.run()  # remaining epochs

    inc = table.read_changes(snap_after_0).select("op", "url", "lsn").collect()
    got = {(r["op"], r["url"], r["lsn"]) for r in inc}

    # Oracle: per-epoch LWW winners of epochs 1.. (that is what MoR commits).
    raw = [r.asDict() for r in changelog.read_log(spark, log_dir).collect()
           if r["lsn"] >= EVENTS_PER_EPOCH]
    winners = {}
    for r in raw:
        epoch = r["lsn"] // EVENTS_PER_EPOCH
        k = (epoch, r["url"])
        cur = winners.get(k)
        if cur is None or (r["warc_ts"], r["lsn"]) > (cur["warc_ts"], cur["lsn"]):
            winners[k] = r
    expected = {
        ("delete" if w["op"] == "delete" else "upsert", w["url"], w["lsn"])
        for w in winners.values()
    }
    assert got == expected

    # Full-range incremental == all commits' rows; from=None means "from
    # the beginning".
    assert table.read_changes(None).count() == sum(
        1 for _ in table.read(with_system=True).collect()
    )

    # An expired/unknown cursor must raise, not silently re-deliver the
    # whole table as changes (consumer must re-bootstrap explicitly).
    with pytest.raises(ValueError, match="not a live snapshot"):
        table.read_changes(99999)


def test_late_backfill_epoch_converges(spark, log_dir, tmp_path):
    """An EARLIER epoch applied after later ones (late backfill) must land
    on the same final state: stored (warc_ts, lsn) guards make merge order
    irrelevant, not just event order."""
    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_late"), registry, n_buckets=8)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / "cp_late")), registry
    )
    epochs = changelog.list_epochs(spark, log_dir)
    for e in [*epochs[2:], epochs[1], epochs[0]]:  # 2,3,..,1,0
        runner.apply_epoch(e)

    ordered, otable, _ = _fresh_runner(spark, log_dir, tmp_path, "ordered_ref")
    ordered.run()
    assert _table_state(table) == _table_state(otable)


def test_cow_merge_prunes_untouched_buckets(spark, log_dir, tmp_path):
    """The CoW scale claim: an epoch touching few keys must only read and
    rewrite the buckets containing them — untouched buckets carry over by
    file REFERENCE (same paths, no rewrite)."""
    import datetime as dt

    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_prune"), registry, n_buckets=8)
    runner = ReplayRunner(
        spark, log_dir, table, CheckpointStore(str(tmp_path / "cp_prune")), registry
    )
    runner.run()  # build a populated table
    before = {f["path"] for f in table.files_of(table._current_snapshot())}
    state_before = _table_state(table)

    one = spark.createDataFrame(
        [("update", "https://prune.example/only-key", 10**9,
          dt.datetime(2030, 1, 1), b"<p>new</p>", "en", 1)],
        "op string, url string, lsn long, warc_ts timestamp, "
        "html binary, lang string, schema_version int",
    )
    from data_pipeline_spark.streaming.runner import stage_changes

    metrics = table.merge(stage_changes(spark, one, table), epoch=777)
    assert metrics["touched_buckets"] == 1
    after = {f["path"] for f in table.files_of(table._current_snapshot())}
    # 7 of 8 buckets' files are carried verbatim.
    carried = before & after
    assert len(after - before) >= 1
    assert len(carried) >= len(before) * 6 // 8

    got = _table_state(table)
    assert got.pop("https://prune.example/only-key")[1] == "new"
    assert got == state_before


def test_point_lookup_prunes_bucket_and_rowgroups(spark, log_dir, tmp_path):
    """lookup() reads one bucket with the key predicate pushed to parquet;
    within-file key sort makes row-group stats selective."""
    runner, table, _ = _fresh_runner(spark, log_dir, tmp_path, "lookup")
    runner.run()
    some_url = table.read().select("url").limit(1).collect()[0]["url"]

    df = table.lookup(some_url)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["url"] == some_url

    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "EqualTo(url" in plan
    # Bucket pruning: the scan lists at most 1/n_buckets of the files.
    n_scan_files = plan.count(".parquet")
    total = len(table.files_of(table._current_snapshot()))
    assert table.read(with_system=True).inputFiles()  # sanity: table has files
    assert len(df.inputFiles()) <= max(1, total // table.n_buckets + 1)

    # Data files are sorted by key within each file (row-group prunable).
    import pyarrow.parquet as pq
    import os as _os

    f = table.files_of(table._current_snapshot())[0]
    t = pq.read_table(_os.path.join(table.path, f["path"]), columns=["url"])
    urls = t.column("url").to_pylist()
    assert urls == sorted(urls)

    # Manifest-level key stats (Iceberg data skipping): every file carries
    # a key range, and pruning by it is consistent with the actual rows.
    files = table.files_of(table._current_snapshot())
    assert all("key_min" in fr and fr["key_min"] <= fr["key_max"] for fr in files)
    skipped = table.read(key_equals=some_url)
    assert len(skipped.inputFiles()) <= len(df.inputFiles()) * table.n_buckets
    got = {r["url"] for r in skipped.where(F.col("url") == some_url).collect()}
    assert got == {some_url}
    # A key lexically outside every range prunes ALL files.
    assert table.read(key_equals="zzzz-no-such-url").inputFiles() == []


def test_checkpoint_metrics_queryable(spark, log_dir, tmp_path):
    """The checkpoint ledger is queryable as a DataFrame: per-epoch rows,
    bytes, snapshot ids, input-file lineage."""
    registry = SchemaRegistry()
    table = make_table_for_log(spark, str(tmp_path / "t_m"), registry, n_buckets=8)
    cps = CheckpointStore(str(tmp_path / "cp_m"))
    ReplayRunner(spark, log_dir, table, cps, registry).run()

    m = cps.metrics_df(spark)
    rows = {r["epoch"]: r for r in m.collect()}
    assert len(rows) == N_EVENTS // EVENTS_PER_EPOCH
    for e, r in rows.items():
        assert r["staged_rows"] > 0
        assert r["input_bytes"] > 0
        assert len(r["input_files"]) >= 1
        assert r["snapshot_id"] >= 1
    # Aggregate observability query over the ledger.
    total = m.agg({"staged_rows": "sum"}).collect()[0][0]
    assert total == sum(r["staged_rows"] for r in rows.values())


def test_remove_orphan_files(spark, log_dir, tmp_path):
    """Files written by a crashed (uncommitted) commit are swept; every
    referenced file — from ANY live snapshot, not just current — survives,
    so time travel still works afterwards."""
    import os as _os

    runner, table, _ = _fresh_runner(spark, log_dir, tmp_path, "orphan")
    runner.run()
    state = _table_state(table)

    # Simulate a crash mid-commit: data files on disk, no snapshot.
    orphan_dir = _os.path.join(table.path, "data", "commit-9999")
    _os.makedirs(orphan_dir)
    for i in range(3):
        with open(_os.path.join(orphan_dir, f"part-{i}.snappy.parquet"), "wb") as f:
            f.write(b"not really parquet")

    # Grace period protects fresh files (in-flight commit simulation).
    assert table.remove_orphan_files(grace_seconds=3600) == 0
    removed = table.remove_orphan_files(grace_seconds=0)
    assert removed == 3
    assert not _os.path.exists(_os.path.join(orphan_dir, "part-0.snappy.parquet"))

    # Table state intact; an OLD snapshot still time-travels.
    assert _table_state(table) == state
    first_sid = table.meta["snapshots"][0]["snapshot_id"]
    assert table.read(snapshot_id=first_sid).count() >= 0  # scan succeeds
