"""Write-audit-publish branches (Iceberg WAP pattern): stage epoch commits
on a branch while main's readers see nothing, audit the branch state, then
fast-forward publish atomically; diverged branches refuse to publish."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.table import LakeTable


def _mk_table(spark, path):
    return LakeTable.create(
        spark, path,
        spark.createDataFrame([], "url string, v long, warc_ts timestamp").schema,
        key_col="url", n_buckets=4,
    )


def _staged(spark, rows):
    # rows: (url, v, seconds, op, lsn)
    return spark.createDataFrame(
        [(u, v, f"2026-01-01 00:00:{s:02d}", op, lsn) for (u, v, s, op, lsn) in rows],
        "url string, v long, warc_ts string, op string, lsn long",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def test_wap_stage_audit_publish(spark, tmp_path):
    table = _mk_table(spark, str(tmp_path / "t"))
    table.merge(_staged(spark, [("a", 1, 1, "upsert", 1)]), epoch=0, mode="mor")
    main_before = {(r["url"], r["v"]) for r in table.read().collect()}

    table.create_branch("audit")
    table.merge(
        _staged(spark, [("b", 2, 2, "upsert", 2), ("a", 10, 3, "upsert", 3)]),
        epoch=1, mode="mor", branch="audit",
    )
    table.merge(
        _staged(spark, [("c", 3, 4, "upsert", 4)]),
        epoch=2, mode="mor", branch="audit",
    )
    # Main unchanged while staged; the branch ref shows the staged state.
    assert {(r["url"], r["v"]) for r in table.read().collect()} == main_before
    staged_view = {(r["url"], r["v"]) for r in table.read(ref="audit").collect()}
    assert staged_view == {("a", 10), ("b", 2), ("c", 3)}

    # Publish: main atomically serves the audited state.
    table.fast_forward("audit")
    assert {(r["url"], r["v"]) for r in table.read().collect()} == staged_view
    assert "audit" not in table.meta.get("branches", {})
    # Cold reload sees the published state (metadata round-trips).
    reloaded = LakeTable.load(spark, table.path)
    assert {(r["url"], r["v"]) for r in reloaded.read().collect()} == staged_view


def test_wap_epoch_ledger_spans_branches(spark, tmp_path):
    """A staged-but-unpublished epoch must not re-apply — the exactly-once
    ledger covers branch commits."""
    table = _mk_table(spark, str(tmp_path / "t2"))
    table.create_branch("wap")
    res = table.merge(
        _staged(spark, [("a", 1, 1, "upsert", 1)]), epoch=7, mode="mor",
        branch="wap",
    )
    assert not res.get("skipped")
    again = table.merge(
        _staged(spark, [("a", 99, 9, "upsert", 9)]), epoch=7, mode="mor",
    )
    assert again["skipped"] is True
    table.fast_forward("wap")
    assert [r["v"] for r in table.read().collect()] == [1]


def test_wap_cow_merge_on_branch_builds_on_branch_head(spark, tmp_path):
    table = _mk_table(spark, str(tmp_path / "t3"))
    table.merge(_staged(spark, [("a", 1, 1, "upsert", 1)]), epoch=0)
    table.create_branch("wap")
    table.merge(
        _staged(spark, [("a", 2, 5, "upsert", 5)]), epoch=1, branch="wap",
    )
    table.merge(
        _staged(spark, [("a", 3, 9, "upsert", 9), ("b", 1, 9, "upsert", 10)]),
        epoch=2, branch="wap",
    )
    # Branch LWW resolved across its own chain; main still at v=1.
    got = {(r["url"], r["v"]) for r in table.read(ref="wap").collect()}
    assert got == {("a", 3), ("b", 1)}
    assert {(r["url"], r["v"]) for r in table.read().collect()} == {("a", 1)}
    table.fast_forward("wap")
    assert {(r["url"], r["v"]) for r in table.read().collect()} == got


def test_diverged_branch_refuses_publish(spark, tmp_path):
    table = _mk_table(spark, str(tmp_path / "t4"))
    table.merge(_staged(spark, [("a", 1, 1, "upsert", 1)]), epoch=0)
    table.create_branch("wap")
    table.merge(_staged(spark, [("b", 2, 2, "upsert", 2)]), epoch=1, branch="wap")
    # Main advances independently → the branch no longer descends from it.
    table.merge(_staged(spark, [("c", 3, 3, "upsert", 3)]), epoch=2)
    with pytest.raises(ValueError, match="diverged"):
        table.fast_forward("wap")
    # Abandon: main unaffected, branch gone.
    table.drop_branch("wap")
    assert {r["url"] for r in table.read().collect()} == {"a", "c"}


def test_branch_and_main_commits_never_collide_on_ids_or_dirs(spark, tmp_path):
    """Interleaved main/branch commits allocate globally unique snapshot ids
    (a per-head +1 would reuse an id and clobber its commit-N data dir)."""
    table = _mk_table(spark, str(tmp_path / "t5"))
    table.merge(_staged(spark, [("a", 1, 1, "upsert", 1)]), epoch=0)
    table.create_branch("wap")
    table.merge(_staged(spark, [("b", 2, 2, "upsert", 2)]), epoch=1, branch="wap")
    table.merge(_staged(spark, [("c", 3, 3, "upsert", 3)]), epoch=2)  # main
    ids = [s["snapshot_id"] for s in table.history()]
    assert len(ids) == len(set(ids)) == 3
    # Main's latest commit did not overwrite the branch's staged files.
    assert {r["url"] for r in table.read(ref="wap").collect()} == {"a", "b"}
    assert {r["url"] for r in table.read().collect()} == {"a", "c"}


def test_expiry_keeps_branch_heads_and_main_current(spark, tmp_path):
    table = _mk_table(spark, str(tmp_path / "t6"))
    table.merge(_staged(spark, [("a", 1, 1, "upsert", 1)]), epoch=0)
    table.create_branch("wap")
    for e in range(1, 4):
        table.merge(
            _staged(spark, [(f"k{e}", e, e, "upsert", e)]), epoch=e, branch="wap",
        )
    # keep_last=1 would naively keep only the newest (branch) snapshot;
    # main's current and the branch head must both survive.
    table.expire_snapshots(keep_last=1)
    assert {r["url"] for r in table.read().collect()} == {"a"}
    assert {r["url"] for r in table.read(ref="wap").collect()} == {
        "a", "k1", "k2", "k3",
    }


def test_replay_runner_stages_on_branch(spark, tmp_path):
    """End-to-end WAP: a replay run staged on a branch leaves main empty
    until fast_forward, then main equals a direct (unbranched) replay."""
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.sources import changelog
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.streaming.checkpoint import CheckpointStore
    from data_pipeline_spark.streaming.runner import ReplayRunner, make_table_for_log

    log = str(tmp_path / "log")
    changelog.write_log(gen_changes(spark, 800, events_per_epoch=400, seed=3), log)
    reg = SchemaRegistry()

    t_wap = make_table_for_log(spark, str(tmp_path / "wap_t"), reg, n_buckets=4)
    ReplayRunner(
        spark, log, t_wap, CheckpointStore(str(tmp_path / "cp1")), reg,
        merge_mode="mor", branch="staging",
    ).run()
    assert t_wap.read().count() == 0  # nothing published yet
    staged_n = t_wap.read(ref="staging").count()
    assert staged_n > 0
    t_wap.fast_forward("staging")
    assert t_wap.read().count() == staged_n

    t_direct = make_table_for_log(spark, str(tmp_path / "dir_t"), reg, n_buckets=4)
    ReplayRunner(
        spark, log, t_direct, CheckpointStore(str(tmp_path / "cp2")), reg,
        merge_mode="mor",
    ).run()
    key = [r["url"] for r in t_direct.read().select("url").collect()]
    a = {tuple(r) for r in t_wap.read().select("url", "text", "warc_ts").collect()}
    b = {tuple(r) for r in t_direct.read().select("url", "text", "warc_ts").collect()}
    assert a == b and len(key) == staged_n


def test_audit_publish_gate(spark, tmp_path):
    """publish_if: all checks green → atomic publish; a failing check →
    main untouched, branch kept (or dropped), full report either way."""
    from data_pipeline_spark.lake import audit as A

    table = _mk_table(spark, str(tmp_path / "a1"))
    table.merge(_staged(spark, [("a", 1, 1, "upsert", 1),
                                ("b", 2, 1, "upsert", 2)]), epoch=0, mode="mor")
    table.create_branch("wap")
    table.merge(
        _staged(spark, [("c", 3, 5, "upsert", 5), ("a", 9, 6, "upsert", 6)]),
        epoch=1, mode="mor", branch="wap",
    )
    rep = A.publish_if(table, "wap", [
        A.min_rows(3), A.no_shrink(0.0), A.max_null_fraction("v", 0.0),
        A.max_delete_fraction(0.0),
    ])
    assert rep["published"] is True
    assert all(c["ok"] for c in rep["checks"]) and len(rep["checks"]) == 4
    assert {(r["url"], r["v"]) for r in table.read().collect()} == {
        ("a", 9), ("b", 2), ("c", 3),
    }


def test_audit_blocks_mass_delete(spark, tmp_path):
    from data_pipeline_spark.lake import audit as A

    table = _mk_table(spark, str(tmp_path / "a2"))
    table.merge(_staged(spark, [(f"k{i}", i, 1, "upsert", i) for i in range(10)]),
                epoch=0, mode="mor")
    table.create_branch("wap")
    # A buggy feed deletes 8 of 10 keys.
    table.merge(
        _staged(spark, [(f"k{i}", 0, 20, "delete", 100 + i) for i in range(8)]),
        epoch=1, mode="mor", branch="wap",
    )
    rep = A.publish_if(
        table, "wap",
        [A.no_shrink(0.5), A.max_delete_fraction(0.5)], on_fail="keep",
    )
    assert rep["published"] is False
    by_name = {c["name"]: c["ok"] for c in rep["checks"]}
    assert by_name["no_shrink"] is False
    assert by_name["max_delete_fraction"] is False
    # Main untouched; branch retained for forensics.
    assert table.read().count() == 10
    assert "wap" in table.meta["branches"]
    # on_fail="drop" abandons it.
    rep2 = A.publish_if(table, "wap", [A.min_rows(10**9)], on_fail="drop")
    assert rep2["published"] is False
    assert "wap" not in table.meta.get("branches", {})
    assert table.read().count() == 10


def test_branch_forked_at_empty_does_not_see_mains_progress(spark, tmp_path):
    """A branch created before any snapshot has an EMPTY head even after
    main advances — its commits must not silently build on main's state."""
    table = _mk_table(spark, str(tmp_path / "t7"))
    table.create_branch("early")  # forked at the empty state
    table.merge(_staged(spark, [("m", 1, 1, "upsert", 1)]), epoch=0)  # main
    table.merge(_staged(spark, [("b", 2, 2, "upsert", 2)]),
                epoch=1, branch="early")
    assert {r["url"] for r in table.read(ref="early").collect()} == {"b"}
    assert {r["url"] for r in table.read().collect()} == {"m"}
    # And it is now diverged (main moved after the fork) → publish refuses.
    with pytest.raises(ValueError, match="diverged"):
        table.fast_forward("early")
