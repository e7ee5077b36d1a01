"""Incrementally-maintained rollups vs full recompute — including group
moves, deletes, multi-epoch key churn, cursor noops, and rebuild."""

import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.lake.incremental import IncrementalRollup
from data_pipeline_spark.lake.table import LakeTable

SCHEMA = "url string, warc_ts timestamp, grp string, val double"


def _events(spark, rows):
    """rows: (op, url, ts_offset_s, grp, val, lsn)"""
    df = spark.createDataFrame(
        [(op, u, g, float(v), int(l), int(ts)) for op, u, ts, g, v, l in rows],
        "op string, url string, grp string, val double, lsn long, _ts long",
    )
    return df.select(
        "op", "url",
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("_ts"))).alias("warc_ts"),
        "grp", "val", "lsn",
    )


def _recompute(table):
    return {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in table.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("val").alias("s"))
        .collect()
    }


def _state(rollup):
    return {
        r["grp"]: (r["n_rows"], round(r["sum_val"], 6))
        for r in rollup.read().collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    schema = spark.createDataFrame([], SCHEMA).schema
    return LakeTable.create(
        spark, str(tmp_path / "t"), schema, key_col="url", n_buckets=8
    )


def test_incremental_matches_recompute(spark, table, tmp_path):
    table.merge(
        _events(spark, [
            ("insert", f"u{i}", i, "abc"[i % 3], 10 + i, i) for i in range(12)
        ]),
        epoch=0, mode="mor",
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], str(tmp_path / "roll")
    )
    r = roll.refresh()
    assert r["mode"] == "full"
    assert _state(roll) == _recompute(table)

    # epoch 1: value update, GROUP MOVE, delete, fresh insert
    table.merge(
        _events(spark, [
            ("update", "u0", 100, "a", 99.5, 100),   # value change, same grp
            ("update", "u1", 101, "c", 11.0, 101),   # grp move b -> c
            ("delete", "u2", 102, None, 0, 102),     # delete
            ("insert", "u99", 103, "b", 7.25, 103),  # new key
        ]),
        epoch=1, mode="mor",
    )
    r2 = roll.refresh()
    assert r2["mode"] == "incremental" and r2["changed_keys"] == 4
    assert r2["buckets_scanned"] <= table.n_buckets
    assert _state(roll) == _recompute(table)

    # noop refresh: cursor already current
    assert roll.refresh()["mode"] == "noop"
    assert _state(roll) == _recompute(table)


def test_multi_epoch_churn_single_refresh(spark, table, tmp_path):
    table.merge(
        _events(spark, [("insert", f"u{i}", i, "xy"[i % 2], i, i) for i in range(6)]),
        epoch=0, mode="mor",
    )
    roll = IncrementalRollup(spark, table, ["grp"], ["val"], str(tmp_path / "r2"))
    roll.refresh()
    # the same key churns across TWO epochs before one refresh — only the
    # final winner may contribute
    table.merge(
        _events(spark, [("update", "u0", 50, "y", 100.0, 50)]), epoch=1, mode="mor"
    )
    table.merge(
        _events(spark, [("update", "u0", 60, "x", 200.0, 60),
                        ("delete", "u3", 61, None, 0, 61)]),
        epoch=2, mode="mor",
    )
    r = roll.refresh()
    assert r["mode"] == "incremental" and r["changed_keys"] == 2
    assert _state(roll) == _recompute(table)


def test_rebuild_and_empty_group_pruned(spark, table, tmp_path):
    table.merge(
        _events(spark, [("insert", "only", 0, "solo", 5.0, 0)]), epoch=0, mode="mor"
    )
    roll = IncrementalRollup(spark, table, ["grp"], ["val"], str(tmp_path / "r3"))
    roll.refresh()
    table.merge(
        _events(spark, [("delete", "only", 1, None, 0, 1)]), epoch=1, mode="mor"
    )
    roll.refresh()
    assert _state(roll) == {} == _recompute(table)  # zero-count group dropped
    # rebuild from scratch agrees
    roll.refresh(rebuild=True)
    assert _state(roll) == _recompute(table)
    assert roll.cursor() == table.meta["current_snapshot_id"]


def test_late_out_of_order_event_nets_zero(spark, table, tmp_path):
    """A late event that LOSES LWW to the stored row must not move the
    rollup: pre/post-images come from the table's snapshots, never from a
    changes-only dedup."""
    table.merge(
        _events(spark, [("insert", "k", 100, "g", 10.0, 100)]), epoch=0, mode="mor"
    )
    roll = IncrementalRollup(spark, table, ["grp"], ["val"], str(tmp_path / "r4"))
    roll.refresh()
    # warc_ts=50 < stored 100: the table keeps val=10 at scan time
    table.merge(
        _events(spark, [("update", "k", 50, "g", 99.0, 101)]), epoch=1, mode="mor"
    )
    r = roll.refresh()
    assert r["mode"] == "incremental" and r["changed_keys"] == 1
    assert _state(roll) == _recompute(table) == {"g": (1, 10.0)}
    # a late DELETE older than the stored row must also be a no-op
    table.merge(
        _events(spark, [("delete", "k", 40, None, 0, 102)]), epoch=2, mode="mor"
    )
    roll.refresh()
    assert _state(roll) == _recompute(table) == {"g": (1, 10.0)}


def test_commit_survives_orphan_state_dir(spark, table, tmp_path):
    """Debris from a crash between data rename and meta swap (an unreferenced
    state-vN dir) must not wedge subsequent commits."""
    import os

    table.merge(
        _events(spark, [("insert", "a", 0, "g", 1.0, 0)]), epoch=0, mode="mor"
    )
    roll = IncrementalRollup(spark, table, ["grp"], ["val"], str(tmp_path / "r5"))
    roll.refresh()
    # simulate the crash artifact: the NEXT version's dir already exists
    orphan = str(tmp_path / "r5" / "state-v2")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as fh:
        fh.write("x")
    (tmp_path / "r5" / ".tmp-dead").mkdir()
    table.merge(
        _events(spark, [("insert", "b", 1, "g", 2.0, 1)]), epoch=1, mode="mor"
    )
    roll.refresh()  # must not ENOTEMPTY
    assert _state(roll) == _recompute(table)
    assert not (tmp_path / "r5" / ".tmp-dead").exists()


def test_bootstrap_on_empty_table_then_data(spark, table, tmp_path):
    """Cursor committed against an EMPTY table (snapshot 0): the next
    refresh must treat pre-images as empty — not read them from the
    current snapshot (which would zero the delta forever)."""
    roll = IncrementalRollup(spark, table, ["grp"], ["val"], str(tmp_path / "r6"))
    assert roll.refresh()["mode"] == "full"
    assert roll.refresh()["mode"] == "noop"  # empty → empty is a noop
    table.merge(
        _events(spark, [("insert", "a", 0, "g", 3.0, 0),
                        ("insert", "b", 1, "h", 4.0, 1)]),
        epoch=0, mode="mor",
    )
    r = roll.refresh()
    assert r["mode"] == "incremental"
    assert _state(roll) == _recompute(table) == {"g": (1, 3.0), "h": (1, 4.0)}


def _recompute_mm(table):
    return {
        r["grp"]: (r["n"], round(r["s"], 6), r["lo"], r["hi"])
        for r in table.read()
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("val").alias("s"),
             F.min("val").alias("lo"), F.max("val").alias("hi"))
        .collect()
    }


def _state_mm(rollup):
    return {
        r["grp"]: (r["n_rows"], round(r["sum_val"], 6),
                   r["min_val"], r["max_val"])
        for r in rollup.read().collect()
    }


def test_minmax_maintenance_matches_recompute(spark, table, tmp_path):
    """Round-4 min/max IVM: monotone fold for untouched-extremum groups,
    affected-group-only rescan when a removed pre-image held the stored
    extremum; state == full recompute after every refresh."""
    table.merge(
        _events(spark, [
            ("insert", f"u{i}", i, "ab"[i % 2], 10 + i, i) for i in range(10)
        ]),
        epoch=0, mode="mor",
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], str(tmp_path / "mm"),
        minmax_cols=["val"],
    )
    assert roll.refresh()["mode"] == "full"
    assert _state_mm(roll) == _recompute_mm(table)

    # epoch 1: inserts + a mid-range delete — NO extremum touched, so the
    # fold path handles everything and zero groups rescan
    table.merge(
        _events(spark, [
            ("insert", "u90", 100, "a", 30.0, 100),  # new a max (fold)
            ("insert", "u91", 101, "c", 1.0, 101),   # brand-new group
            ("delete", "u4", 102, None, 0, 102),     # a's mid value 14
        ]),
        epoch=1, mode="mor",
    )
    r = roll.refresh()
    assert r["mode"] == "incremental"
    assert r["minmax_recomputed_groups"] == 0
    assert _state_mm(roll) == _recompute_mm(table)

    # epoch 2: kill the min-holder of 'a' (u0, val 10) and the max-holder
    # of 'b' (u9 moved out by group move) — both groups must rescan
    table.merge(
        _events(spark, [
            ("delete", "u0", 200, None, 0, 200),
            ("update", "u9", 201, "c", 19.0, 201),   # grp move b -> c
        ]),
        epoch=2, mode="mor",
    )
    r = roll.refresh()
    assert r["minmax_recomputed_groups"] >= 1
    assert _state_mm(roll) == _recompute_mm(table)

    # epoch 3: equality tie — two rows share b's min; deleting one keeps
    # the same extremum (conservative rescan must return the tied value)
    table.merge(
        _events(spark, [
            ("insert", "tie1", 300, "b", 11.0, 300),
            ("insert", "tie2", 301, "b", 11.0, 301),
        ]),
        epoch=3, mode="mor",
    )
    roll.refresh()
    table.merge(
        _events(spark, [("delete", "tie1", 400, None, 0, 400)]),
        epoch=4, mode="mor",
    )
    roll.refresh()
    got = _state_mm(roll)
    assert got == _recompute_mm(table)
    assert got["b"][2] == 11.0

    # group emptied entirely -> pruned from the state incl. minmax
    table.merge(
        _events(spark, [("delete", "u91", 500, None, 0, 500)]),
        epoch=5, mode="mor",
    )
    roll.refresh()
    state = _state_mm(roll)
    assert state == _recompute_mm(table)


def test_minmax_cols_frozen_until_rebuild(spark, table, tmp_path):
    table.merge(
        _events(spark, [("insert", "u1", 0, "a", 1.0, 0)]), epoch=0, mode="mor"
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], str(tmp_path / "fz"),
        minmax_cols=["val"],
    )
    roll.refresh()
    other = IncrementalRollup(
        spark, table, ["grp"], ["val"], str(tmp_path / "fz")
    )
    table.merge(
        _events(spark, [("insert", "u2", 1, "a", 2.0, 1)]), epoch=1, mode="mor"
    )
    with pytest.raises(ValueError, match="rebuild"):
        other.refresh()
    assert other.refresh(rebuild=True)["mode"] == "full"
    assert "min_val" not in other.read().columns


def test_maintenance_job_rollup_refresh(spark, table, tmp_path, monkeypatch, capsys):
    """maintenance_job --rollup-state: the nightly cron path advances the
    rollup (incl. min/max) in O(delta) and reports the refresh stats."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import maintenance_job

    table.merge(
        _events(spark, [
            ("insert", f"u{i}", i, "ab"[i % 2], 10 + i, i) for i in range(8)
        ]),
        epoch=0, mode="mor",
    )
    state = str(tmp_path / "jobroll")

    def run(extra=()):
        monkeypatch.setattr("sys.argv", [
            "maintenance_job.py", "--table", table.path,
            "--rollup-state", state, "--rollup-group", "grp",
            "--rollup-sum", "val", "--rollup-minmax", "val", *extra,
        ])
        from pyspark.sql import SparkSession

        monkeypatch.setattr(SparkSession, "stop", lambda self: None)
        maintenance_job.main()
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert run()["rollup_refresh"]["mode"] == "full"
    table.merge(
        _events(spark, [("delete", "u0", 100, None, 0, 100)]),
        epoch=1, mode="mor",
    )
    r = run()["rollup_refresh"]
    assert r["mode"] == "incremental" and r["minmax_recomputed_groups"] == 1
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], state, minmax_cols=["val"]
    )
    assert _state_mm(roll) == _recompute_mm(table)


def test_distinct_maintenance_exactly_retractable(spark, table, tmp_path):
    """Round-4 distinct IVM: n_distinct_<col> per group via the
    per-(group, value) aux relation — deletes retract exactly (a value
    leaves only when its last holder does), NULLs never count, and the
    aux commits atomically with the main state."""
    # grp a: vals 1,1,2  grp b: vals 1,2,3 + a NULL
    rows = [
        ("u1", "a", 1.0, 1), ("u2", "a", 1.0, 2), ("u3", "a", 2.0, 3),
        ("u4", "b", 1.0, 4), ("u5", "b", 2.0, 5), ("u6", "b", 3.0, 6),
        ("u7", "b", None, 7),
    ]
    table.merge(
        _events(spark, [("insert", u, l, g, v if v is not None else 0, l)
                        for u, g, v, l in rows]).withColumn(
            "val",
            F.when(F.col("url") == "u7", F.lit(None).cast("double"))
            .otherwise(F.col("val")),
        ),
        epoch=0, mode="mor",
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], [], str(tmp_path / "nd"),
        distinct_cols=["val"],
    )
    roll.refresh()

    def nd():
        return {r["grp"]: r["n_distinct_val"] for r in roll.read().collect()}

    assert nd() == {"a": 2, "b": 3}
    # delete ONE of a's two 1.0-holders: distinct must NOT drop (the
    # value survives through u2) — this is exactly what an aux-less
    # recompute-free scheme gets wrong
    table.merge(
        _events(spark, [("delete", "u1", 100, None, 0, 100)]),
        epoch=1, mode="mor",
    )
    assert roll.refresh()["mode"] == "incremental"
    assert nd() == {"a": 2, "b": 3}
    # delete the LAST holder of a's 1.0 and b's NULL row: a drops to 1,
    # b stays (NULL never counted)
    table.merge(
        _events(spark, [("delete", "u2", 200, None, 0, 200),
                        ("delete", "u7", 201, None, 0, 201)]),
        epoch=2, mode="mor",
    )
    roll.refresh()
    assert nd() == {"a": 1, "b": 3}
    # value update moves u3 2.0 -> 9.0: cardinality same, SET changes
    table.merge(
        _events(spark, [("update", "u3", 300, "a", 9.0, 300)]),
        epoch=3, mode="mor",
    )
    roll.refresh()
    assert nd() == {"a": 1, "b": 3}
    aux = {(r["grp"], r["val"]): r["cnt"] for r in roll.read_aux("val").collect()}
    assert aux == {("a", 9.0): 1, ("b", 1.0): 1, ("b", 2.0): 1, ("b", 3.0): 1}
    # full parity with a cold recompute
    want = {
        r["grp"]: r["n"] for r in table.read().groupBy("grp")
        .agg(F.count_distinct("val").alias("n")).collect()
    }
    assert nd() == want
    # frozen-set guard covers distinct_cols too
    other = IncrementalRollup(spark, table, ["grp"], [], str(tmp_path / "nd"))
    table.merge(
        _events(spark, [("insert", "u9", 400, "a", 1.0, 400)]),
        epoch=4, mode="mor",
    )
    with pytest.raises(ValueError, match="rebuild"):
        other.refresh()


def test_minmax_rescan_pushes_isin_to_scan(spark, table, tmp_path):
    """The affected-group rescan's isin predicate reaches the parquet
    scan (PushedFilters) on COMPACTED state, so row-group stats prune
    when the table clusters by the group columns. On un-compacted
    merge-on-read state the filter correctly sits ABOVE the scan-time
    LWW aggregate — a pre-LWW filter on a mutable group column could
    change which version wins — and that non-pushability is pinned
    here too, as the documented cost of rescanning between
    compactions."""
    import pyspark.sql.functions as SF

    table.merge(
        _events(spark, [
            ("insert", f"u{i}", i, "ab"[i % 2], 10 + i, i) for i in range(8)
        ]),
        epoch=0, mode="mor",
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], str(tmp_path / "pin"),
        minmax_cols=["val"],
    )
    roll.refresh()
    table.merge(
        _events(spark, [("delete", "u0", 100, None, 0, 100)]),
        epoch=1, mode="mor",
    )

    def rescan_plan():
        scan = table.read(
            snapshot_id=table.meta["current_snapshot_id"]
        ).where(SF.col("grp").isin(["a"]))
        return scan._jdf.queryExecution().executedPlan().toString()

    # un-compacted MoR: filter must NOT push below the LWW resolve
    assert "PushedFilters: []" in rescan_plan()
    # and the refresh is correct on that state
    roll.refresh()
    assert _state_mm(roll) == _recompute_mm(table)
    # compacted state: plain scan, the group predicate reaches the reader
    table.compact()
    plan = rescan_plan()
    assert "max_by" not in plan
    import re

    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "grp" in pushed.group(1), plan[:1500]


def test_streaming_rollup_maintenance(spark, table, tmp_path):
    """StreamingRollup: a rate-clock stream drives refresh() ticks while
    the base table takes new merges from 'another process'; the rollup
    (incl. min/max + distinct) converges to the full recompute, cursor
    no-ops are recorded between merges, and the state commit — not the
    stream checkpoint — carries exactly-once."""
    import time as _time

    from data_pipeline_spark.lake.incremental import StreamingRollup
    from data_pipeline_spark.lake.table import LakeTable

    table.merge(
        _events(spark, [
            ("insert", f"u{i}", i, "ab"[i % 2], 10 + i, i) for i in range(8)
        ]),
        epoch=0, mode="mor",
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], str(tmp_path / "sr"),
        minmax_cols=["val"], distinct_cols=["val"],
    )
    stream = StreamingRollup(roll)
    q = stream.start(str(tmp_path / "cp"), interval="1 second")
    try:
        # writer-side handle, as a separate process would hold it
        writer = LakeTable.load(spark, table.path)
        deadline = _time.time() + 60
        while not stream.results and _time.time() < deadline:
            _time.sleep(0.5)
        assert stream.results and stream.results[0]["mode"] == "full"
        writer.merge(
            _events(spark, [
                ("delete", "u0", 100, None, 0, 100),      # a's min holder
                ("insert", "u9", 101, "b", 10.0, 101),    # dup value in b
            ]),
            epoch=1, mode="mor",
        )
        while (
            not any(r["mode"] == "incremental" for r in stream.results)
            and _time.time() < deadline
        ):
            _time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    modes = [r["mode"] for r in stream.results]
    assert "incremental" in modes and "noop" in modes, modes
    assert _state_mm(roll) == _recompute_mm(table)
    nd = {r["grp"]: r["n_distinct_val"] for r in roll.read().collect()}
    want = {r["grp"]: r["n"] for r in table.read().groupBy("grp")
            .agg(F.count_distinct("val").alias("n")).collect()}
    assert nd == want


def test_rollup_across_schema_evolution(spark, tmp_path):
    """Schema evolution mid-stream: rows written BEFORE a maintained
    column existed read back as NULL under the lake's scan-time schema
    resolution, and the incremental refresh treats them exactly as the
    full recompute does — sums/min/max skip them, distinct never counts
    them, and deleting a pre-evolution row retracts cleanly."""
    from data_pipeline_spark.lake.table import LakeTable
    from pyspark.sql.types import StructType

    v1 = spark.createDataFrame(
        [], "url string, warc_ts timestamp, grp string"
    ).schema
    table = LakeTable.create(
        spark, str(tmp_path / "ev"), v1, key_col="url", n_buckets=4
    )
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))

    def ev1(rows):
        return spark.createDataFrame(
            rows, "op string, url string, grp string, lsn long"
        ).select("op", "url", ts.alias("warc_ts"), "grp", "lsn")

    table.merge(ev1([("insert", f"o{i}", "a", i) for i in range(4)]),
                epoch=0, mode="mor")
    # evolve: add val double, then write v2 rows
    v2 = spark.createDataFrame(
        [], "url string, warc_ts timestamp, grp string, val double"
    ).schema
    table.evolve(StructType(v2.fields))
    table.merge(
        _events(spark, [("insert", f"n{i}", 10 + i, "a", 5.0 + i, 10 + i)
                        for i in range(3)]),
        epoch=1, mode="mor",
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], str(tmp_path / "evr"),
        minmax_cols=["val"], distinct_cols=["val"],
    )
    roll.refresh()
    assert _state_mm(roll) == _recompute_mm(table)
    got = roll.read().collect()[0]
    assert got["n_rows"] == 7 and got["min_val"] == 5.0  # NULL vals skipped
    assert got["n_distinct_val"] == 3
    # delete a PRE-evolution (null-val) row and a v2 min-holder
    table.merge(
        _events(spark, [("delete", "o0", 100, None, 0, 100),
                        ("delete", "n0", 101, None, 0, 101)]),
        epoch=2, mode="mor",
    )
    r = roll.refresh()
    assert r["mode"] == "incremental"
    assert _state_mm(roll) == _recompute_mm(table)
    got = roll.read().collect()[0]
    assert got["n_rows"] == 5 and got["min_val"] == 6.0
    assert got["n_distinct_val"] == 2


def test_null_group_key_is_its_own_group(spark, table, tmp_path):
    """Round-5 ADVICE fix: NULL is a real group under SQL GROUP BY. The
    count/sum delta path (union+groupBy) always treated it that way, but
    the round-4 min/max/distinct attach joins and the rescan predicate
    were null-UNSAFE — the NULL group silently got NULL extrema and 0
    distinct. All of those now go through eqNullSafe (and the isin rescan
    grows an IS NULL arm), so maintained state must equal a cold
    recompute with NULL-keyed rows present at every step."""
    table.merge(
        _events(spark, [
            ("insert", "n1", 0, None, 5.0, 0),
            ("insert", "n2", 1, None, 9.0, 1),
            ("insert", "n3", 2, None, 5.0, 2),
            ("insert", "a1", 3, "a", 7.0, 3),
            ("insert", "a2", 4, "a", 2.0, 4),
        ]).withColumn(
            "grp",
            F.when(F.col("url").startswith("n"), F.lit(None).cast("string"))
            .otherwise(F.col("grp")),
        ),
        epoch=0, mode="mor",
    )
    roll = IncrementalRollup(
        spark, table, ["grp"], ["val"], str(tmp_path / "ng"),
        minmax_cols=["val"], distinct_cols=["val"],
    )
    assert roll.refresh()["mode"] == "full"

    def full_state():
        return {
            r["grp"]: (r["n_rows"], round(r["sum_val"], 6), r["min_val"],
                       r["max_val"], r["n_distinct_val"])
            for r in roll.read().collect()
        }

    def full_recompute():
        return {
            r["grp"]: (r["n"], round(r["s"], 6), r["mn"], r["mx"], r["nd"])
            for r in table.read().groupBy("grp").agg(
                F.count("*").alias("n"), F.sum("val").alias("s"),
                F.min("val").alias("mn"), F.max("val").alias("mx"),
                F.count_distinct("val").alias("nd"),
            ).collect()
        }

    got = full_state()
    assert got == full_recompute()
    assert got[None] == (3, 19.0, 5.0, 9.0, 2)

    # epoch 1: fold-path insert into the NULL group (new max, no rescan)
    table.merge(
        _events(spark, [("insert", "n4", 100, "x", 11.0, 100)]).withColumn(
            "grp", F.lit(None).cast("string")
        ),
        epoch=1, mode="mor",
    )
    r = roll.refresh()
    assert r["mode"] == "incremental"
    assert r["minmax_recomputed_groups"] == 0
    assert full_state() == full_recompute()

    # epoch 2: kill the NULL group's max holder -> the NULL key must make
    # it through the affected-set rescan (isin path + IS NULL arm)
    table.merge(
        _events(spark, [("delete", "n4", 200, None, 0, 200)]),
        epoch=2, mode="mor",
    )
    r = roll.refresh()
    assert r["minmax_recomputed_groups"] >= 1
    got = full_state()
    assert got == full_recompute()
    assert got[None] == (3, 19.0, 5.0, 9.0, 2)

    # epoch 3: retract one duplicate value holder (distinct must hold via
    # the aux relation, null-safely) and move a row NULL -> 'a'
    table.merge(
        _events(spark, [("delete", "n3", 300, None, 0, 300),
                        ("update", "n1", 301, "a", 5.0, 301)]),
        epoch=3, mode="mor",
    )
    roll.refresh()
    got = full_state()
    assert got == full_recompute()
    assert got[None] == (1, 9.0, 9.0, 9.0, 1)
    assert got["a"] == (3, 14.0, 2.0, 7.0, 3)


def test_hll_distinct_mode_tracks_exact(spark, table, tmp_path):
    """Round-5 distinct_mode='hll': per-group HLL registers replace the
    exact per-(group, value) aux — O(groups x 2^p) state instead of
    O(live pairs). At p=12 every cardinality below the linear-counting
    knee (~hundreds here) estimates EXACTLY, so the hll rollup must
    match the exact twin value-for-value through inserts, retractions
    (affected-group register rebuild), and group moves; the aux relation
    must be a register table bounded by 2^p rows per group."""
    # grp a: 40 distinct vals (+ dups), grp b: 25, plus NULLs sprinkled
    rows = []
    lsn = 0
    for i in range(40):
        rows.append(("insert", f"a{i}", lsn, "a", float(i % 40), lsn)); lsn += 1
    for i in range(20):  # duplicates of a's values
        rows.append(("insert", f"ad{i}", lsn, "a", float(i), lsn)); lsn += 1
    for i in range(25):
        rows.append(("insert", f"b{i}", lsn, "b", float(100 + i), lsn)); lsn += 1
    table.merge(_events(spark, rows), epoch=0, mode="mor")

    exact = IncrementalRollup(
        spark, table, ["grp"], [], str(tmp_path / "ex"), distinct_cols=["val"]
    )
    hll = IncrementalRollup(
        spark, table, ["grp"], [], str(tmp_path / "hl"),
        distinct_cols=["val"], distinct_mode="hll", hll_p=12,
    )
    exact.refresh(); hll.refresh()

    def nd(r):
        return {x["grp"]: x["n_distinct_val"] for x in r.read().collect()}

    assert nd(hll) == nd(exact) == {"a": 40, "b": 25}
    # register table is the bounded-state aux: (grp, idx, rho), <= 2^12/grp
    aux = hll.read_aux("val")
    assert set(aux.columns) == {"grp", "idx", "rho"}
    assert aux.count() <= 2 * (1 << 12)

    # epoch 1: insert-only -> loss-free register merge, NO rescan
    table.merge(
        _events(spark, [("insert", "a99", 500, "a", 999.0, 500),
                        ("insert", "c1", 501, "c", 1.0, 501)]),
        epoch=1, mode="mor",
    )
    exact.refresh()
    r = hll.refresh()
    assert r["mode"] == "incremental" and r["distinct_recomputed_groups"] == 0
    assert nd(hll) == nd(exact) == {"a": 41, "b": 25, "c": 1}

    # epoch 2: retractions — delete a dup-holder (a stays 41), delete b's
    # only 124-holder (b drops), move a value a -> c. Both a and b lost
    # pre-images, so they must rescan; estimates must re-match exact.
    table.merge(
        _events(spark, [("delete", "ad0", 600, None, 0, 600),
                        ("delete", "b24", 601, None, 0, 601),
                        ("update", "a99", 602, "c", 999.0, 602)]),
        epoch=2, mode="mor",
    )
    exact.refresh()
    r = hll.refresh()
    assert r["distinct_recomputed_groups"] >= 2
    assert nd(hll) == nd(exact) == {"a": 40, "b": 24, "c": 2}

    # precision / mode frozen until rebuild
    other = IncrementalRollup(
        spark, table, ["grp"], [], str(tmp_path / "hl"),
        distinct_cols=["val"], distinct_mode="hll", hll_p=9,
    )
    table.merge(
        _events(spark, [("insert", "z1", 700, "a", 5.5, 700)]),
        epoch=3, mode="mor",
    )
    with pytest.raises(ValueError, match="hll_p"):
        other.refresh()
    wrong_mode = IncrementalRollup(
        spark, table, ["grp"], [], str(tmp_path / "hl"),
        distinct_cols=["val"],
    )
    with pytest.raises(ValueError, match="rebuild"):
        wrong_mode.refresh()


def test_maintenance_job_hll_distinct_mode(spark, table, tmp_path,
                                           monkeypatch, capsys):
    """maintenance_job --rollup-distinct-mode hll: the cron path drives
    the sketch-backed distinct (round 5) — registers advance per run,
    estimates match the exact count at low cardinality, and the mode is
    frozen in meta (a later exact-mode run without --rollup-rebuild must
    fail loudly)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import maintenance_job

    table.merge(
        _events(spark, [
            ("insert", f"u{i}", i, "ab"[i % 2], float(i % 6), i)
            for i in range(12)
        ]),
        epoch=0, mode="mor",
    )
    state = str(tmp_path / "jobhll")

    def run(extra=()):
        monkeypatch.setattr("sys.argv", [
            "maintenance_job.py", "--table", table.path,
            "--rollup-state", state, "--rollup-group", "grp",
            "--rollup-distinct", "val", *extra,
        ])
        from pyspark.sql import SparkSession

        monkeypatch.setattr(SparkSession, "stop", lambda self: None)
        maintenance_job.main()
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    hll = ("--rollup-distinct-mode", "hll", "--rollup-hll-p", "12")
    assert run(hll)["rollup_refresh"]["mode"] == "full"
    table.merge(
        _events(spark, [("delete", "u0", 100, None, 0, 100),
                        ("insert", "u99", 101, "a", 99.0, 101)]),
        epoch=1, mode="mor",
    )
    r = run(hll)["rollup_refresh"]
    assert r["mode"] == "incremental" and r["distinct_recomputed_groups"] >= 1
    roll = IncrementalRollup(
        spark, table, ["grp"], [], state,
        distinct_cols=["val"], distinct_mode="hll", hll_p=12,
    )
    got = {x["grp"]: x["n_distinct_val"] for x in roll.read().collect()}
    want = {x["grp"]: x["n"] for x in table.read().groupBy("grp").agg(
        F.count_distinct("val").alias("n")).collect()}
    assert got == want
    # frozen mode: an exact-mode cron against the same state must refuse
    table.merge(
        _events(spark, [("insert", "u98", 200, "b", 1.5, 200)]),
        epoch=2, mode="mor",
    )
    with pytest.raises(ValueError, match="rebuild"):
        run()
