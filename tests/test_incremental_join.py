"""Incrementally-maintained join views vs full recompute — fact updates,
fact join-key moves, fact deletes, dimension inserts/updates/deletes
(including a late-arriving dimension key upgrading a previously-unmatched
fact row), cursor noops, rebuild, and crash idempotency."""

import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.lake.incremental_join import (
    IncrementalJoinView,
    join_view_refresh,
    touched_join_keys,
)
from data_pipeline_spark.lake.table import LakeTable

# fact join column named f_cust so fact/dim column names stay disjoint
FACT_SCHEMA = "url string, warc_ts timestamp, f_cust string, amount double"
DIM_SCHEMA = "cust string, warc_ts timestamp, segment string, score double"


def _rows(spark, schema, key, rows):
    """rows: (op, key, ts_offset_s, *cols, lsn)"""
    n_extra = len(schema.split(",")) - 2  # minus key + warc_ts
    recs = []
    for r in rows:
        op, k, ts = r[0], r[1], r[2]
        extras = r[3:3 + n_extra]
        lsn = r[3 + n_extra]
        recs.append((op, k, int(ts), *extras, int(lsn)))
    cols = [c.strip().split()[0] for c in schema.split(",")]
    extra_cols = [c for c in cols if c not in (key, "warc_ts")]
    base = "op string, " + key + " string, _ts long, " + ", ".join(
        f"{c.strip().split()[0]} {c.strip().split()[1]}"
        for c in schema.split(",") if c.strip().split()[0] in extra_cols
    ) + ", lsn long"
    df = spark.createDataFrame(recs, base)
    return df.select(
        "op", key,
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("_ts"))).alias("warc_ts"),
        *extra_cols, "lsn",
    )


@pytest.fixture()
def tables(spark, tmp_path):
    fact = LakeTable.create(
        spark, str(tmp_path / "fact"),
        spark.createDataFrame([], FACT_SCHEMA).schema,
        key_col="url", n_buckets=8,
    )
    dim = LakeTable.create(
        spark, str(tmp_path / "dim"),
        spark.createDataFrame([], DIM_SCHEMA).schema,
        key_col="cust", n_buckets=4,
    )
    return fact, dim


@pytest.fixture()
def ivj(spark, tables, tmp_path):
    fact, dim = tables
    return IncrementalJoinView(
        spark, fact, dim, join_key_fact="f_cust",
        state_dir=str(tmp_path / "view"),
        dim_cols=["segment", "score"], n_buckets=8,
    )


def _seed2(spark, fact, dim):
    dim.merge(
        _rows(spark, DIM_SCHEMA, "cust", [
            ("insert", "c1", 0, "gold", 1.0, 0),
            ("insert", "c2", 0, "silver", 2.0, 1),
            ("insert", "c3", 0, "bronze", 3.0, 2),
        ]),
        epoch=0, mode="mor",
    )
    fact.merge(
        _rows(spark, FACT_SCHEMA, "url", [
            ("insert", f"u{i}", i, f"c{1 + i % 4}", 10.0 + i, i)
            for i in range(12)
        ]),
        epoch=0, mode="mor",
    )


def _expected(fact, dim):
    f = fact.read()
    d = dim.read().select("cust", "segment", "score")
    j = f.join(d, f["f_cust"] == d["cust"], "left").select(
        "url", "f_cust", "amount", d["cust"], "segment", "score",
    )
    return {tuple(r) for r in j.collect()}


def _got(view):
    df = view.read().select("url", "f_cust", "amount", "cust", "segment", "score")
    return {tuple(r) for r in df.collect()}


def test_bootstrap_and_incremental_matches_recompute(spark, tables, ivj):
    fact, dim = tables
    _seed2(spark, fact, dim)
    r = ivj.refresh()
    assert r["mode"] == "full"
    assert _got(ivj) == _expected(fact, dim)

    # epoch 1 fact: value update, JOIN-KEY MOVE (u1: c2->c3), delete, insert
    fact.merge(
        _rows(spark, FACT_SCHEMA, "url", [
            ("update", "u0", 100, "c1", 99.5, 100),
            ("update", "u1", 101, "c3", 11.0, 101),
            ("delete", "u2", 102, None, 0.0, 102),
            ("insert", "u99", 103, "c2", 7.25, 103),
        ]),
        epoch=1, mode="mor",
    )
    # epoch 1 dim: value update, delete, LATE KEY (c4 had unmatched facts)
    dim.merge(
        _rows(spark, DIM_SCHEMA, "cust", [
            ("update", "c2", 100, "platinum", 2.5, 100),
            ("delete", "c3", 101, None, 0.0, 101),
            ("insert", "c4", 102, "new", 4.0, 102),
        ]),
        epoch=1, mode="mor",
    )
    r2 = ivj.refresh()
    assert r2["mode"] == "incremental"
    assert _got(ivj) == _expected(fact, dim)
    # late dim key c4 upgraded the previously-unmatched fact rows
    assert any(t[3] == "c4" for t in _got(ivj))

    # noop cursor
    assert ivj.refresh()["mode"] == "noop"


def test_inner_projection_filters_unmatched(spark, tables, ivj):
    fact, dim = tables
    _seed2(spark, fact, dim)
    ivj.refresh()
    inner = ivj.read(inner=True)
    assert inner.where(F.col("cust").isNull()).count() == 0
    left = ivj.read()
    assert left.count() > inner.count()  # c4 facts are unmatched


def test_refresh_idempotent_after_crash(spark, tables, ivj):
    """A refresh whose merge committed but whose cursor write was lost
    replays cleanly: the view table's epoch ledger makes the merge a
    no-op and the cursor catches up."""
    fact, dim = tables
    _seed2(spark, fact, dim)
    ivj.refresh()
    fact.merge(
        _rows(spark, FACT_SCHEMA, "url", [
            ("update", "u0", 100, "c2", 50.0, 100),
        ]),
        epoch=1, mode="mor",
    )
    ivj.refresh()
    before = _got(ivj)
    # simulate the crash: rewind the cursor file to the pre-refresh state
    # (the merge itself committed as view-epoch 2; replay must hit the
    # view table's epoch ledger and skip)
    import json
    cur = ivj.cursors()
    cur["snap_a"] = 1
    cur["version"] = 1
    with open(ivj._meta_path, "w") as fh:
        json.dump(cur, fh)
    ivj.refresh()  # re-applies; epoch ledger makes it exactly-once
    assert _got(ivj) == before == _expected(fact, dim)


def test_rebuild_retires_vanished_keys(spark, tables, ivj):
    fact, dim = tables
    _seed2(spark, fact, dim)
    ivj.refresh()
    fact.merge(
        _rows(spark, FACT_SCHEMA, "url", [
            ("delete", "u3", 100, None, 0.0, 100),
        ]),
        epoch=1, mode="mor",
    )
    r = ivj.refresh(rebuild=True)
    assert r["mode"] == "full"
    assert _got(ivj) == _expected(fact, dim)
    assert not any(t[0] == "u3" for t in _got(ivj))


def test_multi_epoch_churn_converges(spark, tables, ivj):
    fact, dim = tables
    _seed2(spark, fact, dim)
    ivj.refresh()
    for e in range(1, 5):
        fact.merge(
            _rows(spark, FACT_SCHEMA, "url", [
                ("update", f"u{(3 * e) % 12}", 100 * e, f"c{1 + (e + 1) % 4}",
                 float(e), 100 * e),
                ("insert", f"w{e}", 100 * e + 1, f"c{1 + e % 5}",
                 1.5 * e, 100 * e + 1),
            ]),
            epoch=e, mode="mor",
        )
        if e % 2 == 0:
            dim.merge(
                _rows(spark, DIM_SCHEMA, "cust", [
                    ("update", f"c{1 + e % 3}", 100 * e, f"seg{e}",
                     float(e), 100 * e),
                ]),
                epoch=e, mode="mor",
            )
        ivj.refresh()
        assert _got(ivj) == _expected(fact, dim), f"diverged at epoch {e}"


def test_streaming_join_view(spark, tables, ivj, tmp_path):
    """Rate-clock streaming maintenance: base-table commits from 'another
    process' appear in the view without manual refresh calls."""
    from data_pipeline_spark.lake.incremental_join import StreamingJoinView

    fact, dim = tables
    _seed2(spark, fact, dim)
    stream = StreamingJoinView(ivj)
    q = stream.start(str(tmp_path / "cp_stream"), interval="1 second")

    def _await(cond, timeout=60.0):
        import time as _time

        deadline = _time.time() + timeout
        while _time.time() < deadline:
            if cond():
                return
            _time.sleep(0.5)
        raise AssertionError("condition not reached within timeout")

    try:
        _await(lambda: ivj.cursors() is not None)
        fact.merge(
            _rows(spark, FACT_SCHEMA, "url", [
                ("insert", "u77", 100, "c2", 77.0, 100),
            ]),
            epoch=1, mode="mor",
        )
        _await(lambda: ivj.cursors() is not None
               and any(t[0] == "u77" for t in _got(ivj)))
    finally:
        q.stop()
    assert _got(ivj) == _expected(fact, dim)
    assert any(r["mode"] != "noop" for r in stream.results)


def test_star_schema_chained_views(spark, tables, tmp_path):
    """Views compose: (fact ⋈ dim) is itself a LakeTable, so a second
    IncrementalJoinView can join it to another dimension — a maintained
    star schema where churn anywhere converges to the full 3-way join."""
    fact, dim = tables
    _seed2(spark, fact, dim)
    dim2 = LakeTable.create(
        spark, str(tmp_path / "dim2"),
        spark.createDataFrame(
            [], "seg string, warc_ts timestamp, tier long"
        ).schema,
        key_col="seg", n_buckets=4,
    )
    dim2.merge(
        _rows(spark, "seg string, warc_ts timestamp, tier long",
              "seg", [
                  ("insert", "gold", 0, 1, 0),
                  ("insert", "silver", 0, 2, 1),
              ]),
        epoch=0, mode="mor",
    )
    v1 = IncrementalJoinView(
        spark, fact, dim, join_key_fact="f_cust",
        state_dir=str(tmp_path / "v1"), dim_cols=["segment"],
    )
    v1.refresh()
    v2 = IncrementalJoinView(
        spark, v1.table, dim2, join_key_fact="segment",
        state_dir=str(tmp_path / "v2"), dim_cols=["tier"],
    )
    v2.refresh()

    def expected():
        f = fact.read()
        d1 = dim.read().select("cust", "segment")
        d2 = dim2.read().select(F.col("seg").alias("seg2"), "tier")
        j = (
            f.join(d1, f["f_cust"] == d1["cust"], "left")
            .join(d2, d1["segment"] == d2["seg2"], "left")
        )
        return {
            tuple(r) for r in j.select(
                "url", "f_cust", "amount", "segment", "tier"
            ).collect()
        }

    def got():
        return {
            tuple(r) for r in v2.read().select(
                "url", "f_cust", "amount", F.col("segment"), "tier"
            ).collect()
        }

    # NB: v2 joins on v1's *stored* segment; v1.read drops _view_ver but
    # v1.table keeps it — v2.read() returns it dropped only for v2's own
    # stamp, so select explicitly above.
    assert got() == expected()

    # churn every level: fact update, dim-1 segment move, dim-2 tier change
    fact.merge(
        _rows(spark, FACT_SCHEMA, "url", [
            ("update", "u0", 100, "c2", 55.0, 100),
        ]),
        epoch=1, mode="mor",
    )
    dim.merge(
        _rows(spark, DIM_SCHEMA, "cust", [
            ("update", "c1", 100, "silver", 9.0, 100),
        ]),
        epoch=1, mode="mor",
    )
    dim2.merge(
        _rows(spark, "seg string, warc_ts timestamp, tier long",
              "seg", [
                  ("update", "silver", 100, 7, 100),
                  ("insert", "bronze", 101, 3, 101),
              ]),
        epoch=1, mode="mor",
    )
    v1.refresh()
    v2.refresh()
    assert got() == expected()


def test_pure_refresh_algebra(spark):
    """join_view_refresh on plain frames equals a direct recompute."""
    a_old = spark.createDataFrame(
        [("u1", "k1", 1.0), ("u2", "k1", 2.0), ("u3", "k2", 3.0),
         ("u4", None, 4.0)],
        "url string, k string, amount double",
    )
    b_old = spark.createDataFrame(
        [("k1", "gold"), ("k3", "late")], "bk string, seg string"
    )
    a_new = spark.createDataFrame(
        [("u1", "k1", 1.0), ("u2", "k3", 2.0), ("u3", "k2", 9.0),
         ("u4", None, 4.0), ("u5", "k2", 5.0)],
        "url string, k string, amount double",
    )  # u2 moved k1->k3, u3 value change, u5 insert; no deletes here
    b_new = spark.createDataFrame(
        [("k1", "gold"), ("k2", "fresh")], "bk string, seg string"
    )  # k3 deleted, k2 inserted

    old_view = a_old.join(b_old, a_old["k"] == b_old["bk"], "left").select(
        "url", "k", "amount", "bk", "seg"
    )
    touched_a = spark.createDataFrame(
        [("u2",), ("u3",), ("u5",)], "url string"
    )
    a_pre = a_old.join(touched_a, "url", "left_semi")
    a_post = a_new.join(touched_a, "url", "left_semi")
    b_changed = spark.createDataFrame([("k2",), ("k3",)], "bk string")
    K = touched_join_keys(
        a_pre.select("k"), a_post.select("k"), b_changed, "k", "bk"
    )
    b_post_k = b_new.join(
        K.select(F.col("k").alias("bk")), "bk", "left_semi"
    )
    got = join_view_refresh(
        old_view, touched_a, a_post.select("url", "k", "amount"), b_post_k,
        K, a_key="url", join_key_a="k", join_key_b="bk",
    )
    want = a_new.join(b_new, a_new["k"] == b_new["bk"], "left").select(
        "url", "k", "amount", "bk", "seg"
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_crash_replay_preserves_widened_delta(spark, tables, ivj):
    """Crash after merge, before cursor write — and the FACT ADVANCES
    before the replay runs. The replay's merge is skipped by the epoch
    ledger; the cursor must record the snapshots the applied commit
    actually consumed (from its commit summary), NOT the wider just-
    computed delta — otherwise the widened range is dropped forever."""
    import json

    fact, dim = tables
    _seed2(spark, fact, dim)
    ivj.refresh()  # version 1
    fact.merge(
        _rows(spark, FACT_SCHEMA, "url", [
            ("update", "u0", 100, "c2", 50.0, 100),
        ]),
        epoch=1, mode="mor",
    )
    ivj.refresh()  # version 2 applied
    cur = ivj.cursors()
    rewound = dict(cur)
    rewound["snap_a"], rewound["version"] = 1, 1
    with open(ivj._meta_path, "w") as fh:
        json.dump(rewound, fh)
    # the fact advances BEFORE the crash replay
    fact.merge(
        _rows(spark, FACT_SCHEMA, "url", [
            ("update", "u1", 200, "c3", 60.0, 200),
        ]),
        epoch=2, mode="mor",
    )
    ivj.refresh()  # merge(epoch=2) skipped — must not swallow u1's change
    ivj.refresh()  # applies the remaining delta as version 3
    assert _got(ivj) == _expected(fact, dim)
    u1 = [r for r in ivj.read().collect() if r["url"] == "u1"][0]
    assert u1["amount"] == 60.0 and u1["segment"] == "bronze"
