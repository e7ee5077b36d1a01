"""Seeded randomized parity sweeps for the round-3 continuation algebras:

- IncrementalJoinView == full recompute under arbitrary interleaved
  fact/dim churn (inserts, updates, join-key moves, deletes, re-inserts,
  late dim keys) across many epochs;
- the DBLog kill rule yields the exact final state for ANY chunk read
  point inside its watermark window (the algorithm's core claim — the
  fixed-read-point tests sample 3 points, this sweeps randomly);
- reconcile_snapshot heals arbitrary random drift in one sweep and the
  second sweep stages nothing.

All randomness is `random.Random(seed)` — failures reproduce exactly.
"""

import random

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.lake.incremental_join import IncrementalJoinView
from data_pipeline_spark.lake.table import LakeTable
from data_pipeline_spark.sources.chunked_snapshot import reconcile_chunks
from data_pipeline_spark.streaming.repair import reconcile_snapshot

FACT_SCHEMA = "url string, warc_ts timestamp, f_cust string, amount double"
DIM_SCHEMA = "cust string, warc_ts timestamp, segment string"


def _ts(col):
    return F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(
        secs=col
    )


def _fact_frame(spark, rows):
    df = spark.createDataFrame(
        [(o, u, c, float(v), int(l)) for o, u, c, v, l in rows],
        "op string, url string, f_cust string, amount double, lsn long",
    )
    return df.withColumn("warc_ts", _ts(F.col("lsn")))


def _dim_frame(spark, rows):
    df = spark.createDataFrame(
        [(o, c, s, int(l)) for o, c, s, l in rows],
        "op string, cust string, segment string, lsn long",
    )
    return df.withColumn("warc_ts", _ts(F.col("lsn")))


@pytest.mark.parametrize("seed", [11, 23])
def test_join_view_random_churn(spark, tmp_path, seed):
    rng = random.Random(seed)
    fact = LakeTable.create(
        spark, str(tmp_path / f"f{seed}"),
        spark.createDataFrame([], FACT_SCHEMA).schema,
        key_col="url", n_buckets=8,
    )
    dim = LakeTable.create(
        spark, str(tmp_path / f"d{seed}"),
        spark.createDataFrame([], DIM_SCHEMA).schema,
        key_col="cust", n_buckets=4,
    )
    ivj = IncrementalJoinView(
        spark, fact, dim, join_key_fact="f_cust",
        state_dir=str(tmp_path / f"v{seed}"), dim_cols=["segment"],
    )
    urls = [f"u{i}" for i in range(20)]
    custs = [f"c{i}" for i in range(6)]
    live_f: set = set()
    live_d: set = set()
    lsn = 0
    for epoch in range(6):
        f_rows, d_rows = [], []
        for _ in range(rng.randint(2, 8)):
            lsn += 1
            u = rng.choice(urls)
            if u in live_f and rng.random() < 0.3:
                f_rows.append(("delete", u, None, 0.0, lsn))
                live_f.discard(u)
            else:
                f_rows.append(
                    ("upsert", u, rng.choice(custs), rng.uniform(0, 99), lsn)
                )
                live_f.add(u)
        for _ in range(rng.randint(0, 3)):
            lsn += 1
            c = rng.choice(custs)
            if c in live_d and rng.random() < 0.3:
                d_rows.append(("delete", c, None, lsn))
                live_d.discard(c)
            else:
                d_rows.append(("upsert", c, f"seg{lsn}", lsn))
                live_d.add(c)
        fact.merge(_fact_frame(spark, f_rows), epoch=epoch, mode="mor")
        if d_rows:
            dim.merge(_dim_frame(spark, d_rows), epoch=epoch, mode="mor")
        ivj.refresh()
        f = fact.read()
        d = dim.read().select("cust", "segment")
        want = {
            tuple(r) for r in f.join(d, f["f_cust"] == d["cust"], "left")
            .select("url", "f_cust", "amount", d["cust"], "segment").collect()
        }
        got = {
            tuple(r) for r in ivj.read()
            .select("url", "f_cust", "amount", "cust", "segment").collect()
        }
        assert got == want, f"seed={seed} diverged at epoch {epoch}"


@pytest.mark.parametrize("seed", [7, 42])
def test_chunked_snapshot_any_read_point(spark, seed):
    """For random per-chunk read points anywhere in (lw, hw], survivors ∪
    log always LWW-folds to the exact final state."""
    rng = random.Random(seed)
    n_keys, n_chunks, win = 40, 4, 25
    base = {f"k{i}": float(i) for i in range(n_keys)}
    # random event schedule, lsns 1..100 unique
    lsns = rng.sample(range(1, 101), 60)
    events = []  # (key, lsn, op, val)
    for l in lsns:
        key = f"k{rng.randrange(n_keys)}"
        if rng.random() < 0.25:
            events.append((key, l, "delete", None))
        else:
            events.append((key, l, "upsert", float(l)))

    # ground truth: per-key max-lsn winner over base ∪ events
    final = dict(base)
    for key, l, op, v in sorted(events, key=lambda e: e[1]):
        if op == "delete":
            final.pop(key, None)
        else:
            final[key] = v

    # chunks by key range; window c*(win), read point random inside
    chunk_rows = []
    for i in range(n_keys):
        key = f"k{i}"
        c = i * n_chunks // n_keys
        lw, hw = c * win, (c + 1) * win
        rp = rng.randint(lw + 1, hw)
        state, dead = base[key], False
        for k2, l, op, v in sorted(events, key=lambda e: e[1]):
            if k2 == key and l <= rp:
                dead = op == "delete"
                if not dead:
                    state = v
        if not dead:
            chunk_rows.append((key, state, lw, hw))
    chunks = spark.createDataFrame(
        chunk_rows, "k string, val double, lw_lsn long, hw_lsn long"
    )
    log = spark.createDataFrame(
        [(k, int(l), op, v) for k, l, op, v in events],
        "k string, lsn long, op string, val double",
    )
    survivors = reconcile_chunks(chunks, log, key_col="k")
    replayed = survivors.select("k", "val", "op", "lsn").unionByName(
        log.select("k", "val", "op", "lsn")
    )
    got = {
        r["k"]: r["w"]["val"]
        for r in replayed.groupBy("k")
        .agg(F.max_by(F.struct("val", "op"), F.col("lsn")).alias("w"))
        .collect()
        if r["w"]["op"] != "delete"
    }
    assert got == final, f"seed={seed}: chunked replay != truth"


@pytest.mark.parametrize("seed", [5])
def test_reconcile_random_drift(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = LakeTable.create(
        spark, str(tmp_path / f"r{seed}"),
        spark.createDataFrame([], "url string, warc_ts timestamp, lsn long, val double").schema,
        key_col="url", n_buckets=8,
    )
    t.merge(
        spark.createDataFrame(
            [("insert", f"u{i}", i, float(i)) for i in range(30)],
            "op string, url string, lsn long, val double",
        ).withColumn("warc_ts", _ts(F.col("lsn"))),
        epoch=0, mode="mor",
    )
    # random drift: the source's truth differs arbitrarily
    truth = {}
    for i in range(30):
        r = rng.random()
        if r < 0.2:
            continue  # source deleted it
        truth[f"u{i}"] = float(i) if r < 0.6 else rng.uniform(100, 200)
    for j in range(5):  # source-only inserts
        truth[f"new{j}"] = rng.uniform(0, 9)
    snap = spark.createDataFrame(
        [(u, rng.randint(1, 50), v) for u, v in truth.items()],
        "url string, lsn long, val double",
    ).withColumn("warc_ts", _ts(F.col("lsn")))
    res = reconcile_snapshot(spark, snap, t, reconcile_id=1)
    assert res["published"]
    got = {r["url"]: round(r["val"], 6) for r in t.read().select("url", "val").collect()}
    assert got == {k: round(v, 6) for k, v in truth.items()}, f"seed={seed}"
    res2 = reconcile_snapshot(spark, snap, t, reconcile_id=2)
    assert (res2.get("staged_rows") or 0) == 0
