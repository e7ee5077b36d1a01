"""Maintained sample store (X112): fold == direct top-k of the whole
corpus, exactly-once skip, latest-epoch payload, exact retraction,
compaction invariance, grouped strata, DuckDB twin parity."""

import hashlib

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.samplestate import (
    SampleStore,
    sql_maintained_sample,
)

K = 20


def mk_epochs(spark):
    """Three epochs over urls u0..u299 (epoch e owns id%3==e), ids %7==0
    re-shipped in EVERY epoch with an epoch-stamped payload."""
    out = []
    for e in range(3):
        out.append(
            spark.range(0, 300)
            .where((F.col("id") % 3 == e) | (F.col("id") % 7 == 0))
            .select(
                F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
                F.concat(F.lit(f"epoch{e}-"), F.col("id").cast("string")).alias(
                    "body"
                ),
                (F.col("id") % 5).cast("string").alias("lang"),
            )
        )
    return out


def expected_sample(n=300, k=K, seed="sample"):
    """Driver-side truth: the k keys with smallest md5, latest payload."""
    keys = [f"u{i}" for i in range(n)]
    ranked = sorted(keys, key=lambda u: hashlib.md5(f"{seed}:{u}".encode()).hexdigest())
    win = ranked[:k]
    out = {}
    for u in win:
        i = int(u[1:])
        e = 2 if i % 7 == 0 else i % 3  # latest epoch carrying the key
        out[u] = f"epoch{e}-{i}"
    return out


def test_fold_equals_direct_and_exactly_once(spark, tmp_path):
    st = SampleStore.create(
        spark, str(tmp_path / "s"), "url", k=K, payload_cols=["body"]
    )
    for e, df in enumerate(mk_epochs(spark)):
        assert st.update(df, epoch=e) == e
    assert st.update(mk_epochs(spark)[0], epoch=0) is None  # exactly-once
    got = {r["url"]: r["body"] for r in st.sample().collect()}
    assert got == expected_sample()


def test_cold_reload_and_compact_invariance(spark, tmp_path):
    p = str(tmp_path / "s")
    st = SampleStore.create(spark, p, "url", k=K, payload_cols=["body"])
    for e, df in enumerate(mk_epochs(spark)):
        st.update(df, epoch=e)
    before = sorted(map(tuple, st.sample().collect()))
    st2 = SampleStore.load(spark, p)
    assert sorted(map(tuple, st2.sample().collect())) == before
    info = st2.compact()
    assert info["dirs"] == 3
    assert sorted(map(tuple, st2.sample().collect())) == before
    # post-compaction updates still fold in
    extra = spark.range(10000, 10100).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.lit("late").alias("body"),
        F.lit("0").alias("lang"),
    )
    st2.update(extra, epoch=9)
    assert st2.sample().count() == K
    with pytest.raises(ValueError, match="compacted"):
        st2.retract_epoch(0)


def test_retraction_is_exact(spark, tmp_path):
    epochs = mk_epochs(spark)
    st = SampleStore.create(
        spark, str(tmp_path / "a"), "url", k=K, payload_cols=["body"]
    )
    for e, df in enumerate(epochs):
        st.update(df, epoch=e)
    st.retract_epoch(1)
    # truth: rebuild a fresh store from epochs 0 and 2 only
    ref = SampleStore.create(
        spark, str(tmp_path / "b"), "url", k=K, payload_cols=["body"]
    )
    ref.update(epochs[0], epoch=0)
    ref.update(epochs[2], epoch=2)
    assert sorted(map(tuple, st.sample().collect())) == sorted(
        map(tuple, ref.sample().collect())
    )
    with pytest.raises(ValueError, match="already retracted"):
        st.retract_epoch(1)
    with pytest.raises(ValueError, match="never committed"):
        st.retract_epoch(99)


def test_grouped_strata_and_frozen_params(spark, tmp_path):
    st = SampleStore.create(
        spark, str(tmp_path / "g"), "url", k=5, group_col="lang"
    )
    for e, df in enumerate(mk_epochs(spark)):
        st.update(df, epoch=e)
    counts = {
        r["lang"]: r["n"]
        for r in st.sample().groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"0", "1", "2", "3", "4"}
    assert all(v == 5 for v in counts.values())
    with pytest.raises(ValueError, match="frozen"):
        SampleStore.create(spark, str(tmp_path / "g"), "url", k=7, group_col="lang")


def test_duckdb_twin_parity(spark, tmp_path):
    st = SampleStore.create(
        spark, str(tmp_path / "t"), "url", k=K, payload_cols=["body", "lang"]
    )
    rows = []
    for e, df in enumerate(mk_epochs(spark)):
        st.update(df, epoch=e)
        rows.append(df.withColumn("epoch", F.lit(e)))
    union = rows[0]
    for r in rows[1:]:
        union = union.unionByName(r)
    con = duckdb.connect()
    con.register("ingested", union.toPandas())
    want = sorted(
        map(
            tuple,
            con.sql(
                sql_maintained_sample(
                    "ingested", "url", K, payload_cols=["body", "lang"]
                )
            ).fetchall(),
        )
    )
    got = sorted(map(tuple, st.sample().collect()))
    assert got == want


def test_empty_store_schema_matches_populated(spark, tmp_path):
    """The no-live-epochs edge must return the REAL column types (from
    the recorded first-commit schema), not string-everything."""
    st = SampleStore.create(
        spark, str(tmp_path / "s"), "doc_id", k=5, payload_cols=["n"]
    )
    df = spark.range(0, 20).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("n")
    )
    st.update(df, epoch=0)
    populated = st.sample().schema
    st.retract_epoch(0)
    assert st.sample().count() == 0
    assert st.sample().schema == populated


def test_kmv_readouts_from_sample_state(spark, tmp_path):
    """The maintained sample doubles as a KMV synopsis: distinct
    estimates (exact below k, ~1/sqrt(k) above) and cross-store overlap
    — computed from state alone, surviving exact retraction."""
    ka = 64
    a = SampleStore.create(spark, str(tmp_path / "a"), "url", k=ka)
    b = SampleStore.create(spark, str(tmp_path / "b"), "url", k=ka)
    url = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url")
    )
    # store a: keys 0..3999 over two epochs; store b: 2000..5999
    a.update(url(0, 2500), epoch=0)
    a.update(url(2500, 4000), epoch=1)
    b.update(url(2000, 6000), epoch=0)
    est_a = a.distinct_estimate().collect()[0]["distinct_est"]
    assert abs(est_a - 4000) / 4000 < 0.40  # 3 sigma at k=64
    ov = a.overlap_with(b).collect()[0]
    # truth: |a ∪ b| = 6000, |a ∩ b| = 2000, jaccard 1/3
    assert abs(ov["union_est"] - 6000) / 6000 < 0.40
    assert abs(ov["jaccard"] - 1 / 3) < 0.20
    # exact regime: a tiny store holds its whole key set
    tiny = SampleStore.create(spark, str(tmp_path / "tiny"), "url", k=ka)
    tiny.update(url(0, 30), epoch=0)
    assert tiny.distinct_estimate().collect()[0]["distinct_est"] == 30.0
    # retraction flows through: epoch 1 retracted -> estimate of 0..2499
    a.retract_epoch(1)
    est_a2 = a.distinct_estimate().collect()[0]["distinct_est"]
    assert abs(est_a2 - 2500) / 2500 < 0.40
    # guards
    c = SampleStore.create(spark, str(tmp_path / "c"), "url", k=ka, seed="other")
    with pytest.raises(ValueError, match="seeds"):
        a.overlap_with(c)


def test_maintenance_job_sample_ops(spark, tmp_path, monkeypatch, capsys):
    """--sample-store drives retraction + compaction from the cron-able
    maintenance CLI, in the safe retract-before-compact order."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs import maintenance_job

    p = str(tmp_path / "s")
    st = SampleStore.create(spark, p, "url", k=K, payload_cols=["body"])
    for e, df in enumerate(mk_epochs(spark)):
        st.update(df, epoch=e)
    monkeypatch.setattr("sys.argv", [
        "maintenance_job.py", "--sample-store", p,
        "--retract-sample-epoch", "1", "--compact-samples",
    ])
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    maintenance_job.main()
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["sample_retracted_epoch"] == 1
    assert stats["sample_compact"]["dirs"] == 2  # epochs 0 and 2 folded
    # post-maintenance state == fresh rebuild from epochs 0 and 2
    ref = SampleStore.create(
        spark, str(tmp_path / "ref"), "url", k=K, payload_cols=["body"]
    )
    epochs = mk_epochs(spark)
    ref.update(epochs[0], epoch=0)
    ref.update(epochs[2], epoch=2)
    got = sorted(map(tuple, SampleStore.load(spark, p).sample().collect()))
    assert got == sorted(map(tuple, ref.sample().collect()))
