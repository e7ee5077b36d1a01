"""Persisted sketch state (X106): exactly-once epochs, fold equivalence
vs direct builds, cold reload, compaction, frozen params, streaming
foreachBatch maintenance."""

import os

import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.bloomdedup import bloom_build
from data_pipeline_spark.operators.cms import cms_build, cms_estimate
from data_pipeline_spark.operators.hll import hll_estimate, hll_registers
from data_pipeline_spark.operators.sketchstate import (
    STREAM_EPOCH_BASE,
    SketchStore,
)

PARAMS = dict(
    bloom_m=1 << 14, bloom_k=4, cms_depth=4, cms_width=1 << 10, hll_p=8
)


def _epoch(spark, e):
    return spark.range(e * 300, (e + 1) * 300 + 50).select(  # 50-key overlap
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
    )


def test_fold_equivalence_and_exactly_once(spark, tmp_path):
    path = str(tmp_path / "st")
    store = SketchStore.create(spark, path, "url", group_col="grp", **PARAMS)
    union = None
    for e in range(3):
        df = _epoch(spark, e)
        assert store.update(df, e) == e
        union = df if union is None else union.unionByName(df)
    assert store.update(_epoch(spark, 1), 1) is None  # exactly-once skip

    # membership: every ingested key reads _maybe=True (no false negatives)
    probed = store.probe(union)
    assert probed.where(~F.col("_maybe")).count() == 0
    # state == direct builds over the union (bloom + cms + hll folds)
    direct_bloom = bloom_build(union, "url", PARAMS["bloom_m"], 4, "sketch")
    assert sorted(map(tuple, store._merged("bloom").collect())) == sorted(
        map(tuple, direct_bloom.collect())
    )
    direct_cms = cms_build(union, "url", 4, PARAMS["cms_width"], "sketch")
    assert sorted(map(tuple, store._merged("cms").collect())) == sorted(
        map(tuple, direct_cms.collect())
    )
    direct_hll = hll_registers(union, "url", ["grp"], PARAMS["hll_p"], "sketch")
    assert sorted(map(tuple, store._merged("hll").collect())) == sorted(
        map(tuple, direct_hll.collect())
    )

    # freq honors the one-sided law incl. cross-epoch double-ingest keys
    true = {
        r["url"]: r["n"]
        for r in union.groupBy("url").agg(F.count("*").alias("n")).collect()
    }
    est = {r["url"]: r["est"] for r in store.freq(union).collect()}
    assert all(est[k] >= v for k, v in true.items())

    # cold reload + compaction preserve every answer
    est_before = sorted(map(tuple, store.distinct().collect()))
    reloaded = SketchStore.load(spark, path)
    stats = reloaded.compact()
    assert stats["epochs"] == 3 and stats["dirs"] == 9
    assert sorted(map(tuple, reloaded.distinct().collect())) == est_before
    assert len(reloaded._dirs("cms")) == 1  # fold collapsed
    assert reloaded.update(_epoch(spark, 1), 1) is None  # ledger survives


def test_frozen_params_and_distinct_accuracy(spark, tmp_path):
    path = str(tmp_path / "st2")
    store = SketchStore.create(spark, path, "url", **PARAMS)
    store.update(_epoch(spark, 0), 0)
    with pytest.raises(ValueError, match="frozen"):
        SketchStore.create(spark, path, "url", cms_width=1 << 11, **{
            k: v for k, v in PARAMS.items() if k != "cms_width"
        })
    est = store.distinct().collect()[0]["est"]
    assert abs(est - 350) / 350 < 0.25  # p=8 -> ~6.5% se


def test_value_quantile_kind(spark, tmp_path):
    import math

    from data_pipeline_spark.operators.ddsketch import dd_histogram

    path = str(tmp_path / "stq")
    store = SketchStore.create(
        spark, path, "url", value_col="lat", dd_alpha=0.02, **PARAMS
    )
    union = None
    for e in range(3):
        df = _epoch(spark, e).withColumn(
            "lat", F.exp((F.crc32(F.col("url")) % 60).cast("double") / 8.0)
        )
        store.update(df, e)
        union = df if union is None else union.unionByName(df)
    # folded dd state == direct build; p90 obeys the relative-error law
    direct = dd_histogram(union, "lat", alpha=0.02)
    assert sorted(map(tuple, store._merged("dd").collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = {r["q"]: r["est"] for r in store.quantiles([0.9]).collect()}[0.9]
    vals = sorted(r["lat"] for r in union.collect())
    x = vals[max(math.ceil(0.9 * len(vals)), 1) - 1]
    assert abs(est - x) <= 0.02 * abs(x) * 1.000001
    # compact covers the dd kind too
    store.compact()
    assert len(store._dirs("dd")) == 1
    assert {r["q"]: r["est"] for r in store.quantiles([0.9]).collect()}[0.9] == est
    # keyless store without value_col refuses quantiles
    plain = SketchStore.create(spark, str(tmp_path / "stq2"), "url", **PARAMS)
    import pytest as _pt

    with _pt.raises(ValueError, match="value_col"):
        plain.quantiles([0.5])


def test_retract_epoch(spark, tmp_path):
    path = str(tmp_path / "str")
    store = SketchStore.create(
        spark, path, "url", value_col="lat", dd_alpha=0.02, **PARAMS
    )
    frames = []
    for e in range(3):
        df = _epoch(spark, e).withColumn(
            "lat", F.exp((F.crc32(F.col("url")) % 40).cast("double") / 6.0)
        )
        frames.append(df)
        store.update(df, e)
    rid = store.retract_epoch(1)
    assert rid < 0  # negative namespace: never collides with update epochs
    # linear kinds net back to a direct build of the REMAINING epochs
    remaining = frames[0].unionByName(frames[2])
    direct_cms = cms_build(remaining, "url", 4, PARAMS["cms_width"], "sketch")
    assert sorted(map(tuple, store._merged("cms").collect())) == sorted(
        map(tuple, direct_cms.collect())
    )
    from data_pipeline_spark.operators.ddsketch import dd_histogram

    direct_dd = dd_histogram(remaining, "lat", alpha=0.02)
    assert sorted(map(tuple, store._merged("dd").collect())) == sorted(
        map(tuple, direct_dd.collect())
    )
    # ever-seen semantics: bloom still answers maybe for retracted keys
    assert store.probe(frames[1]).where(~F.col("_maybe")).count() == 0
    # guards: double retract, retracting a retraction, post-compact retract
    with pytest.raises(ValueError, match="already retracted"):
        store.retract_epoch(1)
    with pytest.raises(ValueError, match="retraction entry"):
        store.retract_epoch(rid)
    with pytest.raises(ValueError, match="never committed"):
        store.retract_epoch(99)
    store.compact()
    with pytest.raises(ValueError, match="compacted"):
        store.retract_epoch(0)
    # compaction preserved the netted state
    assert sorted(map(tuple, store._merged("cms").collect())) == sorted(
        map(tuple, direct_cms.collect())
    )


def test_maintenance_job_sketch_ops(spark, tmp_path, monkeypatch):
    import sys as _sys

    from jobs import maintenance_job

    path = str(tmp_path / "stj")
    store = SketchStore.create(spark, path, "url", **PARAMS)
    for e in range(2):
        store.update(_epoch(spark, e), e)
    monkeypatch.setattr(
        _sys, "argv",
        ["maintenance_job.py", "--sketch-store", path,
         "--retract-sketch-epoch", "1", "--compact-sketches"],
    )
    monkeypatch.setattr(maintenance_job, "_stop_ok", True, raising=False)
    spark_stop = spark.stop
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    try:
        maintenance_job.main()
    finally:
        monkeypatch.setattr(type(spark), "stop", lambda self: spark_stop())
    reloaded = SketchStore.load(spark, path)
    direct = cms_build(_epoch(spark, 0), "url", 4, PARAMS["cms_width"], "sketch")
    assert sorted(map(tuple, reloaded._merged("cms").collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert len(reloaded._dirs("cms")) == 1  # compacted after retraction


def test_freq_decayed(spark, tmp_path):
    path = str(tmp_path / "std")
    store = SketchStore.create(spark, path, "url", **PARAMS)
    # hot key in both epochs, cold key only in the old epoch
    old = spark.createDataFrame([("hot",)] * 4 + [("cold",)] * 6, "url string")
    new = spark.createDataFrame([("hot",)] * 4 + [("warm",)] * 2, "url string")
    store.update(old, 0, ts=0.0)
    store.update(new, 1, ts=3600.0)
    keys = spark.createDataFrame(
        [("hot",), ("cold",), ("warm",), ("never",)], "url string"
    )
    est = {
        r["url"]: r["est"]
        for r in store.freq_decayed(keys, now=3600.0, half_life_s=3600.0).collect()
    }
    # exact decayed counts (wide sketch, no collisions): old weight 0.5
    assert est["cold"] == pytest.approx(3.0, abs=1e-6)   # 6 * 0.5
    assert est["hot"] == pytest.approx(6.0, abs=1e-6)    # 4*0.5 + 4
    assert est["warm"] == pytest.approx(2.0, abs=1e-6)
    assert est["never"] == 0.0
    # undecayed freq still counts raw occurrences
    raw = {r["url"]: r["est"] for r in store.freq(keys).collect()}
    assert raw["cold"] == 6 and raw["hot"] == 8
    # retraction inherits the ORIGINAL epoch's ts: netting epoch 0 out
    # removes exactly its decayed contribution
    store.retract_epoch(0)
    est2 = {
        r["url"]: r["est"]
        for r in store.freq_decayed(keys, now=3600.0, half_life_s=3600.0).collect()
    }
    assert est2["cold"] == pytest.approx(0.0, abs=1e-6)
    assert est2["hot"] == pytest.approx(4.0, abs=1e-6)
    # guards: unstamped epoch, compacted store, bad half-life
    store.update(spark.createDataFrame([("x",)], "url string"), 2)  # no ts
    with pytest.raises(ValueError, match="no ts stamp"):
        store.freq_decayed(keys, 3600.0, 3600.0).collect()
    with pytest.raises(ValueError, match="half_life"):
        store.freq_decayed(keys, 3600.0, 0.0)
    store.compact()
    with pytest.raises(ValueError, match="compacted"):
        store.freq_decayed(keys, 3600.0, 3600.0)


def test_streaming_foreach_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for e in range(3):
        _epoch(spark, e).withColumn("part", F.lit(e)).write.mode(
            "append"
        ).parquet(src)
    store = SketchStore.create(spark, str(tmp_path / "st3"), "url", **PARAMS)
    stream = spark.readStream.schema("url string, grp string, part int").parquet(src)
    q = (
        stream.writeStream.foreachBatch(store.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    eps = SketchStore.load(spark, str(tmp_path / "st3")).committed_epochs()
    assert eps and all(e >= STREAM_EPOCH_BASE for e in eps)
    union = spark.read.parquet(src)
    assert store.probe(union).where(~F.col("_maybe")).count() == 0
