"""Bloom-prefiltered exact history dedup (X100): anti-join equality,
no-false-negative law, union law, NULL semantics, plan pins."""

import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.bloomdedup import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    dedup_against_history,
)

M, K = 1 << 12, 4  # small filter -> real false positives in tests


@pytest.fixture(scope="module")
def frames(spark):
    hist = spark.createDataFrame(
        [(f"h{i}",) for i in range(300)] + [("shared%d" % i,) for i in range(50)]
        + [(None,)],
        "key string",
    )
    new = spark.createDataFrame(
        [(i, f"n{i}") for i in range(200)]
        + [(1000 + i, f"shared{i}") for i in range(50)]
        + [(2000, None), (2001, None), (2002, "n0")],  # dup new key kept twice
        "rid long, key string",
    )
    return hist, new


def test_exact_anti_join_equality(spark, frames):
    hist, new = frames
    got = sorted(
        (r["rid"], r["key"])
        for r in dedup_against_history(new, hist, "key", m_bits=M, k=K).collect()
    )
    want = sorted(
        (r["rid"], r["key"])
        for r in new.join(hist, "key", "left_anti").collect()
    )
    assert got == want
    # NULL-key new rows kept (anti-join semantics), all 50 shared dropped
    assert (2000, None) in got and (2001, None) in got
    assert not any(k and k.startswith("shared") for _, k in got)
    # duplicate-key new rows both survive
    assert sum(1 for _, k in got if k == "n0") == 2


def test_no_false_negatives_and_fpr(spark, frames):
    hist, _ = frames
    bloom = bloom_build(hist, "key", m_bits=M, k=K)
    members = hist.where(F.col("key").isNotNull())
    probed = bloom_probe(members, "key", bloom, m_bits=M, k=K)
    assert probed.where(~F.col("_maybe")).count() == 0  # NEVER false-neg
    # false positives exist but are a small fraction at this sizing
    strangers = members.sparkSession.createDataFrame(
        [(f"zz{i}",) for i in range(2000)], "key string"
    )
    fp = bloom_probe(strangers, "key", bloom, m_bits=M, k=K).where(
        F.col("_maybe")
    ).count()
    assert fp < 400  # ~ (set_bits/m)^k * 2000, generous ceiling


def test_union_law(spark):
    a = spark.range(0, 100).select(F.col("id").cast("string").alias("key"))
    b = spark.range(100, 180).select(F.col("id").cast("string").alias("key"))
    merged = bloom_merge(
        bloom_build(a, "key", m_bits=M, k=K), bloom_build(b, "key", m_bits=M, k=K)
    )
    direct = bloom_build(a.unionByName(b), "key", m_bits=M, k=K)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_empty_history_all_definite(spark, frames):
    _, new = frames
    empty = new.sparkSession.createDataFrame([], "key string")
    out = dedup_against_history(new, empty, "key", m_bits=M, k=K)
    assert out.count() == new.count()


def test_plan_pins(spark, frames):
    hist, new = frames
    bloom = bloom_build(hist, "key", m_bits=M, k=K)
    plan = (
        bloom_probe(new, "key", bloom, m_bits=M, k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # bitmap broadcast, probe side stays put
    assert "BatchEvalPython" not in plan
    with pytest.raises(ValueError):
        bloom_build(hist, "key", m_bits=M, k=5)
    with pytest.raises(ValueError):
        bloom_build(hist, "key", m_bits=32)
    with pytest.raises(ValueError):
        bloom_merge()
