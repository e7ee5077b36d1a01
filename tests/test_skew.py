"""Skew policy (SURVEY.md §7.3 milestone 6 / north_rule "skew handled
explicitly"): hot-key detection from evidence, salted spreading of hot keys
across tasks, and LWW correctness under pathological key skew.
"""

import pyspark.sql.functions as F

from data_pipeline_spark.operators.dedup import lww_dedup
from data_pipeline_spark.operators.skew import (
    detect_hot_keys,
    salted_repartition,
    with_salt,
)
from data_pipeline_spark.sources.datagen import gen_changes


def _partition_sizes(df):
    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").count().collect()
    )
    return [r["count"] for r in rows]


def test_detect_hot_keys_finds_planted_keys(spark):
    df = gen_changes(spark, 20_000, seed=5, hot_key_share=40, n_hot_keys=2)
    hot = detect_hot_keys(df, "url", threshold_ratio=0.05)
    assert len(hot) == 2
    counts = {r["url"]: r["n"] for r in
              df.groupBy("url").agg(F.count("*").alias("n")).collect()}
    for u in hot:
        assert counts[u] >= 0.05 * 20_000

    # No false positives on the un-skewed log.
    assert detect_hot_keys(
        gen_changes(spark, 20_000, seed=5), "url", threshold_ratio=0.05
    ) == []


def test_salted_repartition_spreads_hot_key(spark):
    """80% of rows on one key: keyed repartition puts them in ONE task;
    salting bounds the max task at ~1/salt_buckets of the hot rows."""
    n = 40_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 8, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("key"),
        F.col("id").alias("v"),
    )
    unsalted = df.repartition(16, F.col("key"))
    salted = salted_repartition(df, "key", 16, salt_buckets=8)

    hot_rows = int(n * 0.8)
    assert max(_partition_sizes(unsalted)) >= hot_rows  # straggler task
    # With 8 salts the hot key spans ≥ 4 distinct tasks and the biggest
    # task carries well under half the hot rows.
    assert max(_partition_sizes(salted)) < hot_rows * 0.5

    # Salt must vary WITHIN a key (hash of all columns), never collapse.
    per_key_salts = (
        with_salt(df, 8).where(F.col("key") == "hot")
        .select("_salt").distinct().count()
    )
    assert per_key_salts == 8


def test_lww_correct_under_key_skew(spark):
    """max_by LWW (map-side combinable) must stay correct — and produce
    exactly one winner row — when 40% of events hit 2 keys."""
    df = gen_changes(spark, 30_000, seed=9, hot_key_share=40, n_hot_keys=2)
    winners = lww_dedup(
        df.select("op", "url", "lsn", "warc_ts"),
        key_cols=("url",), order_cols=("warc_ts", "lsn"),
    )
    # Python oracle over the raw events.
    best = {}
    for r in df.select("url", "warc_ts", "lsn").collect():
        cur = best.get(r["url"])
        if cur is None or (r["warc_ts"], r["lsn"]) > cur:
            best[r["url"]] = (r["warc_ts"], r["lsn"])
    got = {r["url"]: (r["warc_ts"], r["lsn"])
           for r in winners.select("url", "warc_ts", "lsn").collect()}
    assert got == best
