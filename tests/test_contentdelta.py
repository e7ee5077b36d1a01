"""operators/contentdelta.py — per-url change magnitude + corpus drift.

Hand-computed oracles for the Jaccard/churn/JS arithmetic, edge cases
(first capture, empty payloads, identical re-ships), hashed-token parity,
and plan pins (one keyed window, no cartesian, no per-row Python).
"""

import math

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.contentdelta import (
    corpus_drift,
    token_distribution,
    version_deltas,
)


def _caps(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts long, text string")


def _by_key(df, *cols):
    return {
        (r["url"], r["warc_ts"]): tuple(r[c] for c in cols)
        for r in df.collect()
    }


class TestVersionDeltas:
    def test_hand_computed_jaccard_and_churn(self, spark):
        # url A: {a,b,c} -> {a,b,c,d} (3/4) -> {x,y} (0/6)
        caps = _caps(
            spark,
            [
                ("A", 1, "a b c"),
                ("A", 2, "a b c d"),
                ("A", 3, "x y"),
            ],
        )
        got = _by_key(
            version_deltas(caps, ts="warc_ts"),
            "n_tokens", "token_delta", "jaccard", "churn",
        )
        assert got[("A", 1)] == (3, None, None, "new")
        assert got[("A", 2)] == (4, 1, 0.75, "minor")
        assert got[("A", 3)] == (2, -2, 0.0, "rewrite")

    def test_class_boundaries(self, spark):
        # 7/10 = 0.7 -> minor (>= is inclusive); 3/10 = 0.3 -> major.
        ten = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
        caps = _caps(
            spark,
            [
                ("B", 1, ten),
                # keep t0..t6, add x0..x2: inter 7, union 13 -> 0.538 major
                ("B", 2, "t0 t1 t2 t3 t4 t5 t6 x0 x1 x2"),
                # identical re-ship
                ("B", 3, "t0 t1 t2 t3 t4 t5 t6 x0 x1 x2"),
                # exactly 7/10: drop x0..x2, tokens t0..t6 subset of prev 10
                ("B", 4, "t0 t1 t2 t3 t4 t5 t6"),
            ],
        )
        got = _by_key(version_deltas(caps, ts="warc_ts"), "jaccard", "churn")
        assert got[("B", 2)] == (round(7 / 13, 6), "major")
        assert got[("B", 3)] == (1.0, "unchanged")
        assert got[("B", 4)] == (0.7, "minor")

    def test_empty_payload_edges(self, spark):
        caps = _caps(
            spark,
            [("C", 1, ""), ("C", 2, "   "), ("C", 3, "now has words")],
        )
        got = _by_key(
            version_deltas(caps, ts="warc_ts"), "n_tokens", "jaccard", "churn"
        )
        assert got[("C", 1)] == (0, None, "new")
        # empty -> empty: both sets empty, defined as identical
        assert got[("C", 2)] == (0, 1.0, "unchanged")
        # empty -> 3 tokens: 0/3
        assert got[("C", 3)] == (3, 0.0, "rewrite")

    def test_null_payload_is_empty_set_not_reset(self, spark):
        # A NULL-text capture (failed fetch) must count as the EMPTY set:
        # the following capture still has history — churn vs {} — not 'new'.
        caps = _caps(
            spark, [("E", 1, "a b"), ("E", 2, None), ("E", 3, "a b")]
        )
        got = _by_key(
            version_deltas(caps, ts="warc_ts"), "n_tokens", "jaccard", "churn"
        )
        assert got[("E", 1)] == (2, None, "new")
        assert got[("E", 2)] == (0, 0.0, "rewrite")
        assert got[("E", 3)] == (2, 0.0, "rewrite")

    def test_duplicate_tokens_collapse_to_set(self, spark):
        caps = _caps(spark, [("D", 1, "a a a b"), ("D", 2, "b a")])
        got = _by_key(version_deltas(caps, ts="warc_ts"), "n_tokens", "churn")
        assert got[("D", 1)] == (2, "new")
        assert got[("D", 2)] == (2, "unchanged")

    def test_hashed_parity(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        caps = docs.select(
            (F.col("doc_id") % 7).cast("string").alias("url"),
            F.col("doc_id").alias("warc_ts"),
            "text",
        )
        raw = version_deltas(caps, ts="warc_ts")
        hashed = version_deltas(caps, ts="warc_ts", hashed=True)
        cols = ["n_tokens", "token_delta", "jaccard", "churn"]
        key = lambda r: tuple(repr(v) for v in r)  # noqa: E731 (None-safe sort)
        assert sorted(map(tuple, raw.select("url", *cols).collect()), key=key) == \
            sorted(map(tuple, hashed.select("url", *cols).collect()), key=key)

    def test_plan_one_window_no_python(self, spark):
        caps = _caps(spark, [("A", 1, "a b"), ("A", 2, "a c")])
        plan = version_deltas(caps, ts="warc_ts")._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert plan.count("Window") <= 2  # one logical window op
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


class TestCorpusDrift:
    def test_identical_epochs_zero_divergence(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "a b c")], "epoch long, text string"
        )
        row = corpus_drift(df).collect()[0]
        assert row["epoch"] == 1
        assert row["js_divergence"] == 0.0
        assert row["oov_mass"] == 0.0 and row["lost_mass"] == 0.0
        assert row["new_vocab"] == 0

    def test_hand_computed_js(self, spark):
        # prev: a,a,b -> p(a)=2/3, p(b)=1/3 ; cur: a,b,b -> mirrored
        df = spark.createDataFrame(
            [(0, "a a b"), (1, "a b b")], "epoch long, text string"
        )
        row = corpus_drift(df).collect()[0]
        p, q = 2 / 3, 1 / 3
        expect = 0.5 * (
            p * math.log(p / ((p + q) / 2)) + q * math.log(q / ((p + q) / 2))
        ) * 2  # token a and token b contribute symmetrically
        assert row["js_divergence"] == pytest.approx(expect, abs=1e-6)
        assert row["cur_tokens"] == 3 and row["prev_tokens"] == 3
        assert row["cur_vocab"] == 2 and row["prev_vocab"] == 2

    def test_disjoint_epochs_max_divergence(self, spark):
        df = spark.createDataFrame(
            [(0, "a b"), (1, "x y")], "epoch long, text string"
        )
        row = corpus_drift(df).collect()[0]
        assert row["js_divergence"] == pytest.approx(math.log(2), abs=1e-6)
        assert row["oov_mass"] == 1.0 and row["lost_mass"] == 1.0
        assert row["new_vocab"] == 2

    def test_multi_epoch_pairs_and_boundaries(self, spark):
        df = spark.createDataFrame(
            [(0, "a"), (1, "a"), (2, "b")], "epoch long, text string"
        )
        rows = {r["epoch"]: r for r in corpus_drift(df).collect()}
        # pairs (0->1) and (1->2) only; no pair for epoch 0 or phantom 3
        assert set(rows) == {1, 2}
        assert rows[1]["js_divergence"] == 0.0
        assert rows[2]["oov_mass"] == 1.0

    def test_distribution_counts_occurrences(self, spark):
        df = spark.createDataFrame([(0, "a a b")], "epoch long, text string")
        got = {
            (r["epoch"], r["token"]): r["n"]
            for r in token_distribution(df).collect()
        }
        assert got == {(0, "a"): 2, (0, "b"): 1}

    def test_plan_no_pairwise_join_no_python(self, spark):
        df = spark.createDataFrame(
            [(i % 4, f"tok{i} common") for i in range(40)],
            "epoch long, text string",
        )
        plan = corpus_drift(df)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # totals come back via broadcast, never a shuffled join
        assert "SortMergeJoin" not in plan
