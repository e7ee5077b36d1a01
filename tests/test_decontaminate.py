"""Benchmark decontamination: GPT-3-style shared-n-gram flagging.

Planted cases: a training doc embedding a benchmark answer inside longer
text must be flagged (and dropped by decontaminate); a clean doc must
survive; min_hits loosens the rule; the corpus side must not shuffle
(bench n-grams broadcast)."""

import pyspark.sql.functions as F

from data_pipeline_spark.operators.decontaminate import (
    contaminated_ids,
    contamination_hits,
    decontaminate,
)

BENCH_TEXT = (
    "the quick brown fox jumps over the lazy dog near the river bank today"
)


def _corpus(spark):
    rows = [
        # embeds a contiguous 13-token run of the benchmark inside filler
        (1, "intro words here " + BENCH_TEXT + " trailing filler words"),
        # shares only a 5-token run — not a 13-gram
        (2, "some unrelated text the quick brown fox jumps elsewhere "
            "entirely different content follows on and on and on"),
        # completely clean
        (3, "completely different document about spark partitioning and "
            "shuffle behavior at terabyte scale with no overlap at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(100, BENCH_TEXT)], "bench_id long, text string"
    )


def test_flags_embedded_benchmark_text(spark):
    bad = contaminated_ids(_corpus(spark), _bench(spark), n=13)
    rows = {r["doc_id"]: r for r in bad.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_bench_docs"] == 1 and rows[1]["n_hits"] >= 1


def test_ngram_size_controls_sensitivity(spark):
    # at n=5 the partial 5-token overlap of doc 2 is contamination too
    bad = contaminated_ids(_corpus(spark), _bench(spark), n=5)
    assert {r["doc_id"] for r in bad.collect()} == {1, 2}


def test_min_hits_loosens_rule(spark):
    # doc 2 shares exactly one 5-gram; min_hits=2 spares it
    bad = contaminated_ids(_corpus(spark), _bench(spark), n=5, min_hits=2)
    assert {r["doc_id"] for r in bad.collect()} == {1}


def test_decontaminate_drops_flagged_docs_only(spark):
    out = decontaminate(_corpus(spark), _bench(spark), n=13)
    assert {r["doc_id"] for r in out.collect()} == {2, 3}
    assert out.columns == ["doc_id", "text"]


def test_hits_count_distinct_shared_grams(spark):
    # BENCH_TEXT has 14 tokens -> two distinct 13-grams, both inside doc 1
    hits = contamination_hits(_corpus(spark), _bench(spark), n=13)
    rows = hits.collect()
    assert [(r["doc_id"], r["bench_id"], r["n_hits"]) for r in rows] == [
        (1, 100, 2)
    ]


def test_corpus_side_broadcast_no_shuffle_before_join(spark):
    plan = (
        contamination_hits(_corpus(spark), _bench(spark), n=13)
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_short_bench_item_matched_by_containment(spark):
    """A benchmark item SHORTER than n tokens has no true n-grams; it must
    still flag docs containing it verbatim (token-boundary containment),
    and must not match mid-token ('fox jumps' !~ 'foxy jumpsuit')."""
    bench = spark.createDataFrame(
        [(1, "quick brown fox jumps"),        # 4 tokens < n=13
         (2, "zebra stripes pattern")],
        "bench_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "intro the quick brown fox jumps over things and more text"),
         (2, "the quickest brown foxy jumpsuit is not a match at all"),
         (3, "zebra stripes patterned wallpaper is not the same gram")],
        "doc_id long, text string",
    )
    bad = contaminated_ids(corpus, bench, n=13)
    rows = {r["doc_id"]: r for r in bad.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_hits"] == 1 and rows[1]["n_bench_docs"] == 1


def test_min_hits_counts_distinct_grams_not_pairs(spark):
    """One shared gram appearing in TWO bench docs (duplicate eval splits)
    is still one hit — min_hits=2 must spare the doc."""
    bench = spark.createDataFrame(
        [(1, BENCH_TEXT), (2, BENCH_TEXT)],  # duplicated benchmark item
        "bench_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "pad " + " ".join(BENCH_TEXT.split()[:13]) + " tail")],
        "doc_id long, text string",
    )
    one = {r["doc_id"]: r for r in contaminated_ids(corpus, bench, n=13).collect()}
    assert one[1]["n_hits"] == 1 and one[1]["n_bench_docs"] == 2
    assert contaminated_ids(corpus, bench, n=13, min_hits=2).count() == 0


def test_null_id_contaminated_doc_is_dropped(spark):
    """A NULL-keyed doc flagged as contaminated must be dropped by the
    (null-safe) anti-join — plain equality would ship it (regression)."""
    bench = _bench(spark)
    corpus = spark.createDataFrame(
        [(None, "pad " + BENCH_TEXT + " tail"),
         (3, "completely different clean text about something else here")],
        "doc_id long, text string",
    )
    flagged = contaminated_ids(corpus, bench, n=13).collect()
    assert [r["doc_id"] for r in flagged] == [None]
    out = decontaminate(corpus, bench, n=13)
    assert [r["doc_id"] for r in out.collect()] == [3]
