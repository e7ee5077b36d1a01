"""Physical-plan shape regressions — the 100-TB posture, pinned.

A query can be value-correct and still be wrong at scale (unbroadcast dim
join, unpruned scan, all-rows window where a partial agg suffices). These
tests read `explain(formatted)` output and assert the plan properties the
SURVEY/BASELINE design calls for, so a refactor that silently regresses
them fails CI rather than a 100-TB run.
"""

import importlib.util
import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "entry_for_plans", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_dim_joins_broadcast(spark, entry):
    """Small dimensions must broadcast — no shuffle join for nation/region."""
    plan = _plan(spark, entry.queries()["nation_supplier_rollup"](spark, SF))
    # Formatted output repeats each node in the detail section; the tree
    # shows 2 joins → ≥2 mentions, and crucially zero shuffle joins.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_top_k_uses_take_ordered(spark, entry):
    """Top-10 must be TakeOrderedAndProject (per-partition heaps), never a
    global sort."""
    plan = _plan(spark, entry.queries()["q3_top_revenue"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_scan_prunes_columns_and_pushes_filters(spark, entry):
    """The filtered lineitem scan must read only referenced columns and
    push predicates into the parquet reader."""
    plan = _plan(spark, entry.queries()["q1_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ReadSchema for lineitem must NOT include unreferenced wide columns.
    assert "l_comment" not in plan
    assert "PartialMerge" in plan or "partial_" in plan  # map-side combine


def test_lww_is_partial_aggregable(spark, entry):
    """The max_by LWW must run as a hash aggregation with a map-side
    partial phase (hot keys collapse before the shuffle) — not a window."""
    plan = _plan(spark, entry.queries()["cdc_lww_latest"](spark, SF))
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_envelope_extract_is_pure_native(spark, entry):
    """The P1/P2 envelope explode must stay JVM-side end-to-end: no Python
    UDFs of any kind (from_json + generators + SQL lambdas only), and the
    part scan prunes to the referenced columns."""
    plan = _plan(spark, entry.queries()["json_envelope_extract"](spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Generate" in plan  # posexplode, not a driver loop
    assert "p_comment" not in plan  # column pruning reaches the scan


def test_ivf_fixed_centroids_broadcast(spark, entry):
    """The IVF contract path must broadcast the centroid table on both the
    assignment and the probe side — never shuffle the corpus against it."""
    plan = _plan(spark, entry.queries()["ann_ivf"](spark, SF))
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # tiny centroid crossJoins
    assert "CartesianProduct" not in plan


def test_lsh_bucket_pairs_no_cartesian(spark, entry):
    """The embedding-LSH scale path must generate candidates via the band
    equi-join — no cartesian/cross product anywhere in the plan."""
    plan = _plan(spark, entry.queries()["dedup_embedding_lsh"](spark, SF))
    assert "CartesianProduct" not in plan
    # The only nested-loop joins allowed are the broadcasts of the tiny
    # hyperplane table into the signature computation (once per side of the
    # candidate self-join); the candidate join itself must be an equi-join.
    assert plan.count("BroadcastNestedLoopJoin (") <= 2
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_merge_stage_plan_has_partial_lww_and_no_collect(spark, tmp_path):
    """The replay staging pipeline (dedup + extraction) keeps the LWW as a
    partial-aggregable hash agg and runs extraction via ArrowEvalPython
    (vectorized), never BatchEvalPython (per-row)."""
    from data_pipeline_spark.plans.registry import SchemaRegistry
    from data_pipeline_spark.sources.datagen import gen_changes
    from data_pipeline_spark.streaming.runner import make_table_for_log, stage_changes

    table = make_table_for_log(
        spark, str(tmp_path / "plan_t"), SchemaRegistry(), n_buckets=8
    )
    staged = stage_changes(spark, gen_changes(spark, 1000, seed=3), table)
    plan = _plan(spark, staged)
    assert "partial_max_by" in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_no_per_row_python_in_any_contract_query(spark, entry):
    """Sweep EVERY driver-contract query: per-row Python (BatchEvalPython)
    is banned across the whole surface — vectorized ArrowEvalPython is the
    only allowed Python execution node. Catches a new operator slipping a
    row-at-a-time UDF into the contract."""
    for name, fn in entry.queries().items():
        plan = _plan(spark, fn(spark, SF))
        assert "BatchEvalPython" not in plan, name


def test_rollup_is_single_expand_aggregate(spark, entry):
    """ROLLUP grouping sets must expand inside one aggregation pipeline
    (Expand + partial-aggregable HashAggregate), not scan-per-level."""
    df = entry.queries()["events_rollup_cube"](spark, SF)
    plan = _plan(spark, df)
    # formatted mode mentions each node twice (tree + detail section):
    # ONE scan = 2 mentions; a scan-per-level plan would show >= 4.
    assert plan.count("Scan parquet") == 2
    assert "Expand" in plan and "HashAggregate" in plan


def test_approx_distinct_tracks_exact(spark, entry):
    """The HLL++ scale path (approx_count_distinct) must stay within its
    documented error bound of the exact distinct the contract query pins
    (rsd default 0.05 -> assert within 10% for slack on small groups)."""
    import pyspark.sql.functions as F

    exact = {
        r["event_type"]: r["n_users"]
        for r in entry.queries()["events_user_reach"](spark, SF).collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("a"))
        .collect()
    }
    assert exact.keys() == approx.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.10 * n), (k, n, approx[k])


def test_approx_percentile_tracks_exact(spark, entry):
    """The GK-sketch scale path (approx_percentile) guarantees RANK error,
    not value error — so pin each approx quantile inside the exact value
    window of q ± 2% rank (value-relative bounds would flake on sparse
    tails, where one rank step is a big value step)."""
    import pyspark.sql.functions as F

    windows = {0.5: (0.48, 0.52), 0.9: (0.88, 0.92), 0.99: (0.97, 1.0)}
    qs = [q for w in windows.values() for q in w]
    bounds = {
        r["event_type"]: r["b"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.expr(f"percentile(value, array({', '.join(map(str, qs))}))").alias("b"))
        .collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.expr(
            "approx_percentile(value, array(0.5, 0.9, 0.99), 10000)"
        ).alias("a"))
        .collect()
    }
    # sanity: the exact contract query agrees with the mid-window exacts
    exact = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in entry.queries()["events_value_quantiles"](spark, SF).collect()
    }
    assert bounds.keys() == approx.keys() == exact.keys()
    for k in bounds:
        for i in range(3):
            lo, hi = bounds[k][2 * i], bounds[k][2 * i + 1]
            assert lo <= approx[k][i] <= hi, (k, i, lo, approx[k][i], hi)


def test_dedup_index_update_is_equi_join(spark, tmp_path):
    """The incremental dedup index's candidate generation must be a band
    equi-join against the stored band table — no cartesian anywhere, and
    no per-row Python (md5/minhash all JVM-side SQL lambdas). Probed via
    duplicates(materialize=False) — the committed path localCheckpoints,
    which hides the plan behind an ExistingRDD scan."""
    from data_pipeline_spark.operators.dedup_index import MinHashDedupIndex

    idx = MinHashDedupIndex.create(
        spark, str(tmp_path / "planidx"), num_hashes=12, bands=4
    )
    idx.update(
        spark.createDataFrame(
            [(1, "stored words for the plan pin test here")],
            "doc_id long, text string",
        ),
        epoch=0,
    )
    probe = idx.duplicates(
        spark.createDataFrame(
            [(2, "new words for the plan pin test here")],
            "doc_id long, text string",
        ),
        materialize=False,
    )
    plan = _plan(spark, probe)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_ivf_incremental_broadcasts_centroids(spark, entry):
    """The persistent IVF index's search must broadcast the centroid table
    (assignment happened at add-time; the probe side still crossJoins the
    tiny centroid frame) and never produce a cartesian over vectors."""
    plan = _plan(spark, entry.queries()["ann_ivf_incremental"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # tiny centroid crossJoin only


def test_purge_filter_pushed_to_scan(spark, tmp_path):
    """The purge rewrite's NOT-IN key filter must reach the parquet reader
    (PushedFilters), so rewriting a file skips row groups that provably
    lack the purged keys instead of decoding every row."""
    import pyspark.sql.functions as F

    from data_pipeline_spark.lake.table import LakeTable

    table = LakeTable.create(
        spark, str(tmp_path / "pp"),
        spark.createDataFrame([], "url string, warc_ts timestamp").schema,
        key_col="url", n_buckets=2,
    )
    staged = spark.createDataFrame(
        [(f"https://x.example/{i}", "upsert", i) for i in range(20)],
        "url string, op string, lsn long",
    ).withColumn("warc_ts", F.current_timestamp())
    table.merge(staged, epoch=0, mode="mor")
    files = table.files_of(table._current_snapshot())
    kept = table._read_files(files).where(
        ~F.col("url").isin(["https://x.example/3", "https://x.example/7"])
    )
    plan = _plan(spark, kept)
    assert "PushedFilters: [Not(In(url" in plan


def test_generic_merge_is_single_join(spark, entry):
    """The MERGE clause compiler must stay a ONE-join plan: N clauses
    compile to CASE branches over one action ordinal, never per-clause
    joins or unions of per-clause passes."""
    import re

    plan = _plan(spark, entry.queries()["merge_into_generic"](spark, SF))
    joins = re.findall(
        r"^\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
        plan, re.M,
    )
    assert len(joins) == 1, plan
    assert "CartesianProduct" not in plan


def test_change_feed_is_one_join_over_pruned_scans(spark, tmp_path):
    """change_feed = two bucket-pruned snapshot scans + ONE full-outer key
    join; no second pass, no union-of-diffs."""
    import pyspark.sql.functions as F

    from data_pipeline_spark.lake.table import LakeTable

    table = LakeTable.create(
        spark, str(tmp_path / "cfp"),
        spark.createDataFrame([], "url string, warc_ts timestamp").schema,
        key_col="url", n_buckets=4,
    )
    staged = spark.createDataFrame(
        [(f"https://x.example/{i}", "upsert", i) for i in range(10)],
        "url string, op string, lsn long",
    ).withColumn("warc_ts", F.current_timestamp())
    table.merge(staged, epoch=0)
    s0 = table.snapshot()["snapshot_id"]
    table.merge(staged.withColumn("lsn", F.col("lsn") + 100), epoch=1)
    import re

    plan = _plan(spark, table.change_feed(s0))
    joins = re.findall(
        r"^\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
        plan, re.M,
    )
    assert len(joins) == 1, plan
    assert "CartesianProduct" not in plan


def test_span_dedup_plan_is_agg_join_only(spark, entry):
    """ExactSubstr: window stream -> fingerprint hash agg (map-side
    partial) -> keyed equi-joins. Never an all-pairs plan, never a
    Window over the corpus, no Python."""
    plan = _plan(spark, entry.queries()["doc_span_dedup"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "partial_count" in plan  # dup counting combines before the shuffle


def test_doc_search_plan_has_topk_and_no_sort_of_corpus(spark, entry):
    """Inverted-index ranking: isin term filter + TakeOrderedAndProject —
    a global sort of all matching docs must not appear."""
    plan = _plan(spark, entry.queries()["doc_search"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Sort (") == 0 or "SortMergeJoin" in plan


def test_html_metadata_plan_is_pure_native(spark, entry):
    """Page-metadata extraction must fuse into codegen: zero Python eval
    nodes, zero joins, zero shuffles."""
    plan = _plan(spark, entry.queries()["html_metadata"](spark, SF))
    assert "EvalPython" not in plan
    assert "Join" not in plan and "Exchange" not in plan


def test_host_reputation_plan_no_window_no_cartesian(spark, entry):
    """Domain rollup: hash aggs + keyed equi-joins only (top-lang pick is
    min(struct(-n, lang)), not a per-doc window)."""
    plan = _plan(spark, entry.queries()["host_reputation"](spark, SF))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_nfc_normalize_is_arrow_vectorized(spark, entry):
    plan = _plan(spark, entry.queries()["doc_nfc_normalize"](spark, SF))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
