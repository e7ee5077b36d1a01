"""DSIR importance resampling (operators/importance.py)."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.importance import (
    importance_weights,
    select_top,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # target docs speak "alpha beta", raw pool is dominated by "gamma delta";
    # a mixed doc sits between the two
    rows = [
        (1, "alpha beta alpha beta", "tgt"),
        (2, "alpha beta beta alpha", "tgt"),
        (3, "gamma delta gamma delta", "raw"),
        (4, "delta gamma delta gamma delta", "raw"),
        (5, "alpha gamma", "raw"),
        (6, "", "raw"),  # tokenless: carries no evidence, no output row
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, dom string")


def test_target_like_docs_rank_first(spark, corpus):
    w = importance_weights(corpus, "doc_id", "text", F.col("dom") == "tgt")
    rows = {r.doc_id: r for r in w.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # doc 6 tokenless -> absent
    # target-vocabulary docs outweigh off-target ones; the mixed doc lands
    # strictly between
    assert rows[1].log_weight > rows[5].log_weight > rows[3].log_weight
    assert rows[2].log_weight > rows[5].log_weight > rows[4].log_weight


def test_weights_sum_token_log_ratios(spark, corpus):
    # hand-check doc 5 ("alpha gamma"): weight = lr(alpha) + lr(gamma) with
    # add-0.5 smoothing over the raw vocab of 4 terms
    import math

    cf_r = {"alpha": 5, "beta": 4, "gamma": 5, "delta": 5}
    cf_t = {"alpha": 4, "beta": 4, "gamma": 0, "delta": 0}
    tr, tt, v, a = sum(cf_r.values()), sum(cf_t.values()), 4, 0.5

    def lr(t):
        return math.log((cf_t[t] + a) / (tt + a * v)) - math.log(
            (cf_r[t] + a) / (tr + a * v)
        )

    w = importance_weights(corpus, "doc_id", "text", F.col("dom") == "tgt")
    got = {r.doc_id: r.log_weight for r in w.collect()}
    assert got[5] == pytest.approx(lr("alpha") + lr("gamma"), abs=2e-6)
    assert got[1] == pytest.approx(2 * lr("alpha") + 2 * lr("beta"), abs=2e-6)


def test_select_top_semi_joins(spark, corpus):
    w = importance_weights(corpus, "doc_id", "text", F.col("dom") == "tgt")
    picked = select_top(corpus, w, "doc_id", k=2)
    assert {r.doc_id for r in picked.collect()} == {1, 2}
    assert picked.columns == corpus.columns


def test_no_python_rows_in_plan(spark, corpus):
    plan = importance_weights(
        corpus, "doc_id", "text", F.col("dom") == "tgt"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
