"""KMV theta sketches (X110/X111): merge law (loss-free union), exact-
below-k regime, estimate accuracy vs exact distinct, pairwise overlap
algebra vs exact set math, DuckDB twin parity."""

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators.kmv import (
    kmv_estimate,
    kmv_merge,
    kmv_overlap,
    kmv_sketch,
    sql_kmv_overlap,
    sql_kmv_sketch,
)

K = 256


@pytest.fixture(scope="module")
def corpora(spark):
    # Three labeled corpora over a shared url universe with KNOWN overlap:
    #   a = urls 0..5999, b = urls 4000..11999 (|a ∩ b| = 2000),
    #   c = urls 0..149 (below k: stored whole, exact regime)
    # plus nulls, plus duplicate rows (distinctness is the operator's job).
    a = spark.range(0, 6000)
    b = spark.range(4000, 12000)
    c = spark.range(0, 150)
    url = F.concat(F.lit("https://site/"), F.col("id").cast("string"))
    rows = (
        a.select(url.alias("url"), F.lit("a").alias("corpus"))
        .unionByName(b.select(url.alias("url"), F.lit("b").alias("corpus")))
        .unionByName(c.select(url.alias("url"), F.lit("c").alias("corpus")))
    )
    dupes = rows.limit(500)  # repeated observations of the same keys
    nulls = spark.range(3).select(
        F.lit(None).cast("string").alias("url"), F.lit("a").alias("corpus")
    )
    return rows.unionByName(dupes).unionByName(nulls)


def test_exact_below_k(spark, corpora):
    c = corpora.where(F.col("corpus") == "c")
    est = kmv_estimate(kmv_sketch(c, "url", ["corpus"], k=K), k=K).collect()
    assert len(est) == 1 and est[0]["distinct_est"] == 150.0


def test_estimate_accuracy(spark, corpora):
    ests = {
        r["corpus"]: r["distinct_est"]
        for r in kmv_estimate(
            kmv_sketch(corpora, "url", ["corpus"], k=K), k=K
        ).collect()
    }
    # rel err ~ 1/sqrt(k-2) ≈ 6.3%; allow 3 sigma
    assert abs(ests["a"] - 6000) / 6000 < 0.19
    assert abs(ests["b"] - 8000) / 8000 < 0.19


def test_merge_is_lossfree_union(spark, corpora):
    old = corpora.where(F.col("url").isNotNull()).limit(4000)
    new = corpora.where(F.col("url").isNotNull()).subtract(old)
    merged = kmv_merge(
        kmv_sketch(old, "url", k=K), kmv_sketch(new, "url", k=K), k=K
    )
    direct = kmv_sketch(corpora, "url", k=K)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_overlap_estimates(spark, corpora):
    sk = kmv_sketch(corpora, "url", ["corpus"], k=K)
    rows = {(r["group_a"], r["group_b"]): r for r in kmv_overlap(sk, "corpus", k=K).collect()}
    ab = rows[("a", "b")]
    # truth: |a ∪ b| = 12000, |a ∩ b| = 2000, jaccard 1/6,
    # containment(a in b) = 2000/6000, (b in a) = 2000/8000.
    # The ∩ ratio estimator has binomial noise on m ~ B(k, J):
    # sigma_rel ≈ sqrt((1-J)/(k·J)) ≈ 14% here — allow ~3 sigma.
    assert abs(ab["union_est"] - 12000) / 12000 < 0.19
    assert abs(ab["intersect_est"] - 2000) / 2000 < 0.42
    assert abs(ab["jaccard"] - 1 / 6) < 0.07
    assert abs(ab["containment_a_in_b"] - 1 / 3) < 0.13
    assert abs(ab["containment_b_in_a"] - 0.25) < 0.10
    # c ⊂ a → containment(c in a) ~1, but m (c-survivors in the union
    # top-k) is only ~150·k/6150 ≈ 6 here, so the ratio is coarse: just
    # pin "mostly contained".
    ac = rows[("a", "c")]
    assert 0.6 < ac["containment_b_in_a"] <= 1.3
    # disjoint-ish pair: c (0..149) vs b (4000..) → zero intersection, exactly
    bc = rows[("b", "c")]
    assert bc["intersect_est"] < 200  # noise floor of the ratio estimator
    assert bc["jaccard"] < 0.03


def test_duckdb_twin_parity(spark, corpora):
    pdf = corpora.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    got = sorted(
        map(tuple, kmv_sketch(corpora, "url", ["corpus"], k=K).collect())
    )
    want = sorted(
        map(tuple, con.sql(sql_kmv_sketch("t", "url", ["corpus"], k=K)).fetchall())
    )
    assert got == want
    got_ov = sorted(
        map(
            tuple,
            kmv_overlap(kmv_sketch(corpora, "url", ["corpus"], k=K), "corpus", k=K)
            .orderBy("group_a", "group_b")
            .collect(),
        )
    )
    want_ov = sorted(
        map(tuple, con.sql(sql_kmv_overlap("t", "url", "corpus", k=K)).fetchall())
    )
    assert got_ov == want_ov


def test_ungrouped_sketch_plan_has_no_global_window(spark, corpora):
    """Ungrouped top-k must be TakeOrderedAndProject (per-partition
    top-k + driver merge), not a single-partition rank window over the
    whole corpus."""
    plan = kmv_sketch(corpora, "url", k=K)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
