"""Deterministic hash sampling: proportions, determinism, stratification,
seed independence, DuckDB twin parity, and plan shape (pure filter)."""

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.operators import sampling as S

N = 20000


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(N).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("s")
    )


def test_threshold_encoding():
    assert S.threshold_hex(1.0) == "g" and S.threshold_hex(2.0) == "g"
    assert S.threshold_hex(0.0) == "00000000" == S.threshold_hex(-1)
    assert S.threshold_hex(0.5) == "80000000"
    # fractions rounding UP to 1.0 must clamp to keep-all, never emit the
    # 9-char '100000000' (which compares BELOW most 8-hex keys)
    assert S.threshold_hex(1 - 1e-12) == "g"
    assert len(S.threshold_hex(1 - 1e-6)) == 8
    # 'g' > any 8-hex-char key; '00000000' admits nothing
    assert "ffffffff" < "g" and not ("00000000" < "00000000")


def test_fraction_and_determinism(keys):
    a = S.hash_sample(keys, "k", 0.3, seed="s1")
    n1, n2 = a.count(), S.hash_sample(keys, "k", 0.3, seed="s1").count()
    assert n1 == n2  # deterministic
    assert abs(n1 / N - 0.3) < 0.02
    # nested property: a 0.1 sample is a subset of the 0.3 sample (same seed)
    small = set(r["k"] for r in S.hash_sample(keys, "k", 0.1, seed="s1").collect())
    big = set(r["k"] for r in a.collect())
    assert small <= big


def test_seed_independence(keys):
    a = set(r["k"] for r in S.hash_sample(keys, "k", 0.5, seed="x").collect())
    b = set(r["k"] for r in S.hash_sample(keys, "k", 0.5, seed="y").collect())
    overlap = len(a & b) / N
    assert abs(overlap - 0.25) < 0.02  # independent 50% samples overlap ~25%


def test_stratified(keys):
    out = S.stratified_hash_sample(
        keys, "k", "s", {"0": 1.0, "1": 0.5, "2": 0.0}, default_fraction=0.1
    )
    cnt = {r["s"]: r["c"] for r in out.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert cnt["0"] == N // 4  # keep-all stratum intact
    assert "2" not in cnt  # dropped stratum empty
    assert abs(cnt["1"] / (N // 4) - 0.5) < 0.05
    assert abs(cnt["3"] / (N // 4) - 0.1) < 0.05  # default fraction


def test_duckdb_twin(keys):
    got = sorted(r["k"] for r in S.hash_sample(keys, "k", 0.25, seed="z").collect())
    con = duckdb.connect()
    con.execute(f"CREATE TABLE sk AS SELECT unnest(range({N})) AS k")
    oracle = sorted(
        r[0]
        for r in con.execute(
            f"SELECT k FROM sk WHERE {S.sql_keep_predicate('k', 0.25, 'z')}"
        ).fetchall()
    )
    assert got == oracle

    got2 = sorted(
        (r["k"], r["s"])
        for r in S.stratified_hash_sample(
            keys, "k", "s", {"0": 0.8, "1": 0.2}, 0.05, seed="w"
        ).collect()
    )
    con.execute("CREATE TABLE sk2 AS SELECT k, CAST(k % 4 AS VARCHAR) AS s FROM sk")
    pred = S.sql_stratified_predicate("k", "s", {"0": 0.8, "1": 0.2}, 0.05, seed="w")
    oracle2 = sorted(
        (r[0], r[1])
        for r in con.execute(f"SELECT k, s FROM sk2 WHERE {pred}").fetchall()
    )
    assert got2 == oracle2


def test_plan_is_scan_level_filter(keys):
    """The sample is one Filter over the scan — no shuffle, no UDF."""
    plan = S.hash_sample(keys, "k", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_budget_sample(spark):
    """Per-stratum realized tokens land in [budget, budget + crossing doc);
    deterministic across reruns and partitioning; zero budget = nothing."""
    import duckdb

    rows = []
    for i in range(60):
        lang = ["en", "de", "fr"][i % 3]
        n_words = 5 + (i * 13) % 40
        rows.append((i, lang, " ".join(f"t{i}w{j}" for j in range(n_words))))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    budgets = {"en": 200, "de": 80, "fr": 0}
    out = S.token_budget_sample(df, "doc_id", "lang", "text", budgets,
                                default_budget=0, seed="tb")
    got = out.collect()
    assert out.columns == ["doc_id", "lang", "text"]  # helpers dropped
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(len(r["text"].split()))
    assert "fr" not in by_lang  # zero budget keeps nothing
    for lang, toks in by_lang.items():
        total = sum(toks)
        assert total >= budgets[lang]  # budget reached (crossing doc kept)
        assert total - max(toks) < budgets[lang]  # overshoot < one doc
    # Determinism across partitioning.
    got2 = {r["doc_id"] for r in S.token_budget_sample(
        df.repartition(7), "doc_id", "lang", "text", budgets, 0, seed="tb"
    ).collect()}
    assert got2 == {r["doc_id"] for r in got}
    # Different seed -> different (but valid) selection.
    got3 = {r["doc_id"] for r in S.token_budget_sample(
        df, "doc_id", "lang", "text", budgets, 0, seed="other"
    ).collect()}
    assert got3 != got2
    # DuckDB twin parity.
    con = duckdb.connect()
    con.execute("CREATE TABLE tb (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO tb VALUES (?,?,?)", rows)
    sql = S.sql_token_budget_sample("SELECT * FROM tb", "doc_id", "lang",
                                    "text", budgets, 0, seed="tb")
    oracle = {r[0] for r in con.execute(
        f"SELECT doc_id FROM ({sql})").fetchall()}
    assert oracle == got2


# -- leakage-safe splits (X115) ----------------------------------------------


def test_assign_split_leakage_safe(spark):
    import pyspark.sql.functions as F

    from data_pipeline_spark.operators.sampling import (
        assign_split,
        split_leakage,
    )

    # 300 hosts x 4 pages each; split must be constant per host
    df = spark.range(0, 1200).select(
        F.concat(F.lit("h"), (F.col("id") % 300).cast("string")).alias("host"),
        F.col("id").alias("page"),
    )
    out = assign_split(df, "host", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert split_leakage(out, "host").count() == 0
    shares = {
        r["split"]: r["n"]
        for r in out.select("host", "split").distinct()
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(shares) == {"train", "val", "test"}
    # entity-share accuracy: binomial over 300 hosts, ~3 sigma bounds
    assert abs(shares["train"] / 300 - 0.8) < 0.07
    assert abs(shares["val"] / 300 - 0.1) < 0.06
    assert abs(shares["test"] / 300 - 0.1) < 0.06
    # deterministic across reruns / physical layouts
    again = assign_split(
        df.repartition(7), "host", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_assign_split_guards_and_twin(spark):
    import duckdb
    import pyspark.sql.functions as F
    import pytest as _pytest

    from data_pipeline_spark.operators.sampling import (
        assign_split,
        sql_assign_split,
    )

    df = spark.range(0, 200).select(
        F.concat(F.lit("site"), F.col("id").cast("string")).alias("host")
    )
    with _pytest.raises(ValueError, match="sum to 1"):
        assign_split(df, "host", {"train": 0.5, "val": 0.1})
    with _pytest.raises(ValueError, match="at least two"):
        assign_split(df, "host", {"train": 1.0})
    fr = {"train": 0.9, "heldout": 0.1}
    got = sorted(
        map(tuple, assign_split(df, "host", fr).collect())
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = sorted(
        map(
            tuple,
            con.sql(
                f"SELECT host, {sql_assign_split('host', fr)} AS split FROM t"
            ).fetchall(),
        )
    )
    assert got == want


def test_token_budget_sample_multilingual(spark):
    import duckdb
    import pyspark.sql.functions as F

    from data_pipeline_spark.operators.sampling import (
        sql_token_budget_sample,
        token_budget_sample,
    )

    # 20 CJK docs of 50 unspaced chars each: whitespace counting sees 1
    # token per doc and would keep ALL of them under a 200-token budget;
    # multilingual counting (50/doc) keeps ~4.
    zh = "今天天气很好啊" * 8  # 56 chars
    df = spark.createDataFrame(
        [(f"u{i}", "zh", zh) for i in range(20)],
        "url string, lang string, text string",
    )
    ws = token_budget_sample(df, "url", "lang", "text", {"zh": 200})
    ml = token_budget_sample(
        df, "url", "lang", "text", {"zh": 200}, multilingual=True
    )
    assert ws.count() == 20          # budget never fills: starvation bug
    assert ml.count() == 4           # 56 tokens/doc -> 4th doc crosses 200
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = sorted(
        r[0] for r in con.sql(sql_token_budget_sample(
            "SELECT * FROM t", "url", "lang", "text", {"zh": 200},
            multilingual=True,
        )).fetchall()
    )
    assert sorted(r["url"] for r in ml.collect()) == want


def test_split_neardup_leakage(spark):
    """Syndicated content crossing hosts lands in different entity-hash
    splits; the near-dup audit surfaces exactly those pairs."""
    import pyspark.sql.functions as F

    from data_pipeline_spark.operators.sampling import (
        assign_split,
        split_neardup_leakage,
    )

    syndicated = (
        "breaking news wire story repeated verbatim across many partner "
        "sites with only the byline differing between the copies of it "
    ) * 3
    rows = []
    # 40 hosts with unique articles
    for i in range(40):
        rows.append((f"h{i}.com/a{i}", f"h{i}.com",
                     f"entirely unique article {i} " + " ".join(
                         f"w{i}x{j}" for j in range(40))))
    # the same wire story on two different hosts (+ tiny suffix)
    rows.append(("h1.com/wire", "h1.com", syndicated + " via h1"))
    rows.append(("h2.com/wire", "h2.com", syndicated + " via h2"))
    df = spark.createDataFrame(rows, "url string, host string, text string")
    # force the two wire hosts into different splits deterministically:
    # try seeds until they split apart (seeded md5 -> stable choice)
    for seed in ("split", "s1", "s2", "s3", "s4"):
        out = assign_split(
            df, "host", {"train": 0.5, "eval": 0.5}, seed=seed
        )
        two = {
            r["split"]
            for r in out.where(F.col("host").isin("h1.com", "h2.com")).collect()
        }
        if len(two) == 2:
            break
    assert len(two) == 2, "pick another seed list"
    leaks = split_neardup_leakage(
        out, "url", "text", num_hashes=24, bands=6, threshold=0.5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in leaks} == {
        ("h1.com/wire", "h2.com/wire")
    }
    assert all(r["split_a"] != r["split_b"] for r in leaks)
