"""operators/qualityclassifier.py — NB quality filter, train/apply split.

Hand-computed oracles for the smoothed log-likelihood ratios, the prior,
and scoring semantics (unseen-term zero evidence, empty-doc prior, tf
multipliers); a deterministic separable-corpus generalization check;
frozen-model save/load parity; hashed parity; DuckDB twin parity; and
plan pins (no per-row Python, no cartesian beyond the 1-row broadcasts).
"""

import math

import duckdb
import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.qualityclassifier import (
    load_model,
    save_model,
    score_documents,
    sql_score_documents,
    sql_train_classifier,
    top_terms,
    train_classifier,
)

LN4 = math.log(4.0)          # llr("good") in the tiny corpus below
LN2_4 = math.log(2.4)        # llr("fine")
LN_BAD = math.log(0.1 / 0.375)  # llr("bad") == llr("spam")


def _train_df(spark):
    # pos: good:2 fine:1 (T_pos=3); neg: bad:1 spam:1 (T_neg=2); V=4; a=0.5
    return spark.createDataFrame(
        [(1, "good good fine", True), (2, "bad spam", False)],
        "doc_id long, text string, label boolean",
    )


class TestTrain:
    def test_hand_computed_llr_and_prior(self, spark):
        model = train_classifier(_train_df(spark), "text", F.col("label"))
        rows = {r["term"]: r for r in model.collect()}
        assert rows["good"]["llr"] == pytest.approx(LN4, abs=1e-12)
        assert rows["fine"]["llr"] == pytest.approx(LN2_4, abs=1e-12)
        assert rows["bad"]["llr"] == pytest.approx(LN_BAD, abs=1e-12)
        assert rows["spam"]["llr"] == pytest.approx(LN_BAD, abs=1e-12)
        # balanced 1v1 docs -> prior ln(2/2) = 0, constant on every row
        assert all(r["log_prior_odds"] == 0.0 for r in rows.values())

    def test_label_pred_required(self, spark):
        with pytest.raises(ValueError, match="label_pred is required"):
            train_classifier(_train_df(spark))

    def test_empty_vocabulary_model_keeps_prior(self, spark):
        # Training texts tokenize to nothing -> 0 evidence terms, but the
        # sentinel row still carries the prior; scoring must yield the
        # prior and a real boolean pred, never NULLs.
        df = spark.createDataFrame(
            [(1, "", True), (2, "   ", True), (3, "", False)],
            "doc_id long, text string, label boolean",
        )
        model = train_classifier(df, "text", F.col("label"))
        assert model.count() == 1  # sentinel only
        prior = math.log(3.0 / 2.0)  # ln((2+1)/(1+1))
        docs = spark.createDataFrame(
            [(10, "anything at all"), (11, "")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in score_documents(docs, model).collect()}
        for i in (10, 11):
            assert got[i]["log_odds"] == round(prior, 6)
            assert got[i]["pred"] is True

    def test_hashed_model_stores_longs(self, spark):
        model = train_classifier(
            _train_df(spark), "text", F.col("label"), hashed=True
        )
        assert dict(model.dtypes)["term"] == "bigint"

    def test_prior_unbalanced_and_null_label(self, spark):
        df = spark.createDataFrame(
            [(1, "a", True), (2, "b", True), (3, "c", True), (4, "d", None)],
            "doc_id long, text string, label boolean",
        )
        model = train_classifier(df, "text", F.col("label"))
        # NULL label counts as negative: prior = ln((3+1)/(1+1)) = ln 2
        assert model.select("log_prior_odds").first()[0] == pytest.approx(
            math.log(2.0), abs=1e-12
        )


class TestScore:
    def test_hand_computed_scores(self, spark):
        train = _train_df(spark)
        model = train_classifier(train, "text", F.col("label"))
        docs = spark.createDataFrame(
            [
                (10, "good bad unseen"),   # LN4 + LN_BAD + 0
                (11, ""),                  # tokenless -> prior only
                (12, "spam spam"),         # tf multiplier: 2 * LN_BAD
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in score_documents(docs, model).collect()}
        assert got[10]["n_tokens"] == 3
        assert got[10]["log_odds"] == round(LN4 + LN_BAD, 6)
        assert got[10]["pred"] is True
        assert got[11]["n_tokens"] == 0
        assert got[11]["log_odds"] == 0.0
        assert got[11]["pred"] is False  # strict >
        assert got[12]["log_odds"] == round(2 * LN_BAD, 6)
        assert got[12]["pred"] is False

    def test_generalizes_on_separable_corpus(self, spark):
        # Disjoint vocabularies; held-out docs share words with training
        # ones but are never themselves seen. NB must classify all of them.
        rows = []
        for i in range(40):
            quality = i % 2 == 0
            vocab = ["science", "method", "data", "proof"] if quality else [
                "click", "win", "free", "pills"
            ]
            text = " ".join(vocab[j % 4] for j in range(i % 5 + 3))
            rows.append((i, text, quality))
        df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
        model = train_classifier(
            df.filter(F.col("doc_id") < 20), "text", F.col("label")
        )
        held = df.filter(F.col("doc_id") >= 20)
        scored = score_documents(held, model)
        joined = scored.join(held.select("doc_id", "label"), "doc_id")
        assert joined.filter(F.col("pred") != F.col("label")).count() == 0

    def test_frozen_model_roundtrip(self, spark, tmp_path):
        train = _train_df(spark)
        model = train_classifier(train, "text", F.col("label"))
        path = str(tmp_path / "nbmodel")
        save_model(model, path)
        docs = spark.createDataFrame(
            [(10, "good bad"), (11, "fine spam spam")], "doc_id long, text string"
        )
        live = sorted(map(tuple, score_documents(docs, model).collect()))
        frozen = sorted(
            map(tuple, score_documents(docs, load_model(spark, path)).collect())
        )
        assert live == frozen

    def test_hashed_parity(self, spark):
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
        )
        pred = F.col("doc_id") % 3 == 0
        raw_m = train_classifier(docs, "text", pred)
        hash_m = train_classifier(docs, "text", pred, hashed=True)
        raw = sorted(map(tuple, score_documents(docs, raw_m).collect()))
        hashed = sorted(
            map(tuple, score_documents(docs, hash_m, hashed=True).collect())
        )
        assert raw == hashed

    def test_top_terms_order(self, spark):
        model = train_classifier(_train_df(spark), "text", F.col("label"))
        pos = [r["term"] for r in top_terms(model, 2).collect()]
        neg = [r["term"] for r in top_terms(model, 2, positive=False).collect()]
        assert pos == ["good", "fine"]
        assert neg == ["bad", "spam"]  # equal llr -> term tie-break


class TestTwinParity:
    def test_duckdb_twin_matches(self, spark):
        df = spark.createDataFrame(
            [
                (1, "alpha beta beta gamma", True),
                (2, "delta spamword spamword", False),
                (3, "alpha gamma gamma", True),
                (4, "spamword delta junk", False),
                (5, "", True),
            ],
            "doc_id long, text string, label boolean",
        )
        model = train_classifier(df, "text", F.col("label"))
        scored = score_documents(df, model)
        spark_rows = sorted(
            (r["doc_id"], r["n_tokens"], r["log_odds"], r["pred"])
            for r in scored.collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE src (doc_id BIGINT, text VARCHAR, label BOOLEAN)"
        )
        con.executemany(
            "INSERT INTO src VALUES (?, ?, ?)",
            [(r[0], r[1], r[2]) for r in df.collect()],
        )
        sql = sql_score_documents(
            "SELECT doc_id, text FROM src",
            sql_train_classifier(
                "SELECT doc_id, text, label FROM src", "text", "label"
            ),
            "doc_id",
            "text",
        )
        duck_rows = sorted(
            (r[0], r[1], r[2], r[3]) for r in con.execute(sql).fetchall()
        )
        assert spark_rows == duck_rows


class TestPlans:
    def test_score_plan_native(self, spark):
        train = _train_df(spark)
        model = train_classifier(train, "text", F.col("label"))
        docs = spark.createDataFrame(
            [(10, "good bad")], "doc_id long, text string"
        )
        plan = score_documents(docs, model)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
