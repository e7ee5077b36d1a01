"""Interpolated bigram LM perplexity (X98): hand-built Python oracle,
DuckDB twin parity, spine completeness, plan pins."""

import math

import duckdb
import pytest

from data_pipeline_spark.operators.lmfilter import (
    bigram_perplexity,
    sql_bigram_perplexity,
)
from data_pipeline_spark.operators.sampling import keep_predicate

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "The CAT sat"),            # case folding
    (3, ""),                       # empty -> n_bigrams 0, NULL scores
    (4, "single"),                 # 1 token -> n_bigrams 0, NULL scores
    (5, "  the\tcat  \n sat on a mat  "),  # wild whitespace
    (6, "zebra quark boson gluon"),        # mostly-OOV doc
    (7, "the the the the"),        # repeated bigram collapse path
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", DOCS)
    return con


def _py_oracle(rows, train_ids, l2=0.7, l1=0.25):
    """Driver-side reimplementation from first principles."""
    toks = {i: (t.lower().split() if t.strip() else []) for i, t in rows}
    uni, big = {}, {}
    for i in train_ids:
        for w in toks[i]:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks[i], toks[i][1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    hist = {}
    for (a, _), c in big.items():
        hist[a] = hist.get(a, 0) + c
    n = float(sum(uni.values()))
    v = float(len(uni))
    l0 = 1 - l2 - l1
    out = {}
    for i, _ in rows:
        bgs = list(zip(toks[i], toks[i][1:]))
        if not bgs:
            out[i] = (0, None, None)
            continue
        nll = 0.0
        for a, b in bgs:
            p = (
                l2 * (big.get((a, b), 0) / hist[a] if hist.get(a) else 0.0)
                + l1 * (uni.get(b, 0) / n if n else 0.0)
                + l0 / (v + 1)
            )
            nll += -math.log(p)
        xent = round(nll / len(bgs), 6)
        out[i] = (len(bgs), xent, round(math.exp(xent), 6))
    return out


def test_hand_oracle_parity(spark, docs):
    # recover the engine's own deterministic train split, then check every
    # doc's score against the from-scratch python model
    marked = docs.select(
        "doc_id", keep_predicate("doc_id", 0.5, "lmtrain").alias("keep")
    ).collect()
    train_ids = {r["doc_id"] for r in marked if r["keep"]}
    assert 0 < len(train_ids) < len(DOCS)  # both sides of the split hit
    exp = _py_oracle(DOCS, train_ids)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent"], r["ppl"])
        for r in bigram_perplexity(docs, "doc_id", "text").collect()
    }
    assert set(got) == set(exp)  # spine: every doc present, incl. 3 and 4
    for i in exp:
        assert got[i] == exp[i], (i, got[i], exp[i])


def test_duckdb_twin_parity(spark, docs):
    got = sorted(
        (r["doc_id"], r["n_bigrams"], r["xent"], r["ppl"])
        for r in bigram_perplexity(docs, "doc_id", "text").collect()
    )
    want = sorted(
        (r[0], r[1], r[2], r[3])
        for r in _duck().execute(
            sql_bigram_perplexity("SELECT doc_id, text FROM documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want


def test_degenerate_docs_and_lambda_guard(spark, docs):
    out = {r["doc_id"]: r for r in bigram_perplexity(docs, "doc_id", "text").collect()}
    for i in (3, 4):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["xent"] is None and out[i]["ppl"] is None
    assert out[7]["n_bigrams"] == 3  # repeats collapse to one key, k=3
    # OOV doc still gets a finite score (uniform floor is never zero)
    assert out[6]["xent"] is not None and out[6]["xent"] > 0
    with pytest.raises(ValueError):
        bigram_perplexity(docs, "doc_id", "text", l2=0.8, l1=0.3)


def test_plan_shape(spark, docs):
    plan = bigram_perplexity(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the vocabulary joins must NOT broadcast the count tables; the only
    # broadcast is the one-row scalar frame
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
