"""Repetition metrics + Gopher rules: Python-oracle checks and DuckDB
twin parity (the same comparison the driver's correctness gate makes)."""

import re

import duckdb
import pytest

from data_pipeline_spark.functions import quality as Q

DOCS = [
    (0, "the cat sat on the mat the cat sat"),
    (1, "a\na\nb\n- item one\n- item two\nwait...\n"),
    (2, ""),
    (3, "word"),
    (4, "x " * 60 + "the of and to in is it for on with"),
    (5, "Line one normal text here\nLine one normal text here\nunique tail"),
    (7, "crlf dup...\r\ncrlf dup...\r\n\tindented\r\n"),  # CRLF + tab edges
    (6, "An ordinary paragraph of english text that is long enough to "
        "pass the word count rule " * 3 + "with the and of to in for on it as."),
]


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE qdocs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO qdocs VALUES (?,?)", DOCS)
    return con


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_dup_frac(items):
    return 0.0 if not items else round(1.0 - len(set(items)) / len(items), 6)


def py_tokens(text):
    # Engine semantics: ALL edge whitespace stripped (EDGE_WS_RE), then
    # split on \s+ — no phantom empty tokens at text edges.
    t = text.strip()
    return [] if t == "" else re.split(r"\s+", t)


def py_ngrams(text, n):
    toks = py_tokens(text)
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def test_dup_fracs_match_python(qdf):
    rows = {
        r["doc_id"]: r
        for r in qdf.select(
            "doc_id",
            Q.dup_line_frac("text").alias("dl"),
            Q.dup_ngram_frac("text", 1).alias("d1"),
            Q.dup_ngram_frac("text", 3).alias("d3"),
        ).collect()
    }
    for doc_id, text in DOCS:
        lines = [ln.strip() for ln in re.split(r"\r?\n", text) if ln.strip()]
        assert rows[doc_id]["dl"] == py_dup_frac(lines), doc_id
        assert rows[doc_id]["d1"] == py_dup_frac(py_ngrams(text, 1)), doc_id
        assert rows[doc_id]["d3"] == py_dup_frac(py_ngrams(text, 3)), doc_id


def test_top_ngram_char_frac_python_oracle(spark):
    # "aa bb aa bb aa" → top 2-gram is "bb aa" (count 2, ties to greatest
    # gram); covered chars = 2*5 = 10 of 14.
    df = spark.createDataFrame([(0, "aa bb aa bb aa")], "doc_id long, text string")
    row = Q.repetition_stats(df, "doc_id", "text").collect()[0]
    assert row["top_ngram_char_frac"] == round(10 / 14, 6)
    assert row["dup_2gram_frac"] == 0.5  # 4 grams, 2 distinct


def test_repetition_duckdb_twin(qdf):
    got = sorted(
        tuple(r) for r in Q.repetition_stats(qdf, "doc_id", "text").collect()
    )
    sql = Q.sql_repetition_stats("SELECT * FROM qdocs", "doc_id", "text")
    oracle = sorted(tuple(r) for r in _duck().execute(sql).fetchall())
    assert got == oracle


def test_gopher_flags_duckdb_twin(qdf):
    cols = [c.alias(k) for k, c in Q.gopher_flags("text").items()]
    got = sorted(
        tuple(r)
        for r in qdf.select("doc_id", *cols, Q.gopher_pass("text").alias("p"))
        .collect()
    )
    fs = Q.sql_gopher_flags("text")
    sel = ", ".join(fs[k] for k in Q.FLAG_NAMES)
    oracle = sorted(
        tuple(r)
        for r in _duck()
        .execute(
            f"SELECT doc_id, {sel}, {Q.sql_gopher_pass('text')} FROM qdocs"
        )
        .fetchall()
    )
    assert got == oracle


def test_gopher_semantics(qdf):
    rows = {
        r["doc_id"]: r
        for r in qdf.select(
            "doc_id", *[c.alias(k) for k, c in Q.gopher_flags("text").items()]
        ).collect()
    }
    assert not rows[2]["word_count_ok"]  # empty
    assert not rows[0]["word_count_ok"]  # 9 words < 50
    assert rows[6]["word_count_ok"] and rows[6]["stopwords_ok"]
    assert rows[6]["alpha_words_ok"] and rows[6]["symbol_ratio_ok"]
    # doc 1: 2 of 6 non-empty lines are bullets (frac 0.333 ≤ 0.9 → ok),
    # 1 of 6 ends with "..." (0.167 ≤ 0.3 → ok)
    assert rows[1]["bullet_lines_ok"] and rows[1]["ellipsis_lines_ok"]


def test_repetition_all_native(qdf):
    """No Python UDF in the plan — pure codegen expressions."""
    plan = Q.repetition_stats(qdf, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
