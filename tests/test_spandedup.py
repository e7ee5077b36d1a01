"""Exact repeated-span (ExactSubstr) dedup: hand-checked semantics, a
brute-force Python oracle, and the DuckDB twin used by the contracts."""

import random
import re

import duckdb
import pandas as pd

from data_pipeline_spark.operators.spandedup import (
    dup_spans,
    span_dedup,
    sql_dup_spans,
    sql_span_dedup,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _result(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def test_cross_doc_span_removed_from_later_doc(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "intro the quick brown fox jumps away now"),
    ]
    out = _result(span_dedup(_df(spark, rows), "doc_id", "text", k=4))
    # doc 1 holds both duplicated windows' first occurrences -> untouched
    assert out[1] == rows[0][1]
    # doc 2 loses tokens 1..5 (union of the two losing windows)
    assert out[2] == "intro away now"


def test_self_overlap_keeps_first_window_only(spark):
    out = _result(span_dedup(_df(spark, [(1, "x x x x")]), "doc_id", "text", k=2))
    assert out[1] == "x"


def test_no_duplicates_normalizes_runs_but_keeps_newlines(spark):
    # horizontal whitespace runs collapse to one space; a run containing a
    # newline collapses to one '\n' (line structure must survive for the
    # downstream line-based quality rules)
    rows = [(1, "  a  b\tc \n d "), (2, "e f g")]
    out = _result(span_dedup(_df(spark, rows), "doc_id", "text", k=2))
    assert out == {1: "a b c\nd", 2: "e f g"}


def test_newlines_survive_span_removal(spark):
    boiler = "subscribe to our newsletter today please"
    rows = [
        (1, f"first line\n{boiler}\nlast line"),
        (2, f"other intro\n{boiler}\nunique tail here"),
    ]
    out = _result(span_dedup(_df(spark, rows), "doc_id", "text", k=6))
    # doc 1 holds the span's first occurrence: fully intact, 3 real lines
    assert out[1] == rows[0][1]
    # doc 2 loses the boilerplate line but keeps ITS line breaks: the
    # token after the removed span still rejoins with its original '\n'
    assert out[2] == "other intro\nunique tail here"


def test_short_and_empty_docs_pass_through(spark):
    rows = [(1, "one two"), (2, ""), (3, "a b c a b c")]
    out = _result(span_dedup(_df(spark, rows), "doc_id", "text", k=3))
    assert out[1] == "one two"
    assert out[2] == ""
    # within-doc repeat: "a b c" at p0 and p3 -> later occurrence stripped
    assert out[3] == "a b c"


def test_dup_spans_report(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "intro the quick brown fox jumps away now"),
    ]
    rep = {
        r["gram"]: (r["n_docs"], r["n_occs"], r["first_doc"])
        for r in dup_spans(_df(spark, rows), "doc_id", "text", k=4).collect()
    }
    assert rep == {
        "the quick brown fox": (2, 2, 1),
        "quick brown fox jumps": (2, 2, 1),
    }


def _python_oracle(rows, k):
    """Brute-force ExactSubstr with the module's exact tie rules."""
    toks = {i: re.split(r"\s+", t.strip()) if t.strip() else [] for i, t in rows}
    occs = {}
    for i, tk in sorted(toks.items()):
        for p in range(len(tk) - k + 1):
            occs.setdefault(" ".join(tk[p : p + k]), []).append((i, p))
    removed = {i: set() for i in toks}
    for g, hits in occs.items():
        if len(hits) > 1:
            for i, p in sorted(hits)[1:]:
                removed[i].update(range(p, p + k))
    return {
        i: " ".join(t for x, t in enumerate(tk) if x not in removed[i])
        for i, tk in toks.items()
    }


def test_randomized_vs_python_oracle(spark):
    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]
    for k in (2, 3, 5):
        out = _result(span_dedup(_df(spark, rows), "doc_id", "text", k=k))
        assert out == _python_oracle(rows, k), f"k={k}"


def test_duckdb_twin_parity(spark):
    rng = random.Random(11)
    vocab = ["w0", "w1", "w2", "w3", "w4", "w5"]
    # random separators exercise the newline-preserving rebuild in both
    # engines, not just the gram semantics
    seps = [" ", " ", " ", "\n", "  ", " \n "]
    rows = [
        (
            i,
            "".join(
                (rng.choice(seps) if x else "") + rng.choice(vocab)
                for x in range(rng.randint(0, 25))
            ),
        )
        for i in range(60)
    ]
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))

    strip_sql = sql_span_dedup("SELECT doc_id, text FROM docs", "doc_id", "text", k=3)
    duck = {r[0]: r[1] for r in con.sql(strip_sql).fetchall()}
    assert _result(span_dedup(_df(spark, rows), "doc_id", "text", k=3)) == duck

    rep_sql = sql_dup_spans("SELECT doc_id, text FROM docs", "doc_id", "text", k=3)
    duck_rep = {r[0]: r[1:] for r in con.sql(rep_sql).fetchall()}
    spark_rep = {
        r["gram"]: (r["n_docs"], r["n_occs"], r["first_doc"])
        for r in dup_spans(_df(spark, rows), "doc_id", "text", k=3).collect()
    }
    assert spark_rep == duck_rep
