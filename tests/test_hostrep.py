"""Host reputation rollup: dup accounting, top-lang tiebreak, verdict
thresholds, and DuckDB twin parity."""

import random

import duckdb
import pandas as pd

from data_pipeline_spark.operators.hostrep import (
    BLOCK_DUP_RATIO,
    REVIEW_AVG_QUALITY,
    REVIEW_DUP_RATIO,
    host_reputation,
    sql_host_reputation,
)

MIRROR = "the quick brown fox jumps over the lazy dog and runs away home"


def _verdict(avg_quality, dup_ratio):
    if dup_ratio >= BLOCK_DUP_RATIO:
        return "block"
    if dup_ratio >= REVIEW_DUP_RATIO or avg_quality < REVIEW_AVG_QUALITY:
        return "review"
    return "keep"


def test_dup_accounting_and_verdicts(spark):
    rows = [
        # mirror.example: 3 of 4 docs are copies (one shared with other.example)
        ("mirror.example", MIRROR),
        ("mirror.example", MIRROR),
        ("mirror.example", MIRROR),
        ("mirror.example", "an original and is the sentence lives only here"),
        # other.example hosts one copy of the mirror text + two originals
        ("other.example", MIRROR),
        ("other.example", "it was the best of times it was the blurst of times"),
        ("other.example", "some words which are not seen anywhere else at all"),
    ]
    df = spark.createDataFrame(rows, "host string, text string")
    out = {r["host"]: r.asDict() for r in host_reputation(df, "host", "text").collect()}
    m, o = out["mirror.example"], out["other.example"]
    assert m["n_docs"] == 4 and o["n_docs"] == 3
    assert m["dup_ratio"] == 0.75          # 3 of 4 share a corpus-wide fp
    assert round(o["dup_ratio"], 4) == round(1 / 3, 4)  # the mirrored copy
    for r in (m, o):
        assert r["verdict"] == _verdict(r["avg_quality"], r["dup_ratio"])
    assert m["verdict"] == "block"


def test_top_lang_tiebreak_is_lexicographic(spark):
    # Two docs, same host, languages predicted differently with equal counts
    # -> tie broken by min(lang). Use texts the n-gram lang-id separates.
    rows = [
        ("h", "the quick brown fox and the lazy dog with some other words"),
        ("h", "der schnelle braune fuchs und der faule hund mit anderen worten"),
    ]
    df = spark.createDataFrame(rows, "host string, text string")
    row = host_reputation(df, "host", "text").collect()[0]
    from data_pipeline_spark.functions import textstats as TS
    import pyspark.sql.functions as F

    preds = sorted(r[0] for r in df.select(TS.lang_id(F.col("text"))).collect())
    if preds[0] != preds[1]:
        # genuine tie between two languages: the lexicographically
        # smaller one wins and holds half the docs
        assert row["top_lang_share"] == 0.5
        assert row["top_lang"] == preds[0]
    else:
        assert row["top_lang_share"] == 1.0


def test_duckdb_twin_parity(spark):
    rng = random.Random(5)
    vocab = ["the", "and", "der", "und", "le", "et", "alpha", "beta", "gamma"]
    rows = []
    shared = " ".join(rng.choice(vocab) for _ in range(12))
    for i in range(80):
        host = f"h{i % 7}.example"
        text = (
            shared
            if rng.random() < 0.3
            else " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 20)))
        )
        rows.append((host, text))
    df = spark.createDataFrame(rows, "host string, text string")
    spark_rows = sorted(
        tuple(r) for r in host_reputation(df, "host", "text").collect()
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["host", "text"]))
    duck_rows = sorted(
        tuple(r)
        for r in con.sql(
            sql_host_reputation("SELECT host, text FROM docs", "host", "text")
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_null_text_docs_still_count(spark):
    from data_pipeline_spark.operators.hostrep import host_reputation

    df = spark.createDataFrame(
        [("h1.com", "good interesting varied text content here"),
         ("h1.com", None), ("h2.com", None), ("h2.com", None)],
        "host string, text string",
    )
    out = {r["host"]: r for r in host_reputation(df, "host", "text").collect()}
    # NULL-text docs participate (they fingerprint together as dups)
    assert out["h1.com"]["n_docs"] == 2
    assert out["h2.com"]["n_docs"] == 2
    assert out["h2.com"]["dup_ratio"] == 1.0  # all-null host = pure dups
    assert out["h2.com"]["verdict"] in ("review", "block")
