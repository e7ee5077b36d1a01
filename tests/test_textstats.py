"""Unit tests for text-analysis operators (token counts, fingerprint,
quality, lang-id) — native-column semantics on handcrafted rows."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.functions import textstats as TS


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox and the lazy dog in the yard is that it"),
        (2, ""),
        (3, "   "),
        (4, "el la de que y en un los el la"),
        (5, "one-two, three! 42 x"),
        (6, "Der und die das ist nicht ein zu der und"),
        (7, "word " * 20),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _map(df, col):
    return {r["doc_id"]: r["v"] for r in df.select("doc_id", col.alias("v")).collect()}


def test_token_count(docs):
    m = _map(docs, TS.token_count(F.col("text")))
    assert m[1] == 14
    assert m[2] == 0
    assert m[3] == 0  # whitespace-only → 0 tokens
    assert m[7] == 20


def test_bpe_token_count(docs):
    m = _map(docs, TS.bpe_token_count(F.col("text")))
    # one-two, three! 42 x → one, -, two, ",", three, !, 42, x = 8
    assert m[5] == 8
    assert m[2] == 0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO WORLD  ")],
        "doc_id long, text string",
    )
    fps = _map(df, TS.fingerprint(F.col("text")))
    assert fps[1] == fps[2] == fps[3]
    assert len(fps[1]) == 32


def test_quality_score_bounds_and_signal(docs):
    m = _map(docs, TS.quality_score(F.col("text")))
    for v in m.values():
        assert v is not None and 0.0 <= v <= 1.0
    assert m[2] == 0.0  # empty text → too short
    assert m[1] == 1.0  # ≥10 tokens, no punctuation, plenty of stopwords


def test_lang_id(docs):
    m = _map(docs, TS.lang_id(F.col("text")))
    assert m[1] == "en"
    assert m[4] == "es"
    assert m[6] == "de"  # lowercased markers
    assert m[2] == "und"
    assert m[7] == "und"  # no markers at all


def test_lang_id_tie_breaks_by_declaration_order(spark):
    # 'la' is a marker for both es and fr; 'de' for es; ties must resolve
    # to the earlier language in LANG_MARKERS order (es before fr).
    df = spark.createDataFrame([(1, "la la")], "doc_id long, text string")
    assert _map(df, TS.lang_id(F.col("text")))[1] == "es"


# -- multilingual token counting (X117) --------------------------------------


def test_multilingual_token_count(spark):
    import duckdb
    import pyspark.sql.functions as F

    from data_pipeline_spark.functions.textstats import (
        bpe_token_count,
        multilingual_token_count,
        sql_multilingual_token_count,
        token_count,
    )

    rows = [
        ("en", "Hello, world! 42 times."),
        ("zh", "\u4eca\u5929\u5929\u6c14\u5f88\u597d"),  # 6 han chars
        ("ko", "\uc548\ub155\ud558\uc138\uc694"),          # 5 hangul
        ("th", "\u0e2a\u0e27\u0e31\u0e2a\u0e14\u0e35"),  # 6 thai chars
        ("ru", "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"),  # 2 words
        ("mix", "GPU\u52a0\u901f 2x faster \u3067\u3059"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "tag string, text string")
    got = {
        r["tag"]: (r["ml"], r["ws"], r["bpe"])
        for r in df.select(
            "tag",
            multilingual_token_count(F.col("text")).alias("ml"),
            token_count(F.col("text")).alias("ws"),
            bpe_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    # pure-ASCII: identical to the BPE-ish counter (no behavior change)
    assert got["en"][0] == got["en"][2]
    # unspaced scripts: one per char, where whitespace sees ONE token
    assert got["zh"] == (6, 1, 6)
    assert got["ko"] == (5, 1, 5)
    assert got["th"] == (6, 1, 6)
    # spaced non-latin: letter RUNS, where BPE-ish counts every char
    assert got["ru"] == (2, 2, 9)
    # mixed: GPU + \u52a0 + \u901f + 2 + x + faster + \u3067 + \u3059
    assert got["mix"][0] == 8
    assert got["empty"][0] == 0
    # DuckDB twin parity
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = dict(
        con.sql(
            f"SELECT tag, {sql_multilingual_token_count('text')} FROM t"
        ).fetchall()
    )
    assert {k: v[0] for k, v in got.items()} == want
