"""Webtext QA: Unicode script profiling, soft-404 detection, compression
ratio. Fixtures plant multi-script, mojibake, and error-page text that the
synthetic documents table (pure ASCII) never exercises, and the DuckDB twin
runs on the SAME fixtures so oracle parity is proven on non-ASCII input,
not just on the easy contract data."""

import duckdb
import pandas as pd
import pytest

import pyspark.sql.functions as F

from data_pipeline_spark.functions import webqa as WQ

DOCS = [
    # (doc_id, text)
    (1, "the quick brown fox jumps over the lazy dog " * 5),
    (2, "Быстрая коричневая лиса прыгает через ленивую собаку"),
    (3, "学而时习之不亦说乎有朋自远方来不亦乐乎"),
    (4, "ひらがなとカタカナのテキスト"),
    (5, "한국어 텍스트 샘플입니다"),
    (6, "mixed text с кириллицей and latin words everywhere here"),
    (7, "mojibake �� broken decode � here"),
    (8, "ctl\x01\x02\x03\x04\x05\x06\x07\x08chars"),  # 8 ctrl in 16 cp
    (9, "1234567890 !!! ???"),  # no script chars at all
    (10, None),
    (11, "ΑΒΓ αβγ ΑΒΓ"),  # greek
    (12, "abc абв"),  # 3 latin vs 3 cyrillic — tie → latin
]

SOFT404_DOCS = [
    (1, "Sorry, the page you requested could not be found. Error 404."),
    (2, "word " * 100 + "page not found"),  # one phrase, long → score 2
    (3, "short text only"),  # short, no phrase → score 1
    (4, "This page does not exist and is no longer available. " + "w " * 100),
    (5, "a perfectly normal long article " * 20),
    (6, None),
]


@pytest.fixture(scope="module")
def profile_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    out = WQ.script_profile(df, "doc_id", "text")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_script_counts(profile_rows):
    r = profile_rows
    assert r[1]["dominant_script"] == "latin" and r[1]["cyrillic_cnt"] == 0
    assert r[2]["dominant_script"] == "cyrillic" and r[2]["latin_cnt"] == 0
    assert r[3]["dominant_script"] == "cjk"
    assert r[3]["cjk_cnt"] == len("学而时习之不亦说乎有朋自远方来不亦乐乎")
    assert r[4]["dominant_script"] == "kana"
    assert r[5]["dominant_script"] == "hangul"
    assert r[6]["latin_cnt"] > 0 and r[6]["cyrillic_cnt"] > 0
    assert r[11]["dominant_script"] == "greek"


def test_mojibake_and_control(profile_rows):
    r = profile_rows
    assert r[7]["replacement_cnt"] == 3 and r[7]["is_mojibake"]
    # 8 control chars over 16 codepoints: ctrl*20 > n_cp
    assert r[8]["ctrl_cnt"] == 8 and r[8]["is_mojibake"]
    assert not r[1]["is_mojibake"]
    # replacement char is not a script char: counted under other_cnt
    assert r[7]["other_cnt"] >= 3


def test_no_script_and_null(profile_rows):
    r = profile_rows
    assert r[9]["dominant_script"] == "none"
    assert r[9]["other_cnt"] == r[9]["n_cp"] - r[9]["latin_cnt"]
    assert r[10]["n_cp"] is None and r[10]["dominant_script"] == "none"


def test_tie_break_is_priority_order(profile_rows):
    r = profile_rows[12]
    assert r["latin_cnt"] == r["cyrillic_cnt"] == 3
    assert r["dominant_script"] == "latin"


def test_counts_partition_the_text(profile_rows):
    # script counts + ctrl + other == n_cp for every non-null doc
    for did, r in profile_rows.items():
        if r["n_cp"] is None:
            continue
        known = sum(r[f"{n}_cnt"] for n in WQ.SCRIPT_NAMES)
        assert known + r["ctrl_cnt"] + r["other_cnt"] == r["n_cp"], did


def _duck_with(rows, schema_sql, sql):
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("fixture_docs", pdf)
    con.execute(f"CREATE VIEW documents AS SELECT * FROM fixture_docs")
    return con.sql(sql).fetchall()


def test_script_profile_duckdb_twin_on_nonascii(spark):
    """Oracle parity on the multi-script fixtures themselves."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in WQ.script_profile(df, "doc_id", "text").collect()
    }
    want = {
        r[0]: r[1:]
        for r in _duck_with(
            DOCS, None, WQ.sql_script_profile_select("documents", "doc_id")
        )
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])


def test_soft404(spark):
    df = spark.createDataFrame(SOFT404_DOCS, "doc_id int, text string")
    r = {x["doc_id"]: x.asDict() for x in WQ.soft404_flag(df, "doc_id", "text").collect()}
    # "page you requested" + "could not be found" + "error 404"
    assert r[1]["phrase_hits"] == 3 and r[1]["is_soft404"]
    assert r[2]["phrase_hits"] == 1 and not r[2]["is_soft404"]  # long, 1 phrase
    assert r[3]["phrase_hits"] == 0 and not r[3]["is_soft404"]  # short only
    assert r[4]["phrase_hits"] == 2 and r[4]["is_soft404"]  # 2 phrases, long
    assert not r[5]["is_soft404"]
    # null text: contains() is null → every CASE falls to 0 (both engines)
    assert r[6]["phrase_hits"] == 0 and r[6]["is_soft404"] is False


def test_soft404_duckdb_twin(spark):
    df = spark.createDataFrame(SOFT404_DOCS, "doc_id int, text string")
    got = sorted(tuple(r) for r in WQ.soft404_flag(df, "doc_id", "text").collect())
    want = sorted(
        _duck_with(SOFT404_DOCS, None, WQ.sql_soft404_select("documents", "doc_id"))
    )
    assert got == want


def test_plans_are_native(spark):
    """Script profile and soft-404 must stay whole-stage-codegen native —
    no Python eval of any kind in the plan."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    for out in (
        WQ.script_profile(df, "doc_id", "text"),
        WQ.soft404_flag(df, "doc_id", "text"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


from hypothesis import given, settings, strategies as st


# Random unicode incl. astral planes (🚀, CJK-B) and raw controls: the twin
# must agree codepoint-for-codepoint even on text no crawler should emit.
_wild_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters=["\x00"]  # NUL breaks C-string SQL
    ),
    max_size=200,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_wild_text | st.none(), min_size=1, max_size=8))
def test_script_profile_twin_property(spark, texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = sorted(
        tuple(r) for r in WQ.script_profile(df, "doc_id", "text").collect()
    )
    want = sorted(
        _duck_with(docs, None, WQ.sql_script_profile_select("documents", "doc_id"))
    )
    assert got == want


def test_compression_ratio_matches_zlib(spark):
    texts = [
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 10,  # templated → low
        "The entropy of natural prose resists deflate somewhat more.",
        "",  # empty → null
        None,
        "кириллица сжимается тоже",  # multi-byte utf-8
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r["i"]: r["cr"]
        for r in df.select(
            "i", WQ.compression_ratio(F.col("text")).alias("cr")
        ).collect()
    }
    want = WQ.ratio_oracle(texts)
    for i, w in enumerate(want):
        if w is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(w, rel=1e-12)
    assert got[0] < 0.1 < got[1]  # templated text compresses far better


def test_compression_ratio_is_arrow_batched(spark):
    df = spark.createDataFrame([(1, "x" * 100)], "i int, text string")
    plan = (
        WQ.with_compression_ratio(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan  # vectorized
    assert "BatchEvalPython" not in plan  # never per-row Python
