"""Main-content extraction (functions/boilerplate.py): block density
semantics, script/comment killing, DuckDB twin parity, native plan."""

import duckdb
import pytest

from data_pipeline_spark.functions import boilerplate as B

PAGES = [
    (0, """<html><head><style>.n{}</style><script>nav()</script></head><body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<p>This is the real article body with plenty of meaningful words inside it, definitely long enough to keep.</p>
<p>Second paragraph also has sustained prose with a single <a href="/r">reference link</a> inside much longer text so density stays low.</p>
<!-- tracking comment --><footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer></body></html>"""),
    (1, "<div><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a> nav row</div>"),
    (2, "<p>short</p>"),
    (3, ""),
    (4, "<p>" + "word " * 30 + "</p><p>tail menu <a href='/m'>m</a> <a href='/n'>n</a></p>"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(PAGES, "id long, html string")


def test_main_content_semantics(df):
    got = {r["id"]: r["mc"] for r in df.select(
        "id", B.main_content("html").alias("mc")).collect()}
    # page 0: both paragraphs kept, chrome dropped
    assert got[0].startswith("This is the real article body")
    assert "Second paragraph" in got[0]
    for junk in ("Home", "Terms", "nav()", ".n{}", "tracking"):
        assert junk not in got[0]
    # pure link rows and short blocks produce nothing
    assert got[1] == "" and got[2] == "" and got[3] == ""
    # page 4: prose kept, link-dense tail dropped
    assert got[4].startswith("word word") and "menu" not in got[4]


def test_content_ratio(df):
    got = {r["id"]: r["cr"] for r in df.select(
        "id", B.content_ratio("html").alias("cr")).collect()}
    assert 0.5 < got[0] < 1.0
    assert got[1] == 0.0 and got[3] == 0.0
    assert got[4] > 0.8


def test_duckdb_twin_parity(df):
    import pyspark.sql.functions as F

    rows = {r["id"]: (r["mc"], r["cr"]) for r in df.select(
        "id",
        B.main_content("html").alias("mc"),
        F.round(B.content_ratio("html"), 6).alias("cr"),
    ).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE p (id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?,?)", PAGES)
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT id, {B.sql_main_content('html')}, "
            f"round({B.sql_content_ratio('html')}, 6) FROM p"
        ).fetchall()
    }
    assert rows == oracle


def test_native_plan(df):
    plan = df.select(
        B.main_content("html"), B.content_ratio("html")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_abbr_does_not_open_phantom_anchor(spark):
    """<abbr>/<address> etc. must not be counted as anchors: with the old
    unanchored '<a[^>]*>' pattern the whole paragraph between <abbr> and a
    later real </a> read as link text and legitimate content was dropped."""
    from data_pipeline_spark.functions.boilerplate import main_content

    para = ("The <abbr title='HyperText'>HTML</abbr> living standard defines "
            "the web platform in considerable detail and this paragraph is "
            "clearly substantive content, ending with one small "
            "<a href='/spec'>spec</a> link.")
    html = f"<html><body><p>{para}</p></body></html>"
    df = spark.createDataFrame([(html,)], "html string")
    out = df.select(main_content("html").alias("c")).collect()[0]["c"]
    assert "living standard" in out
