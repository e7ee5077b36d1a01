"""HTML page-metadata extraction: attribute orders, quoting styles,
noindex detection, and Spark vs DuckDB twin parity."""

import duckdb
import pandas as pd

from data_pipeline_spark.functions.htmlmeta import (
    FIELDS,
    sql_page_metadata,
    with_page_metadata,
)

PAGES = [
    # name-before-content, double quotes
    (1, '<html lang="en"><head><title> Hello   World </title>'
        '<meta name="description" content="A fine page">'
        '<meta property="og:title" content="OG Hello"></head><body>x</body></html>'),
    # content-before-name, single quotes, uppercase tag names
    (2, "<HTML LANG='de-DE'><HEAD><TITLE>Zwei</TITLE>"
        "<META content='Beschreibung' name='description'>"
        "<META content='OG Zwei' property='og:title'>"
        "<META content='noindex, nofollow' name='robots'></HEAD></HTML>"),
    # unquoted lang, robots name-first, no description/og
    (3, '<html lang=fr><head><title>Trois</title>'
        '<meta name=robots content="NOINDEX"></head></html>'),
    # nothing to extract
    (4, "<html><body>plain</body></html>"),
    # empty string
    (5, ""),
]

EXPECTED = {
    1: ("Hello World", "A fine page", "OG Hello", False, "en"),
    2: ("Zwei", "Beschreibung", "OG Zwei", True, "de-de"),
    3: ("Trois", "", "", True, "fr"),
    4: ("", "", "", False, ""),
    5: ("", "", "", False, ""),
}


def _rows(df):
    return {
        r["doc_id"]: tuple(r[f] for f in FIELDS)
        for r in df.select("doc_id", *FIELDS).collect()
    }


def test_extraction_spark(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    assert _rows(with_page_metadata(df, "html")) == EXPECTED


def test_duckdb_twin_parity(spark):
    con = duckdb.connect()
    con.register("pages", pd.DataFrame(PAGES, columns=["doc_id", "html"]))
    exprs = ", ".join(
        f"{e} AS {k}" for k, e in sql_page_metadata("html").items()
    )
    duck = {
        r[0]: tuple(r[1:])
        for r in con.sql(f"SELECT doc_id, {exprs} FROM pages").fetchall()
    }
    assert duck == EXPECTED
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    assert _rows(with_page_metadata(df, "html")) == duck
