"""Charset sniffing + decode (functions/charset.py): BOMs, meta/XML
declarations, alias mapping, malformed-input replacement, native plan."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.functions.charset import decode_html, sniff_charset

CASES = [
    # (id, raw bytes, expected charset, expected decoded text)
    (0, "<html><p>plain ascii</p></html>".encode("ascii"),
     "UTF-8", "<html><p>plain ascii</p></html>"),
    (1, '<meta charset="utf-8"><p>héllo</p>'.encode("utf-8"),
     "UTF-8", '<meta charset="utf-8"><p>héllo</p>'),
    (2, '<meta charset="iso-8859-1"><p>café</p>'.encode("iso-8859-1"),
     "ISO-8859-1", '<meta charset="iso-8859-1"><p>café</p>'),
    (3, ('<meta http-equiv="Content-Type" content="text/html; '
         'charset=windows-1252"><p>“quoted”</p>').encode("windows-1252"),
     "windows-1252",
     '<meta http-equiv="Content-Type" content="text/html; '
     'charset=windows-1252"><p>“quoted”</p>'),
    (4, "﻿<p>bom utf8 ß</p>".encode("utf-8"),
     "UTF-8", "<p>bom utf8 ß</p>"),
    (5, "<p>utf16 页面</p>".encode("utf-16"),  # emits FF FE BOM (LE)
     "UTF-16LE", "<p>utf16 页面</p>"),
    (6, "<p>utf16be Ω</p>".encode("utf-16-be"),  # no BOM, no decl → default
     "UTF-8", None),
    (7, '<?xml version="1.0" encoding="ISO-8859-1"?><r>ñ</r>'.encode("iso-8859-1"),
     "ISO-8859-1", '<?xml version="1.0" encoding="ISO-8859-1"?><r>ñ</r>'),
    (8, '<meta charset="klingon-9"><p>x</p>'.encode("ascii"),
     "UTF-8", '<meta charset="klingon-9"><p>x</p>'),  # junk decl → default
    (9, "<META CHARSET='LATIN1'><p>æøå</p>".encode("latin-1"),
     "ISO-8859-1", "<META CHARSET='LATIN1'><p>æøå</p>"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _, _ in CASES], "id long, html binary"
    )


def test_sniff(df):
    got = {r["id"]: r["cs"] for r in df.select(
        "id", sniff_charset("html").alias("cs")).collect()}
    for i, _, want, _ in CASES:
        assert got[i] == want, i


def test_decode(df):
    got = {r["id"]: r["t"] for r in df.select(
        "id", decode_html("html").alias("t")).collect()}
    for i, _, _, want in CASES:
        if want is not None:
            assert got[i] == want, i
    # UTF-16LE BOM char must be stripped from the decoded text
    assert not got[5].startswith("﻿")


def test_malformed_bytes_never_throw(spark):
    # invalid UTF-8 continuation bytes decode with U+FFFD, not an error
    raw = b"<p>bad \xc3\x28 bytes \xff</p>"
    df = spark.createDataFrame([(bytearray(raw),)], "html binary")
    out = df.select(decode_html("html").alias("t")).collect()[0]["t"]
    assert "�" in out and out.startswith("<p>bad ")


def test_native_plan(df):
    plan = df.select(
        sniff_charset("html"), decode_html("html")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_roundtrip_to_utf8_normalization(df):
    """The composable normalization the module docstring advertises:
    decode under the sniffed charset, re-encode UTF-8 — every non-BOM case
    whose charset was sniffed correctly round-trips its TEXT exactly."""
    out = {r["id"]: bytes(r["b"]) for r in df.select(
        "id", F.encode(decode_html("html"), "UTF-8").alias("b")).collect()}
    for i, _, _, want in CASES:
        if want is not None:
            assert out[i] == want.encode("utf-8"), i


def test_nfc_normalize_udf_parity(spark):
    import duckdb
    import pandas as pd

    from data_pipeline_spark.functions.charset import (
        nfc_normalize_udf,
        sql_nfc_normalize,
    )

    rows = [
        (1, "éclair"),            # decomposed acute -> é
        (2, "café"),               # already NFC
        (3, "각"),      # Hangul jamo -> 각
        (4, ""),
        (5, None),
        (6, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", nfc_normalize_udf()(df.text).alias("t")
        ).collect()
    }
    assert out[1] == "éclair"
    assert out[2] == "café"
    assert out[3] == "각"
    assert out[4] == "" and out[5] is None

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT doc_id, {sql_nfc_normalize('text')} FROM t"
        ).fetchall()
    }
    assert duck == out
