"""Sitemap ingestion (sources/sitemap.py): entry parsing, index files,
lastmod typing, and the server-asserted-change merge into recrawl stats."""

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.sources.sitemap import (
    lastmod_ts,
    parse_sitemap,
    parse_sitemap_index,
    sitemap_due,
)

XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://x.org/a</loc>
    <lastmod>2024-03-05T10:00:00Z</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://x.org/b </loc><lastmod>2024-03-01</lastmod></url>
  <url><loc>https://x.org/new</loc><lastmod>2024-03-06</lastmod></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://x.org/sitemap-1.xml</loc><lastmod>2024-03-01</lastmod></sitemap>
  <sitemap><loc>https://x.org/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_entries(spark):
    df = spark.createDataFrame([("x.org", XML)], "host string, xml string")
    rows = {r["loc"]: r for r in parse_sitemap(df).collect()}
    # loc-less entry dropped; whitespace trimmed; passthrough kept
    assert set(rows) == {"https://x.org/a", "https://x.org/b", "https://x.org/new"}
    a = rows["https://x.org/a"]
    assert a["host"] == "x.org" and a["changefreq"] == "daily"
    assert a["priority"] == pytest.approx(0.8)
    b = rows["https://x.org/b"]
    assert b["lastmod"] == "2024-03-01"
    assert b["changefreq"] is None and b["priority"] is None


def test_entity_escaped_loc_and_garbage_priority(spark):
    # the protocol REQUIRES '&' in a url to ship as '&amp;' — it must
    # decode back or the join against captured urls misses; a non-numeric
    # <priority> must null out, never fail the scan (ANSI mode)
    xml = (
        "<urlset>"
        "<url><loc>https://x.org/p?a=1&amp;b=2</loc>"
        "<priority>high</priority></url>"
        "<url><loc>https://x.org/lt/&lt;&gt;&quot;&apos;</loc></url>"
        "<url><loc>https://x.org/amp/&amp;lt;</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    rows = {r["loc"]: r for r in parse_sitemap(df).collect()}
    assert "https://x.org/p?a=1&b=2" in rows
    assert rows["https://x.org/p?a=1&b=2"]["priority"] is None
    assert "https://x.org/lt/<>\"'" in rows
    # '&amp;lt;' is the literal text '&lt;', not '<' (amp decodes last)
    assert "https://x.org/amp/&lt;" in rows


def test_parse_index(spark):
    df = spark.createDataFrame([(INDEX,)], "xml string")
    rows = {r["loc"]: r["lastmod"] for r in parse_sitemap_index(df).collect()}
    assert rows == {
        "https://x.org/sitemap-1.xml": "2024-03-01",
        "https://x.org/sitemap-2.xml": None,
    }


def test_lastmod_typing(spark):
    df = spark.createDataFrame(
        [("2024-03-05T10:00:00Z",), ("2024-03-01",), ("not a date",), (None,)],
        "lastmod string",
    )
    got = [r["ts"] for r in df.select(lastmod_ts().alias("ts")).collect()]
    assert got[0] == datetime(2024, 3, 5, 10, 0, 0)
    assert got[1] == datetime(2024, 3, 1)
    assert got[2] is None and got[3] is None


def test_native_plan(spark):
    df = spark.createDataFrame([(XML,)], "xml string")
    plan = parse_sitemap(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sitemap_due_merge(spark):
    stats = spark.createDataFrame(
        [
            ("https://x.org/a", datetime(2024, 3, 1), 0.2),  # asserted newer
            ("https://x.org/b", datetime(2024, 3, 2), 0.9),  # capture newer
            ("https://x.org/c", datetime(2024, 3, 2), 0.5),  # not in sitemap
        ],
        "url string, last_ts timestamp, due_score double",
    )
    entries = parse_sitemap(
        spark.createDataFrame([(XML,)], "xml string")
    )
    out = {r["url"]: r for r in sitemap_due(stats, entries).collect()}
    assert out["https://x.org/a"]["server_modified"] is True
    assert out["https://x.org/b"]["server_modified"] is False
    assert out["https://x.org/c"]["server_modified"] is False
    # never-captured url discovered from the sitemap: must-fetch
    assert out["https://x.org/new"]["server_modified"] is True
    assert out["https://x.org/new"]["due_score"] is None


def test_discovery_without_lastmod_is_asserted(spark):
    # <lastmod> is optional and very commonly omitted: a never-captured
    # url in the sitemap is a discovery even with no lastmod at all
    stats = spark.createDataFrame(
        [("https://x.org/a", datetime(2024, 3, 1), 0.2)],
        "url string, last_ts timestamp, due_score double",
    )
    entries = parse_sitemap(
        spark.createDataFrame(
            [("<urlset><url><loc>https://x.org/bare</loc></url></urlset>",)],
            "xml string",
        )
    )
    out = {r["url"]: r for r in sitemap_due(stats, entries).collect()}
    assert out["https://x.org/bare"]["server_modified"] is True
    assert out["https://x.org/bare"]["server_lastmod"] is None
    # captured url absent from the sitemap stays statistical
    assert out["https://x.org/a"]["server_modified"] is False


def test_crawl_plan_job_with_sitemap(spark, tmp_path, monkeypatch):
    """In-process run of jobs/crawl_plan_job.py --sitemap-dir: server-
    asserted changes (and never-captured discoveries) lead the plan ahead
    of every statistical score."""
    import importlib.util
    import sys

    from pyspark.sql import SparkSession

    # the job ends with spark.stop(); keep the shared test session alive
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    # capture history: /a changed often (high due), /b static (0 due)
    rows = []
    for i, d in enumerate((1, 2, 3)):
        rows.append(("https://x.org/a", datetime(2024, 3, d), f"da{i}"))
        rows.append(("https://x.org/b", datetime(2024, 3, d), "db"))
    rows.append(("https://x.org/a", datetime(2024, 3, 4), "da3"))
    rows.append(("https://x.org/stale", datetime(2024, 2, 1), "ds"))
    cdx = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, payload_digest string"
    )
    cdx.write.parquet(str(tmp_path / "cdx"))
    # sitemap asserts /b changed after its last capture + discovers /new
    (tmp_path / "maps").mkdir()
    (tmp_path / "maps" / "sitemap.xml").write_text(
        "<urlset>"
        "<url><loc>https://x.org/b</loc><lastmod>2024-03-09</lastmod></url>"
        "<url><loc>https://x.org/new</loc><lastmod>2024-03-09</lastmod></url>"
        "<url><loc>https://x.org/a</loc><lastmod>2024-02-01</lastmod></url>"
        "</urlset>"
    )
    argv = [
        "crawl_plan_job.py", "--cdx-dir", str(tmp_path / "cdx"),
        "--sitemap-dir", str(tmp_path / "maps"),
        "--out", str(tmp_path / "plan"), "--budget", "3",
    ]
    spec = importlib.util.spec_from_file_location(
        "cpj", __file__.rsplit("/tests/", 1)[0] + "/jobs/crawl_plan_job.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    old = sys.argv
    sys.argv = argv
    try:
        m.main()
    finally:
        sys.argv = old

    plan = (
        spark.read.parquet(str(tmp_path / "plan"))
        .orderBy(F.desc("server_modified"), F.desc("priority"), "url")
        .collect()
    )
    assert len(plan) == 3
    # asserted + discovered lead (url-ordered within the asserted group,
    # since neither has a statistical priority edge)
    assert {plan[0]["url"], plan[1]["url"]} == {"https://x.org/b", "https://x.org/new"}
    assert plan[0]["server_modified"] and plan[1]["server_modified"]
    # then the statistically-due page; /a's older lastmod must NOT assert
    assert plan[2]["url"] == "https://x.org/a" and not plan[2]["server_modified"]
