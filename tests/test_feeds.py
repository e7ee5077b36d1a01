"""RSS/Atom feed ingestion (X116): dialect detection, attribute vs
element links (rel=alternate preference), CDATA titles vs entity
decode, guid/id fallback, RFC822+ISO date parsing with garbage
tolerance, sitemap_due interop, DuckDB twin parity."""

import duckdb
import pytest
import pyspark.sql.functions as F

from data_pipeline_spark.sources.feeds import (
    feed_assertions,
    parse_feed,
    published_ts,
    sql_parse_feed,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
 <title>Example news</title>
 <item>
   <title><![CDATA[Breaking: 5 &lt; 6]]></title>
   <link>https://news.example.com/a?x=1&amp;y=2</link>
   <guid isPermaLink="false">tag:news,a-1</guid>
   <pubDate>Mon, 02 Feb 2026 10:30:00 +0000</pubDate>
 </item>
 <item>
   <title>Plain &amp; simple</title>
   <link>https://news.example.com/b</link>
   <pubDate>not a date at all</pubDate>
 </item>
 <item><title>no link: dropped</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
 <title>Example blog</title>
 <entry>
   <title type="text">First post</title>
   <link rel="self" href="https://blog.example.org/feed.xml"/>
   <link rel="alternate" href="https://blog.example.org/posts/1"/>
   <id>urn:uuid:0001</id>
   <updated>2026-02-03T08:00:00Z</updated>
 </entry>
 <entry>
   <title>Second</title>
   <link href="https://blog.example.org/posts/2"/>
   <updated>2026-02-04</updated>
 </entry>
</feed>"""


@pytest.fixture(scope="module")
def feeds(spark):
    return spark.createDataFrame(
        [("h1", RSS), ("h2", ATOM)], "host string, xml string"
    )


def test_parse_feed_both_dialects(spark, feeds):
    rows = {
        (r["host"], r["link"]): r for r in parse_feed(feeds).collect()
    }
    assert len(rows) == 4  # link-less item dropped
    a = rows[("h1", "https://news.example.com/a?x=1&y=2")]  # entity-decoded
    assert a["feed_type"] == "rss"
    assert a["title"] == "Breaking: 5 &lt; 6"  # CDATA payload stays literal
    assert a["entry_id"] == "tag:news,a-1"
    b = rows[("h1", "https://news.example.com/b")]
    assert b["title"] == "Plain & simple"  # non-CDATA decodes entities
    assert b["entry_id"] == "https://news.example.com/b"  # guid fallback
    p1 = rows[("h2", "https://blog.example.org/posts/1")]
    assert p1["feed_type"] == "atom"
    assert p1["entry_id"] == "urn:uuid:0001"
    assert p1["published"] == "2026-02-03T08:00:00Z"
    # rel=alternate beat rel=self
    assert ("h2", "https://blog.example.org/feed.xml") not in rows


def test_published_ts_parsing(spark, feeds):
    out = parse_feed(feeds).withColumn("ts", published_ts("published"))
    got = {r["link"]: r["ts"] for r in out.collect()}
    assert got["https://news.example.com/a?x=1&y=2"] is not None  # RFC 822
    assert got["https://blog.example.org/posts/1"] is not None    # ISO 8601
    assert got["https://news.example.com/b"] is None              # garbage


def test_feed_assertions_into_sitemap_due(spark, feeds):
    from data_pipeline_spark.sources.sitemap import sitemap_due

    stats = spark.createDataFrame(
        [
            ("https://news.example.com/a?x=1&y=2", "2026-02-01 00:00:00"),
            ("https://blog.example.org/posts/1", "2026-02-10 00:00:00"),
        ],
        "url string, last_ts string",
    ).withColumn("last_ts", F.col("last_ts").cast("timestamp"))
    due = sitemap_due(stats, feed_assertions(parse_feed(feeds)))
    got = {r["url"]: r["server_modified"] for r in due.collect()}
    # asserted after our capture -> modified; before -> not; never
    # captured -> discovery
    assert got["https://news.example.com/a?x=1&y=2"] is True
    assert got["https://blog.example.org/posts/1"] is False
    assert got["https://blog.example.org/posts/2"] is True


def test_duckdb_twin_parity(spark, feeds):
    got = sorted(map(tuple, parse_feed(feeds).collect()))
    con = duckdb.connect()
    con.register("t", feeds.toPandas())
    want = sorted(map(tuple, con.sql(sql_parse_feed("t")).fetchall()))
    assert got == want


def test_crawl_plan_job_with_feeds(spark, tmp_path, monkeypatch):
    """In-process jobs/crawl_plan_job.py --feed-dir (+ --sitemap-dir):
    both origin channels merge into one assertion signal; a url asserted
    by the feed leads the plan, and when both channels assert the same
    url the freshest assertion wins."""
    import importlib.util
    import sys
    from datetime import datetime

    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    rows = []
    for d in (1, 2, 3):
        rows.append(("https://x.org/a", datetime(2024, 3, d), f"da{d}"))
        rows.append(("https://x.org/b", datetime(2024, 3, d), "db"))
    cdx = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, payload_digest string"
    )
    cdx.write.parquet(str(tmp_path / "cdx"))
    (tmp_path / "maps").mkdir()
    (tmp_path / "maps" / "sitemap.xml").write_text(
        "<urlset>"
        "<url><loc>https://x.org/b</loc><lastmod>2024-03-02</lastmod></url>"
        "</urlset>"
    )  # stale assertion: before /b's last capture
    (tmp_path / "feeds").mkdir()
    (tmp_path / "feeds" / "news.rss").write_text(
        '<rss version="2.0"><channel>'
        "<item><link>https://x.org/b</link>"
        "<pubDate>Sat, 09 Mar 2024 10:00:00 GMT</pubDate></item>"
        "<item><link>https://x.org/fresh</link>"
        "<pubDate>Sat, 09 Mar 2024 11:00:00 GMT</pubDate></item>"
        "</channel></rss>"
    )  # feed asserts /b AFTER its last capture + discovers /fresh
    argv = [
        "crawl_plan_job.py", "--cdx-dir", str(tmp_path / "cdx"),
        "--sitemap-dir", str(tmp_path / "maps"),
        "--feed-dir", str(tmp_path / "feeds"),
        "--out", str(tmp_path / "plan"), "--budget", "4",
    ]
    spec = importlib.util.spec_from_file_location(
        "cpjf", __file__.rsplit("/tests/", 1)[0] + "/jobs/crawl_plan_job.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    old = sys.argv
    sys.argv = argv
    try:
        m.main()
    finally:
        sys.argv = old

    plan = {r["url"]: r for r in spark.read.parquet(str(tmp_path / "plan")).collect()}
    # the feed's fresh assertion beats the sitemap's stale one for /b
    assert plan["https://x.org/b"]["server_modified"] is True
    # feed-discovered url rides the plan
    assert plan["https://x.org/fresh"]["server_modified"] is True


def test_published_ts_single_digit_day(spark):
    """ADVICE r3 (feeds.py:157): RFC 822 permits a one-digit day
    ("Mon, 2 Feb 2026 ...") — common in the wild — which the strict dd
    pattern nulled out, silently dropping those entries' freshness
    assertions. The parser must left-pad and parse it."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            ("Mon, 2 Feb 2026 10:30:00 GMT",),
            ("Mon, 02 Feb 2026 10:30:00 GMT",),
            ("2 Feb 2026 10:30:00 +0100",),
            ("not a date",),
        ],
        "published string",
    ).withColumn("ts", published_ts("published"))
    got = [r["ts"] for r in df.collect()]
    assert got[0] == got[1] == dt.datetime(2026, 2, 2, 10, 30)  # UTC session
    assert got[2] is not None
    assert got[3] is None
