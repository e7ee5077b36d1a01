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
