"""robots.txt parsing + URL permission checks (sources/robots.py):
group selection, wildcard/anchor rule compilation, longest-match
precedence, crawl-delay and sitemap discovery."""

import pytest

from data_pipeline_spark.sources.robots import (
    check_allowed,
    parse_robots,
    sitemaps_of,
)

ROBOTS_A = """# comments everywhere
User-agent: GoodBot
User-agent: OtherBot
Disallow: /private/
Allow: /private/ok.html
Crawl-delay: 2.5

User-agent: *
Disallow: /tmp/*.bak$
Disallow: /admin
Allow: /admin/public   # comment after value
Sitemap: https://a.com/sitemap.xml
"""

ROBOTS_B = """User-agent: *
Disallow:
Sitemap: https://b.com/map1.xml
Sitemap: https://b.com/map2.xml
"""


@pytest.fixture(scope="module")
def robots_df(spark):
    return spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
        "host string, robots_txt string",
    )


def test_group_selection_named_agent(spark, robots_df):
    rules = parse_robots(robots_df, agent="GoodBot/1.2")
    got = {(r["host"], r["rule"], r["path"]) for r in rules.collect()}
    # only the named group applies — star rules are ignored per RFC
    assert got == {
        ("a.com", "disallow", "/private/"),
        ("a.com", "allow", "/private/ok.html"),
    }
    delays = {r["host"]: r["crawl_delay"] for r in rules.collect()}
    assert delays["a.com"] == pytest.approx(2.5)


def test_group_selection_star(spark, robots_df):
    rules = parse_robots(robots_df, agent="UnknownBot")
    got = {(r["host"], r["rule"], r["path"]) for r in rules.collect()}
    # empty Disallow (b.com) yields no rule rows — allow-all
    assert got == {
        ("a.com", "disallow", "/tmp/*.bak$"),
        ("a.com", "disallow", "/admin"),
        ("a.com", "allow", "/admin/public"),
    }


def test_sitemap_discovery(spark, robots_df):
    got = {(r["host"], r["sitemap"]) for r in sitemaps_of(robots_df).collect()}
    assert got == {
        ("a.com", "https://a.com/sitemap.xml"),
        ("b.com", "https://b.com/map1.xml"),
        ("b.com", "https://b.com/map2.xml"),
    }


def test_check_allowed_semantics(spark, robots_df):
    rules = parse_robots(robots_df, agent="UnknownBot")
    urls = spark.createDataFrame(
        [
            ("https://a.com/",),                       # no rule → allowed
            ("https://a.com/admin",),                  # disallow /admin
            ("https://a.com/admin/secret",),           # prefix disallow
            ("https://a.com/admin/public/page",),      # longer allow wins
            ("https://a.com/tmp/x.bak",),              # wildcard + $ anchor
            ("https://a.com/tmp/x.bak.txt",),          # $ anchor must NOT hit
            ("https://b.com/anything",),               # allow-all host
            ("https://c.com/no-robots",),              # unknown host → allowed
        ],
        "url string",
    )
    got = {r["url"]: r for r in check_allowed(urls, rules).collect()}
    assert got["https://a.com/"]["allowed"] is True
    assert got["https://a.com/admin"]["allowed"] is False
    assert got["https://a.com/admin/secret"]["allowed"] is False
    assert got["https://a.com/admin/public/page"]["allowed"] is True
    assert got["https://a.com/tmp/x.bak"]["allowed"] is False
    assert got["https://a.com/tmp/x.bak.txt"]["allowed"] is True
    assert got["https://b.com/anything"]["allowed"] is True
    assert got["https://c.com/no-robots"]["allowed"] is True
    assert got["https://a.com/admin"]["matched_rule"] == "/admin"
    assert got["https://c.com/no-robots"]["matched_rule"] is None


def test_allow_wins_length_tie(spark):
    df = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /x/\nAllow: /x/\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(df)
    urls = spark.createDataFrame([("https://t.com/x/page",)], "url string")
    assert check_allowed(urls, rules).collect()[0]["allowed"] is True


def test_query_string_is_matched(spark):
    """RFC: rules match the path INCLUDING the query."""
    df = spark.createDataFrame(
        [("q.com", "User-agent: *\nDisallow: /*?session=\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(df)
    urls = spark.createDataFrame(
        [("https://q.com/page?session=1",), ("https://q.com/page",)],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in check_allowed(urls, rules).collect()}
    assert got["https://q.com/page?session=1"] is False
    assert got["https://q.com/page"] is True


def test_crawl_plan_job_with_robots(spark, tmp_path, monkeypatch):
    """In-process jobs/crawl_plan_job.py --robots-dir: disallowed urls
    never consume budget; the plan carries crawl-delay."""
    import importlib.util
    import sys
    from datetime import datetime

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    rows = []
    for path in ("open", "blocked/a", "blocked/b"):
        for i, d in enumerate((1, 2)):
            rows.append((f"https://r.com/{path}", datetime(2024, 3, d), f"{path}{i}"))
    rows.append(("https://r.com/open", datetime(2024, 3, 3), "open1"))
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, payload_digest string"
    ).write.parquet(str(tmp_path / "cdx"))
    spark.createDataFrame(
        [("r.com", "User-agent: *\nDisallow: /blocked/\nCrawl-delay: 1.5\n")],
        "host string, robots_txt string",
    ).write.parquet(str(tmp_path / "robots"))

    argv = [
        "crawl_plan_job.py", "--cdx-dir", str(tmp_path / "cdx"),
        "--robots-dir", str(tmp_path / "robots"), "--agent", "GoodBot",
        "--out", str(tmp_path / "plan"), "--budget", "10",
        "--default-period-s", "86400", "--schedule",
    ]
    spec = importlib.util.spec_from_file_location(
        "cpj2", __file__.rsplit("/tests/", 1)[0] + "/jobs/crawl_plan_job.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    old = sys.argv
    sys.argv = argv
    try:
        m.main()
    finally:
        sys.argv = old

    plan = spark.read.parquet(str(tmp_path / "plan")).collect()
    urls = {r["url"] for r in plan}
    assert urls == {"https://r.com/open"}
    assert plan[0]["crawl_delay"] == 1.5
    # --schedule: the single allowed url heads its host queue at t0
    assert plan[0]["fetch_slot"] == 0 and plan[0]["scheduled_offset_s"] == 0.0


def test_blank_line_between_ua_lines_shares_group(spark):
    """RFC 9309 ABNF: emptyline is legal inside a group — a blank line
    between two User-agent lines must NOT split them."""
    df = spark.createDataFrame(
        [("g.com", "User-agent: A\n\nUser-agent: B\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    rules_a = parse_robots(df, agent="A")
    assert {(r["rule"], r["path"]) for r in rules_a.collect()} == {
        ("disallow", "/private/")
    }


def test_delay_only_group_keeps_crawl_delay(spark):
    """A chosen group with Crawl-delay but no path rules (or the allow-all
    empty Disallow) must still surface its host's delay."""
    df = spark.createDataFrame(
        [
            ("d.com", "User-agent: *\nCrawl-delay: 10\n"),
            ("e.com", "User-agent: *\nDisallow:\nCrawl-delay: 7\n"),
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots(df)
    delays = {r["host"]: r["crawl_delay"] for r in rules.collect()}
    assert delays == {"d.com": 10.0, "e.com": 7.0}
    urls = spark.createDataFrame(
        [("https://d.com/x",), ("https://e.com/y",)], "url string"
    )
    got = {r["url"]: r for r in check_allowed(urls, rules).collect()}
    assert got["https://d.com/x"]["allowed"] is True
    assert got["https://d.com/x"]["crawl_delay"] == 10.0
    assert got["https://e.com/y"]["crawl_delay"] == 7.0


def test_sql_check_allowed_twin_parity(spark, robots_df):
    """The DuckDB twin must reproduce the full parse+check pipeline on the
    same fixture for BOTH agent modes (named agent and star-only)."""
    import duckdb

    from data_pipeline_spark.sources.robots import sql_check_allowed

    url_rows = [
        ("https://a.com/",), ("https://a.com/admin",),
        ("https://a.com/admin/secret",), ("https://a.com/admin/public/page",),
        ("https://a.com/tmp/x.bak",), ("https://a.com/tmp/x.bak.txt",),
        ("https://a.com/private/doc",), ("https://a.com/private/ok.html",),
        ("https://b.com/anything",), ("https://c.com/no-robots",),
    ]
    urls = spark.createDataFrame(url_rows, "url string")
    con = duckdb.connect()
    con.execute("CREATE TABLE rb (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO rb VALUES (?,?)",
                    [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)])
    con.execute("CREATE TABLE uu (url VARCHAR)")
    con.executemany("INSERT INTO uu VALUES (?)", url_rows)
    for agent in ("GoodBot", "*", "UnknownBot"):
        got = sorted(
            tuple(r) for r in check_allowed(
                urls, parse_robots(robots_df, agent=agent)
            ).collect()
        )
        oracle = sorted(
            tuple(r) for r in con.execute(sql_check_allowed(
                "SELECT url FROM uu", "SELECT host, robots_txt FROM rb",
                agent=agent,
            )).fetchall()
        )
        assert got == oracle, agent
