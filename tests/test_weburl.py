"""URL canonicalization + PII masking: semantics and DuckDB twin parity."""

import duckdb
import pytest

from data_pipeline_spark.functions import weburl as W

URLS = [
    (0, "HTTPS://WWW.Example.COM:443/Catalog/Item-5/?utm_source=x&b=2&a=1#frag"),
    (1, "http://user:pw@Site7.com:8080/a/b//?gclid=1&z=9&y=8"),
    (2, "https://example.com"),
    (3, "ftp://weird.example.org/file"),
    (4, "http://example.com:80/path?UTM_x=1&ref=tw&keep=yes"),
    (5, "https://sub.www.example.co.uk./p?a=1&a=0&"),
    (6, "  not a url at all "),
    (7, "http://example.com/#only-fragment"),
    (8, "http://a.com/p#/route?tab=2"),  # '?' inside the fragment: no query
]

TEXTS = [
    (0, "mail me at john.doe+x@ex-ample.co.uk or call +923001234567 now"),
    (1, "server 192.168.1.100 and 10.0.0.1; fax 555-123-4567"),
    (2, "no pii here, just 3.14 and version strings"),
]


@pytest.fixture(scope="module")
def udf_(spark):
    return spark.createDataFrame(URLS, "id long, url string")


def test_canonical_semantics(udf_):
    got = {
        r["id"]: r["cu"]
        for r in udf_.select("id", W.canonical_url("url").alias("cu")).collect()
    }
    # case folding, default port, www-strip, tracking-strip, param sort,
    # trailing slash, fragment drop:
    assert got[0] == "https://example.com/Catalog/Item-5?a=1&b=2"
    # non-default port + userinfo stripped + gclid dropped + sorted:
    assert got[1] == "http://site7.com:8080/a/b?y=8&z=9"
    assert got[2] == "https://example.com/"  # empty path → /
    assert got[3] == "ftp://weird.example.org/file"  # non-http untouched
    assert got[4] == "http://example.com/path?keep=yes"  # :80 + UTM_/ref cut
    # inner www kept, trailing host dot cut, duplicate keys sorted stably:
    assert got[5] == "https://sub.www.example.co.uk/p?a=0&a=1"
    assert got[6] == "not a url at all"  # unparseable → trimmed passthrough
    assert got[7] == "http://example.com/"
    # SPA hash-route: the first '?' lives inside the fragment and must NOT
    # leak fragment content back in as a query string
    assert got[8] == "http://a.com/p"


def test_host_and_domain(udf_):
    rows = {
        r["id"]: (r["h"], r["d"])
        for r in udf_.select(
            "id",
            W.url_host("url").alias("h"),
            W.registered_domain("url").alias("d"),
        ).collect()
    }
    assert rows[0] == ("example.com", "example.com")
    assert rows[5] == ("sub.www.example.co.uk", "co.uk")  # naive eTLD+1
    assert rows[6] == ("", "")


def test_canonical_idempotent(udf_, spark):
    """canonical(canonical(u)) == canonical(u)."""
    once = udf_.select("id", W.canonical_url("url").alias("url"))
    twice = once.select("id", W.canonical_url("url").alias("url"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_url_duckdb_twin(udf_):
    con = duckdb.connect()
    con.execute("CREATE TABLE wu (id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO wu VALUES (?,?)", URLS)
    got = sorted(
        tuple(r)
        for r in udf_.select(
            "id",
            W.canonical_url("url").alias("cu"),
            W.url_host("url").alias("h"),
            W.registered_domain("url").alias("d"),
        ).collect()
    )
    oracle = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT id, {W.sql_canonical_url('url')}, {W.sql_url_host('url')}, "
            f"{W.sql_registered_domain('url')} FROM wu"
        ).fetchall()
    )
    assert got == oracle


def test_pii_mask_and_counts(spark):
    df = spark.createDataFrame(TEXTS, "id long, text string")
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            W.mask_pii("text").alias("m"),
            *[c.alias(k) for k, c in W.pii_counts("text").items()],
        ).collect()
    }
    assert rows[0]["m"] == "mail me at <EMAIL> or call <PHONE> now"
    assert (rows[0]["email"], rows[0]["phone"]) == (1, 1)
    assert rows[1]["m"] == "server <IP> and <IP>; fax <PHONE>"
    assert rows[1]["ipv4"] == 2 and rows[1]["phone"] == 1
    assert rows[2]["m"] == TEXTS[2][1] and rows[2]["ipv4"] == 0

    con = duckdb.connect()
    con.execute("CREATE TABLE wt (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO wt VALUES (?,?)", TEXTS)
    pc = W.sql_pii_counts("text")
    oracle = {
        r[0]: r
        for r in con.execute(
            f"SELECT id, {W.sql_mask_pii('text')}, {pc['email']}, "
            f"{pc['ipv4']}, {pc['phone']} FROM wt"
        ).fetchall()
    }
    for i, r in rows.items():
        assert tuple(r) == tuple(oracle[i]), i


def test_all_native(udf_):
    plan = udf_.select(
        W.canonical_url("url"), W.mask_pii("url")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_surt_semantics(udf_):
    rows = {r["id"]: r["surt"] for r in udf_.select(
        "id", W.surt_key("url").alias("surt")).collect()}
    # host reversed comma-joined, default port dropped, query sorted/cleaned
    assert rows[0] == "com,example)/Catalog/Item-5?a=1&b=2"
    # non-default port kept after the reversed host
    assert rows[1] == "com,site7:8080)/a/b?y=8&z=9"
    assert rows[2] == "com,example)/"
    # non-http(s) and non-urls pass through trimmed
    assert rows[3] == "ftp://weird.example.org/file"
    assert rows[6] == "not a url at all"
    # subdomains of one registered domain share a key PREFIX (adjacency)
    assert rows[5].startswith("uk,co,example,")


def test_surt_duckdb_twin(udf_):
    got = {r["id"]: r["surt"] for r in udf_.select(
        "id", W.surt_key("url").alias("surt")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE u (id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?,?)", URLS)
    oracle = dict(con.execute(
        f"SELECT id, {W.sql_surt_key('url')} FROM u").fetchall())
    assert got == oracle


def test_surt_native(udf_):
    plan = udf_.select(
        W.surt_key("url")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


FILTER_URLS = [
    (0, "https://ads.spam-mall.com/landing"),          # blocked domain (eTLD+1 match)
    (1, "https://192.168.3.7/cgi/admin"),              # raw-IP host
    (2, "https://news.example.com/free-CASINO-bonus"), # banned word, any case
    (3, "https://example.com/" + "a" * 3000),          # over-length
    (4, "https://example.com/9912837465/118293/55"),   # digit-heavy path
    (5, "https://example.com/articles/science-2024"),  # clean
    (6, "https://spam-mall.com.evil.org/p"),           # blocklist must NOT match mid-host
]
BLOCKED = ("spam-mall.com",)


def test_url_verdict_rules(spark):
    df = spark.createDataFrame(FILTER_URLS, "id long, url string")
    got = {r["id"]: (r["v"], r["a"]) for r in df.select(
        "id",
        W.url_verdict("url", blocked_domains=BLOCKED).alias("v"),
        W.url_allowed("url", blocked_domains=BLOCKED).alias("a"),
    ).collect()}
    assert got[0] == ("blocked_domain", False)
    assert got[1] == ("ip_host", False)
    assert got[2] == ("banned_word", False)
    assert got[3] == ("too_long", False)
    assert got[4] == ("digit_heavy", False)
    assert got[5] == ("ok", True)
    # registered-domain matching, not substring: evil.org hosting a
    # "spam-mall.com" subdomain label is not the blocked domain
    assert got[6] == ("ok", True)


def test_url_verdict_duckdb_twin(spark):
    df = spark.createDataFrame(FILTER_URLS, "id long, url string")
    got = {r["id"]: r["v"] for r in df.select(
        "id", W.url_verdict("url", blocked_domains=BLOCKED).alias("v")
    ).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE uf (id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO uf VALUES (?,?)", FILTER_URLS)
    oracle = dict(con.execute(
        f"SELECT id, {W.sql_url_verdict('url', blocked_domains=BLOCKED)} FROM uf"
    ).fetchall())
    assert got == oracle


def test_url_verdict_native(spark):
    df = spark.createDataFrame(FILTER_URLS, "id long, url string")
    plan = df.select(
        W.url_verdict("url", blocked_domains=BLOCKED)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan  # pure per-row CASE, no lookup table
