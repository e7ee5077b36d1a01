"""Web-graph operators (operators/webgraph.py): link extraction semantics,
host-graph collapse, PageRank vs a NumPy power-iteration oracle."""

import numpy as np
import pytest

from data_pipeline_spark.operators.webgraph import (
    extract_links,
    host_graph,
    host_rank,
    pagerank,
)

HTML = (
    '<html><a href="https://a.com/x">1</a>'
    "<a href='https://b.com/y?q=1'>2</a>"
    '<a href="/relative">skip</a>'
    '<a href="ftp://files.com/z">skip</a>'
    '<A HREF="https://caps.com/">kept-case-insensitive</A>'
    '<a href="http://a.com/x2">4</a></html>'
)


def test_extract_links_semantics(spark):
    df = spark.createDataFrame(
        [("https://src.com/p", HTML), ("https://src.com/empty", "<p>none</p>")],
        "url string, html string",
    )
    rows = extract_links(df).collect()
    hrefs = sorted(r["href"] for r in rows)
    assert hrefs == [
        "http://a.com/x2", "https://a.com/x",
        "https://b.com/y?q=1", "https://caps.com/",
    ]
    assert all(r["src_url"] == "https://src.com/p" for r in rows)


def test_extract_links_binary_html(spark):
    df = spark.createDataFrame(
        [("https://s/", HTML.encode("utf-8"))], "url string, html binary"
    )
    assert extract_links(df).count() == 4


def test_extract_links_native_plan(spark):
    df = spark.createDataFrame([("u", HTML)], "url string, html string")
    plan = extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_host_graph_collapses_and_drops_self_loops(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://b.com/y"),
            ("https://a.com/3", "https://a.com/other"),  # self-loop: dropped
            ("https://www.a.com/4", "https://b.com:443/z"),  # host-normalized
        ],
        "src_url string, href string",
    )
    got = {(r["src"], r["dst"]): r["n_links"] for r in host_graph(links).collect()}
    assert got == {("a.com", "b.com"): 3}


def _np_pagerank(nodes, edges, iters, d=0.85):
    """Independent oracle: same algorithm, dense NumPy."""
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out_w = np.zeros(n)
    for s, t, w in edges:
        out_w[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t, w in edges:
            contrib[idx[t]] += r[idx[s]] * w / out_w[idx[s]]
        sent = sum(r[idx[s]] for s in {e[0] for e in edges})
        base = (1 - d) / n + d * (1.0 - sent) / n
        r = base + d * contrib
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_numpy_oracle(spark):
    edges = [
        ("a", "b", 1.0), ("a", "c", 1.0), ("b", "c", 2.0),
        ("c", "a", 1.0), ("c", "e", 1.0),  # e is dangling
    ]
    nodes = ["a", "b", "c", "e"]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=8, weight="w").collect()
    }
    want = _np_pagerank(nodes, edges, iters=8)
    assert set(got) == set(want)
    for u in nodes:
        assert got[u] == pytest.approx(want[u], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, iterations=2).count() == 0


def test_host_rank_end_to_end(spark):
    # hub.com links everywhere; everyone links back to popular.com
    def page(u, *targets):
        return (u, "".join(f'<a href="{t}">l</a>' for t in targets))

    pages = spark.createDataFrame(
        [
            page("https://hub.com/1", "https://popular.com/a", "https://b.com/x"),
            page("https://b.com/x", "https://popular.com/b"),
            page("https://popular.com/a", "https://hub.com/1"),
        ],
        "url string, html string",
    )
    ranks = {r["host"]: r["rank"] for r in host_rank(pages, iterations=12).collect()}
    assert max(ranks, key=ranks.get) == "popular.com"
    assert sum(ranks.values()) == pytest.approx(1.0, rel=1e-9)


def test_extract_canonical_both_attribute_orders(spark):
    pages = spark.createDataFrame(
        [
            ("u1", '<head><link rel="canonical" href="https://c.com/a"></head>'),
            ("u2", "<head><link href='https://c.com/b' rel='canonical'></head>"),
            ("u3", '<head><link rel="stylesheet" href="https://c.com/x.css"></head>'),
            ("u4", "<p>no links</p>"),
        ],
        "url string, html string",
    )
    from data_pipeline_spark.operators.webgraph import canonical_collapse

    got = {r["url"]: r for r in canonical_collapse(pages).collect()}
    assert got["u1"]["canonical_url"] == "https://c.com/a"
    assert got["u2"]["canonical_url"] == "https://c.com/b"
    assert got["u3"]["canonical_url"] is None  # stylesheet is not canonical
    assert got["u4"]["group_key"] == "u4" and got["u4"]["is_canonical"] is True
    assert got["u1"]["group_key"] == "https://c.com/a"
    assert got["u1"]["is_canonical"] is False


def test_canonical_self_declaration(spark):
    pages = spark.createDataFrame(
        [("https://c.com/a", '<link rel="canonical" href="https://c.com/a">')],
        "url string, html string",
    )
    from data_pipeline_spark.operators.webgraph import canonical_collapse

    r = canonical_collapse(pages).collect()[0]
    assert r["is_canonical"] is True and r["group_key"] == "https://c.com/a"


def test_discover_frontier(spark):
    from data_pipeline_spark.operators.webgraph import discover_frontier

    links = spark.createDataFrame(
        [
            ("https://s/1", "https://a.com/new"),
            ("https://s/2", "https://a.com/new"),            # dedup
            ("https://s/3", "https://a.com/known?utm_source=x"),  # canon → known
            ("https://s/4", "https://b.com/other"),
        ],
        "src_url string, href string",
    )
    known = spark.createDataFrame(
        [("https://a.com/known",)], "url string"
    )
    got = sorted(r["url"] for r in discover_frontier(links, known).collect())
    assert got == ["https://a.com/new", "https://b.com/other"]


ANCHOR_HTML = (
    '<html><body>'
    '<a href="https://t.com/a">Click   Here\n</a>'
    "<a href='https://t.com/a'><b>click</b> here</a>"   # markup + case fold
    '<a href="https://t.com/a">docs</a>'
    '<a href="https://t.com/b"><img src="x"/></a>'       # image link: no text
    '<a href="/rel">relative</a>'                        # relative: dropped
    '<A HREF="https://t.com/c">LEGACY</A>'               # legacy casing
    '</body></html>'
)


def test_extract_anchors_semantics(spark):
    from data_pipeline_spark.operators.webgraph import extract_anchors

    df = spark.createDataFrame([("u", ANCHOR_HTML)], "url string, html string")
    rows = sorted(
        (r["href"], r["anchor"]) for r in extract_anchors(df).collect()
    )
    assert rows == [
        ("https://t.com/a", "Click Here"),   # squeezed + trimmed
        ("https://t.com/a", "click here"),   # tags stripped
        ("https://t.com/a", "docs"),
        ("https://t.com/b", ""),             # image link kept, empty text
        ("https://t.com/c", "LEGACY"),
    ]


def test_anchor_profile_topk(spark):
    from data_pipeline_spark.operators.webgraph import (
        anchor_profile,
        extract_anchors,
    )

    df = spark.createDataFrame(
        [(f"u{i}", ANCHOR_HTML) for i in range(4)], "url string, html string"
    )
    prof = {
        (r["href"], r["rank"]): (r["anchor"], r["n"])
        for r in anchor_profile(extract_anchors(df), k=2).collect()
    }
    # case-folded 'click here' dominates (2 per page), 'docs' second
    assert prof[("https://t.com/a", 1)] == ("click here", 8)
    assert prof[("https://t.com/a", 2)] == ("docs", 4)
    assert ("https://t.com/a", 3) not in prof  # k=2
    # image link's empty anchor must not profile
    assert not any(h == "https://t.com/b" for h, _ in prof)
    assert prof[("https://t.com/c", 1)] == ("legacy", 4)


def test_extract_anchors_native_plan(spark):
    from data_pipeline_spark.operators.webgraph import extract_anchors

    df = spark.createDataFrame([("u", ANCHOR_HTML)], "url string, html string")
    plan = extract_anchors(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sql_host_rank_twin_parity(spark):
    import duckdb

    from data_pipeline_spark.operators.webgraph import host_rank, sql_host_rank

    pages = [
        ("https://a.com/1", '<a href="https://b.com/x">b</a><a href="https://c.com/y">c</a>'),
        ("https://a.com/2", '<a href="https://b.com/x">b</a>'),
        ("https://b.com/1", '<a href="https://a.com/z">a</a>'),
        ("https://c.com/1", '<a href="https://sink.com/">s</a>'),
        # sink.com never links out: dangling-mass path exercised
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    import pyspark.sql.functions as F
    got = {
        r["host"]: r["rank"]
        for r in host_rank(df, iterations=5)
        .select("host", F.round("rank", 6).alias("rank")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p (url VARCHAR, html VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?,?)", pages)
    oracle = dict(con.execute(
        sql_host_rank("SELECT url, html FROM p", iterations=5)
    ).fetchall())
    assert got == oracle
    assert abs(sum(got.values()) - 1.0) < 1e-4  # still a distribution


def test_template_fingerprint_groups_by_layout(spark):
    from data_pipeline_spark.operators.webgraph import template_fingerprint

    def grid(words):
        return (f"<html><body><div><ul><li><span>{words}</span></li>"
                "<li><em>x</em></li></ul></div></body></html>")

    def article(words):
        return (f"<html><body><article><h1>t</h1><p>{words}</p>"
                "<p>more</p></article></body></html>")

    pages = [
        ("g1", grid("entirely different visible words here")),
        ("g2", grid("nothing shared with the other grid page")),
        ("a1", article("prose content one")),
        ("a2", article("second article body text")),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    sig = {r["url"]: r["simhash"] for r in template_fingerprint(df).collect()}
    # same layout -> identical signature regardless of content;
    # different layout -> different signature
    assert sig["g1"] == sig["g2"]
    assert sig["a1"] == sig["a2"]
    assert sig["g1"] != sig["a1"]


def test_discover_frontier_seen_filter(spark):
    from data_pipeline_spark.operators.webgraph import discover_frontier

    links = spark.createDataFrame(
        [("s", "https://new.com/a?utm_source=x"),   # canonicalizes to /a
         ("s", "https://new.com/a"),                # same after canon -> one row
         ("s", "https://seen.com/b/"),              # known (canonical match)
         ("s", "ftp://odd.org/c")],                 # non-http: dropped
        "src_url string, href string",
    )
    known = spark.createDataFrame([("https://seen.com/b",)], "url string")
    got = sorted(r["url"] for r in discover_frontier(links, known).collect())
    assert got == ["https://new.com/a"]
