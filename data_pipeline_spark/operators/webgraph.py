"""Web-graph operators over the crawled corpus: link extraction → host
graph → PageRank.

A crawl-CDC engine that already estimates per-url change rates
(operators/recrawl.py) also wants per-host IMPORTANCE — the other half of
every production crawl scheduler's priority (public literature: the
original PageRank paper + every open crawler's frontier scoring). These
operators build the graph from the corpus the engine already stores:

- :func:`extract_links` — outgoing absolute http(s) hrefs per page, one
  native ``regexp_extract_all`` + ``explode``: scan-speed, zero Python,
  zero shuffle.
- :func:`host_graph` — collapse page edges to weighted host→host edges:
  one hash aggregation (map-side combinable; hot hosts collapse before
  the shuffle).
- :func:`pagerank` — power iteration as keyed joins: contributions =
  ranks ⋈ edges (one shuffle per round, AQE-broadcast when ranks are
  small), dangling mass redistributed exactly, eager ``localCheckpoint``
  per round to cut the growing lineage (same discipline as
  operators/components.py, which this mirrors at 10^10-edge posture).

The reference has no graph surface (single-site crawler); this is the
round-3 web-scale extension. The link regex is shared verbatim with the
DuckDB oracle for the `link_extract` contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: href capture: absolute http(s) URLs in single or double quotes,
#: case-insensitive (legacy corpora use <A HREF=...>). Kept
#: lookaround-free so the SAME pattern text runs under Java regex (Spark)
#: and RE2 (DuckDB) — the repo-wide dual-dialect regex policy
#: (functions/weburl.py).
HREF_RE = r"""(?i)href=["'](https?://[^"'<>\s]+)["']"""


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, href) per outgoing absolute link. Relative links are
    skipped by design at this layer (resolving them needs the base url —
    compose with ``canonical_url`` downstream if needed). Pages with no
    links produce no rows (explode, not explode_outer)."""
    html_str = F.col(html_col)
    if dict(df.dtypes)[html_col] == "binary":
        html_str = html_str.cast("string")
    return df.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(html_str, F.lit(HREF_RE), 1)
        ).alias("href"),
    )


#: whole <a> elements (open tag through matching close), non-greedy body;
#: same dual-dialect discipline as HREF_RE.
ANCHOR_RE = r"(?i)<a\s[^>]*>[\s\S]*?</a\s*>"
TAG_STRIP_RE = r"<[^>]*>"
WS_SQUEEZE_RE = r"\s+"


def extract_anchors(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, href, anchor) per outgoing absolute link, where ``anchor``
    is the link's visible text (tags stripped, whitespace squeezed, may be
    '' for image links). Anchor text is the classic off-page description
    of the TARGET page — MassiveWeb/Gopher (Rae et al. 2021,
    arXiv:2112.11446) keep it as a quality/retrieval signal, and every
    search engine since Google '98 indexes it. One regexp_extract_all +
    explode + two per-element regexes: scan-speed, zero Python, zero
    shuffle; the same pattern texts run under DuckDB/RE2."""
    html_str = F.col(html_col)
    if dict(df.dtypes)[html_col] == "binary":
        html_str = html_str.cast("string")
    a = (
        df.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), 0)
            ).alias("_a"),
        )
        .select(
            "src_url",
            F.regexp_extract("_a", HREF_RE, 1).alias("href"),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace("_a", TAG_STRIP_RE, " "),
                    WS_SQUEEZE_RE, " ",
                )
            ).alias("anchor"),
        )
    )
    return a.where(F.col("href") != "")


def anchor_profile(anchors: DataFrame, k: int = 3) -> DataFrame:
    """Top-k anchor strings pointing AT each url: (href, anchor, n, rank).

    The aggregated anchor profile is the corpus's own description of a
    page — a retrieval surrogate for pages whose body is thin, and a spam
    signal when one anchor dominates. Case-folded; empty anchors (image
    links) carry no text and are excluded. One map-side-combinable hash
    agg + one href-keyed window top-k — both shuffles keyed, nothing
    quadratic, ties rank (n desc, anchor asc) so results are deterministic
    cross-engine."""
    counted = (
        anchors.where(F.col("anchor") != "")
        .groupBy("href", F.lower("anchor").alias("anchor"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("href").orderBy(F.desc("n"), F.asc("anchor"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("integer"))
        .where(F.col("rank") <= k)
    )


def host_graph(links: DataFrame) -> DataFrame:
    """Weighted host→host edges from page links (self-loops dropped: they
    carry no ranking signal and at web scale same-host links dominate raw
    counts by orders of magnitude)."""
    from data_pipeline_spark.functions.weburl import url_host

    e = links.select(
        url_host("src_url").alias("src"),
        url_host("href").alias("dst"),
    ).where((F.col("src") != F.col("dst")) & (F.col("dst") != ""))
    return e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_links"))


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank by power iteration; returns (node, rank), ranks
    summing to 1.0 (dangling mass redistributed uniformly each round, so
    the distribution stays a distribution — rank is comparable across
    corpus snapshots).

    Scale posture: nodes/out-weights are computed once; each round is ONE
    ranks⋈edges equi-join + one hash agg, with an eager localCheckpoint
    truncating the plan (iteration-proof lineage). The dangling-mass
    correction is a lazy broadcast 1-row aggregate fused into the same
    action — one Spark job per iteration total, no driver round trips."""
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        w.cast("double").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # per-edge share of the source's rank; precomputed once
    share = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("share")
    ).localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            ranks.join(share, ranks["node"] == share["src"], "inner")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("share")).alias("contrib"))
        )
        # dangling nodes (no outgoing edges) leak their rank. The mass that
        # WAS sent equals sum(contrib) exactly (each source's shares sum to
        # 1), so the leak is recoverable from contribs itself — as a lazy
        # broadcast 1-row aggregate, NOT a per-iteration driver collect:
        # the whole round is one action (the eager localCheckpoint below).
        sent = contribs.agg(
            F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("__sent")
        )
        base = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * (F.lit(1.0) - F.col("__sent")) / F.lit(n)
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(sent))
            .select(
                "node",
                (base
                 + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def host_rank(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """End-to-end: pages → links → host graph → (host, rank). The crawl
    scheduler joins this against recrawl_stats on host to weight due_score
    by importance."""
    return pagerank(
        host_graph(extract_links(pages, url_col, html_col)),
        iterations=iterations,
        damping=damping,
        weight="n_links",
    ).withColumnRenamed("node", "host")


def sql_host_rank(
    pages_sql: str, iterations: int = 4, damping: float = 0.85
) -> str:
    """DuckDB oracle twin of :func:`host_rank` with the power iteration
    UNROLLED (one CTE pair per round — iterations are a compile-time
    constant, so no recursive-CTE single-reference gymnastics). Every
    float op mirrors the Spark expression order — share division, contrib
    sum, ``(1-d)/n + d*(1-sent)/n + d*contrib`` — so after ``round(.,6)``
    the driver's value hash checks true cross-engine parity of the full
    pipeline: link regex → host collapse → weighted PageRank with exact
    dangling-mass redistribution.

    ``pages_sql`` must yield (url, html)."""
    from ..functions.quality import _dq
    from ..functions.weburl import sql_url_host

    d = repr(float(damping))
    ctes = [
        f"pages AS ({pages_sql})",
        (
            "links AS (\n"
            "  SELECT url AS src_url,\n"
            f"         unnest(regexp_extract_all(html, {_dq(HREF_RE)}, 1)) AS href\n"
            "  FROM pages\n)"
        ),
        (
            "hg AS (\n"
            "  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (\n"
            f"    SELECT {sql_url_host('src_url')} AS src,\n"
            f"           {sql_url_host('href')} AS dst\n"
            "    FROM links\n"
            "  ) WHERE src <> dst AND dst <> '' GROUP BY src, dst\n)"
        ),
        (
            "nodes AS (\n"
            "  SELECT src AS node FROM hg UNION SELECT dst FROM hg\n)"
        ),
        "nstat AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        (
            "share AS (\n"
            "  SELECT hg.src, hg.dst, hg.w / ow.out_w AS share\n"
            "  FROM hg JOIN (SELECT src, sum(w) AS out_w FROM hg GROUP BY src) ow\n"
            "  USING (src)\n)"
        ),
        "r0 AS (SELECT node, 1.0 / ns.n AS rank FROM nodes CROSS JOIN nstat ns)",
    ]
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"c{i} AS (\n"
            f"  SELECT sh.dst, sum({p}.rank * sh.share) AS contrib\n"
            f"  FROM {p} JOIN share sh ON {p}.node = sh.src GROUP BY sh.dst\n)"
        )
        ctes.append(
            f"s{i} AS (SELECT coalesce(sum(contrib), 0.0) AS sent FROM c{i})"
        )
        ctes.append(
            f"r{i} AS (\n"
            f"  SELECT n2.node,\n"
            f"         ((1.0 - {d}) / ns.n + ({d} * (1.0 - s.sent)) / ns.n)\n"
            f"           + {d} * coalesce(c.contrib, 0.0) AS rank\n"
            f"  FROM nodes n2 CROSS JOIN nstat ns CROSS JOIN s{i} s\n"
            f"  LEFT JOIN c{i} c ON n2.node = c.dst\n)"
        )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT node AS host, round(rank, 6) AS rank FROM r{iterations}"
    )


#: rel=canonical link tag, both attribute orders, case-insensitive; same
#: pattern text under Java regex and RE2 (no lookarounds), per the repo
#: dual-dialect policy.
CANONICAL_REL_FIRST_RE = (
    r"""(?i)<link[^>]*rel=["']?canonical["']?[^>]*href=["']([^"'<>\s]+)["']"""
)
CANONICAL_HREF_FIRST_RE = (
    r"""(?i)<link[^>]*href=["']([^"'<>\s]+)["'][^>]*rel=["']?canonical["']?"""
)


def extract_canonical(html) -> "Column":
    """The page's declared canonical url (rel=canonical link tag, either
    attribute order), or null. One native coalesce of two regexp_extracts."""
    c = html if not isinstance(html, str) else F.col(html)
    c = c.cast("string")
    first = F.regexp_extract(c, CANONICAL_REL_FIRST_RE, 1)
    second = F.regexp_extract(c, CANONICAL_HREF_FIRST_RE, 1)
    return F.coalesce(
        F.when(first != "", first), F.when(second != "", second)
    )


def canonical_collapse(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Crawl-side duplicate collapse: every page keyed by its declared
    canonical (or itself) — the dedup group the ORIGIN asserts, zero
    similarity computation. Emits (url, canonical_url nullable,
    group_key, is_canonical); downstream dedup treats group_key exactly
    like a fingerprint key (one hash agg collapses each group)."""
    canon = extract_canonical(F.col(html_col))
    return pages.select(
        F.col(url_col).alias("url"),
        canon.alias("canonical_url"),
        F.coalesce(canon, F.col(url_col)).alias("group_key"),
        (canon.isNull() | (canon == F.col(url_col))).alias("is_canonical"),
    )


#: opening/closing tag NAMES (no attributes): the page's layout skeleton.
TAG_STREAM_RE = r"(?i)</?([a-zA-Z][a-zA-Z0-9]*)"


def tag_stream(html) -> "Column":
    """The page's tag-name sequence as one space-joined lowercase string —
    its LAYOUT stripped of content. Near-identical tag streams = same
    template; one regexp_extract_all + array_join, scan-speed."""
    c = html if not isinstance(html, str) else F.col(html)
    return F.array_join(
        F.transform(
            F.regexp_extract_all(c.cast("string"), F.lit(TAG_STREAM_RE), 1),
            lambda t: F.lower(t),
        ),
        " ",
    )


def sql_tag_stream(html_col: str) -> str:
    from ..functions.quality import _dq

    return (
        f"array_to_string(list_transform(regexp_extract_all("
        f"{html_col}, {_dq(TAG_STREAM_RE)}, 1), t -> lower(t)), ' ')"
    )


def template_fingerprint(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, simhash) template fingerprints: SimHash over the TAG stream
    instead of the text — pages generated by the same template (listing
    grids, forum shells, tag-page spam) collapse to near-identical
    signatures however different their visible words are. Template-level
    dedup is the standard crawl-corpus complement to content dedup
    (boilerplate detection literature, e.g. Gibson et al., "The volume
    and evolution of web page templates", WWW 2005). Pure composition:
    tag_stream (narrow map) → textdedup.simhash (one hash agg);
    ``textdedup.simhash_pairs``-style hamming banding applies unchanged
    downstream when grouping by near-equality rather than exact match."""
    from .textdedup import simhash

    staged = pages.select(
        F.col(url_col).alias("url"), tag_stream(F.col(html_col)).alias("_tags")
    )
    return simhash(staged, "_tags", "url").withColumnRenamed("doc", "url")


def discover_frontier(links: DataFrame, known_urls: DataFrame) -> DataFrame:
    """Frontier expansion with a seen-filter: outlink targets we have
    never captured, deduplicated and canonicalized — the discovery feed
    for the crawl planner (urls with no history score via
    ``default_period_s`` / sitemap assertion, not statistics). One
    distinct + one anti-join on url, both key-partitioned; ``known_urls``
    is typically the CDX url column."""
    from data_pipeline_spark.functions.weburl import canonical_url

    targets = links.select(
        canonical_url("href").alias("url")
    ).where(F.col("url").rlike("^https?://")).distinct()
    known = known_urls.select(canonical_url(known_urls.columns[0]).alias("url"))
    return targets.join(known, "url", "left_anti")
