"""Sitemap ingestion: server-asserted change discovery for the crawl loop.

robots.txt points at sitemap.xml; sitemaps list urls with ``<lastmod>``
(and advisory ``<changefreq>``/``<priority>``). That is the OTHER change
signal next to the engine's own observed change rates
(operators/recrawl.py): the server *asserts* a page changed. The planner
treats an asserted modification after the last capture as must-fetch —
no statistics needed when the origin already told us.

Parsing is pure native expressions (the sitemap protocol's XML is flat
and regular — regexp extraction is the standard fast path): one
``regexp_extract_all`` splits ``<url>…</url>`` entries, one
``regexp_extract`` per field inside the exploded entry. Zero Python,
zero shuffle; 50k-url sitemap files parse at scan speed. Sitemap INDEX
files (``<sitemap><loc>``) enumerate the next fetch level.

Scale: sitemaps are fetched per host — the frame here is (host_file,
xml) pairs from the fetch layer, millions of rows at web scale, each
parsed independently. The join against capture history is one key
equi-join on url.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: one <url>…</url> entry ([\s\S] instead of (?s). — same pattern text is
#: valid under Java regex and RE2/DuckDB, the repo dual-dialect policy)
URL_ENTRY_RE = r"<url>([\s\S]*?)</url>"
SITEMAP_ENTRY_RE = r"<sitemap>([\s\S]*?)</sitemap>"
LOC_RE = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"
LASTMOD_RE = r"<lastmod>\s*([^<]+?)\s*</lastmod>"
CHANGEFREQ_RE = r"<changefreq>\s*([^<]+?)\s*</changefreq>"
PRIORITY_RE = r"<priority>\s*([^<]+?)\s*</priority>"

#: the five XML predefined entities. The sitemap protocol REQUIRES urls
#: with '&'/'<'/... to be entity-escaped inside <loc> — a query-string url
#: is stored as 'p?a=1&amp;b=2' and must decode back before it can join
#: against captured urls. '&amp;' decodes LAST so literal text '&amp;lt;'
#: round-trips to '&lt;', not '<'. Numeric character references (&#NN;)
#: are out of scope (vanishingly rare in <loc>; they would need a per-row
#: codepoint loop that native expressions can't do).
XML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def xml_unescape(c: Column) -> Column:
    """Decode the five predefined XML entities (native replace chain)."""
    for ent, ch in XML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def sql_xml_unescape(expr: str) -> str:
    """DuckDB twin of :func:`xml_unescape`."""
    for ent, ch in XML_ENTITIES:
        expr = f"replace({expr}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    return expr


def _f(entry: Column, regex: str) -> Column:
    e = F.regexp_extract(entry, regex, 1)
    return F.when(e == "", None).otherwise(e)


def parse_sitemap(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(loc, lastmod, changefreq, priority) per ``<url>`` entry; input
    columns other than ``xml_col`` pass through (carry the source host /
    fetch time). ``lastmod`` is the raw W3C datetime string — date-only
    and full ISO both ``to_timestamp`` cleanly via :func:`lastmod_ts`."""
    entry = F.explode(
        F.regexp_extract_all(F.col(xml_col), F.lit(URL_ENTRY_RE), 1)
    ).alias("__entry")
    passthrough = [c for c in df.columns if c != xml_col]
    exploded = df.select(*passthrough, entry)
    # priority: try_cast, not cast — '<priority>high</priority>' and other
    # garbage must null out, never fail the scan under ANSI mode (same
    # convention as robots.py's Crawl-delay parse).
    return exploded.select(
        *passthrough,
        xml_unescape(_f(F.col("__entry"), LOC_RE)).alias("loc"),
        _f(F.col("__entry"), LASTMOD_RE).alias("lastmod"),
        _f(F.col("__entry"), CHANGEFREQ_RE).alias("changefreq"),
        _f(F.col("__entry"), PRIORITY_RE).try_cast("double").alias("priority"),
    ).where(F.col("loc").isNotNull())


def parse_sitemap_index(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(loc, lastmod) per child sitemap of an index file — the next fetch
    level for the crawl driver."""
    entry = F.explode(
        F.regexp_extract_all(F.col(xml_col), F.lit(SITEMAP_ENTRY_RE), 1)
    ).alias("__entry")
    passthrough = [c for c in df.columns if c != xml_col]
    return (
        df.select(*passthrough, entry)
        .select(
            *passthrough,
            xml_unescape(_f(F.col("__entry"), LOC_RE)).alias("loc"),
            _f(F.col("__entry"), LASTMOD_RE).alias("lastmod"),
        )
        .where(F.col("loc").isNotNull())
    )


def lastmod_ts(col="lastmod") -> Column:
    """W3C datetime → timestamp: full ISO-8601 parses directly; date-only
    values ('2024-01-05') become midnight UTC. Unparseable → null (never
    fails the scan — web sitemaps contain garbage)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )


def sitemap_due(
    stats: DataFrame,
    sitemap_entries: DataFrame,
    key: str = "url",
) -> DataFrame:
    """Merge server-asserted modifications into recrawl stats: adds
    ``server_lastmod`` (latest asserted) and ``server_modified`` (asserted
    AFTER our last capture, or url never captured). The planner sorts
    asserted-modified urls to the front regardless of due_score — the
    origin said so; statistics are for when it doesn't. One hash agg over
    entries + one left join; urls in the sitemap but never captured join
    from the entries side with null stats (discovery, not just refresh)."""
    latest = (
        sitemap_entries.groupBy(F.col("loc").alias(key))
        .agg(F.max(lastmod_ts("lastmod")).alias("server_lastmod"))
        # presence flag: a never-captured url in the sitemap is a discovery
        # (= asserted) even when its optional <lastmod> is absent —
        # server_lastmod alone can't distinguish "no entry" from
        # "entry without lastmod"
        .withColumn("__asserted", F.lit(True))
    )
    joined = stats.join(latest, key, "full_outer")
    return joined.withColumn(
        "server_modified",
        F.coalesce(
            F.col("server_lastmod") > F.col("last_ts"),
            F.col("last_ts").isNull() & F.col("__asserted").isNotNull(),
            F.lit(False),
        ),
    ).drop("__asserted")
