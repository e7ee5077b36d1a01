"""RSS / Atom feed ingestion: the freshness channel next to sitemaps
(X116).

Sitemaps enumerate a site; FEEDS announce what just changed — most
news/blog/commerce hosts publish new and updated pages in an RSS 2.0
``<item>`` or Atom ``<entry>`` long before any sitemap regenerates, so
a crawl planner that tails feeds gets minutes-fresh change assertions
instead of daily ones. This module parses both dialects into one
unified entry frame and adapts it to the SAME server-asserted-change
merge the sitemap path uses (``sitemap.sitemap_due``), so the planner
has a single "origin said so" input.

Parsing follows the sitemap module's discipline exactly: the wire
formats are flat, regular XML, so extraction is pure native regexp
expressions — one ``regexp_extract_all`` per file splits the entries,
one ``regexp_extract`` per field inside the exploded entry, the same
pattern text valid under Java regex and RE2/DuckDB (``[\\s\\S]``
instead of dotall). Zero Python, zero shuffle; feeds parse at scan
speed, and at web scale the frame is (host, xml) pairs from the fetch
layer parsed independently per row.

Dialect notes honored here:

- RSS links are element text (``<link>…</link>``); Atom links are an
  ATTRIBUTE (``<link href="…"/>``, with ``rel="alternate"`` preferred
  over enclosure/self links when both are present).
- RSS ``<guid>`` / Atom ``<id>`` are the stable entry identities (the
  link may change on repost); both surface as ``entry_id`` with the
  link as fallback.
- Titles are frequently CDATA-wrapped — the wrapper is stripped, then
  XML entities decode (CDATA text is literal, entities decode only
  OUTSIDE CDATA; the order matters and is tested).
- RSS dates are RFC 822, Atom dates ISO 8601; both parse through
  :func:`published_ts` with try_-semantics (web feeds contain garbage
  — a bad date must not fail the scan).

Reference: no counterpart (the Rust pipeline crawls fixed API
endpoints and has no discovery loop at all).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .sitemap import sql_xml_unescape, xml_unescape

__all__ = [
    "parse_feed",
    "published_ts",
    "feed_assertions",
    "sql_parse_feed",
]

#: entry containers (attributes allowed on the open tag; RE2-safe)
ITEM_RE = r"<item(?:\s[^>]*)?>([\s\S]*?)</item>"
ENTRY_RE = r"<entry(?:\s[^>]*)?>([\s\S]*?)</entry>"

#: RSS fields — element text
RSS_LINK_RE = r"<link>\s*([^<\s][^<]*?)\s*</link>"
GUID_RE = r"<guid(?:\s[^>]*)?>\s*([^<]+?)\s*</guid>"
PUBDATE_RE = r"<pubDate>\s*([^<]+?)\s*</pubDate>"

#: Atom fields — link is an attribute; alternate-rel preferred
ATOM_LINK_ALT_RE = (
    r'<link[^>]*rel\s*=\s*"alternate"[^>]*href\s*=\s*"([^"]*)"'
)
ATOM_LINK_ALT_RE2 = (
    r'<link[^>]*href\s*=\s*"([^"]*)"[^>]*rel\s*=\s*"alternate"'
)
ATOM_LINK_ANY_RE = r'<link(?:\s[^>]*)?href\s*=\s*"([^"]*)"'
ATOM_ID_RE = r"<id>\s*([^<]+?)\s*</id>"
UPDATED_RE = r"<updated>\s*([^<]+?)\s*</updated>"

TITLE_RE = r"<title(?:\s[^>]*)?>([\s\S]*?)</title>"
CDATA_RE = r"^\s*<!\[CDATA\[([\s\S]*?)\]\]>\s*$"


def _f(entry: Column, regex: str) -> Column:
    e = F.regexp_extract(entry, regex, 1)
    return F.when(e == "", None).otherwise(e)


def _title(entry: Column) -> Column:
    """Title text: CDATA payload is literal; non-CDATA decodes the five
    XML entities."""
    raw = _f(entry, TITLE_RE)
    cdata = F.regexp_extract(raw, CDATA_RE, 1)
    return F.when(raw.isNull(), None).otherwise(
        F.when(raw.rlike(CDATA_RE), cdata).otherwise(
            xml_unescape(F.trim(raw))
        )
    )


def parse_feed(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Unified entry frame: ``(passthrough..., feed_type, link, title,
    published, entry_id)`` — one row per RSS ``<item>`` or Atom
    ``<entry>``. ``published`` is the raw date string (RFC 822 for RSS,
    ISO 8601 for Atom — parse with :func:`published_ts`); ``entry_id``
    is guid/id with the link as fallback. Entries without a link are
    dropped (nothing to crawl). Input columns other than ``xml_col``
    pass through."""
    xml = F.col(xml_col)
    is_atom = xml.rlike(r"<feed[\s>]")
    feed_type = F.when(is_atom, "atom").otherwise("rss")
    entries = F.when(
        is_atom, F.regexp_extract_all(xml, F.lit(ENTRY_RE), 1)
    ).otherwise(F.regexp_extract_all(xml, F.lit(ITEM_RE), 1))
    passthrough = [c for c in df.columns if c != xml_col]
    e = F.col("__entry")
    atom_link = F.coalesce(
        _f(e, ATOM_LINK_ALT_RE), _f(e, ATOM_LINK_ALT_RE2),
        _f(e, ATOM_LINK_ANY_RE),
    )
    link = xml_unescape(
        F.when(F.col("feed_type") == "atom", atom_link).otherwise(
            _f(e, RSS_LINK_RE)
        )
    )
    published = F.when(
        F.col("feed_type") == "atom", _f(e, UPDATED_RE)
    ).otherwise(_f(e, PUBDATE_RE))
    entry_id = F.when(
        F.col("feed_type") == "atom", _f(e, ATOM_ID_RE)
    ).otherwise(_f(e, GUID_RE))
    return (
        df.select(
            *passthrough,
            feed_type.alias("feed_type"),
            F.explode(entries).alias("__entry"),
        )
        .select(
            *passthrough,
            "feed_type",
            link.alias("link"),
            _title(e).alias("title"),
            published.alias("published"),
            F.coalesce(entry_id, link).alias("entry_id"),
        )
        .where(F.col("link").isNotNull())
    )


def published_ts(col="published") -> Column:
    """Feed date → timestamp: ISO 8601 (Atom) directly; RFC 822 (RSS)
    by stripping the advisory weekday (Spark's post-3.0 parser forbids
    ``EEE`` in parse patterns) and normalizing the GMT/UT/Z zone names
    to a numeric offset. Unparseable → null — never fails the scan."""
    c = F.col(col) if isinstance(col, str) else col
    # "Mon, 02 Feb 2026 10:30:00 GMT" -> "02 Feb 2026 10:30:00 +0000"
    rfc = F.regexp_replace(c, r"^[A-Za-z]{3},\s*", "")
    rfc = F.regexp_replace(rfc, r"\s+(GMT|UTC?|Z)\s*$", " +0000")
    # RFC 822 allows a single-digit day ("Mon, 2 Feb 2026 ...") which the
    # strict dd pattern nulls out (ADVICE r3) — left-pad it to two digits.
    rfc = F.regexp_replace(rfc, r"^(\d)\s", "0$1 ")
    return F.coalesce(
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(rfc, F.lit("dd MMM yyyy HH:mm:ss Z")),
    )


def feed_assertions(entries: DataFrame) -> DataFrame:
    """Adapt parsed feed entries to the sitemap assertion shape
    ``(loc, lastmod)`` so :func:`sitemap.sitemap_due` merges BOTH
    channels with one code path: feed link → loc, published → lastmod
    (normalized through :func:`published_ts` first — sitemap's
    ``lastmod_ts`` expects W3C datetimes, not RFC 822; sitemap_due then
    maxes over assertions per url, so a url asserted by sitemap AND
    feed takes the freshest)."""
    return entries.select(
        F.col("link").alias("loc"),
        published_ts("published").cast("string").alias("lastmod"),
    )


def sql_parse_feed(input_rel: str, xml_col: str = "xml") -> str:
    """DuckDB twin of :func:`parse_feed` (same regexes under RE2)."""

    def dq(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def f(regex: str) -> str:
        return f"nullif(regexp_extract(e, {dq(regex)}, 1), '')"

    atom_link = (
        f"coalesce({f(ATOM_LINK_ALT_RE)}, {f(ATOM_LINK_ALT_RE2)}, "
        f"{f(ATOM_LINK_ANY_RE)})"
    )
    link = sql_xml_unescape(
        f"CASE WHEN feed_type = 'atom' THEN {atom_link} "
        f"ELSE {f(RSS_LINK_RE)} END"
    )
    raw_title = f(TITLE_RE)
    title = (
        f"CASE WHEN {raw_title} IS NULL THEN NULL "
        f"WHEN regexp_matches({raw_title}, {dq(CDATA_RE)}) "
        f"THEN regexp_extract({raw_title}, {dq(CDATA_RE)}, 1) "
        f"ELSE {sql_xml_unescape(f'trim({raw_title})')} END"
    )
    published = (
        f"CASE WHEN feed_type = 'atom' THEN {f(UPDATED_RE)} "
        f"ELSE {f(PUBDATE_RE)} END"
    )
    entry_id = (
        f"CASE WHEN feed_type = 'atom' THEN {f(ATOM_ID_RE)} "
        f"ELSE {f(GUID_RE)} END"
    )
    return f"""
WITH feed_files AS (
  SELECT *, CASE WHEN regexp_matches({xml_col}, '<feed[\\s>]')
                 THEN 'atom' ELSE 'rss' END AS feed_type
  FROM {input_rel}
),
feed_entries AS (
  SELECT * EXCLUDE ({xml_col}),
    unnest(CASE WHEN feed_type = 'atom'
      THEN regexp_extract_all({xml_col}, {dq(ENTRY_RE)}, 1)
      ELSE regexp_extract_all({xml_col}, {dq(ITEM_RE)}, 1) END) AS e
  FROM feed_files
)
SELECT * EXCLUDE (e, feed_type), feed_type,
  {link} AS link,
  {title} AS title,
  {published} AS published,
  coalesce({entry_id}, {link}) AS entry_id
FROM feed_entries
WHERE {link} IS NOT NULL
"""
