"""robots.txt parsing and URL permission checks (RFC 9309 / REP).

The crawl loop's missing legality layer: before the planner's urls go to
the fetch layer, each must clear its host's robots rules, and the fetcher
needs the host's crawl-delay. The reference repo hardcodes per-source
politeness (configs/*.toml delays); real web-scale crawling reads it from
the origin.

Everything is distributed-native (no per-row Python):

- :func:`parse_robots` — one ``posexplode(split(txt, '\\n'))`` per file,
  comment stripping, line classification, and user-agent GROUP assignment
  as a running count over a per-host window (consecutive ``User-agent:``
  lines share the group per the RFC). Group selection follows the RFC:
  groups naming our agent (longest product-token match simplified to
  case-insensitive substring) win; otherwise ``*`` groups apply; no group
  → everything allowed.
- :func:`rule_regex_expr` — compiles a rule path to an anchored regex IN
  EXPRESSIONS (escape metacharacters, ``*`` → ``.*``, trailing ``$`` →
  end anchor), so rule matching is one ``rlike`` inside codegen.
- :func:`check_allowed` — urls ⋈ their host's rules (rules-per-host is
  small; the join is host-keyed and AQE handles hot hosts), then ONE
  ``max_by`` hash agg picks the longest matching rule, allow winning
  length ties (Google semantics). Unmatched urls are allowed.

Scale: robots files are tiny and per-host; rules frames broadcast in
practice. The url-side cost is one shuffle on host + one agg — O(urls).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _lines(df: DataFrame, host_col: str, txt_col: str) -> DataFrame:
    """(host, pos, line) with comments stripped and blanks kept (blank
    lines do NOT end groups in RFC 9309 — only a new UA line starts one).
    Splits on ``\\r?\\n``: robots.txt on the wire is CRLF more often than
    not, and a trailing ``\\r`` left on the value would poison every
    rule path (trim strips spaces only)."""
    return df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), r"\r?\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")).alias("line"),
    )


def _field(line: Column, name: str) -> Column:
    """Value of a ``Name: value`` line (case-insensitive name), else null."""
    v = F.regexp_extract(line, rf"(?i)^{name}\s*:\s*(.*)$", 1)
    matched = F.lower(line).rlike(rf"(?i)^{name}\s*:")
    return F.when(matched, F.trim(v))


def parse_robots(
    df: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Effective rule set per host for ``agent``:
    (host, rule, path, rule_len, crawl_delay).

    ``rule`` ∈ {allow, disallow}; an empty Disallow ("allow all") yields
    no row, matching its semantics. ``crawl_delay`` is the group's value
    repeated on each row (null if unset)."""
    # Drop blank lines BEFORE group assignment: RFC 9309's ABNF allows
    # emptyline anywhere inside a group (including between consecutive
    # User-agent lines), so grouping must look at the non-blank sequence —
    # 'UA: A\n\nUA: B\nDisallow: /x' is ONE group covering both agents.
    lines = _lines(df, host_col, txt_col).where(F.col("line") != "")
    ua = _field(F.col("line"), "user-agent")
    classified = lines.select(
        "host",
        "pos",
        ua.alias("ua"),
        _field(F.col("line"), "allow").alias("allow_path"),
        _field(F.col("line"), "disallow").alias("disallow_path"),
        _field(F.col("line"), "crawl-delay").alias("delay"),
    )
    w = Window.partitionBy("host").orderBy("pos")
    # a UA line STARTS a new group unless the previous line was also UA
    prev_is_ua = F.lag(F.col("ua").isNotNull(), 1, False).over(w)
    starts = F.col("ua").isNotNull() & ~prev_is_ua
    grouped = classified.withColumn(
        "grp", F.sum(starts.cast("int")).over(w)
    ).where(F.col("grp") > 0)

    agents = grouped.where(F.col("ua").isNotNull()).groupBy("host", "grp").agg(
        F.collect_set(F.lower("ua")).alias("uas")
    )
    me = F.lit(agent.lower())
    agents = agents.select(
        "host",
        "grp",
        F.array_contains("uas", "*").alias("has_star"),
        # u != "": an empty (malformed) User-agent value would otherwise
        # substring-match EVERY agent and suppress the '*' group host-wide.
        (
            F.exists(
                "uas",
                lambda u: (me != "*") & me.contains(u) & (u != "*") & (u != ""),
            )
        ).alias("has_me"),
    )
    # RFC: if ANY group names our agent, star groups do not apply
    host_has_me = agents.groupBy("host").agg(
        F.max(F.col("has_me").cast("int")).alias("host_has_me")
    )
    chosen = (
        agents.join(host_has_me, "host")
        .where(
            F.when(F.col("host_has_me") == 1, F.col("has_me"))
            .otherwise(F.col("has_star"))
        )
        .select("host", "grp")
    )

    body = grouped.join(chosen, ["host", "grp"])
    # try_cast: a malformed delay ("10s", "1,5") must null out, not abort
    # the whole crawl plan under Spark 4's default ANSI cast semantics.
    delay = body.where(F.col("delay").isNotNull()).groupBy("host").agg(
        F.min(F.col("delay").try_cast("double")).alias("crawl_delay")
    )
    rules = body.select(
        "host",
        "grp",
        F.when(F.col("allow_path").isNotNull(), F.lit("allow"))
        .when(F.col("disallow_path").isNotNull(), F.lit("disallow"))
        .alias("rule"),
        F.coalesce("allow_path", "disallow_path").alias("path"),
    ).where(F.col("rule").isNotNull() & (F.col("path") != ""))
    # FULL join with the delay frame: a chosen group with a crawl-delay
    # but no path rules (delay-only, or the allow-all empty Disallow)
    # must still surface its host — otherwise check_allowed hands the
    # fetcher the default spacing instead of the origin's demand.
    return (
        rules.select(
            "host", "rule", "path", F.length("path").alias("rule_len")
        )
        .distinct()
        .join(delay, "host", "full")
    )


def sitemaps_of(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap) — Sitemap lines are global (outside groups); feeds
    sources/sitemap.py's fetch level."""
    lines = _lines(df, host_col, txt_col)
    sm = _field(F.col("line"), "sitemap")
    return lines.select("host", sm.alias("sitemap")).where(
        F.col("sitemap").isNotNull() & (F.col("sitemap") != "")
    )


def rule_regex_expr(path: Column) -> Column:
    """Rule path → anchored Java/RE2 regex, entirely in expressions:
    escape regex metacharacters, ``*`` → ``.*``, and a trailing ``$``
    becomes the end anchor. Prefix semantics otherwise (no trailing
    ``.*`` needed — rlike is unanchored at the end)."""
    ends_anchor = path.endswith("$")
    body = F.when(
        ends_anchor, path.substr(F.lit(1), F.length(path) - 1)
    ).otherwise(path)
    escaped = F.regexp_replace(
        body, r"([.^$+?(){}\[\]\\|])", r"\\$1"
    )
    wildcarded = F.regexp_replace(escaped, r"\*", ".*")
    return F.concat(
        F.lit("^"), wildcarded, F.when(ends_anchor, F.lit("$")).otherwise(F.lit(""))
    )


def check_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Urls + (allowed boolean, matched_rule path or null, crawl_delay).

    Longest matching rule decides; allow wins exact length ties; no
    matching rule (or no rules for the host) → allowed. One host-keyed
    join + one max_by agg."""
    from data_pipeline_spark.functions.weburl import url_host

    from data_pipeline_spark.functions.weburl import (
        HOST_DOT_RE,
        PORT_STRIP_RE,
        WWW_RE,
    )

    def _norm_bare_host(c):
        # The urls side goes through url_host (lowercase, port/www./trailing
        # dot stripped); the rules side is a BARE hostname column and must be
        # normalized the same way or 'WWW.Example.COM'-keyed robots silently
        # match nothing and the legality gate allows everything.
        h = F.lower(F.trim(c))
        h = F.regexp_replace(h, PORT_STRIP_RE, "")
        h = F.regexp_replace(h, HOST_DOT_RE, "")
        return F.regexp_replace(h, WWW_RE, "")

    u = urls.withColumn("__host", url_host(url_col)).withColumn(
        "__path",
        F.coalesce(
            F.nullif(F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1), F.lit("")),
            F.lit("/"),
        ),
    )
    r = rules.select(
        _norm_bare_host(F.col("host")).alias("__host"),
        "rule",
        F.col("path").alias("rule_path"),
        "rule_len",
        "crawl_delay",
        rule_regex_expr(F.col("path")).alias("__re"),
    )
    joined = u.join(r, "__host", "left")
    # rlike with a column-valued pattern: SQL form (the DataFrame method
    # wants a literal pattern)
    joined = joined.withColumn(
        "__matched",
        F.when(F.col("__re").isNotNull(), F.expr("rlike(__path, __re)")).otherwise(False),
    )
    best = joined.groupBy(*urls.columns).agg(
        F.max_by(
            F.struct(
                F.col("rule").alias("rule"), F.col("rule_path").alias("p")
            ),
            F.when(
                F.col("__matched"),
                F.struct(
                    F.col("rule_len").alias("l"),
                    # allow outranks disallow at equal length
                    (F.col("rule") == "allow").cast("int").alias("a"),
                ),
            ),
        ).alias("__best"),
        F.max(F.when(F.col("__matched"), F.col("rule_len"))).alias("__any"),
        F.min("crawl_delay").alias("crawl_delay"),
    )
    return best.select(
        *urls.columns,
        F.when(F.col("__any").isNull(), F.lit(True))
        .otherwise(F.col("__best.rule") == "allow")
        .alias("allowed"),
        F.when(F.col("__any").isNotNull(), F.col("__best.p")).alias("matched_rule"),
        "crawl_delay",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twin
# ---------------------------------------------------------------------------

#: metacharacter class shared by rule_regex_expr and the twin below.
_ESCAPE_CLASS = r"([.^$+?(){}\[\]\\|])"


def sql_check_allowed(
    urls_sql: str,
    robots_sql: str,
    agent: str = "*",
    url_col: str = "url",
    url_cols: tuple[str, ...] = ("url",),
) -> str:
    """DuckDB twin of ``check_allowed(urls, parse_robots(robots, agent))``
    — the ENTIRE legality pipeline (line split, comment strip, UA group
    assignment via the same lag/cumsum windows, RFC group selection, rule
    compilation to anchored regexes, longest-match max_by with
    allow-wins-ties) expressed once more in SQL so the driver value-hash
    checks it cross-engine. ``urls_sql`` yields ``url_cols`` (must
    include ``url_col``); ``robots_sql`` yields (host, robots_txt)."""
    from ..functions.quality import _dq
    from ..functions.weburl import sql_url_host

    me = agent.lower().replace("'", "''")
    if agent == "*":
        has_me = "FALSE"
    else:
        has_me = (
            f"len(list_filter(uas, u -> u <> '*' AND u <> '' "
            f"AND strpos('{me}', u) > 0)) > 0"
        )
    ucols = ", ".join(url_cols)
    field = lambda name: (  # noqa: E731 — local SQL snippet builder
        f"CASE WHEN regexp_matches(line, '(?i)^{name}\\s*:') "
        f"THEN trim(coalesce(regexp_extract(line, '(?i)^{name}\\s*:\\s*(.*)$', 1), '')) END"
    )
    return f"""
WITH rb_lines0 AS (
  SELECT host,
         unnest(list_transform(range(1, len(ls) + 1),
                i -> {{'pos': i,
                       'line': trim(regexp_replace(ls[i], '#.*$', '', 'g'))}})) AS s
  FROM (SELECT host, string_split_regex(robots_txt, '\r?\n') AS ls FROM ({robots_sql}))
),
rb_cls AS (
  SELECT host, pos,
         {field('user-agent')} AS ua,
         {field('allow')} AS allow_path,
         {field('disallow')} AS disallow_path,
         {field('crawl-delay')} AS delay
  FROM (SELECT host, s.pos AS pos, s.line AS line
        FROM rb_lines0 WHERE s.line <> '')
),
rb_grp AS (
  SELECT *, sum(CASE WHEN starts THEN 1 ELSE 0 END)
              OVER (PARTITION BY host ORDER BY pos) AS grp
  FROM (
    SELECT *, (ua IS NOT NULL AND NOT coalesce(
                 lag(ua IS NOT NULL) OVER (PARTITION BY host ORDER BY pos),
                 FALSE)) AS starts
    FROM rb_cls
  )
),
rb_body0 AS (SELECT * FROM rb_grp WHERE grp > 0),
rb_agents AS (
  SELECT host, grp, list(DISTINCT lower(ua)) AS uas
  FROM rb_body0 WHERE ua IS NOT NULL GROUP BY host, grp
),
rb_ag2 AS (
  SELECT host, grp, list_contains(uas, '*') AS has_star, ({has_me}) AS has_me
  FROM rb_agents
),
rb_hhm AS (
  SELECT host, max(CASE WHEN has_me THEN 1 ELSE 0 END) AS host_has_me
  FROM rb_ag2 GROUP BY host
),
rb_chosen AS (
  SELECT a.host, a.grp
  FROM rb_ag2 a JOIN rb_hhm h USING (host)
  WHERE CASE WHEN h.host_has_me = 1 THEN a.has_me ELSE a.has_star END
),
rb_body AS (
  SELECT b.* FROM rb_body0 b JOIN rb_chosen c USING (host, grp)
),
rb_delay AS (
  SELECT host, min(TRY_CAST(delay AS DOUBLE)) AS crawl_delay
  FROM rb_body WHERE delay IS NOT NULL GROUP BY host
),
rb_rules0 AS (
  SELECT DISTINCT host,
         CASE WHEN allow_path IS NOT NULL THEN 'allow'
              WHEN disallow_path IS NOT NULL THEN 'disallow' END AS rule,
         coalesce(allow_path, disallow_path) AS path
  FROM rb_body
  WHERE (allow_path IS NOT NULL OR disallow_path IS NOT NULL)
    AND coalesce(allow_path, disallow_path) <> ''
),
rb_rules AS (
  SELECT coalesce(r.host, d.host) AS host, r.rule, r.path,
         CAST(length(r.path) AS INT) AS rule_len, d.crawl_delay
  FROM rb_rules0 r FULL JOIN rb_delay d ON r.host = d.host
),
rb_r AS (
  SELECT regexp_replace(regexp_replace(regexp_replace(lower(trim(host)),
           ':[0-9]+$', ''), '\\.+$', ''), '^www\\.', '') AS __host,
         rule, path AS rule_path, rule_len, crawl_delay,
         CASE WHEN path IS NOT NULL THEN
           '^' || regexp_replace(regexp_replace(
                    CASE WHEN path LIKE '%$'
                         THEN substr(path, 1, length(path) - 1)
                         ELSE path END,
                    {_dq(_ESCAPE_CLASS)}, '\\\\\\1', 'g'),
                  '\\*', '.*', 'g')
               || CASE WHEN path LIKE '%$' THEN '$' ELSE '' END
         END AS __re
  FROM rb_rules
),
rb_u AS (
  SELECT u0.*, {sql_url_host(url_col)} AS __host,
         coalesce(nullif(coalesce(regexp_extract({url_col},
           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1), ''), ''), '/')
           AS __path
  FROM ({urls_sql}) u0
),
rb_joined AS (
  SELECT u.*, r.rule, r.rule_path, r.rule_len, r.crawl_delay,
         CASE WHEN r.__re IS NOT NULL
              THEN regexp_matches(u.__path, r.__re) ELSE FALSE END AS __matched
  FROM rb_u u LEFT JOIN rb_r r USING (__host)
),
rb_best AS (
  SELECT {ucols},
         arg_max({{'rule': rule, 'p': rule_path}},
                 CASE WHEN __matched THEN
                   CAST(rule_len AS BIGINT) * 2
                     + CASE WHEN rule = 'allow' THEN 1 ELSE 0 END END)
           AS __best,
         max(CASE WHEN __matched THEN rule_len END) AS __any,
         min(crawl_delay) AS crawl_delay
  FROM rb_joined GROUP BY {ucols}
)
SELECT {ucols},
       CASE WHEN __any IS NULL THEN TRUE
            ELSE __best.rule = 'allow' END AS allowed,
       CASE WHEN __any IS NOT NULL THEN __best.p END AS matched_rule,
       crawl_delay
FROM rb_best
"""
