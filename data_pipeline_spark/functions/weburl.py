"""URL canonicalization and PII masking for url-keyed web-page records.

The engine's lake table is keyed by url (north rule: "insert/update/delete
on url-keyed web-page records"), so near-duplicate urls that differ only in
case, default ports, tracking parameters, or fragments silently fork the
same page into multiple keys. `canonical_url` collapses those classes:

- scheme + host lowercased; userinfo stripped; trailing host dot and a
  leading ``www.`` label removed
- default ports dropped (http:80, https:443), other ports kept
- empty path → ``/``; otherwise trailing slashes trimmed
- query parameters: empties and tracking params removed (``utm_*`` prefix
  plus a fixed denylist), remainder SORTED so parameter order is not a key
- fragment dropped

Non-http(s) inputs are returned trimmed but otherwise untouched (the
canonicalizer never invents structure it did not parse).

`mask_pii` / `pii_counts` redact emails, IPv4 addresses and phone-shaped
numbers with fixed placeholder tokens — the standard pre-training scrub.
The regexes avoid lookarounds so one pattern text runs identically under
Java regex (Spark) and RE2 (DuckDB); counts are non-overlapping
left-to-right matches in both engines.

Everything is native Column expressions (regexp_* + one SQL-parsed
filter/sort for the parameter list — SQL-parsed lambdas by policy, see the
sibling-lambda note in functions/quality.py). DuckDB twins are generated
from the same regex/denylist constants. The reference repo normalizes
product fields but has no URL/PII handling; this is a round-2
LLM-data-pipeline extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from .quality import _dq, _sq

# ---------------------------------------------------------------------------
# Constants (raw regexes; dialect quoting applied per engine)
# ---------------------------------------------------------------------------

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
USERINFO_RE = r"^[^@]*@"
PORT_STRIP_RE = r":[0-9]+$"
PORT_RE = r":([0-9]+)$"
# ALL trailing dots, not one: a host like ".." must collapse in a single
# pass or canonical_url isn't idempotent (".." → "." → "" across repeated
# canonicalizations; hypothesis-found).
HOST_DOT_RE = r"\.+$"
WWW_RE = r"^www\."
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
TRAILING_SLASH_RE = r"/+$"
FRAGMENT_RE = r"#[\s\S]*$"  # [\s\S]: '.' skips newlines in both dialects
QUERY_RE = r"\?([\s\S]*)"
DOMAIN_RE = r"([^.]+\.[^.]+)$"

TRACKING_PARAMS = (
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
    "ref", "igshid", "yclid", "_ga",
)
TRACKING_PREFIX = "utm_"

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{7,15}\b|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# Masking order matters (an email's local part may contain phone-shaped
# digits); counts are taken per-pattern on the ORIGINAL text.
PII_PATTERNS = (
    ("email", EMAIL_RE, EMAIL_TOKEN),
    ("ipv4", IPV4_RE, IP_TOKEN),
    ("phone", PHONE_RE, PHONE_TOKEN),
)


# URL-level curation filter (FineWeb: Penedo et al. 2024, arXiv:2406.17557;
# RefinedWeb: Penedo et al. 2023, arXiv:2306.01116 — both gate documents on
# the URL itself before fetching/processing the body, against the UT1
# blocklist + banned-word + structural heuristics). The default word list
# here is a deliberately small stand-in; production passes the real UT1
# categories via ``blocked_domains``/``banned_words``.
IP_HOST_RE = r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$"
BANNED_URL_WORDS = ("casino", "porn", "xxx", "viagra", "escort")
URL_MAX_LEN = 2048
URL_MAX_DIGIT_FRAC = 0.5
DIGIT_STRIP_RE = r"[^0-9]"


# ---------------------------------------------------------------------------
# Dialect expression builders (expression strings; Spark wraps in F.expr)
# ---------------------------------------------------------------------------

def _lit(regex: str, duck: bool) -> str:
    return _dq(regex) if duck else _sq(regex)


def _rex(col: str, regex: str, group: int, duck: bool) -> str:
    # DuckDB's regexp_extract yields NULL on no match (Spark yields '');
    # coalesce so downstream CASE/concat logic is identical.
    e = f"regexp_extract({col}, {_lit(regex, duck)}, {group})"
    return f"coalesce({e}, '')" if duck else e


def _rrep(col: str, regex: str, repl: str, duck: bool) -> str:
    if duck:
        return f"regexp_replace({col}, {_dq(regex)}, '{repl}', 'g')"
    return f"regexp_replace({col}, {_sq(regex)}, '{repl}')"


def _scheme(col: str, duck: bool) -> str:
    return f"lower({_rex(col, SCHEME_RE, 1, duck)})"


def _auth(col: str, duck: bool) -> str:
    """Authority with userinfo stripped."""
    return _rrep(_rex(col, AUTHORITY_RE, 1, duck), USERINFO_RE, "", duck)


def _host(col: str, duck: bool) -> str:
    h = f"lower({_rrep(_auth(col, duck), PORT_STRIP_RE, '', duck)})"
    return _rrep(_rrep(h, HOST_DOT_RE, "", duck), WWW_RE, "", duck)


def _port(col: str, duck: bool) -> str:
    return _rex(_auth(col, duck), PORT_RE, 1, duck)


def _path(col: str, duck: bool) -> str:
    p = _rrep(_rex(col, PATH_RE, 1, duck), TRAILING_SLASH_RE, "", duck)
    return f"CASE WHEN {p} = '' THEN '/' ELSE {p} END"


def _query(col: str, duck: bool) -> str:
    # Strip the fragment FIRST: a '?' whose first occurrence is inside the
    # fragment (SPA hash-routes like '#/route?tab=2') is not a query string.
    q = _rex(_rrep(col, FRAGMENT_RE, "", duck), QUERY_RE, 1, duck)
    denylist = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    if duck:
        params = (
            f"list_filter(string_split({q}, '&'), p -> p <> '' "
            f"AND NOT starts_with(lower(p), '{TRACKING_PREFIX}') "
            f"AND lower(split_part(p, '=', 1)) NOT IN ({denylist}))"
        )
        # list_sort([]) → NULL-ish through array_to_string in DuckDB
        return f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    params = (
        f"filter(split({q}, '[&]'), p -> p <> '' "
        f"AND NOT startswith(lower(p), '{TRACKING_PREFIX}') "
        f"AND lower(split_part(p, '=', 1)) NOT IN ({denylist}))"
    )
    return f"array_join(array_sort({params}), '&')"


def _canonical(col: str, duck: bool) -> str:
    scheme, host, port = _scheme(col, duck), _host(col, duck), _port(col, duck)
    keep_port = (
        f"({port} <> '' AND NOT (({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443')))"
    )
    q = _query(col, duck)
    rebuilt = (
        f"concat({scheme}, '://', {host}, "
        f"CASE WHEN {keep_port} THEN concat(':', {port}) ELSE '' END, "
        f"{_path(col, duck)}, "
        f"CASE WHEN {q} = '' THEN '' ELSE concat('?', {q}) END)"
    )
    return (
        f"CASE WHEN {scheme} IN ('http', 'https') THEN {rebuilt} "
        f"ELSE trim({col}) END"
    )


def _rev_host(col: str, duck: bool) -> str:
    h = _host(col, duck)
    if duck:
        return f"array_to_string(list_reverse(string_split({h}, '.')), ',')"
    return f"array_join(reverse(split({h}, '[.]')), ',')"


def _surt(col: str, duck: bool) -> str:
    """SURT (Sort-friendly URI Reordering Transform), the key format of
    Common Crawl / web-archive CDX indexes (public IIPC spec): host labels
    reversed and comma-joined, then ')' + path + sorted query — so every
    page of a domain (and of its subdomains) sorts ADJACENT. As a CDX /
    lake sort key this turns per-domain scans into contiguous parquet
    ranges that min/max stats prune; the url-hash bucketing stays the
    shuffle key, SURT is the within-file clustering."""
    scheme, port = _scheme(col, duck), _port(col, duck)
    keep_port = (
        f"({port} <> '' AND NOT (({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443')))"
    )
    q = _query(col, duck)
    built = (
        f"concat({_rev_host(col, duck)}, "
        f"CASE WHEN {keep_port} THEN concat(':', {port}) ELSE '' END, "
        f"')', {_path(col, duck)}, "
        f"CASE WHEN {q} = '' THEN '' ELSE concat('?', {q}) END)"
    )
    return (
        f"CASE WHEN {scheme} IN ('http', 'https') THEN {built} "
        f"ELSE trim({col}) END"
    )


def _mask(col: str, duck: bool) -> str:
    out = col
    for _, regex, token in PII_PATTERNS:
        out = _rrep(out, regex, token, duck)
    return out


def _count(col: str, regex: str, duck: bool) -> str:
    if duck:
        return f"CAST(len(regexp_extract_all({col}, {_dq(regex)})) AS BIGINT)"
    return f"CAST(regexp_count({col}, {_sq(regex)}) AS BIGINT)"


def _matches(col: str, regex: str, duck: bool) -> str:
    if duck:
        return f"regexp_matches({col}, {_dq(regex)})"
    return f"regexp_like({col}, {_sq(regex)})"


def _reg_domain(col: str, duck: bool) -> str:
    h = _host(col, duck)
    d = _rex(h, DOMAIN_RE, 1, duck)
    return f"CASE WHEN {d} = '' THEN {h} ELSE {d} END"


def _url_verdict(
    col: str,
    blocked_domains: tuple[str, ...],
    banned_words: tuple[str, ...],
    max_len: int,
    max_digit_frac: float,
    duck: bool,
) -> str:
    """First-matching-rule verdict, priority order fixed so both engines
    agree: blocked_domain > ip_host > banned_word > too_long >
    digit_heavy > ok. Single CASE of regexp/length exprs — scan-speed,
    zero joins, zero Python; at 10^10 urls this runs inside the ingest
    scan's codegen stage."""
    branches = []
    if blocked_domains:
        doms = ", ".join("'" + d.replace("'", "''") + "'" for d in blocked_domains)
        branches.append(
            f"WHEN {_reg_domain(col, duck)} IN ({doms}) THEN 'blocked_domain'"
        )
    branches.append(
        f"WHEN {_matches(_host(col, duck), IP_HOST_RE, duck)} THEN 'ip_host'"
    )
    if banned_words:
        words = "|".join(banned_words)  # plain words; no metachars to escape
        branches.append(
            f"WHEN {_matches(f'lower({col})', words, duck)} THEN 'banned_word'"
        )
    path = _path(col, duck)
    digit_frac = (
        f"(length({_rrep(path, DIGIT_STRIP_RE, '', duck)}) * 1.0 / length({path}))"
    )
    branches.append(f"WHEN length({col}) > {max_len} THEN 'too_long'")
    branches.append(f"WHEN {digit_frac} > {max_digit_frac} THEN 'digit_heavy'")
    return "CASE " + " ".join(branches) + " ELSE 'ok' END"


# ---------------------------------------------------------------------------
# Public Spark API (column-name in, Column out)
# ---------------------------------------------------------------------------

def canonical_url(col: str) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring)."""
    return F.expr(_canonical(col, duck=False))


def url_host(col: str) -> Column:
    """Lowercased host, userinfo/port/trailing-dot/leading-www stripped."""
    return F.expr(_host(col, duck=False))


def registered_domain(col: str) -> Column:
    """Last two dot-labels of the host (naive eTLD+1 — no suffix list in
    the sandbox; documented approximation), or the host if label-free."""
    h = _host(col, duck=False)
    d = _rex(h, DOMAIN_RE, 1, duck=False)
    return F.expr(f"CASE WHEN {d} = '' THEN {h} ELSE {d} END")


def surt_key(col: str) -> Column:
    """SURT sort key of an http(s) URL (see ``_surt``); non-http(s) inputs
    pass through trimmed, mirroring ``canonical_url``."""
    return F.expr(_surt(col, duck=False))


def url_verdict(
    col: str,
    blocked_domains: tuple[str, ...] = (),
    banned_words: tuple[str, ...] = BANNED_URL_WORDS,
    max_len: int = URL_MAX_LEN,
    max_digit_frac: float = URL_MAX_DIGIT_FRAC,
) -> Column:
    """FineWeb/RefinedWeb-style URL filter verdict (see ``_url_verdict``):
    'blocked_domain' | 'ip_host' | 'banned_word' | 'too_long' |
    'digit_heavy' | 'ok', first matching rule wins."""
    return F.expr(
        _url_verdict(col, tuple(blocked_domains), tuple(banned_words),
                     max_len, max_digit_frac, duck=False)
    )


def url_allowed(
    col: str,
    blocked_domains: tuple[str, ...] = (),
    banned_words: tuple[str, ...] = BANNED_URL_WORDS,
    max_len: int = URL_MAX_LEN,
    max_digit_frac: float = URL_MAX_DIGIT_FRAC,
) -> Column:
    """Boolean keep/drop form of :func:`url_verdict`."""
    return url_verdict(
        col, blocked_domains, banned_words, max_len, max_digit_frac
    ) == "ok"


def mask_pii(col: str) -> Column:
    """Text with emails → <EMAIL>, IPv4 → <IP>, phones → <PHONE>."""
    return F.expr(_mask(col, duck=False))


def pii_counts(col: str) -> dict[str, Column]:
    """Per-category match counts on the original text."""
    return {
        name: F.expr(_count(col, regex, duck=False))
        for name, regex, _ in PII_PATTERNS
    }


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------

def sql_canonical_url(col: str) -> str:
    return _canonical(col, duck=True)


def sql_url_host(col: str) -> str:
    return _host(col, duck=True)


def sql_registered_domain(col: str) -> str:
    h = _host(col, duck=True)
    d = _rex(h, DOMAIN_RE, 1, duck=True)
    return f"CASE WHEN {d} = '' THEN {h} ELSE {d} END"


def sql_surt_key(col: str) -> str:
    return _surt(col, duck=True)


def sql_url_verdict(
    col: str,
    blocked_domains: tuple[str, ...] = (),
    banned_words: tuple[str, ...] = BANNED_URL_WORDS,
    max_len: int = URL_MAX_LEN,
    max_digit_frac: float = URL_MAX_DIGIT_FRAC,
) -> str:
    return _url_verdict(col, tuple(blocked_domains), tuple(banned_words),
                        max_len, max_digit_frac, duck=True)


def sql_mask_pii(col: str) -> str:
    return _mask(col, duck=True)


def sql_pii_counts(col: str) -> dict[str, str]:
    return {
        name: _count(col, regex, duck=True) for name, regex, _ in PII_PATTERNS
    }
