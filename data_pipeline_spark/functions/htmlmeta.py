"""Page-level HTML metadata extraction: title, meta description, og:title,
robots noindex, and the <html lang> declaration.

A crawl pipeline needs these before any content processing: `noindex`
pages must be excluded from the corpus (the publisher opted out), `lang`
gates language routing ahead of content-based lang-id
(functions/textstats.py), and title/description feed snippet views and
quality heuristics. The reference pipeline's DOM extraction is
product-card-specific (/root/reference/src/scrapers/mod.rs); this module
is part of the web-text extension family.

All fields are single native regexp expressions over the raw html string —
no DOM build, no Python in the hot path, so extraction fuses into the
scan's whole-stage codegen. Meta tags are matched in BOTH attribute orders
(name-before-content and content-before-name) and quoting styles; patterns
avoid lookarounds so the same text runs under Java regex (Spark) and RE2
(the DuckDB oracle twins, generated from the same constants).

Limitations (documented, not bugs): values are read up to the first quote
character (HTML-entity unescaping is out of scope), and a commented-out
meta tag still matches — the tradeoff for scan-speed regex extraction;
the DOM path (functions/extract.py) exists where fidelity beats speed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from .quality import _dq, _sq

TITLE_RE = r"(?i)<title[^>]*>([^<]*)</title>"
LANG_RE = r"""(?i)<html\b[^>]*\blang\s*=\s*["']?([A-Za-z][A-Za-z-]*)"""

# Whitespace collapse for extracted display strings.
_WS_RE = r"\s+"

FIELDS = ("title", "meta_description", "og_title", "noindex", "lang")


def _meta_res(attr: str, key: str) -> tuple[str, str]:
    """(name-first, content-first) regexes capturing a meta tag's content."""
    k = f"""\\b{attr}\\s*=\\s*["']?{key}["']?"""
    return (
        f"""(?i)<meta\\b[^>]*{k}[^>]*\\bcontent\\s*=\\s*["']([^"']*)""",
        f"""(?i)<meta\\b[^>]*\\bcontent\\s*=\\s*["']([^"']*)["'][^>]*{k}""",
    )


DESCRIPTION_RES = _meta_res("name", "description")
OG_TITLE_RES = _meta_res("property", "og:title")
NOINDEX_RES = (
    r"""(?i)<meta\b[^>]*\bname\s*=\s*["']?robots["']?[^>]*\bcontent\s*=\s*["'][^"']*noindex""",
    r"""(?i)<meta\b[^>]*\bcontent\s*=\s*["'][^"']*noindex[^"']*["'][^>]*\bname\s*=\s*["']?robots["']?""",
)


# ---------------------------------------------------------------------------
# Dialect expression builders (strings; the Spark API wraps them in F.expr)
# ---------------------------------------------------------------------------

def _rex(col: str, regex: str, duck: bool) -> str:
    e = f"regexp_extract({col}, {_dq(regex) if duck else _sq(regex)}, 1)"
    return f"coalesce({e}, '')" if duck else e


def _squeeze(expr: str, duck: bool) -> str:
    if duck:
        return f"trim(regexp_replace({expr}, {_dq(_WS_RE)}, ' ', 'g'))"
    return f"trim(regexp_replace({expr}, {_sq(_WS_RE)}, ' '))"


def _first_nonempty(a: str, b: str) -> str:
    # nullif, not CASE WHEN a <> '' THEN a: the CASE form embeds the ``a``
    # regexp_extract TWICE, and each evaluation scans the full html string
    # — a duplicate whole-page regex pass per field at corpus scale.
    return f"coalesce(nullif({a}, ''), {b})"


def _title(col: str, duck: bool) -> str:
    return _squeeze(_rex(col, TITLE_RE, duck), duck)


def _meta_content(col: str, res: tuple[str, str], duck: bool) -> str:
    return _squeeze(
        _first_nonempty(_rex(col, res[0], duck), _rex(col, res[1], duck)), duck
    )


def _noindex(col: str, duck: bool) -> str:
    if duck:
        return (
            f"(regexp_matches({col}, {_dq(NOINDEX_RES[0])}) "
            f"OR regexp_matches({col}, {_dq(NOINDEX_RES[1])}))"
        )
    return (
        f"({col} RLIKE {_sq(NOINDEX_RES[0])} "
        f"OR {col} RLIKE {_sq(NOINDEX_RES[1])})"
    )


def _lang(col: str, duck: bool) -> str:
    return f"lower({_rex(col, LANG_RE, duck)})"


def _fields(col: str, duck: bool) -> dict[str, str]:
    return {
        "title": _title(col, duck),
        "meta_description": _meta_content(col, DESCRIPTION_RES, duck),
        "og_title": _meta_content(col, OG_TITLE_RES, duck),
        "noindex": _noindex(col, duck),
        "lang": _lang(col, duck),
    }


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def page_metadata(col: str) -> dict[str, Column]:
    """Field name → native Column over an html STRING column name."""
    return {k: F.expr(v) for k, v in _fields(col, duck=False).items()}


def with_page_metadata(df, col: str):
    """Append all metadata fields to df (html string column `col`)."""
    out = df
    for k, v in page_metadata(col).items():
        out = out.withColumn(k, v)
    return out


def sql_page_metadata(col: str) -> dict[str, str]:
    """DuckDB twins generated from the same regex constants."""
    return _fields(col, duck=True)
