"""Main-content extraction: strip navigation/footer boilerplate by block
text-density scoring (the justext / Boilerpipe core heuristic, public
literature: Kohlschütter et al. "Boilerplate Detection using Shallow Text
Features", simplified to its deterministic core).

Plain ``extract_text`` keeps EVERYTHING — menus, cookie banners, footers —
which at pre-training scale is exactly the repetitive junk the quality
filters then fight. The standard fix scores each block-level fragment:

1. kill ``<script>/<style>/<noscript>`` bodies and HTML comments;
2. split on block-level tags (``p div section li h1-6 …``);
3. per block: visible text length and LINK text length (chars inside
   ``<a>…</a>``); keep blocks with ≥ ``MIN_BLOCK_CHARS`` visible chars
   AND link density below 1/3 (integer compare ``3·link ≤ text`` — no
   float dialect drift);
4. join survivors with newlines.

Everything compiles to ONE native expression per row (regexp chains +
SQL-parsed array lambdas — the sibling-lambda policy of
functions/quality.py): scan-speed, no Python, no shuffle. The DuckDB
twin is generated from the SAME regex/threshold constants (backreference-
free patterns — RE2 has no backrefs), so `main_content` is a full
cross-engine contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from .quality import _dq, _sq

# thresholds (justext defaults, simplified)
MIN_BLOCK_CHARS = 25
#: keep iff 3 * link_chars <= text_chars  (i.e. link density < ~1/3)
LINK_DENSITY_NUM = 3

BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|article|section|main|aside|nav|footer|header|ul|ol|li"
    r"|h[1-6]|table|tr|td|th|blockquote|br|hr)[^>]*>"
)
# "<a" must be followed by whitespace or ">": without the boundary,
# <abbr>/<address>/<area>/<audio> open a phantom anchor and everything
# up to the next real </a> counts as link text, killing legitimate
# main-content blocks (same fix as webgraph.ANCHOR_RE).
ANCHOR_TEXT_RE = r"(?i)<a(?:\s[^>]*)?>([\s\S]*?)</a>"
TAG_RE = r"<[^>]*>"
WS_RE = r"\s+"
COMMENT_RE = r"<!--[\s\S]*?-->"
# no backreferences (RE2): one pattern per killed container
_KILL_RES = (
    r"(?i)<script[^>]*>[\s\S]*?</script>",
    r"(?i)<style[^>]*>[\s\S]*?</style>",
    r"(?i)<noscript[^>]*>[\s\S]*?</noscript>",
)


def _rr(col: str, regex: str, repl: str, duck: bool) -> str:
    if duck:
        return f"regexp_replace({col}, {_dq(regex)}, '{repl}', 'g')"
    return f"regexp_replace({col}, {_sq(regex)}, '{repl}')"


def _clean_doc(col: str, duck: bool) -> str:
    out = col
    for kr in _KILL_RES:
        out = _rr(out, kr, " ", duck)
    return _rr(out, COMMENT_RE, " ", duck)


def _block_text(b: str, duck: bool) -> str:
    """Visible text of a fragment: tags → space, whitespace collapsed."""
    return f"trim({_rr(_rr(b, TAG_RE, ' ', duck), WS_RE, ' ', duck)})"


def _link_text_len(b: str, duck: bool) -> str:
    # DuckDB's array_to_string of an EMPTY list is NULL (same quirk noted
    # in weburl._query) — coalesce, or the no-anchor branch of the filter
    # predicate goes NULL and silently drops the block.
    joined = (
        f"coalesce(array_to_string("
        f"regexp_extract_all({b}, {_dq(ANCHOR_TEXT_RE)}, 1), ''), '')"
        if duck
        else f"array_join(regexp_extract_all({b}, {_sq(ANCHOR_TEXT_RE)}, 1), '')"
    )
    return f"length({_block_text(joined, duck)})"


def _main_content(col: str, duck: bool) -> str:
    split = (
        f"string_split_regex({_clean_doc(col, duck)}, {_dq(BLOCK_SPLIT_RE)})"
        if duck
        else f"split({_clean_doc(col, duck)}, {_sq(BLOCK_SPLIT_RE)})"
    )
    keep = (
        f"b -> length({_block_text('b', duck)}) >= {MIN_BLOCK_CHARS} "
        f"AND {LINK_DENSITY_NUM} * {_link_text_len('b', duck)} "
        f"<= length({_block_text('b', duck)})"
    )
    if duck:
        kept = f"list_filter({split}, {keep})"
        texts = f"list_transform({kept}, b -> {_block_text('b', duck)})"
        # empty-list → NULL quirk again: a page with no surviving block is
        # empty content, not NULL content
        return f"coalesce(array_to_string({texts}, chr(10)), '')"
    kept = f"filter({split}, {keep})"
    texts = f"transform({kept}, b -> {_block_text('b', duck)})"
    return f"array_join({texts}, '\\n')"


def main_content(col) -> Column:
    """Block-density main content of an html string column (see module
    docstring). Returns '' when nothing survives — a page of pure chrome
    IS empty content, which the Gopher-style filters then reject."""
    if not isinstance(col, str):
        raise TypeError("main_content expects a column NAME (expression builder)")
    return F.expr(_main_content(col, duck=False))


def content_ratio(col: str) -> Column:
    """kept-chars / total-visible-chars — a per-page boilerplate metric
    (low ratio = mostly chrome); guard against empty pages."""
    total = f"length({_block_text(_clean_doc(col, duck=False), duck=False)})"
    kept = f"length({_main_content(col, duck=False)})"
    return F.expr(
        f"CASE WHEN {total} = 0 THEN 0.0 "
        f"ELSE CAST({kept} AS DOUBLE) / {total} END"
    )


def sql_main_content(col: str) -> str:
    return _main_content(col, duck=True)


def sql_content_ratio(col: str) -> str:
    total = f"length({_block_text(_clean_doc(col, duck=True), duck=True)})"
    kept = f"length({_main_content(col, duck=True)})"
    return (
        f"CASE WHEN {total} = 0 THEN 0.0 "
        f"ELSE CAST({kept} AS DOUBLE) / {total} END"
    )
