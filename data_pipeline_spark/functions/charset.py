"""Charset sniffing + decoding for raw fetched HTML bytes.

Real Common-Crawl-style page bytes are NOT all UTF-8: legacy servers still
emit ISO-8859-1/windows-1252, and UTF-16 appears behind BOMs. Feeding such
bytes to a UTF-8-assuming extractor silently mangles non-ASCII text. The
sniffing ladder here is the standard one (WHATWG encoding sniffing,
simplified to its deterministic core):

1. byte-order mark: EF BB BF → UTF-8, FF FE → UTF-16LE, FE FF → UTF-16BE;
2. ``<meta charset=...>`` / ``<meta http-equiv content="...charset=..."``
   / XML ``encoding=".."`` declaration in the first bytes — scanned on an
   ISO-8859-1 view of the prefix (a 1:1 byte↔char mapping, so the regex
   can't itself trip on malformed UTF-8);
3. default UTF-8.

Everything is native Column expressions: byte compares on ``substring`` of
the binary + one regex for step 2, and :func:`decode_html` compiles to a
CASE over JVM ``decode(...)`` calls (malformed input decodes with U+FFFD
replacement, never throws). No Python, no shuffle — decode happens at scan
speed inside whole-stage codegen.

The engine's default replay pipeline keeps its byte-exact UTF-8 contract
(north rule parity); this is the composable pre-step for corpora where the
transport did NOT already normalize to UTF-8:
``df.withColumn("html_utf8", encode(decode_html(col("html")), 'UTF-8'))``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: charset declaration inside the document prefix (meta charset=, meta
#: http-equiv content="text/html; charset=...", or <?xml encoding="..."?>).
#: Case-insensitive, quote-optional; first match wins like browsers do.
CHARSET_DECL_RE = r"""(?i)(?:charset|encoding)\s*=\s*["']?\s*([A-Za-z0-9_][A-Za-z0-9_\-.:]*)"""

#: canonical names the JVM decoder accepts, keyed by lowercased aliases.
CHARSET_ALIASES = {
    "utf-8": "UTF-8",
    "utf8": "UTF-8",
    "iso-8859-1": "ISO-8859-1",
    "iso8859-1": "ISO-8859-1",
    "latin-1": "ISO-8859-1",
    "latin1": "ISO-8859-1",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    # WHATWG maps us-ascii into the windows-1252 family: declared-ascii
    # pages with high bytes are routine web garbage, and a strict US-ASCII
    # decoder would fail the scan on them.
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "utf-16": "UTF-16",
    "utf-16le": "UTF-16LE",
    "utf-16be": "UTF-16BE",
}

_BOMS = (
    (b"\xef\xbb\xbf", "UTF-8"),
    (b"\xff\xfe", "UTF-16LE"),
    (b"\xfe\xff", "UTF-16BE"),
)

# Spark's decode() supports only the standard charsets (no windows-1252),
# so cp1252 is decoded as ISO-8859-1 (a superset byte→char map) and the
# 0x80-0x9F control range is then translate()'d to cp1252's printable
# chars — exact, still native, and WHATWG-consistent (browsers treat the
# whole latin-1 family as cp1252 anyway). The five undefined cp1252 bytes
# (0x81 8D 8F 90 9D) stay as the control chars latin-1 gives them.
_CP1252_FROM = "".join(
    chr(b) for b in range(0x80, 0xA0)
    if bytes([b]).decode("cp1252", "ignore")
)
_CP1252_TO = "".join(
    bytes([b]).decode("cp1252") for b in range(0x80, 0xA0)
    if bytes([b]).decode("cp1252", "ignore")
)


def sniff_charset(col, prefix_bytes: int = 2048) -> Column:
    """Charset name for a binary html column (see module docstring ladder).
    Unknown/unsupported declared names fall back to UTF-8 rather than
    failing the scan — a web corpus always contains garbage declarations."""
    c = col if isinstance(col, Column) else F.col(col)
    # ISO-8859-1 view of the prefix: total 1:1 byte→char decode, regex-safe
    prefix = F.decode(F.substring(c, 1, prefix_bytes), "ISO-8859-1")
    declared = F.lower(F.regexp_extract(prefix, CHARSET_DECL_RE, 1))
    mapped = F.create_map(
        *[x for k, v in CHARSET_ALIASES.items() for x in (F.lit(k), F.lit(v))]
    )[declared]
    out = F.coalesce(mapped, F.lit("UTF-8"))
    for bom, name in _BOMS:
        out = F.when(
            F.substring(c, 1, len(bom)) == F.lit(bytearray(bom)), F.lit(name)
        ).otherwise(out)
    return out


def decode_html(col, prefix_bytes: int = 2048) -> Column:
    """Decoded text of a binary html column under its sniffed charset.

    Compiles to one CASE over JVM ``decode`` branches (the charset argument
    must be a literal per branch — exactly why the supported set is the
    closed :data:`CHARSET_ALIASES` range). Any leading BOM/zero-width-
    no-break-space is stripped from the decoded text."""
    c = col if isinstance(col, Column) else F.col(col)
    sniffed = sniff_charset(c, prefix_bytes)
    decoded = None
    for name in sorted(set(CHARSET_ALIASES.values())):
        if name == "windows-1252":
            branch = F.translate(
                F.decode(c, "ISO-8859-1"), _CP1252_FROM, _CP1252_TO
            )
        elif name == "UTF-8":
            # Spark 4's decode() THROWS on malformed input; a binary→string
            # cast reinterprets the bytes and make_valid_utf8 substitutes
            # U+FFFD for invalid sequences — replacement semantics with no
            # session conf required. (The UTF-16 branches still use
            # decode(): pair spark.sql.legacy.codingErrorAction=true —
            # set by session.get_spark — to get replacement there too.)
            branch = F.call_function("make_valid_utf8", c.cast("string"))
        else:
            branch = F.decode(c, name)
        decoded = (
            F.when(sniffed == name, branch)
            if decoded is None
            else decoded.when(sniffed == name, branch)
        )
    decoded = decoded.otherwise(F.decode(c, "UTF-8"))
    return F.regexp_replace(decoded, r"^﻿", "")


# ---------------------------------------------------------------------------
# Unicode normalization (NFC)
# ---------------------------------------------------------------------------

def nfc_normalize_udf():
    """Arrow-vectorized NFC normalization for a string column.

    Web text arrives in mixed composition forms (decomposed sequences like
    'e' + U+0301 from mac filesystems and some CMSes vs precomposed
    U+00E9); exact dedup, fingerprints and merge keys must not fork on
    composition form, so corpora are NFC-normalized before keying
    (the convention the big public corpus pipelines follow).

    Spark has no native unicode-normalize expression, so this is one of
    the engine's few Python paths — an Arrow pandas UDF (never per-row
    Python; pandas' str.normalize runs the ICU-equivalent CPython
    unicodedata routine per batch). The DuckDB oracle twin is its native
    ``nfc_normalize``; cross-engine parity is pinned by the
    doc_nfc_normalize contract and tests.
    """
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        return s.str.normalize("NFC")

    return pandas_udf(_nfc, "string")


def sql_nfc_normalize(col: str) -> str:
    """DuckDB twin of :func:`nfc_normalize_udf`."""
    return f"nfc_normalize({col})"
