"""Normalization scalar functions N1-N5 (SURVEY.md §2.5).

Re-expresses /root/reference/src/processor/rule_normalizer.rs:9-227 as native
Spark ``Column`` expressions (JVM-side, whole-stage-codegen'd — the hot path)
plus a shared pure-Python twin for the order-sensitive name/unit extraction
(N2) used both as a pandas-UDF body and as the byte-parity test oracle.
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# ---------------------------------------------------------------------------
# N1: price string → double ("$1,234.50" → 1234.5; unparsable → null)
# rule_normalizer.rs:112-130
# ---------------------------------------------------------------------------


def normalize_price(col: Column) -> Column:
    cleaned = F.trim(F.regexp_replace(col, r"[$,]", ""))
    return F.when(cleaned.rlike(r"^-?\d+(\.\d+)?$"), cleaned.cast("double"))


# ---------------------------------------------------------------------------
# N2: name clean + unit extraction — 5 ordered first-match-wins regex tiers
# rule_normalizer.rs:33-110
# ---------------------------------------------------------------------------

_WEIGHT = (
    r"gm|g|kg|ml|l|gram|grams|kilogram|kilograms|liter|liters|"
    r"milliliter|milliliters"
)
# Order matters — most specific first (rule_normalizer.rs:39 comment).
UNIT_PATTERNS = [
    # (1) parenthetical weight/volume incl. ranges: (800gm), (500gm-600gm)
    rf"(?i)\s*[-–]?\s*\(\s*(\d+(?:\.\d+)?\s*(?:{_WEIGHT})(?:\s*-\s*\d+(?:\.\d+)?\s*(?:{_WEIGHT}))?)\s*\)",
    # (2) parenthetical count/pack: (pack of 6), (1 piece)
    r"(?i)\s*[-–]?\s*\(\s*(pack\s+of\s+\d+|\d+\s+(?:piece|pieces|bundle|bundles|dozen|half\s+dozen))\s*\)",
    # (3) dash count units: - half dozen, - 1 piece
    r"(?i)\s*[-–]\s*(pack\s+of\s+\d+|\d+\s+(?:piece|pieces|bundle|bundles|dozen)|half\s+dozen)\s*",
    # (4) dash weight units: - 800gm
    rf"(?i)\s*[-–]\s*(\d+(?:\.\d+)?\s*(?:{_WEIGHT}))\s*",
    # (5) trailing space units: 3 Kg
    rf"(?i)\s+(\d+(?:\.\d+)?\s*(?:{_WEIGHT}))\s*$",
]
PROMO_PATTERN = r"\s*\|\s*.*$"
_TRANSLATIONS = (
    r"aalu|pyaaz|kheera|sabzi|dal|atta|masala|spice|powder|paste|sauce|pickle|"
    r"jam|honey|sugar|salt|tea|coffee|milk|butter|cheese|paneer|curd|yogurt|"
    r"bread|biscuit|cake|sweet|namkeen|snack|chips|noodles|pasta|soup|juice|"
    r"water|cold drink|soda"
)
DESC_PATTERN = rf"\s*\(\s*(?:{_TRANSLATIONS}|[a-zA-Z\s]+)\s*\)"
DESC_PATTERN_NONEMPTY = rf"\s*\(\s*(?:{_TRANSLATIONS}|[a-zA-Z\s]*[a-zA-Z])\s*\)"

_UNIT_RES = [re.compile(p) for p in UNIT_PATTERNS]
_PROMO_RE = re.compile(PROMO_PATTERN)
_DESC_RE = re.compile(DESC_PATTERN)
_DESC_NONEMPTY_RE = re.compile(DESC_PATTERN_NONEMPTY)


def clean_name_extract_units_py(name: str | None) -> tuple[str, str]:
    """Single-row oracle (and pandas-UDF body) with exact reference
    semantics: promo strip → first matching unit tier extracts+removes
    (FIRST occurrence only) → translation-paren strip → whitespace collapse
    → lowercase. Returns (cleaned_name, units_of_mass)."""
    if name is None:
        return "", "N/A"
    unit = "N/A"
    cleaned = _PROMO_RE.sub("", name)
    for pat in _UNIT_RES:
        m = pat.search(cleaned)
        if m:
            unit = m.group(1).strip()
            cleaned = pat.sub("", cleaned, count=1)
            break
    if unit == "N/A":
        cleaned = _DESC_RE.sub("", cleaned, count=1)
    else:
        cleaned = _DESC_NONEMPTY_RE.sub("", cleaned, count=1)
    cleaned = " ".join(cleaned.split()).lower()
    return cleaned, unit


def clean_name_extract_units_udf():
    """Vectorized twin of :func:`clean_name_extract_units_py` — returns a
    pandas UDF yielding struct<name:string, units_of_mass:string>."""

    def batch(s: pd.Series) -> pd.DataFrame:
        pairs = s.map(clean_name_extract_units_py)
        return pd.DataFrame(
            {"name": pairs.map(lambda t: t[0]), "units_of_mass": pairs.map(lambda t: t[1])}
        )

    return F.pandas_udf(batch, "struct<name:string, units_of_mass:string>")


def with_clean_name_and_units(df: DataFrame, name_col: str = "name") -> DataFrame:
    """Apply N2 over a DataFrame: replaces ``name``, adds ``units_of_mass``.

    Arrow-batched; the regex cascade is order-sensitive (first-match-wins
    with single-occurrence removal), which native regexp_replace can't
    express exactly (it replaces all matches) — so the UDF twin IS the
    production path here, per SURVEY.md §2.5 N2.
    """
    udf = clean_name_extract_units_udf()
    tmp = df.withColumn("_nu", udf(F.col(name_col)))
    return tmp.withColumn(name_col, F.col("_nu.name")).withColumn(
        "units_of_mass", F.col("_nu.units_of_mass")
    ).drop("_nu")


# ---------------------------------------------------------------------------
# N3: trim + lowercase (category) — rule_normalizer.rs:132-146
# ---------------------------------------------------------------------------


def normalize_string(col: Column) -> Column:
    return F.lower(F.trim(col))


# ---------------------------------------------------------------------------
# N4: discount parse ("40% off" → 40.0) — rule_normalizer.rs:148-184
# ---------------------------------------------------------------------------


def parse_discount(col: Column) -> Column:
    cleaned = F.lower(col)
    for word in ("%", "percent", "off", "discount", "sale"):
        cleaned = F.regexp_replace(cleaned, re.escape(word), "")
    first_num = F.regexp_extract(F.trim(cleaned), r"(\d+(?:\.\d+)?)", 1)
    return F.when(first_num != "", first_num.cast("double"))


# ---------------------------------------------------------------------------
# N5: derived discount — rule_normalizer.rs:186-227
# keep valid existing; else ((mrp-cost)/mrp)*100 rounded 2dp when mrp>0 and
# cost<mrp; 0.0 when both prices present; null when either missing.
# ---------------------------------------------------------------------------


def derive_discount(discount: Column, cost: Column, mrp: Column) -> Column:
    return (
        F.when(discount.isNotNull() & ~F.isnan(discount), discount)
        .when(
            cost.isNotNull() & mrp.isNotNull() & (mrp > 0) & (cost < mrp),
            F.round((mrp - cost) / mrp * 100.0, 2),
        )
        .when(cost.isNotNull() & mrp.isNotNull(), F.lit(0.0))
    )


# ---------------------------------------------------------------------------
# Full N1-N5 pipeline over the canonical staging frame
# (string cols: cost_price, mrp, name, sku, product_id, sku_percent_off →
#  discount, category_name → category, units_of_mass)
# ---------------------------------------------------------------------------


# H9: unit keyword extraction — 15 ordered (substring, unit) pairs,
# first match wins (/root/reference/src/processor/html_processor.rs:217-245).
# NOTE "g " / "l " carry a trailing space in the reference, so "500g" does
# NOT match bare "g" but "500g pack" matches via "g " — preserved here.
UNIT_KEYWORD_PAIRS = [
    ("kg", "kg"), ("kilogram", "kg"), ("gram", "g"), ("gm", "g"), ("g ", "g"),
    ("ml", "ml"), ("milliliter", "ml"), ("liter", "l"), ("litre", "l"),
    ("l ", "l"), ("piece", "piece"), ("pcs", "piece"), ("pack", "pack"),
    ("dozen", "dozen"),
]

# H10: known brands, checked against the lowercased full name
# (/root/reference/src/processor/html_processor.rs:248-268).
KNOWN_BRANDS = [
    "brightfarms", "nestle", "unilever", "p&g", "colgate", "johnson", "loreal",
]


def extract_unit_keyword(name: Column) -> Column:
    """H9: first matching unit-keyword substring of the lowercased name →
    canonical unit, else null. Pure Column expression (JVM-side `contains`
    chain — whole-stage codegen, no UDF)."""
    low = F.lower(name)
    expr = F.lit(None).cast("string")
    for pattern, unit in reversed(UNIT_KEYWORD_PAIRS):
        expr = F.when(low.contains(pattern), F.lit(unit)).otherwise(expr)
    return expr


def extract_brand(name: Column) -> Column:
    """H10: known-brand substring of the lowercased name (reference order),
    else the first whitespace word if it starts uppercase and is longer than
    2 chars, else null (/root/reference/src/processor/html_processor.rs:248-280).
    """
    low = F.lower(name)
    first_word = F.element_at(F.split(F.trim(name), r"\s+"), 1)
    fallback = F.when(
        (F.length(first_word) > 2) & first_word.rlike("^[A-Z]"), first_word
    ).otherwise(F.lit(None).cast("string"))
    expr = fallback
    for brand in reversed(KNOWN_BRANDS):
        expr = F.when(low.contains(brand), F.lit(brand)).otherwise(expr)
    return expr


def normalize_dataframe(df: DataFrame) -> DataFrame:
    """The reference's normalize_dataframe (rule_normalizer.rs:9-31) as one
    declarative plan: price casts → name/units → category lower → discount
    parse → derived discount."""
    out = df
    for c in ("cost_price", "mrp"):
        if c in out.columns:
            out = out.withColumn(c, normalize_price(F.col(c)))
    if "name" in out.columns:
        out = with_clean_name_and_units(out)
    if "category" in out.columns:
        out = out.withColumn("category", normalize_string(F.col("category")))
    if "discount" in out.columns:
        out = out.withColumn("discount", parse_discount(F.col("discount")))
    if {"discount", "cost_price", "mrp"} <= set(out.columns):
        out = out.withColumn(
            "discount",
            derive_discount(F.col("discount"), F.col("cost_price"), F.col("mrp")),
        )
    return out
