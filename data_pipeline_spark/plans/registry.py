"""Schema registry: versioned schemas + column-classification rules (C1-C6).

Replaces the reference's hardcoded ``FieldClassifier``
(/root/reference/src/processor/field_classifier.rs:9-232) with a versioned,
JSON-serializable registry. Two roles:

1. **CDC table schemas**: the lake table's schema per ``schema_version``
   observed in the change log; evolution = diff between versions → the runner
   rewrites the merge plan + evolves the table (north_star).
2. **Column classification**: mapping arbitrary source column names onto the
   canonical schema, with the reference's three tiers — exact match, fuzzy
   (bidirectional substring containment), content-based — preserving the
   order-sensitivity the reference regression-tests (sku guard before
   discount, field_classifier.rs:93-156 and verify_column_fix.rs:86-109).

Classification is driver-side metadata work (it renames columns, it doesn't
touch rows), exactly like the reference.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# CDC lake-table schema versions (input_hint shape + v2 evolution)
# ---------------------------------------------------------------------------

_PAGE_V1 = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)
# v2: added payload column (schema evolution mid-log).
_PAGE_V2 = StructType(list(_PAGE_V1.fields) + [StructField("fetch_status", IntegerType(), True)])

DEFAULT_TABLE_SCHEMAS: dict[int, StructType] = {1: _PAGE_V1, 2: _PAGE_V2}


# ---------------------------------------------------------------------------
# Canonical-field classification (reference C1-C6)
# ---------------------------------------------------------------------------

# C1: mapping table (field_classifier.rs:9-51) — source-name → canonical.
DEFAULT_FIELD_MAPPINGS: dict[str, str] = {
    # prices
    "cost_price": "cost_price", "costprice": "cost_price", "special_price": "cost_price",
    "specialprice": "cost_price", "discountedprice": "cost_price", "price": "cost_price",
    "mrp": "mrp", "product_price": "mrp", "productprice": "mrp", "actualprice": "mrp",
    "originalprice": "mrp", "dcimsmrp": "mrp",
    # identity
    "product_id": "product_id", "productid": "product_id", "id": "product_id",
    "varianttitleslug": "product_id",
    "sku": "sku",
    # naming
    "name": "name", "title": "name", "productname": "name",
    # discount
    "sku_percent_off": "discount", "skupercentoff": "discount",
    "discount_percentage": "discount", "discountpercentage": "discount",
    "discount": "discount",
    # category
    "category_name": "category", "categoryname": "category", "category": "category",
    "category_section": "category", "categorysection": "category",
    # units
    "units_of_mass": "units_of_mass", "unitsofmass": "units_of_mass",
    "unit": "units_of_mass", "baseunit": "units_of_mass",
}

CANONICAL_FIELDS = [
    "name", "sku", "product_id", "cost_price", "mrp", "discount",
    "category", "units_of_mass",
]

# ---------------------------------------------------------------------------
# Per-source extraction specs (reference: per-source TOML, api_config.rs:55-58)
# ---------------------------------------------------------------------------

# Every alternative field the P3-P12 cascades probe
# (json_flattener.rs:131-436), as one typed product record schema. A spec may
# narrow this per source; fields absent from a source's payloads parse to
# null and fall through their cascade.
DEFAULT_PRODUCT_DDL = (
    "id string, product_id string, productID string, sku string, "
    "variantTitleSlug string, "
    "name string, title string, productName string, "
    "price string, cost_price string, special_price string, "
    "discountedPrice string, discounted_price string, "
    "mrp string, product_price string, actualPrice string, "
    "actual_price string, originalPrice string, original_price string, "
    "sku_percent_off string, discount_percentage string, "
    "discountPercentage string, "
    "units_of_mass string, unit string, baseUnit string, "
    "category_name string, category string, "
    "categories array<struct<category_name string>>, "
    "productCategory array<struct<category struct<name string>>>, "
    "attributes array<struct<key string, value string>>, "
    "groupRanges array<struct<discountedPrice string>>, "
    "inventories struct<dcImsMrp string>"
)

# Reference per-source configs: krave_mart.toml:13 (data_path with [] hops),
# dealcart.toml:13 (object-hop path), bazaar_app (root array — common
# pattern 1), pandamart.toml:58-59 (data_path deliberately unset; nested
# GraphQL shape via common pattern 5).
DEFAULT_SOURCE_SPECS: dict[str, dict] = {
    "krave_mart": {
        "data_path": "data[].krave_mart_products[]",
        "product_schema": DEFAULT_PRODUCT_DDL,
    },
    "bazaar_app": {"data_path": None, "product_schema": DEFAULT_PRODUCT_DDL},
    "dealcart": {"data_path": "body.results", "product_schema": DEFAULT_PRODUCT_DDL},
    "pandamart": {"data_path": None, "product_schema": DEFAULT_PRODUCT_DDL},
}

_PRICE_VAL = re.compile(r"^\$?\s*\d[\d,]*(\.\d+)?$")
_DISCOUNT_VAL = re.compile(r"^\d+(\.\d+)?\s*%|%\s*off|percent", re.IGNORECASE)


def normalize_field_name(name: str) -> str:
    """C2: lowercase, strip ``_``/``-``/space ("Cost-Price" → "costprice",
    field_classifier.rs:86-91)."""
    return name.lower().replace("_", "").replace("-", "").replace(" ", "")


COMPAT_MODES = {
    "NONE",
    "BACKWARD",
    "FORWARD",
    "FULL",
    "BACKWARD_TRANSITIVE",
    "FORWARD_TRANSITIVE",
    "FULL_TRANSITIVE",
}

#: safe reader-side widenings (Avro schema-resolution promotions mapped to
#: Spark simpleString type names): (writer, reader)
_SAFE_PROMOTIONS = {
    ("int", "bigint"),
    ("int", "float"),
    ("int", "double"),
    ("bigint", "double"),
    ("float", "double"),
    ("date", "timestamp"),
}


class CompatibilityError(ValueError):
    """A schema registration violating the registry's compatibility mode."""


def _can_read(reader: StructType, writer: StructType) -> list[str]:
    """Why ``reader`` cannot read data written with ``writer`` (Avro
    resolution simplified to StructTypes); empty list = it can."""
    issues: list[str] = []
    wf = {f.name: f for f in writer.fields}
    for f in reader.fields:
        w = wf.get(f.name)
        if w is None:
            if not f.nullable:
                issues.append(
                    f"required field '{f.name}' absent from writer schema"
                )
            continue
        rt, wt = f.dataType.simpleString(), w.dataType.simpleString()
        if rt != wt and (wt, rt) not in _SAFE_PROMOTIONS:
            issues.append(f"field '{f.name}': cannot read {wt} as {rt}")
        if not f.nullable and w.nullable:
            issues.append(
                f"field '{f.name}': reader requires non-null, writer may write null"
            )
    return issues


class SchemaRegistry:
    """Versioned schemas + classification rules, JSON round-trippable."""

    def __init__(
        self,
        table_schemas: dict[int, StructType] | None = None,
        field_mappings: dict[str, str] | None = None,
        source_specs: dict[str, dict] | None = None,
        compatibility: str = "NONE",
    ):
        self.table_schemas = dict(table_schemas or DEFAULT_TABLE_SCHEMAS)
        self.field_mappings = dict(field_mappings or DEFAULT_FIELD_MAPPINGS)
        self.source_specs = {
            k: dict(v) for k, v in (source_specs or DEFAULT_SOURCE_SPECS).items()
        }
        if compatibility not in COMPAT_MODES:
            raise ValueError(
                f"unknown compatibility mode {compatibility!r}; "
                f"one of {sorted(COMPAT_MODES)}"
            )
        self.compatibility = compatibility

    # -- persistence ---------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "table_schemas": {
                    str(v): json.loads(s.json()) for v, s in self.table_schemas.items()
                },
                "field_mappings": self.field_mappings,
                "source_specs": self.source_specs,
                "compatibility": self.compatibility,
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, payload: str) -> "SchemaRegistry":
        doc = json.loads(payload)
        return cls(
            table_schemas={
                int(v): StructType.fromJson(s) for v, s in doc["table_schemas"].items()
            },
            field_mappings=doc["field_mappings"],
            source_specs=doc.get("source_specs"),
            compatibility=doc.get("compatibility", "NONE"),
        )

    # -- per-source extraction specs -----------------------------------------

    def source_spec(self, source: str) -> dict:
        return self.source_specs[source]

    def register_source(
        self, source: str, data_path: str | None = None, product_schema: str | None = None
    ) -> None:
        """Adding a new JSON source is a registry entry, not a code edit —
        the reference's per-source TOML role (api_config.rs:55-58)."""
        self.source_specs[source] = {
            "data_path": data_path,
            "product_schema": product_schema or DEFAULT_PRODUCT_DDL,
        }

    def envelope_products(
        self, df: DataFrame, payload_col: str, source: str,
        id_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """Spec-driven P1/P2 envelope explode for ``source`` (see
        :func:`data_pipeline_spark.functions.parse.extract_envelope_products`)."""
        from ..functions.parse import extract_envelope_products

        spec = self.source_spec(source)
        return extract_envelope_products(
            df,
            payload_col,
            product_ddl=spec.get("product_schema") or DEFAULT_PRODUCT_DDL,
            data_path=spec.get("data_path"),
            id_cols=id_cols,
        )

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "SchemaRegistry":
        with open(path, encoding="utf-8") as f:
            return cls.from_json(f.read())

    # -- CDC schemas -----------------------------------------------------------

    def table_schema(self, version: int) -> StructType:
        return self.table_schemas[version]

    def register_version(self, version: int, schema: StructType) -> None:
        """Register a new table schema version, enforcing the registry's
        compatibility mode (Confluent-registry semantics over Spark
        StructTypes): violations raise :class:`CompatibilityError` and the
        registry is left unchanged — an incompatible producer deploy is
        stopped at registration time, never at replay time."""
        violations = self.check_compatibility(schema, version=version)
        if violations:
            raise CompatibilityError(
                f"schema v{version} violates {self.compatibility}: "
                + "; ".join(violations)
            )
        self.table_schemas[version] = schema

    # -- compatibility (Confluent modes over StructTypes) ---------------------

    def check_compatibility(
        self, schema: StructType, version: int | None = None
    ) -> list[str]:
        """Violation list (empty = compatible) of ``schema`` against the
        registry under ``self.compatibility``:

        - BACKWARD: the NEW schema can read data written with the latest
          registered schema (consumers upgrade first);
        - FORWARD: the latest registered schema can read data written with
          the NEW one (producers upgrade first);
        - FULL: both; ``*_TRANSITIVE``: against EVERY registered version,
          not just the latest; NONE: always compatible.

        "X can read Y" uses Avro resolution simplified to StructTypes:
        a reader field missing from the writer must be nullable (reads as
        null); a shared field's type must match or be a safe widening
        (int→long/double, long→double, float→double, int→float,
        date→timestamp)."""
        mode = self.compatibility
        candidates = [
            v for v in self.table_schemas if version is None or v != version
        ]
        if mode == "NONE" or not candidates:
            return []
        prior = (
            sorted(candidates)
            if mode.endswith("_TRANSITIVE")
            else [max(candidates)]
        )
        out: list[str] = []
        for v in prior:
            if version is not None and v == version:
                continue
            old = self.table_schemas[v]
            if mode.startswith("BACKWARD") or mode.startswith("FULL"):
                out += [f"[backward vs v{v}] {m}" for m in _can_read(schema, old)]
            if mode.startswith("FORWARD") or mode.startswith("FULL"):
                out += [f"[forward vs v{v}] {m}" for m in _can_read(old, schema)]
        return out

    def diff(self, old_version: int, new_version: int) -> dict:
        """added / dropped / retyped columns between two versions — the plan
        the runner turns into ALTER TABLE + merge-plan rewrite."""
        old = {f.name: f.dataType for f in self.table_schemas[old_version].fields}
        new = {f.name: f.dataType for f in self.table_schemas[new_version].fields}
        return {
            "added": sorted(set(new) - set(old)),
            "dropped": sorted(set(old) - set(new)),
            "retyped": sorted(
                n for n in set(old) & set(new) if old[n].simpleString() != new[n].simpleString()
            ),
        }

    # -- classification (C3-C5) -------------------------------------------------

    @staticmethod
    def looks_like_price(values: list[str]) -> bool:
        vals = [v for v in values if v]
        return bool(vals) and all(_PRICE_VAL.match(v.strip()) for v in vals)

    @staticmethod
    def looks_like_discount(values: list[str]) -> bool:
        vals = [v for v in values if v]
        return bool(vals) and all(_DISCOUNT_VAL.search(v.strip()) for v in vals)

    def classify_field(self, name: str, sample_values: list[str] | None = None) -> str | None:
        """Three-tier classification (field_classifier.rs:53-156).

        Tier order is semantics-bearing: the sku guard must run before the
        discount name-pattern so ``sku_percent_off`` cannot contaminate
        ``sku`` (regression: verify_column_fix.rs:86-109).
        """
        norm = normalize_field_name(name)
        # C3 exact
        if norm in self.field_mappings:
            return self.field_mappings[norm]
        # C4 fuzzy: bidirectional substring containment. The sku/discount
        # guard applies HERE too: an unseen discount-style name containing
        # 'sku' (e.g. skuPercentageOff) would otherwise fuzzy-match the
        # 'sku' mapping before the C5 guard could veto it — the exact
        # contamination verify_column_fix.rs:86-109 regressed on.
        for known, canonical in self.field_mappings.items():
            if known in norm or norm in known:
                if canonical == "sku" and ("percent" in norm or "off" in norm):
                    continue
                return canonical
        # C5 content/name-pattern tier (ordered)
        if "sku" in norm and "percent" not in norm and "off" not in norm:
            return "sku"
        if any(t in norm for t in ("price", "cost", "mrp")):
            return "cost_price" if "mrp" not in norm else "mrp"
        if any(t in norm for t in ("name", "title")):
            return "name"
        if norm.endswith("id") or norm == "id":
            return "product_id"
        if any(t in norm for t in ("discount", "off", "percent")):
            return "discount"
        if any(t in norm for t in ("category", "type", "class")):
            return "category"
        # C5 value-shape tier
        if sample_values:
            if self.looks_like_price(sample_values):
                return "cost_price"
            if self.looks_like_discount(sample_values):
                return "discount"
        return None

    def map_to_canonical(self, df: DataFrame, sample_rows: int = 5) -> DataFrame:
        """C6: rename every classifiable column to its canonical name in one
        ``select`` (single projection — Catalyst collapses it into the scan).

        Sampling for the value-shape tier reads ≤ ``sample_rows`` values per
        unresolved column (P13, registry-build-time, driver-side).
        """
        canon: dict[str, str | None] = {}
        for col in df.columns:
            canonical = self.classify_field(col)
            if canonical is None and sample_rows:
                samples = [
                    str(r[0])
                    for r in df.select(col).where(f"`{col}` is not null").limit(sample_rows).collect()
                ]
                canonical = self.classify_field(col, samples)
            canon[col] = canonical
        # Collision policy: a column ALREADY named its canonical name keeps
        # it (claimed first, regardless of position); other claimants fall
        # back to their original name, deterministically suffixed if that
        # is taken too — the output must never carry duplicate column
        # names (ambiguous downstream, unwritable as parquet).
        aliases: dict[str, str] = {}
        taken: set[str] = set()
        for col in df.columns:
            if canon[col] == col:
                aliases[col] = col
                taken.add(col)
        for col in df.columns:
            if col in aliases:
                continue
            canonical = canon[col]
            target = canonical if canonical and canonical not in taken else col
            n = 2
            while target in taken:
                target = f"{col}_{n}"
                n += 1
            aliases[col] = target
            taken.add(target)
        import pyspark.sql.functions as F

        return df.select(*[F.col(f"`{c}`").alias(aliases[c]) for c in df.columns])
