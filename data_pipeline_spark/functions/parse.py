"""Typed parse: JSON flatten + fallback coalesce cascades P1-P12 (SURVEY.md §2.2).

Re-expresses /root/reference/src/processor/json_flattener.rs:131-436 — which
probes many alternative field names per logical column across four source
shapes — as ONE declarative ``select`` of ``coalesce`` cascades. Catalyst
prunes to exactly the referenced fields; per-row lazy evaluation of
``coalesce`` reproduces the reference's short-circuit "first present field
wins" semantics natively (no UDF).

Works on any DataFrame produced by ``spark.read.json`` (or ``from_json``);
missing fields/shapes in a given source's schema resolve to null columns, so
all source shapes (krave_mart / bazaar_app / dealcart / pandamart / html)
flow through the same plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

STAGING_COLUMNS = [
    "cost_price", "mrp", "name", "sku", "product_id", "sku_percent_off",
    "category_name", "units_of_mass",
]


def _has(df: DataFrame, path: str) -> bool:
    """True if dotted ``path`` resolves in df's schema."""
    fields = df.schema
    for part in path.split("."):
        try:
            names = {f.name: f for f in fields.fields}  # type: ignore[union-attr]
        except AttributeError:
            return False
        if part not in names:
            return False
        fields = names[part].dataType
        # unwrap array element for [0]-style hops
        while hasattr(fields, "elementType"):
            fields = fields.elementType
    return True


def _col(df: DataFrame, path: str) -> Column:
    """Column at ``path`` if it exists in the schema, else null literal."""
    return F.col(path) if _has(df, path) else F.lit(None)


def _is_array(df: DataFrame, name: str) -> bool:
    for f in df.schema.fields:
        if f.name == name:
            return hasattr(f.dataType, "elementType")
    return False


def canonical_number(col: Column) -> Column:
    """P11 (json_flattener.rs:143-169): numeric → integer string when the
    fractional part is 0, else float string ("390.00"→"390", 99.5→"99.5").
    Non-numeric strings pass through unchanged — which requires try_cast:
    under Spark 4's default ANSI mode a plain cast THROWS on the first
    malformed value (one garbage price string in 100 TB kills the job)
    instead of taking the pass-through branch."""
    d = col.try_cast("double")
    return (
        F.when(d.isNull(), col.cast("string"))
        .when(d == F.floor(d), d.cast("long").cast("string"))
        .otherwise(d.cast("string"))
    )


def _num_cascade(*cols: Column) -> Column:
    """Coalesce over alternatives, canonicalizing each numeric candidate
    (the reference canonicalizes per-field at extraction time)."""
    return F.coalesce(*[canonical_number(c) for c in cols])


def flatten_products(df: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Project any source-shaped product records onto the fixed 8-column
    string staging schema (P12, json_flattener.rs:408-436); ``keep_cols``
    are passthrough identity columns (e.g. the envelope's source row id).

    Cascade order per column is semantics-bearing (first present wins):

    - product_id: product_id → productID → sku → id → variantTitleSlug (P3)
    - name: name → title → productName (P4)
    - cost_price: cost_price → special_price → discountedPrice →
      discounted_price → price → groupRanges[0].discountedPrice (P5)
    - mrp: mrp → product_price → actualPrice → actual_price →
      originalPrice → original_price → inventories[0].dcImsMrp (P6)
    - sku: sku → attributes[key=='sku'].value → "SKU_{id}" (P7)
    - sku_percent_off: sku_percent_off → discount_percentage →
      discountPercentage → "0.00" iff productID present (P8)
    - units_of_mass: units_of_mass → unit → baseUnit →
      attributes[key=='baseUnit'].value → "N/A" (P9)
    - category_name: categories[].category_name (lower, ", "-joined) →
      productCategory[].category.name → category_section → category (P10)
    """
    c = lambda p: _col(df, p)  # noqa: E731

    product_id = _num_cascade(
        c("product_id"), c("productID"), c("sku"), c("id"), c("variantTitleSlug")
    )
    name = F.coalesce(
        c("name").cast("string"), c("title").cast("string"),
        c("productName").cast("string"),
    )
    cost_price = _num_cascade(
        c("cost_price"), c("special_price"), c("discountedPrice"),
        c("discounted_price"), c("price"),
        c("groupRanges")[0]["discountedPrice"] if _has(df, "groupRanges.discountedPrice") else F.lit(None),
    )
    if _has(df, "inventories.dcImsMrp"):
        inv_mrp = (
            c("inventories")[0]["dcImsMrp"]
            if _is_array(df, "inventories")
            else c("inventories")["dcImsMrp"]
        )
    else:
        inv_mrp = F.lit(None)
    mrp = _num_cascade(
        c("mrp"), c("product_price"), c("actualPrice"), c("actual_price"),
        c("originalPrice"), c("original_price"), inv_mrp,
    )

    # P7: key-value array lookup with synthesized fallback SKU_{id}.
    if _has(df, "attributes.key"):
        attr_sku = F.element_at(
            F.filter(c("attributes"), lambda x: x["key"] == "sku"), 1
        )["value"]
        attr_unit = F.element_at(
            F.filter(c("attributes"), lambda x: x["key"] == "baseUnit"), 1
        )["value"]
    else:
        attr_sku = F.lit(None)
        attr_unit = F.lit(None)
    sku = F.coalesce(
        c("sku").cast("string"), attr_sku.cast("string"),
        F.when(product_id.isNotNull(), F.concat(F.lit("SKU_"), product_id)),
    )

    # P8: discount cascade; literal "0.00" iff a productID-bearing source.
    sku_percent_off = F.coalesce(
        c("sku_percent_off").cast("string"),
        _num_cascade(c("discount_percentage"), c("discountPercentage")),
        F.when(c("productID").isNotNull(), F.lit("0.00")),
    )

    units = F.coalesce(
        c("units_of_mass").cast("string"), c("unit").cast("string"),
        c("baseUnit").cast("string"), attr_unit.cast("string"), F.lit("N/A"),
    )

    # P10: category array flatten (lowercased, ", "-joined) → alternatives.
    # SQL-parsed lambdas, NOT python-lambda HOFs: both branches can land
    # inside ONE coalesce expression, and PySpark 4.1 mis-binds the lambda
    # variables of sibling python-lambda higher-order functions nested under
    # a single expression (see textdedup._signature_from_shingles).
    if _has(df, "categories.category_name"):
        cat_arr = F.expr(
            "array_join(transform(categories, x -> lower(trim(x.category_name))), ', ')"
        )
        cat_arr = F.when(F.size(c("categories")) > 0, cat_arr)
    else:
        cat_arr = F.lit(None)
    if _has(df, "productCategory.category.name"):
        pc_arr = F.expr(
            "array_join(transform(productCategory, x -> trim(x.category.name)), ', ')"
        )
        pc_arr = F.when(F.size(c("productCategory")) > 0, pc_arr)
    else:
        pc_arr = F.lit(None)
    category = F.coalesce(
        cat_arr, pc_arr, c("category_section").cast("string"),
        c("category_name").cast("string"), c("category").cast("string"),
    )

    out = df.select(
        *keep_cols,
        cost_price.alias("cost_price"),
        mrp.alias("mrp"),
        name.alias("name"),
        sku.alias("sku"),
        product_id.alias("product_id"),
        sku_percent_off.alias("sku_percent_off"),
        category.alias("category_name"),
        units.alias("units_of_mass"),
    )
    # P12: fixed schema — missing values land as "" (json_flattener.rs:414-423).
    return out.select(
        *keep_cols,
        *[F.coalesce(F.col(col), F.lit("")).alias(col) for col in STAGING_COLUMNS],
    )


def extract_json_path(col: Column, *path: str) -> Column:
    """P1: dotted-path extraction over a JSON *string* column
    (unified_fetcher.rs:483-507) — ``get_json_object`` keeps it JVM-side."""
    return F.get_json_object(col, "$." + ".".join(path))


# ---------------------------------------------------------------------------
# P1/P2: nested-JSON envelope extraction (the first mile of every JSON source)
# ---------------------------------------------------------------------------

def _parse_path(path: str) -> list[tuple[str, bool]]:
    """``"data[].l2_products[]"`` → ``[("data", True), ("l2_products", True)]``."""
    segs = []
    for part in path.split("."):
        part = part.strip()
        if part.endswith("[]"):
            segs.append((part[:-2], True))
        else:
            segs.append((part, False))
    return segs


def _path_schema_ddl(segs: list[tuple[str, bool]], product_ddl: str) -> str:
    """Envelope DDL for a data_path: the terminal segment is an array of
    product records (the reference's final ``current.as_array()``), each
    ``[]`` hop above it an array of wrapper structs, plain hops structs."""
    field_name = segs[-1][0]
    t = f"array<struct<{product_ddl}>>"
    for name, is_arr in reversed(segs[:-1]):
        inner = f"struct<`{field_name}`: {t}>"
        t = f"array<{inner}>" if is_arr else inner
        field_name = name
    return f"struct<`{field_name}`: {t}>"


def _path_extract_sql(parsed_col: str, segs: list[tuple[str, bool]]) -> str:
    """SQL expression flattening a parsed envelope down its data_path to one
    ``array<product>``. SQL-parsed lambdas with unique variable names per
    depth (never python-lambda HOF siblings — PySpark 4.1 mis-binds them).

    NOTE a deliberate divergence from the reference: its ``extract_by_path``
    returns at the FIRST ``[]`` segment, ignoring the rest of the configured
    path (/root/reference/src/fetcher/unified_fetcher.rs:483-507 — so
    ``data[].krave_mart_products[]`` actually yields the wrapper objects).
    This implements the path as specified — every ``[]`` hop fans out — which
    is what the configs mean and what the common-pattern fallback does.
    """

    def gen(obj: str, rest: list[tuple[str, bool]], depth: int) -> str:
        name, _ = rest[0]
        if len(rest) == 1:
            return f"coalesce({obj}.`{name}`, array())"
        if rest[0][1]:
            var = f"x{depth}"
            inner = gen(var, rest[1:], depth + 1)
            return (
                f"flatten(transform(coalesce({obj}.`{name}`, array()), "
                f"{var} -> {inner}))"
            )
        return gen(f"{obj}.`{name}`", rest[1:], depth)

    return gen(parsed_col, segs, 0)


def extract_envelope_products(
    df: DataFrame,
    payload_col: str,
    product_ddl: str,
    data_path: str | None = None,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """P2: explode raw JSON envelope payloads into one row per product
    record, with Pandamart parent-``name`` enrichment as ``category_section``
    (/root/reference/src/fetcher/unified_fetcher.rs:483-572).

    ``data_path`` (per-source config, e.g. ``"data[].krave_mart_products[]"``,
    ``"body.results"`` — api_config.rs:57, krave_mart.toml:13,
    dealcart.toml:13) takes priority; otherwise the five common patterns are
    probed in reference order:

    1. root array (BazaarApp);
    2. ``data[]`` → per-item ``l2_products[]`` else ``krave_mart_products[]``
       (KraveMart — the data-array presence wins even if items are empty);
    3. ``products[]``;
    4. ``items[]``;
    5. ``data.categoryProductList.categoryProducts[].items[]`` with the
       category's ``name`` attached to each product as ``category_section``
       (Pandamart GraphQL).

    Everything is one declarative plan: three ``from_json`` parses (the
    object-envelope and GraphQL shapes need incompatible ``data`` types, so
    each parse nulls out on the other's payloads), a lexical root-array probe
    (``from_json`` with an array schema "helpfully" wraps a lone object into
    a 1-element array, so the array shape is detected by the leading ``[``),
    a CASE over SQL-parsed lambdas, one ``posexplode``. No UDFs, no driver
    round trips; Catalyst prunes unused parse branches per query.

    Returns ``id_cols + (prod_idx, category_section) + product fields``;
    rows whose payload matches no shape (or is malformed) yield zero rows —
    route raw payloads through :func:`parse_json_with_quarantine` first when
    a quarantine ledger is needed.

    Output feeds :func:`flatten_products` (category_section participates in
    the P10 category cascade).
    """
    wrap = (
        "transform({arr}, xw -> struct(xw AS product, "
        "CAST(NULL AS STRING) AS category_section))"
    )
    if data_path is not None:
        segs = _parse_path(data_path)
        parsed = df.withColumn(
            "_pp", F.from_json(F.col(payload_col), _path_schema_ddl(segs, product_ddl))
        )
        chosen = F.expr(wrap.format(arr=_path_extract_sql("_pp", segs)))
    else:
        env_ddl = (
            f"struct<data: array<struct<l2_products: array<struct<{product_ddl}>>, "
            f"krave_mart_products: array<struct<{product_ddl}>>>>, "
            f"products: array<struct<{product_ddl}>>, "
            f"items: array<struct<{product_ddl}>>>"
        )
        gql_ddl = (
            "struct<data: struct<categoryProductList: struct<"
            f"categoryProducts: array<struct<name: string, "
            f"items: array<struct<{product_ddl}>>>>>>>"
        )
        parsed = (
            df.withColumn("_root", F.from_json(F.col(payload_col), f"array<struct<{product_ddl}>>"))
            .withColumn("_env", F.from_json(F.col(payload_col), env_ddl))
            .withColumn("_gql", F.from_json(F.col(payload_col), gql_ddl))
        )
        chosen = F.expr(
            f"""CASE
  WHEN {payload_col} RLIKE '^\\\\s*\\\\[' THEN
    {wrap.format(arr='coalesce(_root, array())')}
  WHEN _env.data IS NOT NULL THEN
    {wrap.format(arr="flatten(transform(_env.data, xd -> coalesce(xd.l2_products, xd.krave_mart_products, array())))")}
  WHEN _env.products IS NOT NULL THEN {wrap.format(arr='_env.products')}
  WHEN _env.items IS NOT NULL THEN {wrap.format(arr='_env.items')}
  WHEN _gql.data.categoryProductList.categoryProducts IS NOT NULL THEN
    flatten(transform(_gql.data.categoryProductList.categoryProducts,
      xc -> transform(coalesce(xc.items, array()),
        xi -> struct(xi AS product, xc.name AS category_section))))
  ELSE array()
END"""
        )
    exploded = parsed.select(
        *id_cols, F.posexplode(chosen).alias("prod_idx", "_rec")
    )
    from pyspark.sql.types import _parse_datatype_string

    prod_fields = _parse_datatype_string(f"struct<{product_ddl}>").fieldNames()
    # A record-level category_section (a source that pre-injects it, like the
    # reference fetcher does for Pandamart) wins over envelope enrichment.
    section = F.col("_rec.category_section")
    if "category_section" in prod_fields:
        section = F.coalesce(F.col("_rec.product.category_section"), section)
        prod_fields = [f for f in prod_fields if f != "category_section"]
    return exploded.select(
        *id_cols,
        "prod_idx",
        section.alias("category_section"),
        *[F.col(f"_rec.product.`{f}`").alias(f) for f in prod_fields],
    )


def parse_json_with_quarantine(
    df: DataFrame, payload_col: str, schema: str | "StructType"
):
    """P16: typed JSON-payload parse with per-row error quarantine.

    The reference skips+counts rows whose extraction fails
    (/root/reference/src/processor/json_flattener.rs:19-48,
    /root/reference/src/processor/html_processor.rs:28-50); the Spark
    idiom is PERMISSIVE parsing with a corrupt-record column: malformed
    payloads land in a quarantine DataFrame instead of killing the job,
    and both sides stay fully distributed (no driver round trip).

    Returns ``(good, quarantined)``:
    - ``good``: original columns + the parsed struct's fields (payload
      dropped);
    - ``quarantined``: original rows whose payload failed to parse, plus
      ``_corrupt`` carrying the raw text — write it to a quarantine table
      and count it into the metrics ledger.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    schema_with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt", StringType(), True)]
    )
    parsed = df.withColumn(
        "_p",
        F.from_json(
            F.col(payload_col).cast("string"),
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    is_bad = F.col(payload_col).isNotNull() & (
        F.col("_p").isNull() | F.col("_p._corrupt").isNotNull()
    )
    keep = [c for c in df.columns if c != payload_col]
    good = parsed.where(~is_bad).select(
        *keep, *[F.col(f"_p.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantined = parsed.where(is_bad).select(
        *keep, F.coalesce(F.col("_p._corrupt"), F.col(payload_col).cast("string")).alias("_corrupt")
    )
    return good, quarantined


def export_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    """S15: CSV export (reference: sample result export,
    /root/reference/src/bin/test_unified_pipeline.rs:182-196)."""
    df.write.mode("overwrite").option("header", str(header).lower()).option(
        "sep", sep
    ).csv(path)
