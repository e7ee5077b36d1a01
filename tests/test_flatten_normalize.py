"""Flatten cascade (P3-P12) + normalization (N1-N5) unit tests.

Fixtures lifted from the reference's own tests:
json_flattener.rs:444-593 (price fallback, golden krave_mart record,
pandamart shape), test_data_cleaning.rs:21-67 (unit formats, derived
discount), html_processor.rs:293-364 (price cleaning).
"""

import json

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.functions.extract import clean_price
from data_pipeline_spark.functions.normalize import (
    clean_name_extract_units_py,
    derive_discount,
    normalize_dataframe,
    normalize_price,
    parse_discount,
)
from data_pipeline_spark.functions.parse import flatten_products


def _read_json(spark, records):
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in records]))


def _flatten_one(spark, record):
    df = flatten_products(_read_json(spark, [record]))
    return df.collect()[0].asDict()


def test_price_fallback_primary(spark):
    r = _flatten_one(spark, {
        "product_id": 123, "name": "Test Product", "cost_price": 100.0,
        "mrp": 150.0, "special_price": 80.0, "product_price": 120.0,
        "sku": "TEST123", "sku_percent_off": "20%", "categories": [],
    })
    assert r["cost_price"] == "100"
    assert r["mrp"] == "150"
    assert r["sku"] == "TEST123"


def test_price_fallback_null_primary(spark):
    r = _flatten_one(spark, {
        "product_id": 124, "name": "Fallback Product", "cost_price": None,
        "mrp": None, "special_price": "234.00", "product_price": "390.00",
        "sku": "FALLBACK123", "sku_percent_off": "40%", "categories": [],
    })
    assert r["cost_price"] == "234"
    assert r["mrp"] == "390"


def test_price_absent_stays_empty(spark):
    r = _flatten_one(spark, {
        "product_id": 125, "name": "No Price Product", "sku": "NOPRICE123",
        "sku_percent_off": "0%", "categories": [],
    })
    assert r["cost_price"] == ""
    assert r["mrp"] == ""


def test_golden_krave_mart_record(spark):
    """json_flattener.rs:502-560 — the real-world sample."""
    r = _flatten_one(spark, {
        "store_id": 1242164, "sku": "BNDL7002230", "is_enabled": 1,
        "images": [], "categories": [{
            "store_id": 0, "category_name": "Fruits & Vegetables",
            "category_id": 4960, "product_id": 103922,
            "parent_category": {"parent_name": "inDrive", "parent_id": 4959, "id": 4960},
        }],
        "inventories": {"store_id": 1242164, "quantity": 22},
        "product_price": "390.00", "special_price": "234.00",
        "sku_percent_off": "40% off", "product_id": 103922,
        "name": "Kfresh Potatoes (Aalu) - 3 Kg", "mrp": None, "cost_price": None,
    })
    assert r["cost_price"] == "234"
    assert r["mrp"] == "390"
    assert r["name"] == "Kfresh Potatoes (Aalu) - 3 Kg"
    assert r["sku"] == "BNDL7002230"
    assert r["sku_percent_off"] == "40% off"
    assert r["category_name"] == "fruits & vegetables"


def test_pandamart_shape(spark):
    """json_flattener.rs:562-593 + attributes KV lookup (P7/P9)."""
    r = _flatten_one(spark, {
        "id": "12345", "name": "Fresh Bananas", "price": 150.0,
        "original_price": 200.0, "discount_percentage": 25,
        "category_section": "Fresh Fruits",
        "attributes": [{"key": "sku", "value": "PM-001"},
                       {"key": "baseUnit", "value": "dozen"}],
    })
    assert r["product_id"] == "12345"
    assert r["cost_price"] == "150"
    assert r["mrp"] == "200"
    assert r["sku_percent_off"] == "25"
    assert r["category_name"] == "Fresh Fruits"
    assert r["sku"] == "PM-001"
    assert r["units_of_mass"] == "dozen"


def test_synthesized_sku_and_dealcart_hops(spark):
    r = _flatten_one(spark, {
        "id": 99, "name": "DC Item",
        "productCategory": [{"category": {"name": "Snacks"}}],
        "groupRanges": [{"discountedPrice": "123.00"}],
        "inventories": [{"dcImsMrp": 150}],
    })
    assert r["product_id"] == "99"
    assert r["sku"] == "SKU_99"
    assert r["cost_price"] == "123"
    assert r["mrp"] == "150"
    assert r["category_name"] == "Snacks"


# -- N2 name/unit extraction (rule_normalizer.rs:33-110) ----------------------

@pytest.mark.parametrize(
    "name,expected_name,expected_unit",
    [
        ("Kfresh Potatoes (Aalu) - 3 Kg", "kfresh potatoes", "3 Kg"),
        ("Onion (Pyaaz) - 800gm", "onion", "800gm"),
        ("Eggs - half dozen", "eggs", "half dozen"),
        ("Bread (pack of 6)", "bread", "pack of 6"),
        ("Milk (500ml-600ml)", "milk", "500ml-600ml"),
        ("Chips | Buy 2 Get 1", "chips", "N/A"),
        ("Cucumber (Kheera)", "cucumber", "N/A"),
        ("Plain Rice", "plain rice", "N/A"),
        (None, "", "N/A"),
    ],
)
def test_clean_name_extract_units_py(name, expected_name, expected_unit):
    cleaned, unit = clean_name_extract_units_py(name)
    assert cleaned == expected_name
    assert unit == expected_unit


def test_clean_name_udf_matches_py(spark):
    names = [
        "Kfresh Potatoes (Aalu) - 3 Kg", "Onion (Pyaaz) - 800gm",
        "Eggs - half dozen", "Bread (pack of 6)", "Milk (500ml-600ml)",
        "Chips | Buy 2 Get 1", "Cucumber (Kheera)", "Plain Rice",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    from data_pipeline_spark.functions.normalize import with_clean_name_and_units

    got = with_clean_name_and_units(df).collect()
    for n, row in zip(names, got):
        exp_name, exp_unit = clean_name_extract_units_py(n)
        assert row["name"] == exp_name
        assert row["units_of_mass"] == exp_unit


# -- N1/N4/N5 -------------------------------------------------------------

def test_normalize_price_and_discount_exprs(spark):
    df = spark.createDataFrame(
        [("$1,234.50", "40% off"), ("99", "25%"), ("abc", "no num"), (None, None)],
        "price string, disc string",
    )
    rows = df.select(
        normalize_price(F.col("price")).alias("p"),
        parse_discount(F.col("disc")).alias("d"),
    ).collect()
    assert rows[0]["p"] == 1234.5 and rows[0]["d"] == 40.0
    assert rows[1]["p"] == 99.0 and rows[1]["d"] == 25.0
    assert rows[2]["p"] is None and rows[2]["d"] is None
    assert rows[3]["p"] is None and rows[3]["d"] is None


def test_derive_discount(spark):
    df = spark.createDataFrame(
        [
            (None, 80.0, 100.0),   # derive → 20.0
            (15.0, 80.0, 100.0),   # keep existing
            (None, 100.0, 100.0),  # both present, no gap → 0.0
            (None, None, 100.0),   # missing → null
            # (100-99.995)/100*100 = 0.004999... in f64 → rounds to 0.0,
            # matching Rust's (x*100).round()/100 on the same float.
            (None, 99.995, 100.0),
        ],
        "d double, c double, m double",
    )
    rows = df.select(
        derive_discount(F.col("d"), F.col("c"), F.col("m")).alias("out")
    ).collect()
    assert [r["out"] for r in rows] == [20.0, 15.0, 0.0, None, 0.0]


def test_full_normalize_dataframe(spark):
    """test_data_cleaning.rs:21-67-style micro-fixture through the whole
    flatten → rename → normalize path, with row-count preservation
    (test_full_pipeline.rs:61-70)."""
    records = [
        {"product_id": 1, "name": "Potatoes (Aalu) - 3 Kg", "cost_price": "80",
         "mrp": "100", "sku": "A1", "sku_percent_off": "", "categories": [
             {"category_name": "Veg"}]},
        {"product_id": 2, "name": "Eggs - half dozen", "special_price": "234.00",
         "product_price": "390.00", "sku": "A2", "sku_percent_off": "40% off",
         "categories": []},
    ]
    from data_pipeline_spark.plans.registry import SchemaRegistry

    staged = flatten_products(_read_json(spark, records))
    renamed = SchemaRegistry().map_to_canonical(staged, sample_rows=0)
    out = normalize_dataframe(renamed).orderBy("product_id").collect()
    assert len(out) == len(records)
    r1, r2 = out
    assert r1["name"] == "potatoes" and r1["units_of_mass"] == "3 Kg"
    assert r1["cost_price"] == 80.0 and r1["mrp"] == 100.0
    assert r1["discount"] == 20.0  # derived
    assert r1["category"] == "veg"
    assert r2["name"] == "eggs" and r2["units_of_mass"] == "half dozen"
    assert r2["discount"] == 40.0  # parsed from "40% off"


# -- H7 price cleaning (html_processor.rs:293-305) ---------------------------

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Rs. 150", "150"), ("PKR 1,500", "1500"), ("₨ 99.50", "99.5"),
        ("2100", "2100"), ("Rs. 0", None), ("", None), ("abc", None),
    ],
)
def test_clean_price(raw, expected):
    assert clean_price(raw) == expected


def test_unit_keyword_and_brand_extraction(spark):
    """H9/H10: ordered substring unit keywords; known-brand list then
    capitalized-first-word fallback (html_processor.rs:217-280)."""
    import pyspark.sql.functions as F

    from data_pipeline_spark.functions.normalize import (
        extract_brand,
        extract_unit_keyword,
    )

    rows = [
        ("Nestle Milk 2 kg", "kg", "nestle"),
        ("Fresh Eggs 1 dozen", "dozen", "Fresh"),
        ("Olive Oil 500 ml bottle", "ml", "Olive"),
        # "g " tier: word ending in g + space, reference quirk preserved
        ("spring water pack", "g ", None),  # placeholder, fixed below
        ("P&G Detergent", "g", "p&g"),  # "p&g " contains "g "
        ("xy", None, None),  # first word too short, no keywords
        ("lowercase item piece", "piece", None),
    ]
    df = spark.createDataFrame(
        [(r[0],) for r in rows], "name string"
    ).select(
        "name",
        extract_unit_keyword(F.col("name")).alias("unit"),
        extract_brand(F.col("name")).alias("brand"),
    )
    got = {r["name"]: (r["unit"], r["brand"]) for r in df.collect()}
    assert got["Nestle Milk 2 kg"] == ("kg", "nestle")
    assert got["Fresh Eggs 1 dozen"] == ("dozen", "Fresh")
    assert got["Olive Oil 500 ml bottle"] == ("ml", "Olive")
    # "spring water pack": "g " substring (sprinG ) fires before "pack" —
    # the reference's ordered-contains semantics, quirk and all.
    assert got["spring water pack"] == ("g", None)
    assert got["P&G Detergent"] == ("g", "p&g")
    assert got["xy"] == (None, None)
    assert got["lowercase item piece"] == ("piece", None)


def test_parse_json_with_quarantine(spark, tmp_path):
    """P16: malformed payloads split into a quarantine frame; good rows parse
    to typed columns; nothing is silently dropped."""
    from data_pipeline_spark.functions.parse import export_csv, parse_json_with_quarantine

    rows = [
        (1, '{"name": "apple", "price": 5.5}'),
        (2, '{"name": "broken"'),          # malformed
        (3, '{"name": "pear", "price": 2}'),
        (4, "not json at all"),
        (5, None),                          # null payload: good, null fields
    ]
    df = spark.createDataFrame(rows, "id int, payload string")
    good, bad = parse_json_with_quarantine(
        df, "payload", "name string, price double"
    )
    g = {r["id"]: (r["name"], r["price"]) for r in good.collect()}
    b = sorted(r["id"] for r in bad.collect())
    assert b == [2, 4]
    assert g[1] == ("apple", 5.5)
    assert g[3] == ("pear", 2.0)
    assert g[5] == (None, None)
    assert set(g) == {1, 3, 5}

    out = str(tmp_path / "csv_out")
    export_csv(good, out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 3


def test_garbage_in_numeric_field_passes_through_under_ansi(spark):
    """canonical_number must use try_cast: under Spark 4 ANSI mode a plain
    cast throws on the first malformed numeric string — at 10^10 events one
    garbage price in a payload would kill the whole stage. Non-numeric
    values take the documented pass-through branch instead."""
    r = _flatten_one(spark, {
        "product_id": "SKU-A1-B2", "name": "Garbage Price Product",
        "cost_price": "N/A", "special_price": "call for price",
        "sku": "X", "categories": [],
    })
    assert r["cost_price"] == "N/A"
    assert r["product_id"] == "SKU-A1-B2"
