"""P1/P2 nested-JSON envelope extraction: the five reference payload shapes
(/root/reference/src/fetcher/unified_fetcher.rs:509-572), config-driven
data_path extraction (api_config.rs:55-58), and the reference flattener's
golden records (json_flattener.rs:502-593) through envelope + P3-P12."""

import pytest

from data_pipeline_spark.functions.parse import (
    extract_envelope_products,
    flatten_products,
)
from data_pipeline_spark.plans.registry import SchemaRegistry

PROD = "id string, name string, title string, price string, special_price string"


def _extract(spark, payloads, **kw):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "rid int, payload string"
    )
    return extract_envelope_products(
        df, "payload", kw.pop("product_ddl", PROD), id_cols=("rid",), **kw
    )


def test_all_five_common_patterns(spark):
    payloads = [
        '[{"id":"1","name":"a","price":"10"},{"id":"2","name":"a2","price":"11"}]',
        '{"data":[{"l2_products":[{"id":"3","name":"b","price":"20"}]},'
        '{"krave_mart_products":[{"id":"4","name":"b2","price":"21"}]}]}',
        '{"products":[{"id":"5","name":"c","price":"30"}]}',
        '{"items":[{"id":"6","name":"d","price":"40"}]}',
        '{"data":{"categoryProductList":{"categoryProducts":[{"name":"Fresh",'
        '"items":[{"id":"7","name":"e","price":"50"}]}]}}}',
    ]
    out = _extract(spark, payloads)
    rows = {(r["rid"], r["prod_idx"]): r for r in out.collect()}
    # shape 1 (root array) and shape 2 (kravemart) fan out to 2 products each
    assert {k for k in rows} == {
        (0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (3, 0), (4, 0)
    }
    assert rows[(1, 0)]["name"] == "b" and rows[(1, 1)]["name"] == "b2"
    # Pandamart parent enrichment (unified_fetcher.rs:549-560)
    assert rows[(4, 0)]["category_section"] == "Fresh"
    assert all(
        r["category_section"] is None for k, r in rows.items() if k[0] != 4
    )


def test_no_pattern_and_malformed_yield_zero_rows(spark):
    out = _extract(spark, ["not json", "{}", '{"foo": 1}', '{"data": []}'])
    assert out.count() == 0


def test_object_payload_not_mistaken_for_root_array(spark):
    """from_json with an array schema wraps a lone object into a 1-element
    array; the lexical '[' probe must prevent that from shadowing the
    object-envelope patterns."""
    out = _extract(spark, ['{"products":[{"id":"9","name":"z","price":"1"}]}'])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["name"] == "z"


def test_root_array_probe_tolerates_leading_whitespace(spark):
    """Spark's ltrim strips spaces only; a pretty-printed / newline-prefixed
    array payload must still hit the root-array shape (regression: the
    '[' probe previously used ltrim and silently yielded zero rows)."""
    out = _extract(spark, [
        '\n[{"id":"1","name":"a","price":"10"}]',
        '\t [{"id":"2","name":"b","price":"11"}]',
        '  \r\n  [{"id":"3","name":"c","price":"12"}]',
    ])
    assert {r["name"] for r in out.collect()} == {"a", "b", "c"}


def test_data_path_array_hops(spark):
    """P1 []-hops: every [] level fans out (full-path semantics; the
    reference's extract_by_path early-returns at the first [] —
    unified_fetcher.rs:488-501 — which would yield wrapper objects)."""
    out = _extract(
        spark,
        ['{"data":[{"l2":[{"id":"1","name":"a","price":"1"}]},'
         '{"l2":[{"id":"2","name":"b","price":"2"}]}]}'],
        data_path="data[].l2[]",
    )
    assert [r["name"] for r in out.orderBy("prod_idx").collect()] == ["a", "b"]


def test_data_path_object_hops(spark):
    """dealcart.toml:13 style: plain object hops, terminal array."""
    out = _extract(
        spark,
        ['{"body":{"results":[{"id":"1","name":"a","price":"1"}]}}'],
        data_path="body.results",
    )
    assert [r["name"] for r in out.collect()] == ["a"]


def test_registry_spec_round_trip_drives_extraction(spark):
    reg = SchemaRegistry()
    reg.register_source("acme", data_path="body.results", product_schema=PROD)
    reg2 = SchemaRegistry.from_json(reg.to_json())
    assert reg2.source_spec("krave_mart")["data_path"] == "data[].krave_mart_products[]"
    df = spark.createDataFrame(
        [(1, '{"body":{"results":[{"id":"1","name":"a","price":"7"}]}}')],
        "rid int, payload string",
    )
    out = reg2.envelope_products(df, "payload", source="acme", id_cols=("rid",))
    assert [r["price"] for r in out.collect()] == ["7"]


# -- reference golden records (json_flattener.rs:502-593) --------------------

_KFRESH = """
{"store_id": 1242164, "sku": "BNDL7002230", "is_enabled": 1,
 "categories": [{"store_id": 0, "category_name": "Fruits & Vegetables",
                 "category_id": 4960, "product_id": 103922}],
 "inventories": {"store_id": 1242164, "quantity": 22},
 "product_price": "390.00", "special_price": "234.00",
 "sku_percent_off": "40% off", "product_id": 103922,
 "name": "Kfresh Potatoes (Aalu) - 3 Kg",
 "description": "Kfresh Potatoes (Aalu) - 3 Kg",
 "deals": null, "mrp": null, "cost_price": null}
"""

_PANDAMART = """
{"id": "12345", "name": "Fresh Bananas", "description": "Premium quality",
 "price": "150.0", "original_price": "200.0", "discount_percentage": "25",
 "category_section": "Fresh Fruits", "availability": true}
"""


@pytest.fixture(scope="module")
def rich_ddl():
    from data_pipeline_spark.plans.registry import DEFAULT_PRODUCT_DDL

    # category_section rides the envelope column, not the record schema.
    return DEFAULT_PRODUCT_DDL + ", description string"


def _flatten_one(spark, payload_json, rich_ddl):
    env = _extract(
        spark, ["{\"products\": [" + payload_json + "]}"], product_ddl=rich_ddl
    )
    rows = flatten_products(env, keep_cols=("rid",)).collect()
    assert len(rows) == 1
    return rows[0]


def test_golden_real_world_sample(spark, rich_ddl):
    """json_flattener.rs test_real_world_sample_data expectations."""
    r = _flatten_one(spark, _KFRESH, rich_ddl)
    assert r["cost_price"] == "234"          # special_price -> cost_price
    assert r["mrp"] == "390"                 # product_price -> mrp
    assert r["name"] == "Kfresh Potatoes (Aalu) - 3 Kg"
    assert r["sku"] == "BNDL7002230"
    assert r["sku_percent_off"] == "40% off"
    assert r["category_name"] == "fruits & vegetables"


def test_golden_pandamart_sample(spark, rich_ddl):
    """json_flattener.rs test_pandamart_json_flattening expectations.

    category_section here is a FIELD of the record (the reference's fetcher
    injected it upstream); the cascade must still pick it up.
    """
    env = _extract(
        spark,
        ['{"products": [' + _PANDAMART + "]}"],
        product_ddl=rich_ddl + ", category_section string",
    )
    r = flatten_products(env, keep_cols=("rid",)).collect()[0]
    assert r["product_id"] == "12345"
    assert r["name"] == "Fresh Bananas"
    assert r["cost_price"] == "150"          # price -> cost_price
    assert r["mrp"] == "200"                 # original_price -> mrp
    assert r["sku_percent_off"] == "25"      # discount_percentage
    assert r["category_name"] == "Fresh Fruits"
