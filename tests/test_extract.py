"""HTML extraction tests (H1-H7): selector-cascade semantics, entities,
nesting, exclusion, price-attr priority, fallbacks — plus UDF/oracle parity.

Semantics mirror /root/reference/src/fetcher/html_fetcher.rs:269-551 and
naheed.toml:18-64; the same Python implementation runs in the pandas UDF, so
these tests pin the engine AND the oracle simultaneously.
"""

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.functions.extract import (
    clean_price,
    extract_price_from_text,
    extract_products,
    extract_text,
    extract_text_udf,
    extract_products_udf,
    looks_like_price,
)

PAGE = """
<html><body>
<span class="base" data-ui-id="page-title-wrapper">Fresh Fruits</span>
<div class="product-item-info" data-product-id="101">
  <h3>Red Apples &amp; Pears (1 kg)</h3>
  <span class="price" data-price-amount="350">Rs. 350</span>
</div>
<div class="product-item-info">
  <h3>Bananas Dozen</h3>
  <span class="price">PKR 1,250</span>
  <a data-product-id="102">buy</a>
</div>
<div class="product-item-info" data-product-id="103">
  <h3>Advertisement banner special</h3>
  <span class="price">Rs. 999</span>
</div>
</body></html>
"""


def test_container_cascade_first_selector_wins():
    """.product-item-info is tried before .product-item; presence of the
    former must shadow the latter entirely."""
    html = PAGE.replace("product-item-info", "product-item-info") + ""
    prods = extract_products(html)
    ids = [p["product_id"] for p in prods]
    assert ids == ["101", "102"]  # 103 excluded (advertisement/banner)


def test_data_price_amount_priority():
    prods = extract_products(PAGE)
    assert prods[0]["cost_price"] == "350"  # attr, not "Rs. 350" text
    assert prods[0]["mrp"] == "350"
    assert prods[1]["cost_price"] == "1250"  # PKR 1,250 → cleaned


def test_entity_decoding_and_category():
    prods = extract_products(PAGE)
    assert prods[0]["name"] == "Red Apples & Pears (1 kg)"
    assert prods[0]["category_name"] == "Fresh Fruits"
    assert prods[0]["sku"] == "101"
    assert prods[0]["sku_percent_off"] == "0.00"


def test_product_id_from_descendant():
    prods = extract_products(PAGE)
    assert prods[1]["product_id"] == "102"


def test_exclusion_keywords():
    prods = extract_products(PAGE)
    assert all("banner" not in p["name"].lower() for p in prods)


def test_fallback_container_selector():
    html = """
    <ul>
      <li class="list-item" data-product-id="7">
        <strong>Mango Crate</strong> <span class="cost">Rs. 2,500</span>
      </li>
    </ul>"""
    prods = extract_products(html, category_name="Fruit")
    assert len(prods) == 1
    assert prods[0]["product_id"] == "7"
    assert prods[0]["cost_price"] == "2500"
    assert prods[0]["category_name"] == "Fruit"  # no page category → arg


def test_name_fallback_first_nonprice_line():
    html = """
    <div class="product" data-product-id="9">
      Rs. 450
      Golden Syrup Bottle
    </div>"""
    prods = extract_products(html)
    assert len(prods) == 1
    assert prods[0]["name"] == "Golden Syrup Bottle"
    assert prods[0]["cost_price"] == "450"


def test_price_regex_fallback_over_all_text():
    html = """
    <div class="product" data-product-id="11">
      <h3>Basmati Rice Bag</h3>
      <p>only 925 Rs today</p>
    </div>"""
    prods = extract_products(html)
    assert prods[0]["cost_price"] == "925"


def test_nested_containers_no_price_rejected():
    html = '<div class="product" data-product-id="1"><h3>Thing One</h3></div>'
    assert extract_products(html) == []


def test_invalid_price_rejected():
    html = ('<div class="product" data-product-id="1"><h3>Zero Item</h3>'
            '<span class="price" data-price-amount="0">Rs. 0</span></div>')
    assert extract_products(html) == []


@pytest.mark.parametrize(
    "text,expected",
    [
        ("Rs. 1,500", "Rs. 1,500"), ("price PKR 99 each", "PKR 99"),
        ("₨. 75", "₨. 75"), ("450 Rs", "450 Rs"), ("no price here", None),
    ],
)
def test_extract_price_from_text(text, expected):
    assert extract_price_from_text(text) == expected


def test_looks_like_price():
    assert looks_like_price("Rs. 20")
    assert not looks_like_price("Apples")


def test_extract_text_determinism_and_entities():
    html = "<div><script>var x=1;</script><p>A &amp; B</p>\n<p>C   D</p></div>"
    assert extract_text(html) == "A & B C D"
    # idempotent / deterministic
    assert extract_text(html) == extract_text(html)


def test_udfs_match_oracle(spark):
    pages = [PAGE, "<div class='product' data-product-id='5'><h4>Tea Box</h4>"
                   "<span class='price'>Rs. 320</span></div>", "<p>nothing</p>"]
    df = spark.createDataFrame([(p.encode(),) for p in pages], "html binary")
    got = df.select(
        extract_text_udf()(F.col("html")).alias("text"),
        extract_products_udf()(F.col("html")).alias("prods"),
    ).collect()
    for page, row in zip(pages, got):
        assert row["text"] == extract_text(page)  # byte-identical
        oracle = extract_products(page)
        assert len(row["prods"]) == len(oracle)
        for got_p, exp_p in zip(row["prods"], oracle):
            assert got_p["name"] == exp_p["name"]
            assert got_p["cost_price"] == exp_p["cost_price"]
            assert got_p["product_id"] == exp_p["product_id"]


def test_fast_text_extractor_matches_dom_twin():
    """The streaming text collector must be byte-identical to the naive
    DOM-walk implementation on adversarial and fuzzed markup."""
    import random

    from data_pipeline_spark.functions.extract import extract_text, extract_text_dom

    samples = [
        "<p>a<Br>b</p><script>skip</script>tail",
        "<script>unclosed to EOF ... <div>hidden</div>",
        "</script>stray close<div>ok</div>",
        "<style/><span>self-closed style</span>",
        "text &lt;escaped&gt; &amp; entity &#65; &nbsp;done",
        "<SCRIPT>UPPER</SCRIPT>after",
        "<div><script></div></script>weird</div>end",
        "",
        "plain",
        "<b>bold<i>ital</b>close-cross</i>rest",
        "<script type='x'><style>nested?</style></script>visible",
        "a < b and c > d <!-- comment --> <!DOCTYPE html> tail",
    ]
    rng = random.Random(7)
    vocab = [
        "<div class='c1'>", "</div>", "<script>", "</script>", "<style>",
        "</style>", "word ", "&amp;", "<br>", "<span data-x='1'>", "</span>",
        "\n\t ", "<p>", "</p>", "<!-- c -->",
        # gate-edge tokens for the regex fast path
        "< notatag ", "<div title=\"a>b\">", "&amp", "&ampx", "5 < 6 > 4 ",
        "<a href=foo>", "</ div>", "<SpAn>", "</SPAN>", "&#65;&#x42;",
    ]
    for _ in range(500):
        samples.append("".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
    for s in samples:
        assert extract_text(s) == extract_text_dom(s), repr(s[:120])


def test_fast_path_differential_vs_parser():
    """extract_text (gated regex fast path) must be byte-identical to the
    html.parser implementation on every input — by taking the fast path
    only when equivalence is provable, falling back otherwise."""
    from data_pipeline_spark.functions.extract import (
        extract_text,
        extract_text_parser,
    )

    battery = [
        # fast-path eligible
        '<html><body><div class="x" data-id="7"><h3>A &amp; B</h3>'
        '<span class="price" data-price-amount="450">Rs. 450</span></div></body></html>',
        "<p>a</p><p>b</p>",
        "<a href=unquoted>link</a> tail",
        "<div title='q'>t</div>",
        "&nbsp;&#10;x&#x41;",
        "plain text only",
        "",
        # must fall back (and stay identical)
        "< b> stray open",
        '<div title="a>b">quoted gt</div>',
        "<script>var x = '<div>';</script>visible",
        "<!-- c --> <!DOCTYPE html> after",
        "<?pi ?>x",
        "a & b &amp c &ampx d",
        "broken <unclosed",
        "<style>p{}</style>styled",
    ]
    for s in battery:
        assert extract_text(s) == extract_text_parser(s), repr(s)


def test_fast_path_property_parity():
    """Property test: on arbitrary ascii-ish soup the gated fast path never
    diverges from the parser semantics."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_spark.functions.extract import (
        extract_text,
        extract_text_parser,
    )

    soup = st.text(
        alphabet='<>&"\'/;!?- \tabcdeSCRIPTstyle=#x0123',
        max_size=80,
    )

    @settings(max_examples=400, deadline=None)
    @given(soup)
    def check(s):
        assert extract_text(s) == extract_text_parser(s)

    check()


def test_dom_features_shape_and_values():
    from data_pipeline_spark.functions.extract import (
        DOM_FEATURE_DIM,
        extract_dom_features,
    )

    html = (
        '<html><body><div class="product-item grid" data-x="1">'
        '<h3>Fresh Apple</h3><span class="price">Rs. 150</span>'
        '<a href="#">buy</a></div>'
        "<li>item two</li></body></html>"
    )
    feats = extract_dom_features(html)
    # candidates: the div (tag pass 1) then the li (tag pass 3)
    assert len(feats) == 2
    assert all(len(f) == DOM_FEATURE_DIM for f in feats)
    div = feats[0]
    text = "Fresh Apple Rs. 150 buy"
    assert div[0] == float(len(text))
    assert div[1] == 3.0  # F, A, R
    assert div[2] == 3.0  # 1, 5, 0
    assert div[3] == 5.0  # words
    assert div[4] == 1.0  # Rs. pattern
    assert div[8] == 1.0  # capitalized-name pattern
    assert div[10] == 3.0  # depth: html(1) body(2) div(3)
    assert div[11] == 2.0  # classes
    assert div[12] == 2.0  # attrs: class + data-x
    assert div[13] == 1.0  # has <a>
    li = feats[1]
    assert li[13] == 0.0 and li[11] == 0.0
