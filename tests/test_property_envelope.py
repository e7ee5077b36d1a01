"""Property-based differential: the driver-side envelope sniffer
(`fetchplan.extract_products_py`, pure json.loads) and the declarative
Spark extractor (`parse.extract_envelope_products`) must report the SAME
product count for ARBITRARY payloads of the five common shapes, junk, and
whitespace-mangled variants — the sniffer drives the crawl's stop rule, so
any divergence either stops a crawl the lake would extract or keeps
crawling pages that extract to nothing.

Batch pattern: each property draws a LIST of payloads and runs them
through one DataFrame (O(1) Spark jobs per property)."""

import json

from hypothesis import given, settings, strategies as st

from data_pipeline_spark.functions.parse import extract_envelope_products
from data_pipeline_spark.sources.fetchplan import extract_products_py

PROD = "id string, name string, title string, price string, special_price string"

_word = st.from_regex(r"[A-Za-z0-9 .,-]{0,12}", fullmatch=True)
_product = st.fixed_dictionaries(
    {},
    optional={
        "id": _word, "name": _word, "title": _word,
        "price": _word, "special_price": _word,
    },
)
_products = st.lists(_product, max_size=4)
_ws = st.sampled_from(["", "\n", "\t ", "  \r\n  ", " "])


@st.composite
def _payload(draw):
    shape = draw(st.integers(0, 6))
    if shape == 0:  # root array (+ leading whitespace)
        return draw(_ws) + json.dumps(draw(_products))
    if shape == 1:  # kravemart data[] wrappers
        wraps = []
        for _ in range(draw(st.integers(0, 3))):
            w = {}
            which = draw(st.integers(0, 2))
            if which == 0:
                w["l2_products"] = draw(_products)
            elif which == 1:
                w["krave_mart_products"] = draw(_products)
            wraps.append(w)
        return json.dumps({"data": wraps})
    if shape == 2:
        return json.dumps({"products": draw(_products)})
    if shape == 3:
        return json.dumps({"items": draw(_products)})
    if shape == 4:  # pandamart GraphQL
        cats = [
            {"name": draw(_word), "items": draw(_products)}
            for _ in range(draw(st.integers(0, 2)))
        ]
        return json.dumps(
            {"data": {"categoryProductList": {"categoryProducts": cats}}}
        )
    if shape == 5:  # junk objects
        return json.dumps(draw(st.dictionaries(_word, _word, max_size=3)))
    return draw(_word)  # malformed / non-JSON


@settings(max_examples=12, deadline=None)
@given(st.lists(_payload(), min_size=1, max_size=25))
def test_sniffer_count_parity_on_arbitrary_payloads(spark, payloads):
    py_counts = []
    for p in payloads:
        try:
            py_counts.append(len(extract_products_py(json.loads(p))))
        except (json.JSONDecodeError, AttributeError):
            py_counts.append(0)
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "rid int, payload string"
    )
    out = extract_envelope_products(df, "payload", PROD, id_cols=("rid",))
    spark_counts = [0] * len(payloads)
    for r in out.groupBy("rid").count().collect():
        spark_counts[r["rid"]] = r["count"]
    assert spark_counts == py_counts, list(
        (i, p) for i, (a, b) in enumerate(zip(spark_counts, py_counts))
        if a != b for p in [payloads[i]]
    )
