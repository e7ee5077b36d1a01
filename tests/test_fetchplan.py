"""S1/S3/S5/S7: fetch specs, pagination state machine, distributed crawl.

The transport is injected (no network in tests or in the sandbox); what IS
tested is everything the reference implements around the transport: request
construction, auth-header indirection, the stop rules, rate-limit schedule,
retry composition, and the crawl → envelope-extraction handoff — including
a parity pin between the driver-side envelope sniffer and the Spark
declarative extractor.
"""

import json
import os

import pytest

from data_pipeline_spark.functions.parse import extract_envelope_products
from data_pipeline_spark.sources.fetchplan import (
    CRAWL_SCHEMA,
    REFERENCE_FETCH_SPECS,
    FetchSpec,
    build_request,
    crawl,
    drive_pagination,
    extract_products_py,
    load_spec,
    load_specs,
    resolve_headers,
    save_spec,
    spec_with,
)

GET_SPEC = FetchSpec(source="s", base_url="https://x", pagination="page",
                     limit_param="limit", default_limit=100)
POST_SPEC = FetchSpec(source="s", base_url="https://x", method="POST",
                      pagination="post_body", limit_param="size",
                      default_limit=20, category_field="slug")


def page_payload(n_products, start=0):
    return json.dumps(
        {"products": [{"id": str(start + i), "name": f"p{start+i}", "price": "9"}
                      for i in range(n_products)]}
    )


# -- specs + requests ---------------------------------------------------------


def test_reference_spec_constants():
    """Pinned to src/configs/*.toml + unified_fetcher.rs constants."""
    km = REFERENCE_FETCH_SPECS["krave_mart"]
    assert (km.max_pages, km.max_consecutive_empty, km.rate_limit_ms) == (50, 2, 500)
    assert km.default_limit == 100 and km.page_base == 1
    assert km.data_path == "data[].krave_mart_products[]"
    ba = REFERENCE_FETCH_SPECS["bazaar_app"]
    assert ba.page_base == 0 and ba.default_limit == 20
    assert REFERENCE_FETCH_SPECS["dealcart"].default_limit == 2000
    nh = REFERENCE_FETCH_SPECS["naheed"]
    assert (nh.max_pages, nh.rate_limit_ms, nh.jitter_ms, nh.retries) == (
        5, 2000, 1000, 3)


def test_auth_header_env_indirection():
    spec = spec_with(GET_SPEC, auth_env="TOK", user_agent="UA",
                     headers={"X-Extra": "1"})
    h = resolve_headers(spec, env={"TOK": "sekrit"})
    assert h == {"X-Extra": "1", "User-Agent": "UA", "Authorization": "Bearer sekrit"}
    with pytest.raises(KeyError):
        resolve_headers(spec, env={})
    # no auth configured → no Authorization and no env requirement
    assert "Authorization" not in resolve_headers(GET_SPEC, env={})


def test_build_request_get_and_post():
    r = build_request(GET_SPEC, "veg", 3)
    assert r == {"url": "https://x/veg?page=3&limit=100", "method": "GET",
                 "body": None, "page": 3}
    r = build_request(POST_SPEC, "veg", 0)
    assert r["method"] == "POST"
    assert r["body"] == {"slug": "veg", "page": 0, "size": 20}


# -- envelope sniffer parity --------------------------------------------------

FIVE_SHAPES = [
    '[{"id":"1","name":"a","price":"10"},{"id":"2","name":"a2","price":"11"}]',
    '{"data":[{"l2_products":[{"id":"3","name":"b","price":"20"}]},'
    '{"krave_mart_products":[{"id":"4","name":"b2","price":"21"}]}]}',
    '{"products":[{"id":"5","name":"c","price":"30"}]}',
    '{"items":[{"id":"6","name":"d","price":"40"}]}',
    '{"data":{"categoryProductList":{"categoryProducts":[{"name":"Fresh",'
    '"items":[{"id":"7","name":"e","price":"50"}]}]}}}',
]


def test_sniffer_matches_spark_extractor(spark):
    """The driver-side stop-rule sniffer and the declarative Spark envelope
    operator must agree on every shape — else the crawl stops on pages the
    lake would have extracted (or vice versa)."""
    py_counts = [len(extract_products_py(json.loads(p))) for p in FIVE_SHAPES]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(FIVE_SHAPES)], "rid int, payload string"
    )
    out = extract_envelope_products(
        df, "payload", "id string, name string, price string", id_cols=("rid",)
    )
    spark_counts = [0] * len(FIVE_SHAPES)
    for r in out.groupBy("rid").count().collect():
        spark_counts[r["rid"]] = r["count"]
    assert py_counts == spark_counts == [2, 2, 1, 1, 1]
    # pattern-5 parent enrichment in the python twin too
    p5 = extract_products_py(json.loads(FIVE_SHAPES[4]))
    assert p5[0]["category_section"] == "Fresh"


def test_sniffer_data_path_priority():
    data = json.loads(FIVE_SHAPES[1])
    assert [p["id"] for p in
            extract_products_py(data, "data[].krave_mart_products[]")] == ["4"]
    assert extract_products_py({"body": {"results": [{"id": "8"}]}},
                               "body.results") == [{"id": "8"}]
    assert extract_products_py({"weird": 1}) == []


def test_sniffer_multi_hop_path_matches_spark_extractor(spark):
    """General data_path parity (regression: the old walker returned at
    the FIRST [] hop for any path other than the exact two-[]-segment
    form, so a 3-segment path counted wrapper objects as products and the
    crawl/stop decision diverged from what the lake would extract)."""
    payloads = [
        # data[].sections.products[] — plain hop between two [] hops
        '{"data":[{"sections":{"products":[{"id":"1"},{"id":"2"}]}},'
        '{"sections":{"products":[{"id":"3"}]}},'
        '{"sections":{}}]}',
        '{"data":[]}',
        '{"data":[{"sections":{"products": 7}}]}',  # non-list terminal
    ]
    path = "data[].sections.products[]"
    py_counts = [len(extract_products_py(json.loads(p), path)) for p in payloads]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "rid int, payload string"
    )
    out = extract_envelope_products(
        df, "payload", "id string", data_path=path, id_cols=("rid",)
    )
    spark_counts = [0] * len(payloads)
    for r in out.groupBy("rid").count().collect():
        spark_counts[r["rid"]] = r["count"]
    assert py_counts == spark_counts == [3, 0, 0]
    assert [p["id"] for p in
            extract_products_py(json.loads(payloads[0]), path)] == ["1", "2", "3"]


# -- pagination state machine -------------------------------------------------


def make_transport(pages_by_num, fail_pages=(), flaky_pages=()):
    """pages_by_num: {page -> n_products}; fail_pages always raise;
    flaky_pages raise on first call only."""
    calls = []
    flaked = set()

    def fetch(req):
        page = req["page"]
        calls.append(page)
        if page in fail_pages:
            raise OSError(f"http 500 on page {page}")
        if page in flaky_pages and page not in flaked:
            flaked.add(page)
            raise OSError(f"transient on page {page}")
        return page_payload(pages_by_num.get(page, 0), start=page * 100)

    fetch.calls = calls
    return fetch


def test_stop_after_two_consecutive_empty():
    fetch = make_transport({1: 3, 2: 2, 3: 1})
    sleeps = []
    pages = drive_pagination(GET_SPEC, fetch, "c", sleep=sleeps.append)
    assert [p["page"] for p in pages] == [1, 2, 3]
    assert [p["n_products"] for p in pages] == [3, 2, 1]
    # pages 4,5 empty → stop; 5 requests total, sleep after each non-final page
    assert fetch.calls == [1, 2, 3, 4, 5]
    assert len(sleeps) == 4 and all(s == 0.5 for s in sleeps)


def test_single_empty_gap_does_not_stop():
    fetch = make_transport({1: 1, 3: 1, 5: 1})  # gaps at 2,4 reset by 3,5
    pages = drive_pagination(GET_SPEC, fetch, "c", sleep=lambda _: None)
    assert [p["page"] for p in pages] == [1, 3, 5]
    assert fetch.calls == [1, 2, 3, 4, 5, 6, 7]  # stops after empties 6,7


def test_errors_share_the_empty_counter():
    # page 2 fails, page 3 non-empty resets, pages 4-5 fail → stop
    fetch = make_transport({1: 1, 3: 1}, fail_pages={2, 4, 5})
    pages = drive_pagination(GET_SPEC, fetch, "c", sleep=lambda _: None)
    assert [p["page"] for p in pages] == [1, 3]
    assert fetch.calls == [1, 2, 3, 4, 5]


def test_retry_recovers_before_charging_counter():
    spec = spec_with(GET_SPEC, retries=2)
    fetch = make_transport({1: 1, 2: 1}, flaky_pages={2})
    pages = drive_pagination(spec, fetch, "c", sleep=lambda _: None)
    assert [p["page"] for p in pages] == [1, 2]
    assert fetch.calls == [1, 2, 2, 3, 4]  # page 2 retried in-place, then empties


def test_max_pages_cap_get_and_post():
    fetch = make_transport({p: 1 for p in range(0, 60)})
    got = drive_pagination(GET_SPEC, fetch, "c", sleep=lambda _: None)
    assert len(got) == 50 and fetch.calls[0] == 1 and fetch.calls[-1] == 50
    fetch2 = make_transport({p: 1 for p in range(0, 60)})
    got2 = drive_pagination(POST_SPEC, fetch2, "c", sleep=lambda _: None)
    assert len(got2) == 50 and fetch2.calls[0] == 0 and fetch2.calls[-1] == 49


def test_single_fetch_mode():
    spec = FetchSpec(source="dc", base_url="https://x", pagination="none",
                     data_path="body.results")
    body = json.dumps({"body": {"results": [{"id": "1"}, {"id": "2"}]}})
    pages = drive_pagination(spec, lambda req: body, "c", sleep=lambda _: None)
    assert len(pages) == 1 and pages[0]["n_products"] == 2


def test_naheed_scrape_jitter_schedule_deterministic():
    spec = REFERENCE_FETCH_SPECS["naheed"]
    fetch = make_transport({p: 1 for p in range(1, 6)})
    s1, s2 = [], []
    drive_pagination(spec, fetch, "c", sleep=s1.append, seed=9)
    drive_pagination(spec, fetch, "c", sleep=s2.append, seed=9)
    assert s1 == s2 and len(s1) == 5  # 5-page scrape depth
    assert all(2.0 <= s <= 3.0 for s in s1)  # 2000ms + 0-1000ms jitter


# -- distributed crawl --------------------------------------------------------


def test_crawl_lands_pages_and_flattens(spark):
    # Transport defined as a CLOSURE: cloudpickle ships nested functions by
    # value, so executors need no tests/ module on their path — the same
    # shape a real user's partial(transport, session_cfg) would take.
    def crawl_fetch(req):
        import json as _json
        page = req["page"]
        n = 2 if page is not None and page <= 2 else 0
        return _json.dumps(
            {"products": [{"id": str((page or 0) * 10 + i),
                           "name": f"p{i}", "price": "9"} for i in range(n)]}
        )

    cats = ["veg", "fruit", "dairy"]
    df = crawl(spark, GET_SPEC, cats, crawl_fetch, sleep=None)
    rows = df.collect()
    assert df.schema.simpleString() == (
        "struct<" + CRAWL_SCHEMA.replace(" ", ":").replace(",:", ",") + ">"
    )
    assert {r["category"] for r in rows} == set(cats)
    assert all(r["n_products"] == 2 for r in rows)
    assert len(rows) == 6  # 2 non-empty pages per category
    # handoff: declarative flatten of the landed raw pages
    out = extract_envelope_products(
        df, "payload", "id string, name string, price string",
        id_cols=("source", "category", "page"),
    )
    assert out.count() == 12
    assert out.where("category = 'veg'").count() == 4


# -- file-loadable specs (VERDICT r2 Next round #4) ---------------------------


def test_specs_load_from_packaged_toml():
    """REFERENCE_FETCH_SPECS now comes from on-disk TOML documents (the
    reference's src/configs/*.toml role, minus the committed secrets)."""
    import data_pipeline_spark.sources as pkg

    cfg_dir = os.path.join(os.path.dirname(pkg.__file__), "configs")
    files = sorted(os.listdir(cfg_dir))
    assert {"krave_mart.toml", "bazaar_app.toml", "dealcart.toml",
            "pandamart.toml", "naheed.toml"} <= set(files)
    specs = load_specs(cfg_dir)
    assert specs == REFERENCE_FETCH_SPECS
    # no secret material on disk, only the env-var name
    raw = open(os.path.join(cfg_dir, "krave_mart.toml")).read()
    assert "Bearer" not in raw and "eyJ" not in raw
    assert specs["krave_mart"].auth_env == "KRAVE_MART_TOKEN"


def test_new_source_is_a_config_drop_not_a_code_edit(tmp_path, spark):
    """Adding a source = dropping one document into a config dir; the loaded
    spec drives the full pagination/crawl machinery with zero code changes."""
    (tmp_path / "freshmart.toml").write_text(
        'source = "freshmart"\n'
        'base_url = "https://api.freshmart.example"\n'
        'method = "GET"\n'
        'pagination = "page"\n'
        'page_param = "p"\n'
        'limit_param = "limit"\n'
        'default_limit = 50\n'
        'max_pages = 3\n'
    )
    specs = load_specs(str(tmp_path))
    spec = specs["freshmart"]
    assert spec.default_limit == 50 and spec.max_pages == 3

    def fetch(req):
        assert req["url"].startswith("https://api.freshmart.example/")
        assert "p=" in req["url"] and "limit=50" in req["url"]
        page = req["page"]
        n = 2 if page == 1 else 0
        return json.dumps({"products": [{"id": str(i)} for i in range(n)]})

    rows = crawl(spark, spec, ["veg"], fetch, sleep=None).collect()
    assert len(rows) == 1 and rows[0]["n_products"] == 2


def test_spec_round_trip_and_validation(tmp_path):
    spec = REFERENCE_FETCH_SPECS["naheed"]
    p = str(tmp_path / "naheed.json")
    save_spec(spec, p)
    assert load_spec(p) == spec
    # unknown field is a hard error, not a silent default
    (tmp_path / "bad.toml").write_text(
        'source = "b"\nbase_url = "https://b"\nmax_pgaes = 9\n'
    )
    with pytest.raises(ValueError, match="max_pgaes"):
        load_spec(str(tmp_path / "bad.toml"))
    # duplicate source names across documents is a hard error
    (tmp_path / "dup.toml").write_text('source = "naheed"\nbase_url = "https://x"\n')
    (tmp_path / "dup2.toml").write_text('source = "naheed"\nbase_url = "https://y"\n')
    os.remove(str(tmp_path / "bad.toml"))
    with pytest.raises(ValueError, match="duplicate source"):
        load_specs(str(tmp_path))
