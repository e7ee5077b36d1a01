"""S1/S3/S5/S7: per-source fetch specs + the pagination state machine +
a distributed category crawl — the reference's fetch layer re-expressed
for a cluster, with the network behind an injectable transport.

Reference semantics mirrored exactly:

- pagination driver (/root/reference/src/fetcher/unified_fetcher.rs:130-223
  GET, :225-332 POST): hard cap of ``max_pages``; fetch errors, JSON parse
  failures and empty pages share one ``consecutive_empty`` counter that
  stops the loop at 2; a non-empty page resets it; fixed inter-page sleep.
  GET pagination is 1-based, POST 0-based (unified_fetcher.rs:132,231).
- per-source request config (/root/reference/src/config/api_config.rs:40-56,
  ``src/configs/*.toml``): method, endpoint, page/limit params, page size,
  auth + extra headers, rate limits; HTML scraping uses its own depth/delay
  (naheed.toml:10-14: 5 pages/category, 2000 ms + jitter).
- envelope sniffing for the stop rule (unified_fetcher.rs:509-572): the
  five common payload shapes, as a pure-Python twin of
  :func:`..functions.parse.extract_envelope_products` (parity pinned by
  test) — the driver must know page emptiness *online*; the landed raw
  pages are still flattened declaratively in Spark.

One deliberate divergence: the reference commits live bearer tokens into
its TOML configs (krave_mart.toml:5). Here a spec carries only the NAME of
an environment variable (``auth_env``); the secret is resolved at request
time and never serialized with the spec.

Scale posture: one category = one task (``mapInPandas`` over a
category-partitioned frame). Politeness (rate limit) is per category —
sequential within a task — while the cluster crawls categories in
parallel; 1000 executors crawl 1000 categories at once without any task
exceeding the per-source request rate.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import time
import tomllib
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession

from ..streaming.retry import with_retries

# -- spec ---------------------------------------------------------------------


@dataclass(frozen=True)
class FetchSpec:
    """Everything the reference keeps in a per-source ``*.toml``, minus
    secrets (api_config.rs:14-56)."""

    source: str
    base_url: str
    method: str = "GET"              # GET | POST | GRAPHQL | HTML
    endpoint: str = ""
    pagination: str = "page"         # page | post_body | none
    page_param: str = "page"
    limit_param: str | None = None
    default_limit: int | None = None
    category_field: str = "category"
    max_pages: int = 50              # unified_fetcher.rs:135,231
    max_consecutive_empty: int = 2   # unified_fetcher.rs:134,230
    rate_limit_ms: int = 500         # unified_fetcher.rs:214,322
    jitter_ms: int = 0               # naheed scrape adds 0-1000 (html_fetcher.rs:107-111)
    retries: int = 0                 # per-request, html_fetcher.rs:169-193 schedule
    auth_env: str | None = None      # env var holding the bearer token
    headers: dict = field(default_factory=dict)
    user_agent: str | None = None
    data_path: str | None = None     # response.data_path, e.g. "data[].krave_mart_products[]"

    @property
    def page_base(self) -> int:
        """GET pagination is 1-based, POST-body 0-based (unified_fetcher.rs)."""
        return 0 if self.pagination == "post_body" else 1


# -- file-loadable specs -------------------------------------------------------
#
# The reference drives its sources from on-disk TOML documents
# (/root/reference/src/configs/*.toml, loaded at src/config/api_config.rs:61-66).
# Mirrored here: one flat TOML (or JSON) document per source; adding a source
# is a config drop, not a code edit. Secrets are still never on disk — a
# document carries only the env-var NAME (`auth_env`).


def spec_from_dict(d: dict) -> FetchSpec:
    """Build a spec from a parsed config document; unknown keys are a hard
    error (a typo'd field silently falling back to a default is how a crawler
    ends up hammering page 1 fifty times)."""
    names = {f.name for f in dataclasses.fields(FetchSpec)}
    unknown = set(d) - names
    if unknown:
        raise ValueError(f"unknown fetch-spec field(s): {sorted(unknown)}")
    if "source" not in d or "base_url" not in d:
        raise ValueError("fetch spec requires 'source' and 'base_url'")
    return FetchSpec(**d)


def spec_to_dict(spec: FetchSpec) -> dict:
    """Serializable view: defaults and None-valued fields dropped, so the
    document stays as minimal as the hand-written ones."""
    out = {}
    for f in dataclasses.fields(FetchSpec):
        v = getattr(spec, f.name)
        default = f.default if f.default is not dataclasses.MISSING else (
            f.default_factory() if f.default_factory is not dataclasses.MISSING else None
        )
        if v is not None and v != default:
            out[f.name] = v
    out["source"] = spec.source
    out["base_url"] = spec.base_url
    return out


def load_spec(path: str) -> FetchSpec:
    """Load one spec document (.toml via stdlib tomllib, or .json)."""
    with open(path, "rb") as fh:
        if path.endswith(".toml"):
            d = tomllib.load(fh)
        else:
            d = json.loads(fh.read())
    return spec_from_dict(d)


def save_spec(spec: FetchSpec, path: str) -> None:
    """Write a spec as a JSON document `load_spec` round-trips (stdlib has
    no TOML writer; load accepts both)."""
    with open(path, "w") as fh:
        json.dump(spec_to_dict(spec), fh, indent=2, sort_keys=True)
        fh.write("\n")


def load_specs(config_dir: str) -> dict[str, FetchSpec]:
    """Load every *.toml / *.json under `config_dir`, keyed by source name.
    Two documents claiming the same source name is a hard error."""
    specs: dict[str, FetchSpec] = {}
    paths = sorted(
        os.path.join(config_dir, p)
        for p in os.listdir(config_dir)
        if p.endswith((".toml", ".json"))
    )
    for p in paths:
        s = load_spec(p)
        if s.source in specs:
            raise ValueError(f"duplicate source {s.source!r} in {p}")
        specs[s.source] = s
    return specs


def _packaged_specs() -> dict[str, FetchSpec]:
    """Load the spec documents shipped inside the package. Goes through
    importlib.resources so it works both from a source checkout and from
    the spark-submit --py-files zip (where os.listdir can't)."""
    from importlib import resources

    specs: dict[str, FetchSpec] = {}
    root = resources.files(__package__) / "configs"
    for entry in sorted(root.iterdir(), key=lambda e: e.name):
        if entry.name.endswith(".toml"):
            d = tomllib.loads(entry.read_text())
        elif entry.name.endswith(".json"):
            d = json.loads(entry.read_text())
        else:
            continue
        s = spec_from_dict(d)
        if s.source in specs:
            raise ValueError(f"duplicate source {s.source!r} in {entry.name}")
        specs[s.source] = s
    return specs


# The reference's four API sources + one HTML source, loaded from the
# packaged config documents (values from the reference's
# src/configs/{krave_mart,bazaar_app,dealcart,pandamart,naheed}.toml).
REFERENCE_FETCH_SPECS: dict[str, FetchSpec] = _packaged_specs()


def resolve_headers(spec: FetchSpec, env=None) -> dict:
    """Materialize request headers; the bearer token comes from the
    environment at request time (api_config.rs:46 ``authorization`` role).
    A configured-but-absent token is a hard error — a silent missing
    Authorization header just manifests as confusing 401 pages later."""
    env = os.environ if env is None else env
    headers = dict(spec.headers)
    if spec.user_agent:
        headers["User-Agent"] = spec.user_agent
    if spec.auth_env:
        if spec.auth_env not in env:
            raise KeyError(
                f"source {spec.source!r} requires auth token in ${spec.auth_env}"
            )
        headers["Authorization"] = f"Bearer {env[spec.auth_env]}"
    return headers


def build_request(spec: FetchSpec, category: str, page: int | None) -> dict:
    """One request descriptor — url/method/body, no transport."""
    base = spec.base_url + spec.endpoint
    if spec.pagination == "post_body":
        body = {spec.category_field: category, spec.page_param: page}
        if spec.limit_param:
            body[spec.limit_param] = spec.default_limit
        return {"url": base, "method": "POST", "body": body, "page": page}
    if spec.pagination == "page":
        # unified_fetcher.rs:147 — "{url}?page={n}"; limit riding along when
        # the source defines one (krave_mart.toml default_limit=100).
        q = f"{spec.page_param}={page}"
        if spec.limit_param and spec.default_limit:
            q += f"&{spec.limit_param}={spec.default_limit}"
        return {
            "url": f"{base}/{category}?{q}", "method": "GET",
            "body": None, "page": page,
        }
    # single fetch (dealcart "none" / pandamart GraphQL)
    q = f"?{spec.limit_param}={spec.default_limit}" if spec.limit_param else ""
    return {
        "url": f"{base}/{category}{q}",
        "method": "POST" if spec.method == "GRAPHQL" else "GET",
        "body": {"category_id": category} if spec.method == "GRAPHQL" else None,
        "page": page,
    }


# -- envelope sniffing (pure-Python twin of parse.extract_envelope_products) --


def _walk_path(data, path: str) -> list:
    """data_path walker — exact recursion twin of
    ``parse._path_extract_sql`` so the online empty-page stop rule counts
    the SAME rows the Spark extractor will later produce, for ANY path
    shape (not just the reference's two-``[]`` forms): every ``[]`` hop
    fans out and concatenates, plain hops descend, the terminal segment's
    array is returned (missing / non-list values contribute [])."""
    from ..functions.parse import _parse_path

    def gen(obj, rest) -> list:
        name, is_arr = rest[0]
        val = obj.get(name) if isinstance(obj, dict) else None
        if len(rest) == 1:
            return val if isinstance(val, list) else []
        if is_arr:
            out: list = []
            for item in val if isinstance(val, list) else []:
                out.extend(gen(item, rest[1:]))
            return out
        return gen(val, rest[1:])

    return gen(data, _parse_path(path))


def extract_products_py(data, data_path: str | None = None) -> list:
    """The five common-pattern shapes (unified_fetcher.rs:509-572), used
    driver-side for the online empty-page stop rule. ``data_path`` wins
    when configured; ``_walk_path`` fans out every ``[]`` hop exactly as
    the declarative extractor does (parity pinned in tests)."""
    if data_path is not None:
        return _walk_path(data, data_path)
    if isinstance(data, list):                                   # pattern 1
        return data
    if not isinstance(data, dict):
        return []
    d = data.get("data")
    if isinstance(d, list):                                      # pattern 2
        out = []
        for item in d:
            if not isinstance(item, dict):
                continue
            for k in ("l2_products", "krave_mart_products"):
                v = item.get(k)
                if isinstance(v, list):
                    out.extend(v)
                    break
        return out
    for k in ("products", "items"):                              # patterns 3-4
        v = data.get(k)
        if isinstance(v, list):
            return v
    cpl = d.get("categoryProductList") if isinstance(d, dict) else None  # pattern 5
    cats = cpl.get("categoryProducts") if isinstance(cpl, dict) else None
    if isinstance(cats, list):
        out = []
        for cat in cats:
            items = cat.get("items") if isinstance(cat, dict) else None
            if not isinstance(items, list):
                continue
            name = cat.get("name") or "Unknown"
            for item in items:
                if isinstance(item, dict):
                    item = {**item, "category_section": name}
                out.append(item)
        return out
    return []


# -- the pagination state machine --------------------------------------------


def drive_pagination(
    spec: FetchSpec,
    fetch,
    category: str,
    sleep=time.sleep,
    seed: int = 42,
) -> list[dict]:
    """Drive one category to completion; returns one record per page that
    yielded products: ``{"page", "payload", "n_products"}`` (raw page text
    lands in the sink — flattening stays declarative, in Spark).

    ``fetch(request: dict) -> str`` is the transport: raw response body.
    Exact reference loop semantics (see module docstring); per-request
    retry (``spec.retries``) composes via :func:`with_retries` before an
    error is charged to the consecutive-empty counter.
    """
    rng = random.Random(seed)

    def pause() -> None:
        sleep((spec.rate_limit_ms + rng.uniform(0, spec.jitter_ms)) / 1000.0)

    if spec.pagination == "none":
        req = build_request(spec, category, page=None)
        body = fetch(req)
        n = len(extract_products_py(json.loads(body), spec.data_path))
        return [{"page": 0, "payload": body, "n_products": n}] if n else []

    pages: list[dict] = []
    page = spec.page_base
    consecutive_empty = 0
    while True:
        # rs:139 GET (1-based): stop when page > max; rs:235 POST (0-based):
        # stop when page >= max — both yield exactly max_pages requests.
        if page >= spec.max_pages + spec.page_base:
            break
        req = build_request(spec, category, page)
        try:
            if spec.retries:
                body = with_retries(
                    lambda r=req: fetch(r), max_retries=spec.retries,
                    seed=seed + page, sleep=sleep,
                )
            else:
                body = fetch(req)
            products = extract_products_py(json.loads(body), spec.data_path)
        except Exception:
            # fetch failure and parse failure are both "an empty page" to
            # the stop rule (unified_fetcher.rs:151-166,169-186).
            consecutive_empty += 1
            if consecutive_empty >= spec.max_consecutive_empty:
                break
            page += 1
            pause()
            continue
        if not products:
            consecutive_empty += 1
            if consecutive_empty >= spec.max_consecutive_empty:
                break
        else:
            consecutive_empty = 0
            pages.append(
                {"page": page, "payload": body, "n_products": len(products)}
            )
        page += 1
        pause()
    return pages


# -- distributed crawl --------------------------------------------------------

CRAWL_SCHEMA = (
    "source string, category string, page int, payload string, n_products int"
)


def crawl(
    spark: SparkSession,
    spec: FetchSpec,
    categories: list[str],
    fetch,
    sleep=time.sleep,
) -> DataFrame:
    """S7 at cluster scale: categories fan out one-per-task; each task runs
    the sequential (rate-limited) pagination driver for its category and
    emits raw page rows. ``fetch`` must be cloudpicklable (top-level
    function, partial, or closure). ``sleep=None`` disables rate limiting
    (tests / offline replays). Downstream:
    ``registry.envelope_products(crawled, "payload", source)``.
    """
    import pandas as pd

    slp = (lambda _s: None) if sleep is None else sleep

    # Exactly one category per partition: parallelize slices the local list
    # deterministically (element i -> slice i). A hash repartition on the
    # category value would birthday-collide — some tasks crawling 2-3
    # categories back-to-back under the rate limit while others sit empty.
    cat_rdd = spark.sparkContext.parallelize(
        [(c,) for c in categories], max(len(categories), 1)
    )
    cat_df = spark.createDataFrame(cat_rdd, "category string")

    def run_partition(batches):
        for pdf in batches:
            for cat in pdf["category"]:
                rows = drive_pagination(spec, fetch, cat, sleep=slp)
                if rows:
                    yield pd.DataFrame(
                        {
                            "source": spec.source,
                            "category": cat,
                            "page": [r["page"] for r in rows],
                            "payload": [r["payload"] for r in rows],
                            "n_products": [r["n_products"] for r in rows],
                        }
                    )

    return cat_df.mapInPandas(run_partition, schema=CRAWL_SCHEMA)


def spec_to_registry(spec: FetchSpec) -> dict:
    """The registry source-spec view of a fetch spec (one document per
    source: extraction + fetch config together, the reference's TOML
    role)."""
    return {"data_path": spec.data_path, "fetch": {
        k: v for k, v in spec.__dict__.items() if k != "headers"
    } | {"headers": dict(spec.headers)}}


def spec_with(spec: FetchSpec, **overrides) -> FetchSpec:
    return replace(spec, **overrides)
