"""HTML → record extraction: shared pure-Python core + vectorized Spark UDFs.

Re-expresses the reference's rule-based DOM extraction (H1-H7 in SURVEY.md §2.3;
/root/reference/src/fetcher/html_fetcher.rs:269-551 and
/root/reference/src/configs/naheed.toml:18-64) as ONE deterministic Python
implementation used in two places:

1. driver-side / test-side as the single-node **oracle**, and
2. executor-side inside Arrow-batched pandas UDFs (``extract_text_udf``,
   ``extract_products_udf``) — no per-row Python round trips; pandas applies
   the function over an Arrow batch at a time.

Using the identical function on both sides gives the byte-identical
text-per-url invariant (BASELINE.json input_hint) *by construction*.

The sandbox has no selectolax/lxml, so the DOM is built with stdlib
``html.parser``; the selector subset implemented below covers every selector
the reference configures (compound selectors only — no combinators appear in
naheed.toml). Swapping in selectolax later only changes ``_build_dom``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

import pandas as pd

# ---------------------------------------------------------------------------
# Mini-DOM
# ---------------------------------------------------------------------------

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


@dataclass
class Node:
    """One element node. Text is kept in document order in ``texts`` slots
    interleaved with children via ``order`` ("t" = text, "c" = child)."""

    tag: str
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    texts: list[str] = field(default_factory=list)
    order: list[str] = field(default_factory=list)

    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def iter_descendants(self):
        """Document-order descendants (excluding self) — matches
        scraper's ``ElementRef::select`` semantics."""
        for child in self.children:
            yield child
            yield from child.iter_descendants()

    def text_chunks(self) -> list[str]:
        """All text-node chunks under this element in document order —
        mirrors scraper's ``element.text()`` iterator."""
        out: list[str] = []
        ti = ci = 0
        for kind in self.order:
            if kind == "t":
                out.append(self.texts[ti])
                ti += 1
            else:
                out.extend(self.children[ci].text_chunks())
                ci += 1
        return out

    def text(self) -> str:
        """Reference joins text chunks with a single space then trims
        (html_fetcher.rs:433, :505)."""
        return " ".join(self.text_chunks()).strip()


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(tag="#root")
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(tag=tag, attrs={k: (v if v is not None else "") for k, v in attrs})
        parent = self.stack[-1]
        parent.children.append(node)
        parent.order.append("c")
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(tag=tag, attrs={k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)
        self.stack[-1].order.append("c")

    def handle_endtag(self, tag: str) -> None:
        # Close the nearest matching open tag (tolerant of malformed HTML).
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data: str) -> None:
        if data:
            node = self.stack[-1]
            node.texts.append(data)
            node.order.append("t")


def _build_dom(html: str) -> Node:
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ---------------------------------------------------------------------------
# CSS selector subset (exactly the forms naheed.toml uses)
# ---------------------------------------------------------------------------

_SEL_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9]*)?"
    r"(?P<cls>\.[A-Za-z0-9_-]+)?"
    r"(?P<attr>\[[^\]]+\])?$"
)
_ATTR_RE = re.compile(
    r"^\[\s*(?P<name>[A-Za-z0-9_-]+)\s*(?:(?P<op>\*?=)\s*"
    r"['\"]?(?P<val>[^'\"\]]*)['\"]?)?\s*\]$"
)


def _compile_selector(sel: str):
    """Compile a compound selector into a predicate, or None if unsupported."""
    m = _SEL_RE.match(sel.strip())
    if not m:
        return None
    tag = m.group("tag").lower() if m.group("tag") else None
    cls = m.group("cls")[1:] if m.group("cls") else None
    attr_name = attr_op = attr_val = None
    if m.group("attr"):
        am = _ATTR_RE.match(m.group("attr"))
        if not am:
            return None
        attr_name = am.group("name")
        attr_op = am.group("op")
        attr_val = am.group("val")

    def pred(node: Node) -> bool:
        if tag is not None and node.tag != tag:
            return False
        if cls is not None and cls not in node.classes():
            return False
        if attr_name is not None:
            if attr_name not in node.attrs:
                return False
            if attr_op == "=" and node.attrs[attr_name] != attr_val:
                return False
            if attr_op == "*=" and attr_val not in node.attrs[attr_name]:
                return False
        return True

    return pred


def select(scope: Node, selector: str) -> list[Node]:
    """Document-order descendants of ``scope`` matching ``selector``."""
    pred = _compile_selector(selector)
    if pred is None:
        return []
    return [n for n in scope.iter_descendants() if pred(n)]


def select_first(scope: Node, selector: str) -> Node | None:
    pred = _compile_selector(selector)
    if pred is None:
        return None
    for n in scope.iter_descendants():
        if pred(n):
            return n
    return None


# ---------------------------------------------------------------------------
# Reference selector cascades (naheed.toml:18-64)
# ---------------------------------------------------------------------------

PRODUCT_SELECTORS = [
    ".product-item-info", ".product-item", ".product-card", ".item",
    ".product", ".grid-item", "li[class*='item']", "div[class*='product']",
    "article[class*='product']",
]
NAME_SELECTORS = [
    ".product-name", ".product-item-name", ".item-title", ".product-title",
    "h3", "h4", "h2", ".title", "strong", "a[title]", ".name",
    "[class*='name']", "[class*='title']",
]
PRICE_SELECTORS = [
    "[data-price-amount]", ".price", ".cost", ".amount", "[class*='price']",
    ".product-price", "span[class*='rs']",
]
CATEGORY_SELECTORS = [
    "span.base[data-ui-id='page-title-wrapper']", ".page-title",
    ".breadcrumb", "h1", ".category-title",
]

# Price regexes (html_fetcher.rs:535-551; naheed.toml:112-117)
_PRICE_PATTERNS = [
    re.compile(r"Rs\.?\s*[\d,]+"),
    re.compile(r"PKR\.?\s*[\d,]+"),
    re.compile(r"₨\.?\s*[\d,]+"),
    re.compile(r"\d+\s*Rs"),
]

# Exclusion keywords (html_processor.rs:161-189)
EXCLUDED_KEYWORDS = [
    "advertisement", "sponsored", "banner", "footer", "header",
    "navigation", "menu", "breadcrumb", "pagination", "filter", "sort",
    "view all", "show more", "load more",
]


def extract_price_from_text(text: str) -> str | None:
    """First price-pattern match, trimmed (html_fetcher.rs:535-551)."""
    for pat in _PRICE_PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(0).strip()
    return None


def looks_like_price(text: str) -> bool:
    return any(p.search(text) for p in _PRICE_PATTERNS)


def _extract_name(element: Node) -> str | None:
    """Name cascade: first match per selector, first selector with text
    longer than 2 chars wins (html_fetcher.rs:419-459)."""
    for sel in NAME_SELECTORS:
        node = select_first(element, sel)
        if node is not None:
            name = node.text()
            if name and len(name) > 2:
                return name
    # Fallback: first non-empty trimmed line of element text >3 chars that
    # doesn't look like a price.
    text = " ".join(element.text_chunks())
    for line in text.splitlines():
        line = line.strip()
        if line and len(line) > 3 and not looks_like_price(line):
            return line
    return None


def _extract_price(element: Node) -> str | None:
    """Price cascade: per selector, first element; data-price-amount attr
    takes priority over its text (html_fetcher.rs:462-504)."""
    for sel in PRICE_SELECTORS:
        node = select_first(element, sel)
        if node is not None:
            if "data-price-amount" in node.attrs:
                return node.attrs["data-price-amount"]
            price = extract_price_from_text(node.text())
            if price is not None:
                return price
    return extract_price_from_text(" ".join(element.text_chunks()))


def _extract_product_id(element: Node) -> str | None:
    """data-product-id on the element, else first descendant bearing it
    (html_fetcher.rs:507-532)."""
    if "data-product-id" in element.attrs:
        return element.attrs["data-product-id"]
    node = select_first(element, "[data-product-id]")
    if node is not None:
        return node.attrs.get("data-product-id")
    return None


def _extract_page_category(root: Node) -> str | None:
    """First matching category selector's text (html_fetcher.rs:343-356)."""
    for sel in CATEGORY_SELECTORS:
        node = select_first(root, sel)
        if node is not None:
            text = node.text()
            if text:
                return text
    return None


def clean_price(price_text: str) -> str | None:
    """Strip Rs./Rs/PKR/₨/commas, keep digits+dot, parse f64, reject <=0,
    int-canonicalize (html_processor.rs:90-121 + P11 json_flattener.rs:143-169).

    Returns e.g. "Rs. 1,500" → "1500", "₨ 99.50" → "99.5"; None if invalid.
    """
    cleaned = (
        price_text.replace("Rs.", "").replace("Rs", "").replace("PKR", "")
        .replace("₨", "").replace(",", "").strip()
    )
    numeric = "".join(c for c in cleaned if c.isdigit() or c == ".")
    if not numeric:
        return None
    try:
        value = float(numeric)
    except ValueError:
        return None
    if value <= 0.0:
        return None
    # Rust f64::to_string prints integral floats without ".0"? No — it prints
    # "1500" for 1500.0. Python repr gives "1500.0"; canonicalize like P11.
    if value == int(value):
        return str(int(value))
    return repr(value)


def validate_product(name: str, price: str, product_id: str) -> bool:
    """html_processor.rs:124-149: name len 3-200, non-empty price/id, has
    alphabetic char, parsable price."""
    if len(name) < 3 or len(name) > 200:
        return False
    if not price or not product_id:
        return False
    if not any(c.isalpha() for c in name):
        return False
    return clean_price(price) is not None


def is_excluded(name: str) -> bool:
    """html_processor.rs:161-189 keyword exclusion on the name."""
    low = name.lower()
    return any(k in low for k in EXCLUDED_KEYWORDS)


def _extract_single_record(
    el: Node, page_category: str, source_type: str = "html"
) -> dict | None:
    """The per-element H2-H8 pipeline shared by the rule path (container
    selector hits) and the ML-fallback path (reference
    ``extract_single_product`` / ``candidate_to_product``,
    html_fetcher.rs:407-417,666-680): name/price/id cascades, exclusion,
    validation, price cleaning, canonical record. None if invalid."""
    name = _extract_name(el)
    if name is None:
        return None
    price = _extract_price(el)
    if price is None:
        return None
    product_id = _extract_product_id(el)
    if product_id is None:
        return None
    if is_excluded(name):
        return None
    if not validate_product(name, price, product_id):
        return None
    cleaned = clean_price(price)
    return {
        "name": name.strip(),
        "cost_price": cleaned,
        "mrp": cleaned,          # HTML sources carry a single price
        "product_id": product_id.strip(),
        "sku": product_id.strip(),
        "category_name": page_category.strip(),
        "sku_percent_off": "0.00",
        "units_of_mass": "N/A",
        "source_type": source_type,
    }


def extract_products(html: str, category_name: str = "") -> list[dict]:
    """Full rule-based extraction of one page → list of canonical records.

    Mirrors html_fetcher.rs:269-304 (first container selector with ≥1 match
    wins) + html_processor.rs:23-121 (validation, price cleaning, H8
    JSON-normalization: mrp = cost_price, sku = product_id,
    sku_percent_off = "0.00").
    """
    root = _build_dom(html)
    page_category = _extract_page_category(root) or category_name

    elements: list[Node] = []
    for sel in PRODUCT_SELECTORS:
        found = select(root, sel)
        if found:
            elements = found
            break

    products: list[dict] = []
    for el in elements:
        rec = _extract_single_record(el, page_category)
        if rec is not None:
            products.append(rec)
    return products


def extract_candidate_products(
    html: str, category_name: str = ""
) -> list[dict | None]:
    """H11 helper: one record (or None) per ML candidate element, aligned
    index-for-index with :func:`extract_dom_features`'s candidate order —
    the reference's ``candidate_to_product`` (html_fetcher.rs:666-680)
    vectorized: predicted-positive candidate indices join back to these
    records."""
    root = _build_dom(html)
    page_category = _extract_page_category(root) or category_name
    out: list[dict | None] = []
    for tag in _CANDIDATE_TAGS:
        for el in root.iter_descendants():
            if el.tag != tag:
                continue
            out.append(_extract_single_record(el, page_category, source_type="html_ml"))
    return out


def extract_text_dom(html: str) -> str:
    """DOM-walk twin of :func:`extract_text` — the parity oracle.

    Kept deliberately naive (build the full mini-DOM, walk it) so the fast
    streaming implementation below has an independent reference to be tested
    byte-identical against (tests/test_extract.py).
    """
    root = _build_dom(html)

    chunks: list[str] = []

    def walk(node: Node) -> None:
        if node.tag in ("script", "style"):
            return
        ti = ci = 0
        for kind in node.order:
            if kind == "t":
                chunks.append(node.texts[ti])
                ti += 1
            else:
                walk(node.children[ci])
                ci += 1

    walk(root)
    return re.sub(r"\s+", " ", " ".join(chunks)).strip()


class _TextCollector(HTMLParser):
    """Streaming text extraction: no DOM, no per-element allocation.

    Emits exactly the text chunks the DOM walk emits, in document order:
    html.parser switches to CDATA mode inside <script>/<style> and reports
    their raw content as data, which the ``_skip`` counter suppresses —
    mirroring the DOM version pruning those subtrees. An unclosed
    <script> swallows the rest of the document in both implementations
    (the parser never leaves CDATA mode).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, data: str) -> None:
        if data and not self._skip:
            self.chunks.append(data)


def extract_text_parser(html: str) -> str:
    """The html.parser implementation of visible-text extraction — the
    semantic definition, kept as the slow path + differential oracle for
    the gated fast scanner below."""
    p = _TextCollector()
    p.feed(html)
    p.close()
    return re.sub(r"\s+", " ", " ".join(p.chunks)).strip()


# Fast-path gate: the regex scanner is only byte-equivalent to html.parser
# for documents made of plain tags and text. Anything that engages parser
# special-casing — script/style CDATA modes, comments/doctype/CDATA/PIs
# ("<!", "<?"), quoted attribute values containing < or >, or a stray "<"
# that doesn't open a real tag — falls back to the parser.
_TRICKY = re.compile(r"<[sS][cC][rR][iI][pP][tT]|<[sS][tT][yY][lL][eE]|<!|<\?")
# One tag: "<", a name start or "/", then runs of quote-free chars or fully
# quoted sections (quotes may not contain < or >), then ">". Exactly one "<"
# per match, so gate-validity is: every "<" in the document starts a match.
_TAG = re.compile(r"""<[a-zA-Z/](?:[^<>"']|"[^"<>]*"|'[^'<>]*')*>""")
_WS = re.compile(r"\s+")


def extract_text(html: str) -> str:
    """Deterministic visible-text extraction for the ``text`` lake column.

    All text nodes outside <script>/<style>, document order, joined with a
    single space, whitespace-collapsed, trimmed. This one function is both
    the executor UDF body and the test oracle → byte-identical per url.

    Implementation: a regex scanner ~9× faster than html.parser (this is
    the dominant CPU kernel of the whole CDC replay — ~80% of epoch time),
    taken only when the gate proves the document is plain tags + text;
    everything else uses :func:`extract_text_parser`. Byte-parity of the
    two paths on gate-accepted inputs is pinned by differential + property
    tests (tests/test_extract.py).
    """
    if _TRICKY.search(html) is None:
        stripped, n_tags = _TAG.subn(" ", html)
        if stripped.count("<") == 0:
            # every "<" belonged to a well-formed simple tag → the parser
            # would have emitted exactly the remaining text segments.
            # Entity conversion AFTER tag removal is safe: a tag boundary
            # always injects a space, so references can't merge.
            from html import unescape

            return _WS.sub(" ", unescape(stripped)).strip()
    return extract_text_parser(html)


# ---------------------------------------------------------------------------
# H12: DOM structural features (the ML-fallback feature extractor)
# ---------------------------------------------------------------------------

# Name patterns from the reference FeatureExtractor
# (/root/reference/src/fetcher/html_fetcher.rs:716-721).
_NAME_PATTERNS = [
    re.compile(r"\b[A-Z][a-z]+(\s+[A-Z][a-z]+)*\b"),
    re.compile(r"\d+\s*(kg|g|ml|l|pack|pcs)\b"),
]

_CANDIDATE_TAGS = ("div", "article", "li", "section")

DOM_FEATURE_DIM = 17


def extract_dom_features(html: str) -> list[list[float]]:
    """H12: per-candidate 17-dim structural feature vectors.

    Candidates = every <div>, then every <article>, <li>, <section> (the
    reference enumerates the four selectors in that order,
    /root/reference/src/fetcher/html_fetcher.rs:601-617). Features per
    candidate (html_fetcher.rs:725-788): text len, uppercase count, digit
    count, word count; 4 price-regex flags; 2 name-regex flags; depth,
    class count, attr count, has_link; parent-context contains
    product/item/grid. The reference ships this path disabled (H11,
    naheed.toml:177) — here it doubles as feature engineering for the
    similarity/ANN operators (array<float> embedding input).
    """
    root = _build_dom(html)
    parents, depths = _dom_context(root)
    out: list[list[float]] = []
    for tag in _CANDIDATE_TAGS:
        for el in root.iter_descendants():
            if el.tag != tag:
                continue
            out.append(_node_features(el, parents, depths))
    return out


def _dom_context(root: Node) -> tuple[dict[int, Node], dict[int, int]]:
    """Depth + parent maps in one walk (reference counts self..root chain)."""
    parents: dict[int, Node] = {}
    depths: dict[int, int] = {id(root): 0}

    def walk(node: Node) -> None:
        for child in node.children:
            parents[id(child)] = node
            depths[id(child)] = depths[id(node)] + 1
            walk(child)

    walk(root)
    return parents, depths


def _node_features(
    el: Node, parents: dict[int, Node], depths: dict[int, int]
) -> list[float]:
    """The 17-dim H12 feature vector for one element in full-DOM context
    (html_fetcher.rs:725-788)."""
    text = " ".join(el.text_chunks())
    parent = parents.get(id(el))
    parent_ctx = " ".join(parent.classes()) if parent is not None else ""
    feats = [
        float(len(text)),
        float(sum(1 for c in text if c.isupper())),
        float(sum(1 for c in text if c.isnumeric())),
        float(len(text.split())),
    ]
    feats += [1.0 if p.search(text) else 0.0 for p in _PRICE_PATTERNS]
    feats += [1.0 if p.search(text) else 0.0 for p in _NAME_PATTERNS]
    feats += [
        float(depths[id(el)]),
        float(len(el.classes())),
        float(len(el.attrs)),
        1.0 if any(d.tag == "a" for d in el.iter_descendants()) else 0.0,
        1.0 if "product" in parent_ctx else 0.0,
        1.0 if "item" in parent_ctx else 0.0,
        1.0 if "grid" in parent_ctx else 0.0,
    ]
    return feats


# Training-example selectors (naheed_store.rs:460,571-580): positives are
# product-looking containers; negatives are site-chrome sections, capped at
# 2 per selector per page.
POSITIVE_EXAMPLE_SELECTORS = ["div[class*='product']", ".product-item", ".item"]
NEGATIVE_EXAMPLE_SELECTORS = [
    "header", "footer", "nav", ".navigation", ".menu",
    ".breadcrumb", ".sidebar", ".advertisement",
]


def extract_training_examples(html: str) -> list[dict]:
    """H11 training-data generation (naheed_store.rs:453-600).

    Positive examples: elements matching any POSITIVE_EXAMPLE_SELECTORS
    part (the reference's comma-compound selector, naheed_store.rs:460)
    where the name or price cascade extracts something
    (create_positive_example, :543-563). Negative examples: up to 2
    elements per NEGATIVE_EXAMPLE_SELECTORS entry with >10 chars of text
    (create_negative_examples, :565-600). One divergence, on purpose: the
    reference featurizes a *simplified* re-parse of the example fragment
    (example_to_candidate, :644-658 — hardcoded tag/depth, empty classes);
    we featurize the element in full-DOM context with the same H12 vector
    the scoring path uses, so train and score see one distribution.
    """
    root = _build_dom(html)
    parents, depths = _dom_context(root)
    examples: list[dict] = []

    pos_preds = [_compile_selector(s) for s in POSITIVE_EXAMPLE_SELECTORS]
    # One document-order pass over the compound selector, each element once
    # (scraper's Html::select yields per-element, not per-selector-part).
    for el in root.iter_descendants():
        if not any(p is not None and p(el) for p in pos_preds):
            continue
        name = _extract_name(el)
        price = _extract_price(el)
        if name is None and price is None:
            continue
        examples.append(
            {
                "label": 1.0,
                "features": _node_features(el, parents, depths),
                "name": name,
                "price": price,
                "section": "product-section",
            }
        )

    for sel in NEGATIVE_EXAMPLE_SELECTORS:
        for el in select(root, sel)[:2]:
            text = " ".join(el.text_chunks())
            if text.strip() and len(text) > 10:
                examples.append(
                    {
                        "label": 0.0,
                        "features": _node_features(el, parents, depths),
                        "name": None,
                        "price": None,
                        "section": sel,
                    }
                )
    return examples


# ---------------------------------------------------------------------------
# Vectorized Spark UDFs (Arrow-batched; no per-row Python round trips)
# ---------------------------------------------------------------------------

_PRODUCT_FIELDS = [
    "name", "cost_price", "mrp", "product_id", "sku",
    "category_name", "sku_percent_off", "units_of_mass", "source_type",
]

PRODUCT_STRUCT_DDL = (
    "array<struct<"
    + ",".join(f"{f}:string" for f in _PRODUCT_FIELDS)
    + ">>"
)


def _decode(b) -> str:
    if b is None:
        return ""
    if isinstance(b, (bytes, bytearray, memoryview)):
        return bytes(b).decode("utf-8", errors="replace")
    return str(b)


def _series_extract_text(s: pd.Series) -> pd.Series:
    return s.map(lambda b: extract_text(_decode(b)))


def _series_extract_products(s: pd.Series) -> pd.Series:
    def one(b):
        recs = extract_products(_decode(b))
        return [tuple(r[f] for f in _PRODUCT_FIELDS) for r in recs]

    return s.map(one)


def extract_text_udf():
    """pandas UDF: html binary → extracted text string."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_series_extract_text, "string")


def extract_products_udf():
    """pandas UDF: html binary → array<struct> of canonical product records."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_series_extract_products, PRODUCT_STRUCT_DDL)


_CANDIDATE_RECORD_DDL = (
    "array<struct<" + ",".join(f"{f}:string" for f in _PRODUCT_FIELDS) + ">>"
)


def _series_candidate_products(s: pd.Series) -> pd.Series:
    def one(b):
        recs = extract_candidate_products(_decode(b))
        return [
            None if r is None else tuple(r[f] for f in _PRODUCT_FIELDS)
            for r in recs
        ]

    return s.map(one)


def candidate_records_udf():
    """pandas UDF: html binary → per-ML-candidate records (null for invalid
    candidates), index-aligned with ``dom_features_udf``."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_series_candidate_products, _CANDIDATE_RECORD_DDL)


def _series_dom_features(s: pd.Series) -> pd.Series:
    return s.map(lambda b: extract_dom_features(_decode(b)))


def dom_features_udf():
    """pandas UDF: html binary → array<array<float>> of per-candidate H12
    structural feature vectors."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_series_dom_features, "array<array<float>>")


TRAINING_EXAMPLE_DDL = (
    "array<struct<label:double,features:array<float>,"
    "name:string,price:string,section:string>>"
)


def _series_training_examples(s: pd.Series) -> pd.Series:
    def one(b):
        return [
            (e["label"], e["features"], e["name"], e["price"], e["section"])
            for e in extract_training_examples(_decode(b))
        ]

    return s.map(one)


def training_examples_udf():
    """pandas UDF: html binary → array<struct> of labeled H11 training
    examples (naheed_store.rs:453-600)."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_series_training_examples, TRAINING_EXAMPLE_DDL)
