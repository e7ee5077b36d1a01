"""H11 ML-fallback: candidate explosion, distributed RF training, scoring.

The reference ships this disabled; the test proves the Spark machinery is
real — features from the H12 UDF, pyspark.ml fit/transform, and that a
forest trained on separable synthetic candidates actually separates them.
"""

import pyspark.sql.functions as F

from data_pipeline_spark.operators.mlfallback import (
    candidate_features,
    extract_products_with_fallback,
    predict_product_candidates,
    train_fallback_model,
)


def _pages(spark, n):
    """Pages whose product-like divs have price text + product class, and
    boilerplate divs that don't — structurally separable, like real cards."""
    rows = []
    for i in range(n):
        html = (
            f'<html><body><div class="products grid">'
            f'<div class="product-item" data-product-id="{i}">'
            f"<h3>Fresh Item {i}</h3>"
            f'<span class="price">Rs. {100 + i}</span><a href="#">buy</a></div>'
            f'</div><div class="footer-links">about us contact careers</div>'
            f"</body></html>"
        )
        rows.append((f"https://x.example/p/{i}", html.encode()))
    return spark.createDataFrame(rows, "url string, html binary")


def test_candidates_and_rf_separate_products(spark):
    cands = candidate_features(_pages(spark, 60))
    # 3 divs per page: wrapper, product card, footer.
    assert cands.count() == 180
    assert cands.columns == ["url", "candidate_idx", "features"]

    # Label: the card is the div with a price-pattern flag AND product
    # parent context — exactly the H12 features the forest consumes.
    labeled = cands.withColumn(
        "label",
        ((F.col("features")[4] == 1.0) & (F.col("features")[14] == 1.0)).cast("double"),
    )
    assert labeled.where("label = 1.0").count() == 60

    train = labeled.where(F.crc32(F.col("url")) % 4 != 0)
    test = labeled.where(F.crc32(F.col("url")) % 4 == 0)
    model = train_fallback_model(train, num_trees=10)

    kept = predict_product_candidates(model, test.drop("label"))
    truth = {
        (r["url"], r["candidate_idx"])
        for r in test.where("label = 1.0").collect()
    }
    got = {(r["url"], r["candidate_idx"]) for r in kept.collect()}
    assert got == truth  # fully separable by construction


def _flat_pages(spark, n, cls="entry-box"):
    """Pages with NO rule-matching container class: one product-like div
    (price text, data-product-id) + one boilerplate div per page."""
    rows = []
    for i in range(n):
        html = (
            f'<html><body><div class="{cls}" data-product-id="{700 + i}">'
            f"<h3>Hidden Gem {i}</h3> Rs. {400 + i}</div>"
            f'<div class="info-links">about us contact careers</div>'
            f"</body></html>"
        )
        rows.append((f"https://x.example/f/{i}", html.encode()))
    return spark.createDataFrame(rows, "url string, html binary")


def test_fallback_trigger_recovers_rule_missed_products(spark):
    """The H11 cascade (html_fetcher.rs:235-266): a page whose containers
    match no rule selector still yields the planted product via the model
    path; rule-matching pages keep going through rules."""
    # Train: label = the H12 price-flag feature (separates card from
    # boilerplate on these pages by construction).
    train_pages = _flat_pages(spark, 40)
    labeled = candidate_features(train_pages).withColumn(
        "label", (F.col("features")[4] == 1.0).cast("double")
    )
    assert labeled.where("label = 1.0").count() == 40
    model = train_fallback_model(labeled, num_trees=10)

    # Mixed batch: 3 rule-miss pages + 2 rule-hit pages.
    miss = _flat_pages(spark, 3)
    hit_rows = [
        (
            f"https://x.example/r/{i}",
            (
                f'<html><body><div class="product-item" data-product-id="{i}">'
                f"<h3>Ruled Item {i}</h3>"
                f'<span class="price">Rs. {100 + i}</span></div></body></html>'
            ).encode(),
        )
        for i in range(2)
    ]
    hits = spark.createDataFrame(hit_rows, "url string, html binary")
    out = extract_products_with_fallback(miss.unionByName(hits), model).collect()

    by_method = {}
    for r in out:
        by_method.setdefault(r["method"], []).append(r)
    assert {r["name"] for r in by_method["rules"]} == {"Ruled Item 0", "Ruled Item 1"}
    ml_names = {r["name"] for r in by_method["ml"]}
    assert ml_names == {"Hidden Gem 0", "Hidden Gem 1", "Hidden Gem 2"}
    ml0 = next(r for r in by_method["ml"] if r["name"] == "Hidden Gem 0")
    assert ml0["cost_price"] == "400" and ml0["product_id"] == "700"
    assert ml0["source_type"] == "html_ml"

    # model=None degrades to rules-only (the reference ships it disabled).
    rules_only = extract_products_with_fallback(miss.unionByName(hits), None)
    assert {r["method"] for r in rules_only.collect()} == {"rules"}


def test_transform_survives_observation_manager_init(spark):
    """Order-dependence regression: LakeTable.merge (any observe-
    instrumented commit) initializes the session's lazy JVM
    ObservationManager, which is not java-Serializable. A fitted model
    whose trainingSummary still pins the SparkSession then fails EVERY
    transform with `Task not serializable`. train_fallback_model strips
    the summary, so scoring must work in such a session."""
    js = spark._jsparkSession
    try:
        # Force-init the lazy field exactly as an observed commit does
        # (private[sql] in Scala => public in bytecode, callable via py4j).
        js.observationManager()
    except Exception:
        from pyspark.sql import Observation

        obs = Observation()
        spark.range(2).observe(obs, F.count(F.lit(1)).alias("n")).count()
        obs.get
    fld = js.getClass().getDeclaredField("observationManager")
    fld.setAccessible(True)
    assert fld.get(js) is not None, "poisoning precondition not established"

    cands = candidate_features(_pages(spark, 8))
    labeled = cands.withColumn(
        "label",
        ((F.col("features")[4] == 1.0) & (F.col("features")[14] == 1.0)).cast("double"),
    )
    model = train_fallback_model(labeled, num_trees=5)
    assert not model.hasSummary  # the strip is what makes the next line safe
    assert predict_product_candidates(model, labeled.drop("label")).count() == 8


def _training_pages(spark, n):
    """Raw pages in the reference's training shape (naheed_store.rs:453-600):
    product cards matching the positive compound selector (with name+price),
    chrome sections matching the negative selectors. Wrapper classes and link
    presence vary so price/name content — not page position — is the only
    consistent separator the forest can learn."""
    wrappers = ["wrap", "grid cols", "list-area", "main-zone"]
    rows = []
    for i in range(n):
        link = '<a href="/buy">buy now</a>' if i % 2 else ""
        html = (
            f'<html><body><header class="site-head">Best deals on groceries '
            f"delivered fast every single day</header>"
            f'<nav class="menu">home shop categories offers account help</nav>'
            f'<div class="{wrappers[i % 4]}">'
            f'<div class="product-item" data-product-id="{i}">'
            f"<h3>Orchard Item {i}</h3>"
            f'<span class="price">Rs. {90 + i}</span>{link}</div>'
            f"</div>"
            f'<footer class="foot">About our store careers contact terms '
            f"privacy returns policy {i}</footer></body></html>"
        )
        rows.append((f"https://x.example/t/{i}", html.encode()))
    return spark.createDataFrame(rows, "url string, html binary")


def test_training_examples_match_reference_rules(spark):
    """generate_training_data semantics: one positive per product card
    (name+price captured), negatives capped at 2 per chrome selector with
    >10 chars of text, section column carries the provenance selector."""
    from data_pipeline_spark.operators.mlfallback import training_examples

    ex = training_examples(_training_pages(spark, 12))
    assert ex.columns == [
        "url", "example_idx", "label", "features", "name", "price", "section",
    ]
    pos = ex.where("label = 1.0").collect()
    assert len(pos) == 12
    assert {r["section"] for r in pos} == {"product-section"}
    assert {r["name"] for r in pos} == {f"Orchard Item {i}" for i in range(12)}
    assert all(r["price"].startswith("Rs. ") for r in pos)
    neg = ex.where("label = 0.0").collect()
    # 3 chrome elements per page; the nav matches TWO negative selectors
    # (tag `nav` and class `.menu`) and yields one example per selector,
    # exactly like the reference's per-selector loop. None repeated >2x
    # per selector.
    assert {r["section"] for r in neg} == {"header", "footer", "nav", ".menu"}
    per_page_sel = {}
    for r in neg:
        k = (r["url"], r["section"])
        per_page_sel[k] = per_page_sel.get(k, 0) + 1
    assert max(per_page_sel.values()) <= 2
    # Features are the 17-dim H12 vector (train == score distribution).
    assert all(len(r["features"]) == 17 for r in pos + neg)


def test_train_from_pages_end_to_end_fallback(spark):
    """The full reference pipeline (collect_training_data → train_ml_model →
    extract_with_ml, naheed_store.rs:514-690): a forest trained ONLY on
    generated examples recovers planted products from pages whose containers
    match no rule selector."""
    from data_pipeline_spark.operators.mlfallback import train_from_pages

    model = train_from_pages(_training_pages(spark, 48), num_trees=15)

    miss = _flat_pages(spark, 4)  # class "entry-box": rule selectors miss
    out = extract_products_with_fallback(miss, model).collect()
    assert {r["method"] for r in out} == {"ml"}
    assert {r["name"] for r in out} == {f"Hidden Gem {i}" for i in range(4)}
    assert all(r["source_type"] == "html_ml" for r in out)
