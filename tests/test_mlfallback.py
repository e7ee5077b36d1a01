"""H11 ML-fallback: candidate explosion, distributed RF training, scoring.

The reference ships this disabled; the test proves the Spark machinery is
real — features from the H12 UDF, pyspark.ml fit/transform, and that a
forest trained on separable synthetic candidates actually separates them.
"""

import pyspark.sql.functions as F

from data_pipeline_spark.operators.mlfallback import (
    candidate_features,
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
