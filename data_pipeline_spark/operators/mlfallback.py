"""H11: ML fallback extraction — RandomForest over DOM structural features.

The reference ships this path *disabled* (`ml_model: None`,
/root/reference/src/fetcher/html_fetcher.rs:77; `enabled = false`,
/root/reference/src/configs/naheed.toml:177): when rule-based selectors find
zero products, candidate elements (every div/article/li/section) are scored
by a RandomForest over 17 structural features
(/root/reference/src/fetcher/html_fetcher.rs:235-266,601-681,725-788;
training loop in the legacy /root/reference/src/naheed_store.rs:602-658).

Spark-first mapping: candidates come from the vectorized H12 feature UDF
(:func:`data_pipeline_spark.functions.extract.dom_features_udf`), training
and scoring are `pyspark.ml` (distributed fit, codegen'd transform) — no
driver-side loops, model broadcast to executors by Spark ML itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.extract import dom_features_udf


def candidate_features(df: DataFrame, html_col: str = "html", id_cols=("url",)) -> DataFrame:
    """Explode each page into (id, candidate_idx, features) rows.

    ``features`` is `array<float>` (H12's 17 dims) — one row per candidate
    element, ready for labeling or scoring.
    """
    feats = dom_features_udf()
    exploded = df.select(
        *id_cols, F.posexplode(feats(F.col(html_col))).alias("candidate_idx", "features")
    )
    return exploded


def _with_vector(df: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("_fv", array_to_vector(F.col("features").cast("array<double>")))


def train_fallback_model(labeled: DataFrame, num_trees: int = 20, seed: int = 42):
    """Fit the RandomForest on (features: array<float>, label: double) rows.

    Distributed equivalent of the reference's offline training loop
    (naheed_store.rs:602-658). Returns a RandomForestClassificationModel.
    """
    from pyspark.ml.classification import RandomForestClassifier

    from .mlutil import strip_training_summary

    rf = RandomForestClassifier(
        featuresCol="_fv", labelCol="label", numTrees=num_trees, seed=seed
    )
    # Summary stripped so transform task closures never serialize the
    # SparkSession the summary pins (see mlutil docstring).
    return strip_training_summary(rf.fit(_with_vector(labeled)))


def predict_product_candidates(model, candidates: DataFrame) -> DataFrame:
    """Score candidates; keep predicted positives (the reference keeps
    candidates the forest classifies as products,
    html_fetcher.rs:307-340)."""
    scored = model.transform(_with_vector(candidates))
    return scored.where(F.col("prediction") == 1.0).drop("_fv", "rawPrediction", "probability")


def extract_products_with_fallback(
    pages: DataFrame,
    model=None,
    html_col: str = "html",
    id_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """H11 trigger wiring — the reference's primary/secondary cascade
    (``extract_products_from_html``, html_fetcher.rs:235-266) as one
    declarative plan:

    - pages where rule extraction finds ≥1 product emit those records
      (``method='rules'``);
    - pages where rules find ZERO products fan out into ML candidates,
      the forest scores them, and predicted-positive candidates become
      records via the same per-element cascade (``candidate_to_product``,
      html_fetcher.rs:666-680) — joined back by (page id, candidate_idx),
      ``method='ml'``;
    - ``model=None`` (the reference ships it disabled) degrades to
      rules-only, like the reference's ``if let Some(ml_model)``.

    Scale shape: the rule UDF runs once over all pages; the two ML UDF
    passes (features + candidate records) run only over the rule-miss
    subset; the positives⋈records join is an equi-join on
    (id, candidate_idx) — per-page work, no cross-page shuffle skew.
    """
    from ..functions.extract import candidate_records_udf, extract_products_udf

    xp = extract_products_udf()
    with_rules = pages.withColumn("_prods", xp(F.col(html_col)))
    rule_hits = (
        with_rules.where(F.size("_prods") > 0)
        .select(*id_cols, F.explode("_prods").alias("_pr"))
        .select(*id_cols, F.lit("rules").alias("method"), F.col("_pr.*"))
    )
    if model is None:
        return rule_hits
    misses = with_rules.where(F.size("_prods") == 0).drop("_prods")
    feats = candidate_features(misses, html_col=html_col, id_cols=id_cols)
    positives = predict_product_candidates(model, feats).select(
        *id_cols, "candidate_idx"
    )
    cr = candidate_records_udf()
    recs = (
        misses.select(
            *id_cols,
            F.posexplode(cr(F.col(html_col))).alias("candidate_idx", "_rec"),
        )
        .where(F.col("_rec").isNotNull())
    )
    ml_hits = positives.join(recs, on=[*id_cols, "candidate_idx"]).select(
        *id_cols, F.lit("ml").alias("method"), F.col("_rec.*")
    )
    return rule_hits.unionByName(ml_hits)


def training_examples(
    df: DataFrame, html_col: str = "html", id_cols=("url",)
) -> DataFrame:
    """Generate labeled training examples from raw pages — the reference's
    ``generate_training_data`` loop (naheed_store.rs:453-600) as one
    vectorized pass: positives from product-looking containers whose
    name/price cascade fires, negatives from site chrome (≤2 per selector
    per page). Returns (id, example_idx, label, features, name, price,
    section) rows ready for :func:`train_fallback_model`.
    """
    from ..functions.extract import training_examples_udf

    te = training_examples_udf()
    return df.select(
        *id_cols, F.posexplode(te(F.col(html_col))).alias("example_idx", "_ex")
    ).select(*id_cols, "example_idx", F.col("_ex.*"))


def train_from_pages(
    df: DataFrame,
    html_col: str = "html",
    id_cols=("url",),
    num_trees: int = 20,
    seed: int = 42,
):
    """End-to-end: pages → labeled examples → fitted fallback forest — the
    reference's ``collect_training_data`` + ``train_ml_model`` pipeline
    (naheed_store.rs:514-623) minus the fetch (the pages DataFrame is the
    tail's output here). Distributed: example generation is one Arrow pass,
    the fit is pyspark.ml."""
    labeled = training_examples(df, html_col=html_col, id_cols=id_cols)
    return train_fallback_model(
        labeled.select("features", "label"), num_trees=num_trees, seed=seed
    )
