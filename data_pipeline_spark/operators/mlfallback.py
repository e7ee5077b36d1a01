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

    rf = RandomForestClassifier(
        featuresCol="_fv", labelCol="label", numTrees=num_trees, seed=seed
    )
    return rf.fit(_with_vector(labeled))


def predict_product_candidates(model, candidates: DataFrame) -> DataFrame:
    """Score candidates; keep predicted positives (the reference keeps
    candidates the forest classifies as products,
    html_fetcher.rs:307-340)."""
    scored = model.transform(_with_vector(candidates))
    return scored.where(F.col("prediction") == 1.0).drop("_fv", "rawPrediction", "probability")
