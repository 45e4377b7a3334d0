"""Spark ML layer: fraud-classifier feature engineering + training on
top of the risk engine's output (BASELINE.json approach: "Spark ML +
DataFrame ETL").

The reference stops at a hand-tuned additive score
(``poller/poller.py:459-495``); this module turns the same signals into
a trainable model: the scored DataFrame (operators/risk.py) becomes a
feature vector, a ``Pipeline`` (VectorAssembler → StandardScaler →
LogisticRegression) learns weights, and inference is a single
``transform`` — distributed end-to-end, no collect.

Scale: VectorAssembler/LogisticRegression run as map-side vector ops +
L-BFGS with tree-aggregated gradients (Spark ML's native path); feature
extraction reuses the already-computed risk columns so no extra pass
over the corpus is needed.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Numeric signals derived from the risk engine's output columns.
FEATURE_COLS = [
    "f_z",
    "f_price",
    "f_n_factors",
    "f_enriched",
    "f_fallback",
    "f_corrected",
    "f_desc_len",
]


def assemble_features(scored: DataFrame) -> DataFrame:
    """Project the score_listings output into model features —
    null-safe casts only, stays inside codegen."""
    return scored.select(
        "*",
        F.coalesce(F.col("composite_z"), F.lit(0.0)).alias("f_z"),
        F.coalesce(F.col("price"), F.lit(0.0)).alias("f_price"),
        F.size(F.coalesce(F.col("risk_factors"), F.array())).cast("double").alias("f_n_factors"),
        F.coalesce(F.col("enriched").cast("double"), F.lit(0.0)).alias("f_enriched"),
        F.coalesce(F.col("fallback_used").cast("double"), F.lit(0.0)).alias("f_fallback"),
        F.coalesce(F.col("price_corrected").cast("double"), F.lit(0.0)).alias("f_corrected"),
        F.length(F.coalesce(F.col("description"), F.lit(""))).cast("double").alias("f_desc_len"),
    )


def fraud_pipeline(max_iter: int = 50, reg_param: float = 0.01) -> Pipeline:
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="raw_features")
    scaler = StandardScaler(inputCol="raw_features", outputCol="features")
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[assembler, scaler, lr])


def train_fraud_model(scored_labeled: DataFrame, **kwargs) -> PipelineModel:
    """Fit on a scored DataFrame carrying a binary ``label`` column
    (e.g. confirmed-scam reports)."""
    return fraud_pipeline(**kwargs).fit(assemble_features(scored_labeled))


def predict_fraud(model: PipelineModel, scored: DataFrame) -> DataFrame:
    """Score new listings; returns the input plus probability/prediction."""
    return model.transform(assemble_features(scored))
