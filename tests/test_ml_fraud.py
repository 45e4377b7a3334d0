"""Spark ML fraud classifier: features from risk-engine output columns,
train/predict round-trip, sane separation on synthetic labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.ml import (
    FEATURE_COLS,
    assemble_features,
    predict_fraud,
    train_fraud_model,
)


@pytest.fixture(scope="module")
def scored_synthetic(spark):
    # risk-engine-shaped rows: fraudulent rows have very negative z,
    # corrected prices and more factors; legit rows look benign
    rows = []
    for i in range(200):
        fraud = i % 2 == 0
        z = -3.0 - (i % 5) * 0.1 if fraud else 0.5 + (i % 5) * 0.1
        rows.append(
            (
                str(i),
                "desc " * (3 if fraud else 30),
                200.0 + i,
                z,
                ["Statistically Cheap", "External Contact"] if fraud else [],
                fraud,
                fraud,
                i % 3 == 0,
                1 if fraud else 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "id string, description string, price double, composite_z double, "
        "risk_factors array<string>, enriched boolean, price_corrected boolean, "
        "fallback_used boolean, label int",
    )


def test_feature_assembly(scored_synthetic):
    feats = assemble_features(scored_synthetic)
    row = feats.filter(F.col("id") == "0").first()
    assert row.f_z == -3.0
    assert row.f_n_factors == 2.0
    assert row.f_enriched == 1.0 and row.f_corrected == 1.0
    assert set(FEATURE_COLS) <= set(feats.columns)


def test_train_predict_separates(scored_synthetic):
    model = train_fraud_model(scored_synthetic)
    preds = predict_fraud(model, scored_synthetic)
    acc = preds.filter(
        F.col("prediction") == F.col("label").cast("double")
    ).count() / preds.count()
    assert acc >= 0.95  # cleanly separable synthetic data
    assert {"probability", "prediction"} <= set(preds.columns)
