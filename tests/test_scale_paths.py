"""Accuracy gates for the approximate scale-path operators: sketches
must land within tolerance of their exact twins on the driver corpus."""

from __future__ import annotations

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
    REGISTRY,
)


def test_approx_median_within_tolerance(spark, sf_dir):
    exact = {
        (r.l_returnflag, r.l_linestatus): r.median_price
        for r in REGISTRY["a01_grouped_price_stats"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.l_returnflag, r.l_linestatus): r.approx_median_price
        for r in REGISTRY["a01b_approx_stats_scale_path"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, m in exact.items():
        assert abs(approx[k] - m) / m <= 0.01, (k, approx[k], m)
