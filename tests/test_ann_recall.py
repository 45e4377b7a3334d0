"""ANN quality gates: the approximate paths (hyperplane LSH, IVF) must
recover a meaningful fraction of the exact brute-force top-k — the
correctness criterion an oracle can't express for seeded KMeans."""

from __future__ import annotations

import pytest

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
    REGISTRY,
)


def _topk(spark, sf_dir, name):
    out = {}
    for r in REGISTRY[name].fn(spark, sf_dir).collect():
        out.setdefault(r.q_id, set()).add(r.vec_id)
    return out


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    return _topk(spark, sf_dir, "nn01_cosine_topk")


@pytest.mark.parametrize("name,min_recall", [("nn03_ivf_ann", 0.5)])
def test_ann_recall_vs_bruteforce(spark, sf_dir, exact, name, min_recall):
    approx = _topk(spark, sf_dir, name)
    hits = total = 0
    for q, truth in exact.items():
        total += len(truth)
        hits += len(truth & approx.get(q, set()))
    assert total > 0
    recall = hits / total
    assert recall >= min_recall, f"{name} recall@k={recall:.2f} < {min_recall}"
