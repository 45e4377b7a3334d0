"""Stored BM25 index artifact (ix03) — physical layout + fidelity.

The oracle gate already hash-verifies the read-back CONTENT summary
(ix03_index_artifact) and the serving results (ix02/rk01). These tests
pin what the oracle can't see: the on-disk layout the write-leg
promised (partitioned by term bucket, one file per bucket), exact
row-level round-trip fidelity against the index definition, and the
once-per-session memoization that makes store-and-serve cheaper than
rebuild-per-query.
"""

from __future__ import annotations

import glob
import os

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
    _IX03_STORE,
    _ix01_index,
    _ix03_artifact_path,
    _ix03_read_index,
)


def test_artifact_layout_one_file_per_bucket(spark, sf_dir):
    path = _ix03_artifact_path(spark, sf_dir)
    part_dirs = sorted(
        d for d in glob.glob(os.path.join(path, "pk=*")) if os.path.isdir(d)
    )
    assert part_dirs, path
    for d in part_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)  # repartition(pk) → no small files


def test_artifact_roundtrip_is_rowwise_exact(spark, sf_dir):
    """Every posting and every weight bit survives write→read: the
    stored artifact equals the index definition row-for-row (sorted on
    the (term, rank) key; w_bm25 compared by exact double bits)."""
    built = _ix01_index(spark, sf_dir).toPandas()
    stored = _ix03_read_index(spark, sf_dir).toPandas()
    key = ["term", "rank"]
    built = built.sort_values(key).reset_index(drop=True)
    stored = stored[built.columns].sort_values(key).reset_index(drop=True)
    assert built.equals(stored)


def test_artifact_is_memoized_per_session_and_corpus(spark, sf_dir):
    p1 = _ix03_artifact_path(spark, sf_dir)
    p2 = _ix03_artifact_path(spark, sf_dir)
    assert p1 == p2
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    assert _IX03_STORE[key] == p1
    mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(p1, "pk=*", "*.parquet"))
    }
    _ix03_read_index(spark, sf_dir).count()  # serving never rewrites
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f
