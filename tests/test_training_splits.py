"""Semantic invariants for the split / epoch-shuffle / decontamination
operators — properties the value-hash oracle can't state directly:
leakage safety across duplicate texts, dense permutation ranks that
re-key per epoch, and exact set algebra between ct01's scan and ct02's
surviving train split.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
    ct01_benchmark_contamination,
    ct02_decontaminated_train,
    ds03_leakage_safe_split,
    ds04_training_order,
    _EVAL_SOURCE,
)


def test_ds03_duplicate_texts_never_straddle_splits(spark, sf_dir, tmp_path):
    # plant byte-identical duplicate texts under fresh doc_ids: the split
    # keys on normalized text, so every copy MUST land in the same split
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup = docs.limit(50).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    docs.unionByName(dup).write.parquet(str(tmp_path / "documents.parquet"))
    split = ds03_leakage_safe_split(spark, str(tmp_path))
    corpus = spark.read.parquet(str(tmp_path / "documents.parquet"))
    joined = corpus.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("k")).join(
        split, "doc_id"
    )
    per_text = joined.groupBy("k").agg(
        F.countDistinct("split").alias("n_splits"), F.count("*").alias("n")
    )
    assert per_text.filter(F.col("n") > 1).count() >= 50  # dups exercised
    assert per_text.filter(F.col("n_splits") > 1).count() == 0
    # all three splits are populated and roughly sized 90/5/5
    sizes = {r["split"]: r["count"] for r in split.groupBy("split").count().collect()}
    assert set(sizes) == {"train", "val", "test"}
    assert sizes["train"] > sizes["val"] and sizes["train"] > sizes["test"]


def test_ds04_epoch_reshuffle_is_a_fresh_permutation(spark, sf_dir):
    e0 = ds04_training_order(spark, sf_dir, epoch=0)
    e1 = ds04_training_order(spark, sf_dir, epoch=1)
    n = e0.count()
    # dense 1..n ranks, no gaps or dups, both epochs
    for df in (e0, e1):
        stats = df.agg(
            F.count("*").alias("c"),
            F.countDistinct("shuffle_rank").alias("d"),
            F.min("shuffle_rank").alias("lo"),
            F.max("shuffle_rank").alias("hi"),
        ).first()
        assert (stats.c, stats.d, stats.lo, stats.hi) == (n, n, 1, n)
    # same document set, materially different order
    moved = (
        e0.select("doc_id", F.col("shuffle_rank").alias("r0"))
        .join(e1.select("doc_id", F.col("shuffle_rank").alias("r1")), "doc_id")
    )
    assert moved.count() == n
    assert moved.filter(F.col("r0") != F.col("r1")).count() > n // 2


def test_ct02_set_algebra_against_ct01(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train_ids = {
        r.doc_id
        for r in docs.filter(F.col("source") != _EVAL_SOURCE)
        .select("doc_id")
        .collect()
    }
    bad_ids = {r.doc_id for r in ct01_benchmark_contamination(spark, sf_dir).collect()}
    kept = {r.doc_id for r in ct02_decontaminated_train(spark, sf_dir).collect()}
    assert bad_ids, "contamination scan found nothing — the test is vacuous"
    assert kept == train_ids - bad_ids
