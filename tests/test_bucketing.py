"""Bucketed co-located joins (the 100 TB fact-to-fact strategy): tables
bucketed on the join key join WITHOUT a shuffle exchange on either side
— the physical plan must show SortMergeJoin over bucketed scans with no
Exchange, versus the plain-parquet twin which must shuffle both sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.sources.readers import (
    load_table,
)


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    (
        li.write.format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "li_b"))
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "ord_b"))
        .mode("overwrite")
        .saveAsTable("ord_bucketed")
    )
    yield wh
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    li = spark.table("li_bucketed")
    orders = spark.table("ord_bucketed")
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).groupBy("o_orderdate").agg(F.sum("l_extendedprice").alias("rev"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert joined.count() > 0  # run first: AQE finalizes the plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    join_part = plan.split("HashAggregate")[-1]  # below the agg: the join itself
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount" in plan  # bucketed scans engaged
    assert "Exchange hashpartitioning" not in join_part  # co-located: no shuffle


def test_unbucketed_twin_shuffles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "x", F.lit(1)
    )
    # disable broadcast so the comparison is honest
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange hashpartitioning" in plan


def test_salted_join_equivalent_and_distributed(spark, sf_dir):
    """Salting must preserve join semantics exactly; the hot key's rows
    must actually spread across salts."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.skew import (
        salted_join,
    )

    # skewed fact: 90% of events hit user 7
    events = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 10 < 9, F.lit(7)).otherwise(F.col("user_id")).alias("user_id"),
        "event_id",
        "value",
    )
    dim = load_table(spark, sf_dir, "events").select("user_id").distinct().withColumn(
        "grade", F.col("user_id") % 5
    )
    plain = events.join(dim, "user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("s"), F.sum("grade").alias("g")
    ).first()
    salted = salted_join(events, dim, "user_id", n_salts=8).agg(
        F.count("*").alias("n"), F.sum("value").alias("s"), F.sum("grade").alias("g")
    ).first()
    assert (plain.n, plain.s, plain.g) == (salted.n, salted.s, salted.g)

    # the hot key's rows really do land on multiple salts
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.skew import (
        salted_join as _sj,  # reuse internals via a raw run
    )
    big = events.withColumn("__salt", (F.rand(42) * 8).cast("int"))
    n_salts_hit = big.filter(F.col("user_id") == 7).select("__salt").distinct().count()
    assert n_salts_hit >= 4
