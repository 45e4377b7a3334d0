"""The production micro-batch orchestrator (SURVEY §2.1 S9 / §3.1).

Reference ``run_pipeline.sh:64-100``: cron → poll → verify file →
ingest → cleanup. Engine-side that is one batch function: read the
NDJSON landing zone → score through the composed risk engine → package
into the ES document shape → append to the date-partitioned lake →
drop expired partitions. Each run is idempotent per landing file set;
scheduling stays external (cron / Airflow / Trigger.AvailableNow via
streaming/alerts.py for the alert leg).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import read_listings_ndjson, write_partitioned
from .export import bulk_deliver, split_for_bulk, to_es_documents
from .retention import drop_expired
from .risk import score_listings

#: Landing-zone listing schema (poller NDJSON, poller.py:729-754).
LISTING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("api_condition", T.StringType()),
        T.StructField("is_refurbished", T.BooleanType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def run_ingest_batch(
    spark: SparkSession,
    landing_dir: str,
    prime_stats: DataFrame,
    comp_stats: DataFrame,
    out_path: str,
    users: DataFrame | None = None,
    reviews: DataFrame | None = None,
    retain_days: int = 30,
    today: dt.date | None = None,
    rejects_path: str | None = None,
    post=None,
) -> int:
    """One poll→score→ingest→cleanup cycle. Returns valid rows written.

    Three tolerance layers, mirroring the reference's never-fail-the-batch
    posture (``bulk_ingest.py:50-108``): corrupt landing LINES are
    quarantined at read (dropped from scoring, not fatal); documents
    the index mapping would reject per-doc (``split_for_bulk``) are routed
    to ``rejects_path`` (dead-letter parquet with ``reject_reasons``) when
    given, silently dropped otherwise; and when ``post`` is given the
    clean docs are ALSO bulk-delivered through it (``bulk_deliver``) with
    sink-side per-item failures appended to ``rejects_path`` as
    ``(doc_id, status)`` under ``<rejects_path>_sink`` — either way the
    batch completes.
    """
    raw = read_listings_ndjson(spark, landing_dir, schema=LISTING_SCHEMA)
    listings = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    scored = score_listings(
        listings, prime_stats, comp_stats, users=users, reviews=reviews
    )
    docs = to_es_documents(scored).withColumn(
        "ingest_date", F.date_format(F.current_date(), "yyyy-MM-dd")
    )
    # count + lake write + reject write all re-read the scored docs —
    # persist so the (expensive) extraction/scoring plan runs once
    docs = docs.persist()
    try:
        valid, rejects = split_for_bulk(docs)
        n = valid.count()
        write_partitioned(valid, out_path)
        if rejects_path is not None:
            rejects.write.mode("append").parquet(rejects_path)
        if post is not None:
            outcomes = bulk_deliver(valid.drop("ingest_date"), post)
            failed = outcomes.filter(F.col("status") != "acked")
            if rejects_path is not None:
                failed.write.mode("append").parquet(rejects_path + "_sink")
            else:
                failed.count()  # still drive the delivery to completion
    finally:
        docs.unpersist()
    drop_expired(out_path, retain_days=retain_days, today=today)
    return n
