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
from .export import to_es_documents
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
) -> int:
    """One poll→score→ingest→cleanup cycle. Returns rows written.

    Corrupt landing lines are quarantined (dropped from scoring but
    counted) rather than failing the batch — the ES dynamic-template
    open-world behavior.
    """
    raw = read_listings_ndjson(spark, landing_dir, schema=LISTING_SCHEMA)
    listings = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    scored = score_listings(
        listings, prime_stats, comp_stats, users=users, reviews=reviews
    )
    docs = to_es_documents(scored).withColumn(
        "ingest_date", F.date_format(F.current_date(), "yyyy-MM-dd")
    )
    n = docs.count()
    write_partitioned(docs, out_path)
    drop_expired(out_path, retain_days=retain_days, today=today)
    return n
