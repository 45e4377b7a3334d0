"""Enriched-document export (SURVEY §7 phase C closing contract).

The reference's output schema is the ES mapping
(``ingestion/index_template.json:23-82``): nested listing docs with a
``price`` struct, a ``geo_point``-bearing ``location``, a
``timestamps.crawl_timestamp``, and the ``enrichment`` tree
(risk_score, risk_factors, market_analysis with specs_detected). This
module packages the flat ``score_listings`` output back into that
document shape so a reference consumer (bulk indexer, dashboard) can
switch engines without schema changes.

Scale: pure projection — no shuffle; written through
``sources.readers.write_partitioned`` it lands date-partitioned, which
replaces the ILM rollover (S8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _opt(df: DataFrame, name: str, typ: str):
    return F.col(name) if name in df.columns else F.lit(None).cast(typ)


def to_es_documents(scored: DataFrame, currency: str = "EUR") -> DataFrame:
    """score_listings output → index_template.json document shape."""
    geo = F.when(
        _opt(scored, "latitude", "double").isNotNull()
        & _opt(scored, "longitude", "double").isNotNull(),
        F.struct(
            _opt(scored, "latitude", "double").alias("lat"),
            _opt(scored, "longitude", "double").alias("lon"),
        ),
    )
    market_analysis = F.struct(
        F.col("category").alias("detected_category"),
        F.col("condition").alias("detected_condition"),
        F.struct(
            F.col("cpu").alias("cpu"),
            F.col("ram").cast("string").alias("ram"),
            F.col("gpu").alias("gpu"),
        ).alias("specs_detected"),
        F.col("composite_z").alias("composite_z_score"),
        F.col("estimated_value").alias("estimated_market_value"),
        F.col("fallback_used").alias("fallback_used"),
    )
    return scored.select(
        F.col("id"),
        F.col("title"),
        F.col("description"),
        F.struct(
            F.col("price").alias("amount"), F.lit(currency).alias("currency")
        ).alias("price"),
        F.col("user_id").cast("string").alias("user_id"),
        _opt(scored, "web_slug", "string").alias("web_slug"),
        _opt(scored, "created_at", "timestamp").alias("created_at"),
        _opt(scored, "modified_at", "timestamp").alias("modified_at"),
        F.struct(
            geo.alias("geo"),
            _opt(scored, "latitude", "double").alias("latitude"),
            _opt(scored, "longitude", "double").alias("longitude"),
            _opt(scored, "city", "string").alias("city"),
            _opt(scored, "postal_code", "string").alias("postal_code"),
            _opt(scored, "country_code", "string").alias("country_code"),
        ).alias("location"),
        F.struct(F.current_timestamp().alias("crawl_timestamp")).alias("timestamps"),
        F.struct(
            F.col("risk_score").cast("int").alias("risk_score"),
            F.col("risk_factors").alias("risk_factors"),
            market_analysis.alias("market_analysis"),
        ).alias("enrichment"),
    )
