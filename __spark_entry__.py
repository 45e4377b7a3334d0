"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in
``hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark/plans/queries.py``
— one entry per SURVEY.md §2 operator, each with a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
    REGISTRY,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "a06_weighted_zscore"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the composite weighted Z-score risk signal (SURVEY
    §2.4 A6 + §2.3 J1/J2): fact scan → broadcast stats dims → weighted
    z — the heart of the reference's risk engine.
    """
    return REGISTRY[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    out = {}
    for name, spec in REGISTRY.items():
        sql = spec.oracle_text()
        if sql is not None:
            out[name] = sql
    return out
