"""Sources & sinks (SURVEY §2.1, S1–S9).

The reference's ingest surface is paginated HTTP + NDJSON files + an ES
bulk sink. Engine-side that maps to:

- S1/S5/S6: ``spark.read.json`` (line-delimited or multiLine) with an
  explicit schema — schema-on-read with a permissive rescue path, like
  the ES dynamic template (reference ``ingestion/index_template.json:12-22``).
- S3/S7/S8: partitioned Parquet writes with an ingest-date partition
  column; retention = partition predicate delete (see ``retention.py``).
- S4/S9: Structured Streaming checkpoints / ``Trigger.AvailableNow``
  (see ``streaming/alerts.py``).

The driver's testdata is plain Parquet; ``load_table`` is the scan used
by every registered query. Filters/projections written against these
DataFrames reach the Parquet reader (PushedFilters / ReadSchema) — at
100 TB the date-partitioned layout plus pushdown is what keeps panel
queries from full scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver-provided Parquet table (TESTDATA.md).

    ``events.parquet``'s ``ts`` column has shipped in two physical forms
    across driver testdata generations: TIMESTAMP(NANOS) (which Spark's
    Parquet reader rejects outright) and plain TIMESTAMP(MICROS) NTZ.
    Adapt by inspecting the read schema: a micros file needs nothing; a
    nanos file is re-read as long nanos (legacy conf) and floor-divided
    to microseconds — exact integer math, matching DuckDB's nanos→µs
    truncation so oracle comparisons agree either way.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as _T

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if not isinstance(df.schema["ts"].dataType, _T.LongType):
            return df  # already TIMESTAMP — nothing to normalize
        # Nanos → NTZ micros via pure interval arithmetic: independent of
        # the session timezone (an LTZ→NTZ cast would shift under a
        # non-UTC driver session). Seconds and sub-second micros are
        # carried separately so every value stays exact in double space.
        return df.withColumn(
            "ts",
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
                " + make_dt_interval(0, 0, 0, CAST(ts DIV 1000000000 AS DOUBLE))"
                " + make_dt_interval(0, 0, 0, CAST((ts DIV 1000) % 1000000 AS DOUBLE) / 1e6)"
            ),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def read_listings_ndjson(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S1/S3 engine-side: read the poller's NDJSON landing files.

    Mirrors reference ``poller/poller.py:729-754`` (one JSON object per
    line, daily files). PERMISSIVE mode + ``_corrupt_record`` rescue
    column reproduces the ES dynamic-template open-world behavior.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_corpus_json_array(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S5: the analyst poller's JSON-array corpus file
    (reference ``poller/regex_analyzer.py:893-894``)."""
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so the full engine
    surface is reachable through ``spark.sql`` — the reference's 'query
    language' is an API, but Spark users get ANSI SQL for free."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(df: DataFrame, path: str, partition_col: str = "ingest_date") -> None:
    """S3/S7/S8: append-mode date-partitioned Parquet sink.

    Replaces the NDJSON sink + ES bulk indexer + ILM rollover
    (reference ``ingestion/bulk_ingest.py:50-108``,
    ``ingestion/ilm_policy.json:1-20``): partition-by-date gives
    rollover, and retention is a partition drop (retention.py).
    """
    df.write.mode("append").partitionBy(partition_col).parquet(path)
