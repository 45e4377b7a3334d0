"""Streaming corpus-ingest curation — the training-data twin of the
alert engine's ST surface.

Documents land as NDJSON (the same landing-zone pattern the batch
poller writes, ``poller/poller.py:729-754``); each micro-batch computes
the scan-projection curation columns — content fingerprint, Gopher rule
verdict, token count — drops rejects, and drops byte-identical
re-ingests with ``dropDuplicatesWithinWatermark`` on the content
fingerprint. This is cp01's front half (dedup + quality) running
continuously instead of as a batch pass.

Scale: the only state is the fingerprint-dedupe map, bounded by the
watermark horizon and partitioned by fingerprint — no global state, so
the job scales linearly with executors. The dedupe key is the same
``md5(lower(trim(text)))`` cp01/dd01 use, so batch backfills and the
stream can never disagree about what counts as a duplicate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Landing-zone document schema: the driver `documents` columns plus the
#: ingest event time the watermark rides on.
DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)

#: How long a fingerprint stays deduplicable — bounds the state store.
DEDUPE_HORIZON = "1 hour"


def read_document_stream(
    spark: SparkSession, landing_dir: str, schema: T.StructType = DOC_STREAM_SCHEMA
) -> DataFrame:
    return spark.readStream.schema(schema).json(landing_dir)


def curated_stream(stream: DataFrame, horizon: str = DEDUPE_HORIZON) -> DataFrame:
    """Quality-filter + watermark-bounded exact dedupe.

    Every derived column is computed in the stateless projection (same
    discipline as cp01: text never enters the stateful operator — only
    the 32-hex fingerprint does, keeping per-key state tiny)."""
    from functools import reduce

    from ..functions.textstats import tokens

    # lazy import: the rule battery lives with its oracle twin in the
    # batch registry; importing it here keeps ONE source of truth for
    # the thresholds without making the registry import streaming
    from ..plans.training_queries import _gopher_rule_cols

    text = F.col("text")
    keep = reduce(lambda a, b: a & b, _gopher_rule_cols(text).values())
    fp = F.md5(F.lower(F.trim(text)))
    curated = (
        stream.withWatermark("ingest_ts", horizon)
        .select(
            "doc_id",
            "lang",
            "source",
            "ingest_ts",
            fp.alias("fp"),
            # the shared tokenizer, so stream and batch (cp01/ds02)
            # can never disagree on token accounting
            F.size(tokens(text)).alias("n_tok"),
            keep.alias("keep"),
        )
        .filter(F.col("keep"))
        .drop("keep")
    )
    return curated.dropDuplicatesWithinWatermark(["fp"])


def start_ingest_query(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    available_now: bool = True,
    horizon: str = DEDUPE_HORIZON,
):
    """Run the curation stream into a foreachBatch sink. AvailableNow
    gives the cron-style micro-batch (drain the landing zone, keep the
    checkpointed dedupe state, stop); exactly-once re-runs come from
    checkpointLocation, same as the alert engine (ST7)."""
    stream = read_document_stream(spark, landing_dir)
    writer = (
        curated_stream(stream, horizon)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
