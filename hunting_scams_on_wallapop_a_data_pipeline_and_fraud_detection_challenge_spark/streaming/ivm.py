"""Streaming incremental view maintenance (ST14) — the unbounded twin
of the batch ``ivm02_retraction_merge`` recipe: a keyed stats view
(user → exact integer moments n, Σc, Σc²) is MAINTAINED, never
rebuilt, by folding each micro-batch's SIGNED delta partials into the
stored view — the cdc02-shaped change feed (insert / delete; an update
travels as one retraction plus one insertion, the ivm02 rule) absorbed
continuously.

The view lives in the shared crash-safe versioned state store
(streaming/state.py — ST9's ``v=<n>`` + ``_SUCCESS`` commit protocol):
each batch reads the newest committed view, merges by plain addition
(the Chan-identity merge, closed under subtraction because the
partials are EXACT integers — the ivm02 argument), drops keys whose
count reaches zero, and commits the next version. A crash mid-commit
leaves the previous view intact. Because ``foreachBatch`` is
at-least-once (a crash BETWEEN the state commit and the streaming
commit-log write replays the batch) and a signed sum — unlike ST9's
idempotent ``bit_or`` — would double-fold a replayed delta, every
committed version carries the id of the last batch folded into it
(``applied_bid``, on every row plus a NULL-key sentinel row so it
survives an empty view): ``merge_batch`` no-ops on any batch id at or
below the stored one, making the fold idempotent under replay.

Parity (pinned in tests/test_streaming_ivm.py): after any sequence of
batches, the view equals a DIRECT recompute over the logical current
table — merge-equals-recompute under deletes, the ivm02 proof, held
continuously.

Scale shape (100 TB/day ingest): per batch ONE map-side-combinable
signed aggregate over the delta (delta-sized, never history-sized) +
one keyed merge against the view; the view is key-partitioned parquet
(here one file — production buckets it by key so the merge join is
co-located); no history scan ever happens after the first load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .state import read_latest_state, write_next_state

#: change-feed landing schema: op is 'I' (insert) or 'D' (delete);
#: an UPDATE is a ('D', old value) + ('I', new value) row pair
CHANGE_SCHEMA = "user_id long, event_id long, op string, value double"

#: the stored view: exact integer moments per key, plus the replay
#: fence (the id of the last batch folded in — constant per version;
#: a NULL-key sentinel row keeps it present even when the view itself
#: is empty)
VIEW_SCHEMA = (
    "user_id BIGINT, n BIGINT, s BIGINT, s2 BIGINT, applied_bid BIGINT"
)


def read_change_feed(spark: SparkSession, landing_dir: str) -> DataFrame:
    """NDJSON change-feed landing files as an unbounded file-source
    stream (the scd/joins landing pattern)."""
    return spark.readStream.schema(CHANGE_SCHEMA).json(landing_dir)


def signed_partials(df: DataFrame) -> DataFrame:
    """Per-user signed delta partials (Σsg, Σsg·c, Σsg·c²) over a
    change-feed batch — the ivm02 signed algebra on the ivm01 cents
    rule (ONE source of truth: `_IVM01_CENTS` is lazily imported from
    the batch twin, like ST10 shares `_dd16_canon`)."""
    from ..plans.training_queries import _IVM01_CENTS

    sg = F.when(F.col("op") == "D", F.lit(-1)).otherwise(F.lit(1))
    return (
        df.select(
            "user_id",
            sg.alias("sg"),
            F.expr(_IVM01_CENTS).cast("bigint").alias("c"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("sg").cast("bigint").alias("n"),
            F.sum(F.col("sg") * F.col("c")).cast("bigint").alias("s"),
            F.sum(F.col("sg") * F.col("c") * F.col("c"))
            .cast("bigint")
            .alias("s2"),
        )
    )


def merge_batch(batch_df: DataFrame, batch_id: int, state_dir: str) -> None:
    """Fold one micro-batch into the stored view: read the newest
    committed view, NO-OP if ``batch_id`` was already folded (the
    replay fence — foreachBatch is at-least-once), otherwise add the
    batch's signed partials (union + keyed sum — the plan shape
    ivm01/ivm02 pin), drop zero-count keys, and commit the next
    version crash-safely with the fence advanced."""
    spark = batch_df.sparkSession
    state = read_latest_state(spark, state_dir, VIEW_SCHEMA)
    applied = state.agg(F.max("applied_bid")).collect()[0][0]
    if applied is not None and batch_id <= applied:
        return  # replayed batch: already folded into a committed view
    view = state.filter(F.col("user_id").isNotNull()).select(
        "user_id", "n", "s", "s2"
    )
    merged = (
        view.unionByName(signed_partials(batch_df))
        .groupBy("user_id")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s").cast("bigint").alias("s"),
            F.sum(F.col("s2")).cast("bigint").alias("s2"),
        )
        # a key whose rows were all retracted leaves the view — the
        # view holds live keys only
        .filter(F.col("n") != 0)
    )
    sentinel = spark.createDataFrame(
        [(None, 0, 0, 0, batch_id)], VIEW_SCHEMA
    )
    write_next_state(
        spark,
        merged.withColumn(
            "applied_bid", F.lit(batch_id).cast("bigint")
        ).unionByName(sentinel),
        state_dir,
    )


def start_view_maintenance(
    spark: SparkSession, landing_dir: str, state_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Maintain the view over everything currently in the landing dir
    (availableNow trigger; the checkpoint's offset log + the
    batch-id-fenced versioned state commit make each input file fold
    exactly once EVEN under foreachBatch replay)."""
    return (
        read_change_feed(spark, landing_dir)
        .writeStream.foreachBatch(
            lambda df, bid: merge_batch(df, bid, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def view_stats(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained view (sentinel row excluded) with derived
    mean/variance — the ivm02 fixed-order double derivations from the
    exact integer moments, through the shared ``_r`` rounding rule
    (one epsilon policy with the batch twin)."""
    from ..plans.queries import _r

    v = read_latest_state(spark, state_dir, VIEW_SCHEMA).filter(
        F.col("user_id").isNotNull()
    )
    mean = F.col("s").cast("double") / F.col("n") / 100.0
    var = (
        (F.col("s2") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / F.col("n")
        / 10000.0
    )
    return v.select(
        "user_id",
        "n",
        "s",
        "s2",
        _r(mean, 4).alias("mean_value"),
        _r(var, 4).alias("var_value"),
    )
