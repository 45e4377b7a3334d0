"""Streaming sessionization — the unbounded twin of the batch
``w04_sessionize`` recipe (SESSIONIZE family, streaming form).

SURVEY §2.9 notes the reference has no session windows; this module is
the beyond-the-reference streaming operator a training-data / behavior
pipeline needs for continuous ingestion: gap-based user sessions over
an unbounded event stream via Spark's native ``session_window`` +
watermark (state merges sessions across micro-batches and across
restarts through the checkpoint; the watermark bounds state size by
closing sessions older than the buffer).

Boundary semantics vs the batch twin: ``session_window`` extends a
session while the next event lands STRICTLY inside ``last + gap``
(window ends are exclusive), whereas w04's lag-based form breaks on
``diff > gap`` (ties merge). Events exactly ``gap`` apart are the one
divergence — documented, not hidden; both forms agree on any stream
without exact-gap deltas.

Scale note (100 TB/day ingest): state is per (user, open-session) and
the watermark closes sessions ``buffer`` behind the max event time, so
state size is bounded by the number of concurrently-active users, not
by history. The shuffle keys on user_id — the same single-shuffle
contract as the batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: session gap (minutes) — matches the batch twin's default
SESSION_GAP_MIN = 30
#: watermark buffer: how long a session can stay open waiting for
#: late events before the state closes and the session emits
LATE_BUFFER = "2 hours"

EVENT_SCHEMA = "user_id long, event_type string, ts timestamp"


def read_event_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """NDJSON event landing files as an unbounded file-source stream
    (the corpus_ingest/alerts landing pattern)."""
    return spark.readStream.schema(EVENT_SCHEMA).json(landing_dir)


def sessionized_counts(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    buffer: str = LATE_BUFFER,
) -> DataFrame:
    """Gap-based user sessions with per-session event/error counts.

    Native ``session_window`` aggregation: Spark maintains one state
    row per open (user, session), MERGES overlapping windows as events
    arrive in any order within the watermark, and emits a session
    exactly once when the watermark passes its end (``append`` is the
    only output mode Spark supports for session-window aggregations —
    the merge makes per-batch ``update`` rows ill-defined). The
    engine's no-data batch after a watermark advance is what flushes
    closed sessions at the end of an AvailableNow drain."""
    return (
        events.withWatermark("ts", buffer)
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).cast("bigint").alias("n_errors"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "n_errors",
        )
    )
