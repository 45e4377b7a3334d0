"""Watermarked stream-stream interval join — the one Structured
Streaming operator class the rest of the streaming surface doesn't
exercise (SURVEY §2.9: the reference has no stream-stream joins;
ST8-ST11 cover stateful aggregation, dedup and change capture).

The shape is attribution: for every click, find the same user's
purchases landing within the attribution window after it — the
streaming form of a batch interval join (j06/j08's family), with BOTH
sides watermarked and a time-range join condition so the state store
can discard rows the watermark proves can no longer match. Without the
range condition Spark would have to keep every click forever; with it,
click state older than ``watermark − window`` and purchase state older
than ``watermark`` are provably dead and evicted — the textbook
bounded-state stream-stream inner join.

Scale note (100 TB/day ingest): state is partitioned by the join key
(user_id) and bounded by the attribution window times the per-key event
rate, independent of history; the shuffle is the same single user_id
exchange as the batch twin. Inner joins emit exactly when both sides
have arrived — append mode, no watermark-close latency on the output
row itself.

``last_touch_attribution`` chains a second stateful operator onto the
join (windowed arg-max per purchase — the ST13-era multiple-stateful-
operator pattern); its batch twin is the oracle-backed
``j10_last_touch_attribution`` registry entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ST11 and ST12 consume the SAME event landing format — one schema and
# one reader (a second copy would let the two input contracts drift)
from .scd import EVENT_SCHEMA  # noqa: F401  (re-exported contract)
from .scd import read_change_stream as read_event_stream  # noqa: F401

#: attribution window: a purchase matches a click at most this many
#: minutes after it
ATTRIBUTION_MIN = 60
#: how late either side may arrive before its state is fair game
LATE_BUFFER = "30 minutes"


def _joined(
    events: DataFrame, window_minutes: int, buffer: str
) -> DataFrame:
    """The watermarked inner join with BOTH event-time columns still
    aboard — ST12's ledger and the last-touch aggregate both derive
    from this one join (a second copy would let the two attribution
    contracts drift)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", buffer)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", buffer)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    return clicks.join(purchases, cond, "inner")


def attributed_purchases(
    events: DataFrame,
    window_minutes: int = ATTRIBUTION_MIN,
    buffer: str = LATE_BUFFER,
) -> DataFrame:
    """Click→purchase attribution as a watermarked stream-stream inner
    join: purchases join the same user's clicks with
    ``click_ts < purchase_ts AND purchase_ts <= click_ts + window``.

    Both sides carry their own watermark and the join condition bounds
    event time on both sides, so Spark derives state-eviction
    thresholds for each input (clicks survive ``window`` past the
    purchase watermark; purchases need only out-of-order slack). A
    purchase inside two clicks' windows attributes to BOTH — the
    multi-touch ledger; ``last_touch_attribution`` below is the
    downstream arg-max over the same join."""
    return _joined(events, window_minutes, buffer).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_ts"))
            - F.unix_micros(F.col("click_ts"))
        ).alias("lag_us"),
    )


def last_touch_attribution(
    events: DataFrame,
    window_minutes: int = ATTRIBUTION_MIN,
    buffer: str = LATE_BUFFER,
) -> DataFrame:
    """Last-touch attribution, streaming form: per purchase, the
    LATEST covering click — the attribution model most pipelines ship
    (the batch twin is ``j10_last_touch_attribution``, which applies
    the identical (click_ts, click_id) lexicographic arg-max; parity
    pinned in tests/test_streaming_joins.py).

    This CHAINS two stateful operators — the ST12 stream-stream join
    feeds a windowed aggregation keyed by the purchase (Spark's
    multiple-stateful-operator support: the aggregate windows on the
    watermarked ``purchase_ts`` that survives the join, so its state
    closes when the purchase watermark passes the hour window). A
    purchase's candidates all land in ONE group (its own (user,
    purchase, hour-window) key), the arg-max is a map-side-combinable
    ``max(struct)`` partial — never a per-purchase sort — and the row
    emits exactly once, when the watermark proves no later click can
    still join (a click more than ``window_minutes`` after the
    purchase cannot match, so the join's own state bound already
    covers the aggregate's input completeness).

    Scale note (100 TB/day): state adds one (purchase, best-so-far)
    row per in-flight purchase on top of the join state — bounded by
    the same watermark horizon, keyed by the same user-partitioned
    shuffle."""
    j = _joined(events, window_minutes, buffer)
    return (
        j.groupBy(
            F.window("purchase_ts", "1 hour").alias("w"),
            F.col("c_user").alias("user_id"),
            "purchase_id",
        )
        .agg(
            F.max(
                F.struct(
                    F.col("click_ts").alias("ct"),
                    F.col("click_id").alias("cid"),
                    F.col("purchase_ts").alias("pt"),
                )
            ).alias("mx")
        )
        .select(
            "user_id",
            "purchase_id",
            F.col("mx.cid").alias("click_id"),
            (
                F.unix_micros(F.col("mx.pt")) - F.unix_micros(F.col("mx.ct"))
            ).alias("lag_us"),
        )
    )
