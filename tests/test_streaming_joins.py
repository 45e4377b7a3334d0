"""Watermarked stream-stream interval join (streaming/joins.py, ST12):
inner-join emission as soon as both sides arrive (including across
micro-batches and restarts through checkpointed join state), the
attribution window excluding out-of-range purchases, multi-touch
attribution when two clicks cover one purchase, and batch parity — the
streamed ledger equals the same interval join run as a plain batch
query over the drained input."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.joins import (
    ATTRIBUTION_MIN,
    attributed_purchases,
    read_event_stream,
)

_US = 1_000_000


def _event(user, eid, ts, etype):
    return {"user_id": user, "event_id": eid, "event_type": etype, "ts": ts}


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _drain(spark, landing, ckpt, got):
    def sink(batch_df, batch_id):
        got.extend(
            (r.user_id, r.click_id, r.purchase_id, r.lag_us)
            for r in batch_df.collect()
        )

    q = (
        attributed_purchases(read_event_stream(spark, str(landing)))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_stream_attribution_join(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    got: list[tuple] = []

    _write(
        landing / "b1.json",
        [
            _event(1, 100, "2026-08-13T10:00:00", "click"),
            # in-window purchase (25 min later) — joins in this batch
            _event(1, 200, "2026-08-13T10:25:00", "purchase"),
            # out-of-window purchase (2 h later) — must never join
            _event(1, 201, "2026-08-13T12:00:00", "purchase"),
            # a click with no purchase yet: state for the next batch
            _event(2, 101, "2026-08-13T11:00:00", "click"),
        ],
    )
    _drain(spark, landing, ckpt, got)
    assert sorted(got) == [(1, 100, 200, 25 * 60 * _US)], got

    # restart: user 2's purchase arrives in a later file and joins the
    # CHECKPOINTED click state; a second user-1 click 10 min before a
    # new purchase makes it multi-touch territory for the next file
    got.clear()
    _write(
        landing / "b2.json",
        [
            _event(2, 202, "2026-08-13T11:40:00", "purchase"),
            _event(1, 102, "2026-08-13T12:30:00", "click"),
            _event(1, 103, "2026-08-13T12:50:00", "click"),
        ],
    )
    _drain(spark, landing, ckpt, got)
    assert sorted(got) == [(2, 101, 202, 40 * 60 * _US)], got

    # one purchase inside BOTH open click windows -> two attribution
    # rows (multi-touch), emitted in the same drain it arrives
    got.clear()
    _write(landing / "b3.json", [_event(1, 203, "2026-08-13T13:10:00", "purchase")])
    _drain(spark, landing, ckpt, got)
    assert sorted(got) == [
        (1, 102, 203, 40 * 60 * _US),
        (1, 103, 203, 20 * 60 * _US),
    ], got

    # batch parity: the same interval join as a plain (non-streaming)
    # query over everything drained equals the streamed ledger
    batch = spark.read.schema(
        "user_id long, event_id long, event_type string, ts timestamp"
    ).json(str(landing))
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    twin = (
        c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") < F.col("purchase_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts")
                + F.expr(f"INTERVAL {ATTRIBUTION_MIN} MINUTES")
            ),
        )
        .select(
            "c_user",
            "click_id",
            "purchase_id",
            (
                F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
            ).alias("lag_us"),
        )
        .collect()
    )
    streamed_all = [
        (1, 100, 200, 25 * 60 * _US),
        (2, 101, 202, 40 * 60 * _US),
        (1, 102, 203, 40 * 60 * _US),
        (1, 103, 203, 20 * 60 * _US),
    ]
    assert sorted(tuple(r) for r in twin) == sorted(streamed_all)


def _drain_lt(spark, landing, ckpt, got):
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.joins import (
        last_touch_attribution,
    )

    def sink(batch_df, batch_id):
        got.extend(
            (r.user_id, r.purchase_id, r.click_id, r.lag_us)
            for r in batch_df.collect()
        )

    q = (
        last_touch_attribution(read_event_stream(spark, str(landing)))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_last_touch_attribution_matches_batch_twin(spark, tmp_path):
    """Last-touch (ST12's chained arg-max): per purchase exactly ONE
    row, the LATEST covering click wins, emission waits for the
    watermark to close the purchase's hour window (append mode across
    two stateful operators), and the ledger equals the batch twin
    j10_last_touch_attribution's attributed rows on the drained
    input."""
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    got: list[tuple] = []

    _write(
        landing / "b1.json",
        [
            # user 1: two clicks cover the purchase — last touch is the
            # 10:20 click (multi-touch would emit both)
            _event(1, 100, "2026-08-13T10:00:00", "click"),
            _event(1, 101, "2026-08-13T10:20:00", "click"),
            _event(1, 200, "2026-08-13T10:45:00", "purchase"),
            # user 2: single-touch
            _event(2, 110, "2026-08-13T10:10:00", "click"),
            _event(2, 210, "2026-08-13T10:40:00", "purchase"),
        ],
    )
    _drain_lt(spark, landing, ckpt / "lt", got)
    # append mode: the purchases' hour window (10:00-11:00) is still
    # open — the watermark (max event time - buffer) sits at 10:15
    assert got == [], got

    # far-future flush on BOTH sides (the join's output watermark is
    # the min of its inputs) — no join row of its own (the click is
    # after the purchase), but it closes the 10:00-11:00 window
    got.clear()
    _write(
        landing / "b2.json",
        [
            _event(9, 900, "2026-08-13T14:00:00", "purchase"),
            _event(9, 901, "2026-08-13T15:30:00", "click"),
        ],
    )
    _drain_lt(spark, landing, ckpt / "lt", got)
    assert sorted(got) == [
        (1, 200, 101, 25 * 60 * _US),
        (2, 210, 110, 30 * 60 * _US),
    ], got

    # batch parity: j10 over the same drained events (through the
    # registry's parquet surface) — its attributed rows (click_id NOT
    # NULL; the batch twin also ledgers unattributed purchases, which
    # an inner stream-stream join never emits) equal the streamed rows
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
        REGISTRY,
    )

    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    batch = spark.read.schema(
        "user_id long, event_id long, event_type string, ts timestamp"
    ).json(str(landing))
    batch.coalesce(1).write.mode("overwrite").parquet(
        str(sf_dir / "events.parquet")
    )
    twin = [
        (r.user_id, r.purchase_id, r.click_id, r.lag_us)
        for r in REGISTRY["j10_last_touch_attribution"]
        .fn(spark, str(sf_dir))
        .filter(F.col("click_id").isNotNull())
        .collect()
    ]
    assert sorted(twin) == sorted(got), (twin, got)
