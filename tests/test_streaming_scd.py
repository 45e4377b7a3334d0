"""Streaming SCD2 change capture (streaming/scd.py, ST11): closed
intervals emit exactly once at the change point, version numbers and
the open interval survive a restart through the checkpointed state,
late rows behind a key's frontier are dropped, and the closed-interval
ledger matches the batch twin (cdc02_scd2_intervals) on the same
in-order input."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
    REGISTRY,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.scd import (
    read_change_stream,
    scd2_closed_intervals,
)

_US = 1_000_000


def _event(user, eid, ts, etype):
    return {"user_id": user, "event_id": eid, "event_type": etype, "ts": ts}


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _drain(spark, landing, ckpt, got):
    def sink(batch_df, batch_id):
        got.extend(
            (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us, r.version)
            for r in batch_df.collect()
        )

    q = (
        scd2_closed_intervals(read_change_stream(spark, str(landing)))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _us(hhmm: str) -> int:
    h, m = int(hhmm[:2]), int(hhmm[3:])
    # 2026-08-13 00:00:00 UTC epoch seconds
    day0 = 1786579200
    return (day0 + h * 3600 + m * 60) * _US


def test_streaming_scd2_closes_versions_and_survives_restart(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    got: list[tuple] = []

    _write(
        landing / "b1.json",
        [
            _event(1, 10, "2026-08-13T10:00:00", "click"),
            _event(1, 11, "2026-08-13T10:10:00", "click"),
            _event(1, 12, "2026-08-13T10:20:00", "error"),
            _event(2, 20, "2026-08-13T10:05:00", "view"),
        ],
    )
    _drain(spark, landing, ckpt, got)
    # user 1's click run closed when error arrived; user 2 still open
    assert got == [(1, "click", _us("10:00"), _us("10:20"), 1)], got

    # restart: a change for both keys — the open intervals (error@10:20
    # for user 1, view@10:05 for user 2) close from CHECKPOINTED state,
    # version numbering continuing where b1 left off
    got.clear()
    _write(
        landing / "b2.json",
        [
            _event(1, 13, "2026-08-13T11:00:00", "purchase"),
            _event(2, 21, "2026-08-13T11:30:00", "error"),
        ],
    )
    _drain(spark, landing, ckpt, got)
    assert sorted(got) == [
        (1, "error", _us("10:20"), _us("11:00"), 2),
        (2, "view", _us("10:05"), _us("11:30"), 1),
    ], got

    # late row behind user 1's frontier (10:30 < 11:00) is dropped —
    # no emission, no state corruption; an unchanged value at 11:40
    # extends the open interval silently
    got.clear()
    _write(
        landing / "b3.json",
        [
            _event(1, 14, "2026-08-13T10:30:00", "signup"),
            _event(1, 15, "2026-08-13T11:40:00", "purchase"),
        ],
    )
    _drain(spark, landing, ckpt, got)
    assert got == [], got

    # the next real change closes purchase with valid_from 11:00 (the
    # late signup never spliced in) and version 3
    got.clear()
    _write(landing / "b4.json", [_event(1, 16, "2026-08-13T12:00:00", "error")])
    _drain(spark, landing, ckpt, got)
    assert got == [(1, "purchase", _us("11:00"), _us("12:00"), 3)], got


def test_streaming_scd2_frontier_replay_dropped_tie_admitted(
    spark, tmp_path
):
    """The frontier is the (ts, event_id) PAIR: an exact-frontier
    replay (duplicate delivery, even with a mutated value) is dropped,
    while a tie at the frontier timestamp with a HIGHER event_id is
    admitted in the batch twin's (ts, event_id) order."""
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    got: list[tuple] = []

    _write(
        landing / "b1.json",
        [
            _event(5, 1, "2026-08-13T10:00:00", "view"),
            _event(5, 2, "2026-08-13T10:30:00", "click"),
        ],
    )
    _drain(spark, landing, ckpt, got)
    assert got == [(5, "view", _us("10:00"), _us("10:30"), 1)], got

    # exact-frontier replay (same ts AND event_id) with a MUTATED value
    # — a duplicate delivery, not a new change: dropped, no emission
    got.clear()
    _write(landing / "b2.json", [_event(5, 2, "2026-08-13T10:30:00", "error")])
    _drain(spark, landing, ckpt, got)
    assert got == [], got

    # tie at the frontier timestamp with a HIGHER event_id: admitted —
    # closes the click interval zero-length at 10:30, exactly what the
    # batch twin's (ts, event_id) total order produces
    got.clear()
    _write(
        landing / "b3.json", [_event(5, 3, "2026-08-13T10:30:00", "purchase")]
    )
    _drain(spark, landing, ckpt, got)
    assert got == [(5, "click", _us("10:30"), _us("10:30"), 2)], got

    # the replayed "error" never spliced in: the next change closes
    # purchase from 10:30, version numbering unbroken
    got.clear()
    _write(landing / "b4.json", [_event(5, 4, "2026-08-13T11:15:00", "error")])
    _drain(spark, landing, ckpt, got)
    assert got == [(5, "purchase", _us("10:30"), _us("11:15"), 3)], got


def test_streaming_scd2_matches_batch_twin_on_in_order_input(
    spark, tmp_path
):
    """Verdict parity: the streaming ledger of CLOSED intervals equals
    cdc02's valid_to IS NOT NULL rows on the same in-order events."""
    rows = [
        _event(7, 1, "2026-08-13T09:00:00", "view"),
        _event(7, 2, "2026-08-13T09:30:00", "view"),
        _event(7, 3, "2026-08-13T10:00:00", "click"),
        _event(7, 4, "2026-08-13T10:30:00", "purchase"),
        _event(7, 5, "2026-08-13T11:00:00", "purchase"),
        _event(8, 6, "2026-08-13T09:10:00", "error"),
        _event(8, 7, "2026-08-13T09:50:00", "signup"),
        _event(8, 8, "2026-08-13T10:40:00", "error"),
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    got: list[tuple] = []
    _write(landing / "all.json", rows)
    _drain(spark, landing, tmp_path / "ckpt", got)

    # batch twin over the same rows, through the same parquet surface
    # the registry reads (sf_dir/events.parquet)
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    (
        spark.createDataFrame(
            [
                (r["user_id"], r["event_id"], r["event_type"], r["ts"])
                for r in rows
            ],
            "user_id long, event_id long, event_type string, ts string",
        )
        .withColumn("ts", F.to_timestamp("ts"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(sf_dir / "events.parquet"))
    )
    batch = REGISTRY["cdc02_scd2_intervals"].fn(spark, str(sf_dir))
    # epoch-microsecond conversion happens JVM-side (unix_micros) so a
    # non-UTC test host can never shift the comparison
    closed = [
        (r.user_id, r.event_type, r.f_us, r.t_us, r.version)
        for r in batch.filter(F.col("valid_to").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.unix_micros("valid_from").alias("f_us"),
            F.unix_micros("valid_to").alias("t_us"),
            "version",
        )
        .collect()
    ]
    assert sorted(got) == sorted(closed), (got, closed)
