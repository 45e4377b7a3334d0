"""Streaming sessionization (streaming/sessions.py): native
session_window semantics under AvailableNow drains — append-mode
emission only after the watermark closes a session, cross-restart
session MERGE through the checkpointed state, and exactly-once
emission of each closed session."""

from __future__ import annotations

import json

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.sessions import (
    read_event_stream,
    sessionized_counts,
)


def _event(user, ts, etype="click"):
    return {"user_id": user, "event_type": etype, "ts": ts}


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _drain(spark, landing, ckpt, got):
    def sink(batch_df, batch_id):
        got.extend(
            (
                r.user_id,
                r.session_start.isoformat(),
                r.session_end.isoformat(),
                r.n_events,
                r.n_errors,
            )
            for r in batch_df.collect()
        )

    q = (
        sessionized_counts(read_event_stream(spark, str(landing)))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_sessions_merge_and_watermark_emission(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    got: list[tuple] = []

    _write(
        landing / "b1.json",
        [
            # user 1: one session of 3 events (10 min apart), one error
            _event(1, "2026-08-13T10:00:00"),
            _event(1, "2026-08-13T10:10:00", "error"),
            _event(1, "2026-08-13T10:20:00"),
            # user 1: a second session past the 30-min gap
            _event(1, "2026-08-13T11:30:00"),
            # user 2: one two-event session
            _event(2, "2026-08-13T10:05:00", "error"),
            _event(2, "2026-08-13T10:06:00"),
        ],
    )
    _drain(spark, landing, ckpt, got)
    # append mode: nothing may emit while the watermark (max event time
    # minus the 2h buffer) is still behind every session's end
    assert got == [], got

    # restart with a new file: an event inside user 1's open second
    # session must MERGE into it via the checkpointed session state
    _write(landing / "b2.json", [_event(1, "2026-08-13T11:40:00")])
    _drain(spark, landing, ckpt, got)
    assert got == [], got  # still open — watermark hasn't passed them

    # a far-future flush event pushes the watermark past every real
    # session; the engine's no-data batch then closes and emits each
    # session EXACTLY once (checkpointed watermark + state across the
    # three separate query runs)
    _write(landing / "b3.json", [_event(999, "2026-08-14T12:00:00")])
    _drain(spark, landing, ckpt, got)

    sessions = sorted(t for t in got if t[0] != 999)
    assert sessions == [
        # session_window end = last event + gap (30 min)
        (1, "2026-08-13T10:00:00", "2026-08-13T10:50:00", 3, 1),
        # the b2 event extended the checkpointed 11:30 session
        (1, "2026-08-13T11:30:00", "2026-08-13T12:10:00", 2, 0),
        (2, "2026-08-13T10:05:00", "2026-08-13T10:36:00", 2, 1),
    ], sessions
