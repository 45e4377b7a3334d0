"""End-to-end Structured Streaming test for the ST1–ST7 alert engine.

NDJSON landing files → file-source stream → filter/dedupe/format →
foreachBatch collector, run with Trigger.AvailableNow (the cron-style
micro-batch of run_pipeline.sh) + a restart to prove checkpoint resume.
"""

from __future__ import annotations

import json

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.alerts import (
    start_alert_query,
    windowed_alert_counts,
    read_listing_stream,
)


def _listing(i, risk, ts, slug="item-slug", dup=None):
    return {
        "id": dup or f"it{i}",
        "title": f"Listing {i}",
        "web_slug": slug,
        "risk_score": risk,
        "risk_factors": ["Very Low Price vs Market (Z=-2.10)", "External Contact"],
        "crawl_timestamp": ts,
    }


def _write_ndjson(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_alert_stream_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    now = "2026-08-13T10:00:00"
    stale = "2020-01-01T00:00:00"
    _write_ndjson(
        landing / "batch1.json",
        [
            _listing(1, 95, now),
            _listing(2, 40, now),  # below threshold -> dropped
            _listing(3, 85, now, dup="it1"),  # same id -> deduped (ST6)
            _listing(4, 99, stale),  # older than 2 days -> ST4 drops at sink
        ],
    )

    got: list[dict] = []

    def sink(batch_df, batch_id):
        got.extend(r.asDict() for r in batch_df.collect())

    q = start_alert_query(spark, str(landing), str(ckpt), sink, available_now=True)
    q.awaitTermination(120)

    assert len(got) == 1, got
    alert = got[0]
    assert alert["id"] == "it1"
    assert alert["subject"] == "FRAUD ALERT (risk 95): Listing 1"
    assert "https://es.wallapop.com/item/item-slug" in alert["body"]
    assert "External Contact" in alert["body"]

    # checkpoint resume (ST7): new file, old rows must not re-fire
    _write_ndjson(landing / "batch2.json", [_listing(5, 90, now)])
    q2 = start_alert_query(spark, str(landing), str(ckpt), sink, available_now=True)
    q2.awaitTermination(120)
    assert sorted(a["id"] for a in got) == ["it1", "it5"]


def test_windowed_frequency_general_form(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        _listing(1, 90, "2026-08-13T10:01:00"),
        _listing(2, 90, "2026-08-13T10:04:00"),  # same 10-min window
        _listing(3, 90, "2026-08-13T10:15:00"),  # next window, alone
    ]
    _write_ndjson(landing / "b.json", rows)

    stream = read_listing_stream(spark, str(landing))
    counts = windowed_alert_counts(stream, num_events=2)
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("winalerts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r.window_start.minute: r.n for r in spark.sql("select * from winalerts").collect()}
    assert out == {0: 2}  # only the 10:00-10:10 window reaches num_events=2
