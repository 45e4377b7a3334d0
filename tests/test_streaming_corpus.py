"""Structured Streaming corpus-ingest curation: quality filter +
watermark-bounded fingerprint dedupe + checkpointed exactly-once resume,
run with Trigger.AvailableNow over an NDJSON landing zone."""

from __future__ import annotations

import json

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.corpus_ingest import (
    start_ingest_query,
)

#: ≥30 tokens, mean word length in [3,10], several stopwords, low
#: duplicate-token ratio — passes every Gopher rule.
GOOD = (
    "the quick brown fox jumps over lazy dogs and then runs far into "
    "the green forest while birds sing songs of morning light it was "
    "a calm day full of wind and sun near those quiet hills"
)
#: fails rule_len (under 30 tokens)
SHORT = "the tiny doc is too short to keep"


def _doc(i, text, ts="2026-08-13T10:00:00", lang="en", source="src1"):
    return {
        "doc_id": i,
        "text": text,
        "lang": lang,
        "source": source,
        "ingest_ts": ts,
    }


def _write_ndjson(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_ingest_filters_dedupes_and_resumes(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_ndjson(
        landing / "batch1.json",
        [
            _doc(1, GOOD),
            _doc(2, SHORT),  # fails the quality battery -> dropped
            _doc(3, "  " + GOOD.upper() + " "),  # normalized dup of 1
            _doc(4, GOOD + " plus unique trailing words here today"),
        ],
    )

    got: list[dict] = []

    def sink(batch_df, batch_id):
        got.extend(r.asDict() for r in batch_df.collect())

    q = start_ingest_query(spark, str(landing), str(ckpt), sink)
    q.awaitTermination(120)

    # assert on CONTENT survival, not which doc_id won the in-batch
    # dedupe race (dropDuplicatesWithinWatermark keeps the first row to
    # reach the state store — not guaranteed to be the lower doc_id)
    ids = sorted(r["doc_id"] for r in got)
    assert len(got) == 2, got  # 2 filtered out, {1,3} deduped to one
    assert ids[0] in (1, 3) and ids[1] == 4, got
    fps = [r["fp"] for r in got]
    assert len(set(fps)) == 2  # one row per distinct content
    for r in got:
        assert len(r["fp"]) == 32 and r["fp"] == r["fp"].lower()
        assert r["n_tok"] >= 30
    good_fp = next(r["fp"] for r in got if r["doc_id"] != 4)

    # resume: a byte-dup of doc 1 within the horizon must NOT re-emit
    # (checkpointed dedupe state), a fresh doc must flow through
    _write_ndjson(
        landing / "batch2.json",
        [
            _doc(5, GOOD),  # exact dup of already-emitted content
            _doc(6, GOOD + " and some different closing words appear now"),
        ],
    )
    q2 = start_ingest_query(spark, str(landing), str(ckpt), sink)
    q2.awaitTermination(120)
    assert sorted(r["doc_id"] for r in got)[-1] == 6 and len(got) == 3, got
    assert sum(1 for r in got if r["fp"] == good_fp) == 1  # never re-emitted


def test_ingest_state_is_fingerprint_only(spark, tmp_path):
    """The stateful operator must key on the 32-hex fingerprint, never
    the raw text — pin it from the analyzed plan of the curated
    stream."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.corpus_ingest import (
        curated_stream,
        read_document_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    _write_ndjson(landing / "b.json", [_doc(1, GOOD)])
    df = curated_stream(read_document_stream(spark, str(landing)))
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark [fp#" in plan, plan


def test_ingest_drops_malformed_lines_gracefully(spark, tmp_path):
    """A corrupt NDJSON line must not kill the stream or emit a row:
    the schema'd json source nulls unparseable lines, every quality
    rule evaluates NULL on null text, and the keep filter drops NULL
    (three-valued logic) — the stream's quarantine-by-construction."""
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"
    (landing / "b.json").write_text(
        "{not valid json at all\n"
        + json.dumps(_doc(1, GOOD))
        + "\n"
        + '{"doc_id": "also-not-a-long"}\n'
    )

    got: list[dict] = []

    def sink(batch_df, batch_id):
        got.extend(r.asDict() for r in batch_df.collect())

    q = start_ingest_query(spark, str(landing), str(ckpt), sink)
    q.awaitTermination(120)
    assert [r["doc_id"] for r in got] == [1], got
