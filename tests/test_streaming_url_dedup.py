"""Streaming canonical-URL dedup (ST10 — dd16's streaming twin): a
two-batch AvailableNow drain where a re-crawl of an already-seen
canonical URL is dropped against checkpointed state, a resume with no
new files emits nothing, and a one-batch drain keeps exactly one doc
per canonical URL — the same groups batch dd16 builds over the same
documents (the shared ``_dd16_canon`` expression is the parity
contract)."""

from __future__ import annotations

import json

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.corpus_ingest import (
    start_url_dedup_ingest_query,
)


def _doc(i, lang="en"):
    return {
        "doc_id": i,
        "text": f"text of document {i}",
        "lang": lang,
        "source": "src1",
        "ingest_ts": "2026-08-13T10:00:00",
    }


def _write_ndjson(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _drain(spark, landing, ckpt, got):
    def sink(batch_df, batch_id):
        got.extend(r.asDict() for r in batch_df.collect())

    q = start_url_dedup_ingest_query(spark, str(landing), str(ckpt), sink)
    q.awaitTermination(120)


def test_url_stream_drops_recrawls_and_resumes(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = tmp_path / "ckpt"

    # doc_ids 0 and 3 share a canonical URL (same mirror 0 % 3, same
    # /item/0 path block); 1 and 7 are each fresh canonicals
    _write_ndjson(landing / "b1.json", [_doc(0), _doc(1)])
    got: list[dict] = []
    _drain(spark, landing, ckpt, got)
    assert {r["doc_id"] for r in got} == {0, 1}
    # the text column must be dropped BEFORE the stateful operator
    # (cp01 discipline: only the fixed-width key + passthrough ids
    # enter state) — the emitted rows prove the projection
    assert "text" not in got[0], sorted(got[0])
    assert all(r["canonical_url"].startswith("m") for r in got)
    assert all("://" not in r["canonical_url"] for r in got)
    assert all("?" not in r["canonical_url"] for r in got)

    # batch 2: doc 3 re-crawls doc 0's canonical URL (different raw
    # noise — scheme/www/slash all differ) and must be dropped; doc 7
    # is a fresh canonical and passes
    _write_ndjson(landing / "b2.json", [_doc(3), _doc(7)])
    got.clear()
    _drain(spark, landing, ckpt, got)
    assert {r["doc_id"] for r in got} == {7}

    # checkpoint resume with no new files: nothing re-emits
    got.clear()
    _drain(spark, landing, ckpt, got)
    assert got == []


def test_url_stream_matches_batch_dd16_groups(spark, tmp_path):
    """Batch/stream parity: one drain over a 30-doc slice must keep
    exactly one doc per canonical URL, and the kept canonical-URL SET
    must equal batch dd16's groups over the SAME documents (which
    survivor wins differs by design: the stream keeps first arrival,
    the batch keeps min doc_id — the groups are the contract)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _t,
        dd16_url_dedup,
    )

    sf = "/root/testdata/sf0.001"
    docs = _t(spark, sf, "documents").filter("doc_id < 30")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/slice/documents.parquet")
    batch = {
        r.canonical_url: r.n_raw
        for r in dd16_url_dedup(spark, f"{tmp_path}/slice").collect()
    }

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        {
            "doc_id": r.doc_id,
            "text": r.text,
            "lang": r.lang,
            "source": r.source,
            "ingest_ts": "2026-08-13T10:00:00",
        }
        for r in docs.collect()
    ]
    _write_ndjson(landing / "b1.json", rows)
    got: list[dict] = []
    _drain(spark, landing, tmp_path / "ckpt", got)

    assert len(got) == len(batch)
    assert {r["canonical_url"] for r in got} == set(batch)
    assert sum(batch.values()) == 30
