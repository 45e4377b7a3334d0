"""ES bulk sink parity: per-document failure tolerance + NDJSON body.

Reference ``ingestion/bulk_ingest.py:50-108`` tolerates per-doc failures
inside a bulk batch (ES ``errors: true`` is reported, the run continues)
and ``:171-190`` builds the alternating action/doc NDJSON lines against
the write alias. Engine twins: ``split_for_bulk`` (classify-and-route
before the all-or-nothing committer) and ``to_bulk_ndjson``.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.export import (
    INDEX_ALIAS,
    split_for_bulk,
    to_bulk_ndjson,
    to_es_documents,
)

_SCORED_COLS = (
    "id string, title string, description string, price double, user_id long, "
    "category string, condition string, cpu string, ram string, gpu string, "
    "composite_z double, estimated_value double, fallback_used boolean, "
    "risk_score int, risk_factors array<string>, latitude double, longitude double"
)

NAN = float("nan")
INF = float("inf")


def _docs(spark, rows):
    return to_es_documents(spark.createDataFrame(rows, _SCORED_COLS))


_GOOD = ("ok", "Portatil i7", "desc", 200.0, 9, "GAMING", "USED", "INTEL I7",
         "16", None, -1.2, 500.0, False, 70, ["PRICE_ANOMALY"], 40.4, -3.7)


def test_split_routes_sink_rejectable_docs(spark):
    rows = [
        _GOOD,
        # geo_point out of range -> mapper_parsing_exception at the index
        ("bad_geo",) + _GOOD[1:15] + (999.0, -3.7),
        # NaN composite_z -> unrepresentable in the JSON bulk body
        ("bad_nan", "t", "d", 200.0, 9, "GAMING", "USED", None, None, None,
         NAN, 500.0, False, 10, [], None, None),
        # Inf price amount
        ("bad_inf", "t", "d", INF, 9, "GAMING", "USED", None, None, None,
         -1.0, 500.0, False, 10, [], None, None),
        # null id: engine-side idempotent re-ingest cannot key the action
        (None, "t", "d", 200.0, 9, "GAMING", "USED", None, None, None,
         -1.0, 500.0, False, 10, [], None, None),
    ]
    valid, rejects = split_for_bulk(_docs(spark, rows))
    assert [r.id for r in valid.collect()] == ["ok"]
    got = {r.id: list(r.reject_reasons) for r in rejects.collect()}
    assert got == {
        "bad_geo": ["geo_out_of_range"],
        "bad_nan": ["nonfinite_number"],
        "bad_inf": ["nonfinite_number"],
        None: ["null_doc_id"],
    }
    # rejects keep the full document (dead-letter is replayable after fix)
    assert "enrichment" in rejects.columns


def test_split_accumulates_multiple_reasons(spark):
    rows = [(None, "t", "d", NAN, 9, "GAMING", "USED", None, None, None,
             -1.0, 500.0, False, 10, [], 95.0, 0.0)]
    valid, rejects = split_for_bulk(_docs(spark, rows))
    assert valid.count() == 0
    assert list(rejects.first().reject_reasons) == [
        "null_doc_id", "geo_out_of_range", "nonfinite_number"
    ]


def test_split_is_shuffle_free(spark):
    valid, rejects = split_for_bulk(_docs(spark, [_GOOD]))
    for df in (valid, rejects):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_bulk_ndjson_body(spark):
    lines = []
    for row in to_bulk_ndjson(_docs(spark, [_GOOD])).collect():
        lines.extend(row.value.split("\n"))
    # alternating action/doc pairs, exactly as send_batch posts them
    assert len(lines) == 2
    action, doc = (json.loads(x) for x in lines)
    assert action == {"index": {"_index": INDEX_ALIAS}}
    assert doc["id"] == "ok"
    assert doc["price"] == {"amount": 200.0, "currency": "EUR"}
    assert doc["location"]["geo"] == {"lat": 40.4, "lon": -3.7}
    assert doc["enrichment"]["risk_score"] == 70
    # null fields omitted (dynamic-mapping open world: absent == null)
    assert "gpu" not in doc["enrichment"]["market_analysis"]["specs_detected"]


def test_bulk_response_partial_failure_tolerated():
    """Reference bulk_ingest.py:96-108: ES answers 200 + ``errors: true``
    when SOME docs in the batch fail — the run reports and continues.
    The parser must land the good docs and quarantine the bad ones with
    their mapper reasons, without raising."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.export import (
        parse_bulk_response,
    )

    resp = {
        "took": 12,
        "errors": True,
        "items": [
            {"index": {"_index": INDEX_ALIAS, "status": 201}},
            {"index": {"status": 400, "error": {
                "type": "mapper_parsing_exception",
                "reason": "failed to parse field [location.geo]"}}},
            {"index": {"_index": INDEX_ALIAS, "status": 200}},
            {"index": {"status": 429, "error": {
                "type": "es_rejected_execution_exception",
                "reason": "thread pool queue full"}}},
        ],
    }
    acked, failed = parse_bulk_response(resp, ["d1", "d2", "d3", "d4"])
    assert acked == ["d1", "d3"]
    assert failed == [
        ("d2", "mapper_parsing_exception: failed to parse field [location.geo]"),
        ("d4", "es_rejected_execution_exception: thread pool queue full"),
    ]


def test_bulk_response_all_green_and_malformed():
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.export import (
        parse_bulk_response,
    )

    ok = {"errors": False, "items": [{"index": {"status": 201}}] * 2}
    assert parse_bulk_response(ok, ["a", "b"]) == (["a", "b"], [])
    # HTTP-level / truncated response: whole batch retryable, no raise
    acked, failed = parse_bulk_response({"error": "http 503"}, ["a", "b"])
    assert acked == []
    assert [d for d, _ in failed] == ["a", "b"]
    assert all("batch_retryable" in r for _, r in failed)
    # item missing status / empty item dict -> failed, not crashed
    weird = {"items": [{}, {"index": {}}]}
    acked, failed = parse_bulk_response(weird, ["a", "b"])
    assert acked == [] and len(failed) == 2


def test_ingest_batch_dead_letters_rejects(spark, tmp_path):
    """End-to-end: a batch containing a sink-rejectable doc completes,
    writes the clean docs, and dead-letters the reject with its reason."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.pipeline import (
        run_ingest_batch,
    )

    desc = "Portatil gaming en perfecto estado con garantia incluida " * 2
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        {"id": "p1", "title": "Portatil gaming i7", "description": desc,
         "price": 200.0, "user_id": 9, "latitude": 40.4, "longitude": -3.7},
        {"id": "p2", "title": "Portatil gaming i7", "description": desc,
         "price": 210.0, "user_id": 9, "latitude": 400.0, "longitude": -3.7},
    ]
    (landing / "d.json").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    prime = spark.createDataFrame(
        [("GAMING", "USED", 500.0, 100.0)],
        "category string, condition string, mean double, stdev double",
    )
    comp = spark.createDataFrame(
        [], "category string, condition string, comp_type string, "
            "comp_name string, mean double, stdev double",
    )
    out = str(tmp_path / "lake")
    dead = str(tmp_path / "rejects")
    n = run_ingest_batch(spark, str(landing), prime, comp, out, rejects_path=dead)
    assert n == 1
    assert [r.id for r in spark.read.parquet(out).collect()] == ["p1"]
    rej = spark.read.parquet(dead).collect()
    assert [(r.id, list(r.reject_reasons)) for r in rej] == [
        ("p2", ["geo_out_of_range"])
    ]


def test_bulk_deliver_per_doc_outcomes(spark):
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.export import (
        bulk_deliver,
    )

    # defined INSIDE the test so cloudpickle ships it by value (the
    # tests dir is not importable on executors). Deterministic ES
    # stand-in: parses the bulk NDJSON body and rejects any doc whose
    # title contains 'poison' — items in request order, like ES.
    def fake_es_post(body: str) -> dict:
        import json as _json

        lines = [ln for ln in body.split("\n") if ln]
        items = []
        for i in range(0, len(lines), 2):
            action, doc = _json.loads(lines[i]), _json.loads(lines[i + 1])
            assert "index" in action
            if "poison" in (doc.get("title") or ""):
                items.append({"index": {"status": 400, "error": {
                    "type": "mapper_parsing_exception", "reason": "bad doc"}}})
            else:
                items.append({"index": {"status": 201}})
        return {"errors": any(i["index"]["status"] >= 300 for i in items),
                "items": items}

    rows = [_GOOD]
    for i in range(7):
        title = "poison apple" if i % 3 == 0 else f"Portatil {i}"
        rows.append((f"d{i}", title) + _GOOD[2:])
    out = bulk_deliver(_docs(spark, rows), fake_es_post, chunk=3)
    got = {r.doc_id: r.status for r in out.collect()}
    assert len(got) == 8
    assert got["ok"] == "acked"
    for i in range(7):
        if i % 3 == 0:
            assert got[f"d{i}"] == "mapper_parsing_exception: bad doc"
        else:
            assert got[f"d{i}"] == "acked"


def test_bulk_deliver_tolerates_broken_endpoint(spark):
    """An endpoint answering garbage fails the batch as retryable — it
    must never raise out of the job (reference send_batch catches all)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.export import (
        bulk_deliver,
    )

    out = bulk_deliver(_docs(spark, [_GOOD]), lambda body: {"oops": True})
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].status.startswith("batch_retryable")


def test_bulk_deliver_posts_each_doc_exactly_once(spark, tmp_path):
    """Regression: toDF-with-names schema inference ran an eager job
    that re-executed partition 0's POSTs — every body must reach the
    endpoint exactly once, and an EMPTY batch must deliver nothing
    (and not crash)."""
    import uuid

    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.export import (
        bulk_deliver,
    )

    outdir = tmp_path / "posts"
    outdir.mkdir()
    path = str(outdir)

    def recording_post(body: str) -> dict:
        import json as _json
        import uuid as _uuid

        with open(f"{path}/{_uuid.uuid4().hex}", "w") as fh:
            fh.write(body)
        n = sum(1 for ln in body.split("\n") if ln) // 2
        return {"errors": False, "items": [{"index": {"status": 201}}] * n}

    _ = uuid  # imported for parity with executor-side use
    rows = [_GOOD] + [(f"d{i}",) + _GOOD[1:] for i in range(5)]
    out = bulk_deliver(_docs(spark, rows), recording_post, chunk=2)
    assert sorted(r.status for r in out.collect()) == ["acked"] * 6
    posted = 0
    for f in outdir.iterdir():
        body = f.read_text()
        posted += sum(1 for ln in body.split("\n") if ln) // 2
    assert posted == 6, f"docs posted {posted} times total, expected 6"

    empty = bulk_deliver(_docs(spark, rows).limit(0), recording_post)
    assert empty.count() == 0


def test_ingest_batch_delivers_and_dead_letters_sink_failures(spark, tmp_path):
    """End-to-end with a live-sink stand-in: docs that pass pre-sink
    classification but are rejected by the endpoint land in the
    sink dead-letter with their per-item reason; the batch completes."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.pipeline import (
        run_ingest_batch,
    )

    desc = "Portatil gaming en perfecto estado con garantia incluida " * 2
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        {"id": "p1", "title": "Portatil gaming i7", "description": desc,
         "price": 200.0, "user_id": 9, "latitude": 40.4, "longitude": -3.7},
        {"id": "p3", "title": "Portatil gaming i7", "description": desc,
         "price": 250.0, "user_id": 9, "latitude": 40.4, "longitude": -3.7},
    ]
    (landing / "d.json").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    prime = spark.createDataFrame(
        [("GAMING", "USED", 500.0, 100.0)],
        "category string, condition string, mean double, stdev double",
    )
    comp = spark.createDataFrame(
        [], "category string, condition string, comp_type string, "
            "comp_name string, mean double, stdev double",
    )

    def post_rejecting_p3(body: str) -> dict:
        import json as _json

        lines = [ln for ln in body.split("\n") if ln]
        items = []
        for i in range(1, len(lines), 2):
            if _json.loads(lines[i]).get("id") == "p3":
                items.append({"index": {"status": 400, "error": {
                    "type": "version_conflict_engine_exception",
                    "reason": "p3 already versioned"}}})
            else:
                items.append({"index": {"status": 201}})
        return {"errors": True, "items": items}

    out = str(tmp_path / "lake")
    dead = str(tmp_path / "rejects")
    n = run_ingest_batch(
        spark, str(landing), prime, comp, out,
        rejects_path=dead, post=post_rejecting_p3,
    )
    assert n == 2  # both docs are lake-valid; sink rejection is separate
    sink_dead = spark.read.parquet(dead + "_sink").collect()
    assert [(r.doc_id, r.status) for r in sink_dead] == [
        ("p3", "version_conflict_engine_exception: p3 already versioned")
    ]


def test_ingest_batch_delivery_runs_without_rejects_path(spark, tmp_path):
    """The post-given / rejects_path-None branch must still DRIVE the
    delivery (the discarded count() is what executes the POSTs)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.pipeline import (
        run_ingest_batch,
    )

    desc = "Portatil gaming en perfecto estado con garantia incluida " * 2
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "d.json").write_text(json.dumps(
        {"id": "p1", "title": "Portatil gaming i7", "description": desc,
         "price": 200.0, "user_id": 9, "latitude": 40.4, "longitude": -3.7}
    ) + "\n")
    prime = spark.createDataFrame(
        [("GAMING", "USED", 500.0, 100.0)],
        "category string, condition string, mean double, stdev double",
    )
    comp = spark.createDataFrame(
        [], "category string, condition string, comp_type string, "
            "comp_name string, mean double, stdev double",
    )
    posted_dir = tmp_path / "posted"
    posted_dir.mkdir()
    pdir = str(posted_dir)

    def recording_post(body: str) -> dict:
        import uuid as _uuid

        with open(f"{pdir}/{_uuid.uuid4().hex}", "w") as fh:
            fh.write(body)
        n = sum(1 for ln in body.split("\n") if ln) // 2
        return {"errors": False, "items": [{"index": {"status": 201}}] * n}

    n = run_ingest_batch(
        spark, str(landing), prime, comp, str(tmp_path / "lake"),
        post=recording_post,
    )
    assert n == 1
    bodies = list(posted_dir.iterdir())
    assert len(bodies) == 1, "delivery never executed without rejects_path"
    assert '"id":"p1"' in bodies[0].read_text().replace(" ", "")


def test_bulk_deliver_transport_failure_is_retryable(spark):
    """A post() that RAISES (connection refused / timeout) must not fail
    the job: the chunk's docs come back batch_retryable."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.export import (
        bulk_deliver,
    )

    def broken_post(body: str) -> dict:
        raise ConnectionError("sink unreachable")

    out = bulk_deliver(_docs(spark, [_GOOD]), broken_post).collect()
    assert len(out) == 1
    assert out[0].status.startswith("batch_retryable: transport:")
    assert "sink unreachable" in out[0].status
