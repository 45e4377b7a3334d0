"""Enriched-document export (SURVEY §7 phase C closing contract).

The reference's output schema is the ES mapping
(``ingestion/index_template.json:23-82``): nested listing docs with a
``price`` struct, a ``geo_point``-bearing ``location``, a
``timestamps.crawl_timestamp``, and the ``enrichment`` tree
(risk_score, risk_factors, market_analysis with specs_detected). This
module packages the flat ``score_listings`` output back into that
document shape so a reference consumer (bulk indexer, dashboard) can
switch engines without schema changes.

Scale: pure projection — no shuffle; written through
``sources.readers.write_partitioned`` it lands date-partitioned, which
replaces the ILM rollover (S8).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Write alias the reference's bulk action lines target
#: (``ingestion/bulk_ingest.py:171-190``, ``ingestion/index_alias.json:1-8``).
INDEX_ALIAS = "lab10310.wallapop"


def _opt(df: DataFrame, name: str, typ: str):
    return F.col(name) if name in df.columns else F.lit(None).cast(typ)


def to_es_documents(scored: DataFrame, currency: str = "EUR") -> DataFrame:
    """score_listings output → index_template.json document shape."""
    geo = F.when(
        _opt(scored, "latitude", "double").isNotNull()
        & _opt(scored, "longitude", "double").isNotNull(),
        F.struct(
            _opt(scored, "latitude", "double").alias("lat"),
            _opt(scored, "longitude", "double").alias("lon"),
        ),
    )
    market_analysis = F.struct(
        F.col("category").alias("detected_category"),
        F.col("condition").alias("detected_condition"),
        F.struct(
            F.col("cpu").alias("cpu"),
            F.col("ram").cast("string").alias("ram"),
            F.col("gpu").alias("gpu"),
        ).alias("specs_detected"),
        F.col("composite_z").alias("composite_z_score"),
        F.col("estimated_value").alias("estimated_market_value"),
        F.col("fallback_used").alias("fallback_used"),
    )
    return scored.select(
        F.col("id"),
        F.col("title"),
        F.col("description"),
        F.struct(
            F.col("price").alias("amount"), F.lit(currency).alias("currency")
        ).alias("price"),
        F.col("user_id").cast("string").alias("user_id"),
        _opt(scored, "web_slug", "string").alias("web_slug"),
        _opt(scored, "created_at", "timestamp").alias("created_at"),
        _opt(scored, "modified_at", "timestamp").alias("modified_at"),
        F.struct(
            geo.alias("geo"),
            _opt(scored, "latitude", "double").alias("latitude"),
            _opt(scored, "longitude", "double").alias("longitude"),
            _opt(scored, "city", "string").alias("city"),
            _opt(scored, "postal_code", "string").alias("postal_code"),
            _opt(scored, "country_code", "string").alias("country_code"),
        ).alias("location"),
        F.struct(F.current_timestamp().alias("crawl_timestamp")).alias("timestamps"),
        F.struct(
            F.col("risk_score").cast("int").alias("risk_score"),
            F.col("risk_factors").alias("risk_factors"),
            market_analysis.alias("market_analysis"),
        ).alias("enrichment"),
    )


def _nonfinite(c):
    return c.isNotNull() & (F.isnan(c) | (F.abs(c) == F.lit(float("inf"))))


def split_for_bulk(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Per-document sink-failure tolerance for the export path.

    The reference's bulk indexer tolerates per-document failures inside a
    batch — ES reports ``errors: true`` and the run continues
    (``ingestion/bulk_ingest.py:50-108``: "Los errores parciales ... se
    reportan pero no interrumpen el procesamiento"). Engine-side the
    committer is all-or-nothing, so the tolerance moves BEFORE the sink:
    classify each document against the rejections the index mapping
    (``ingestion/index_template.json:23-82``) would raise, route cleans to
    the lake and rejects to a dead-letter output with the reason attached.

    Checks (each maps to a real per-doc bulk failure):

    - ``geo_out_of_range`` — ``location.geo`` outside lat [-90, 90] /
      lon [-180, 180]: ES ``geo_point`` mapper_parsing_exception.
    - ``nonfinite_number`` — NaN/±Inf in ``price.amount`` or the float
      enrichment metrics: not representable in the JSON bulk body.
    - ``null_doc_id`` — reference actions auto-id (no ``_id`` in
      ``bulk_ingest.py:174``), but engine re-ingest is idempotent per
      listing id; a null id can neither key the index action nor dedupe.

    Pure narrow projection — one mask column, zero shuffles; at 100 TB the
    split adds no stage boundary. Returns ``(valid, rejects)``; rejects
    carry ``reject_reasons array<string>``. Callers re-reading an expensive
    upstream should persist ``docs`` across the two consumers.
    """
    lat = F.col("location.geo.lat")
    lon = F.col("location.geo.lon")
    ma = "enrichment.market_analysis"
    reasons = F.array_compact(
        F.array(
            F.when(F.col("id").isNull(), "null_doc_id"),
            F.when(
                F.col("location.geo").isNotNull()
                & ((F.abs(lat) > 90) | (F.abs(lon) > 180)),
                "geo_out_of_range",
            ),
            F.when(
                _nonfinite(F.col("price.amount"))
                | _nonfinite(F.col(f"{ma}.composite_z_score"))
                | _nonfinite(F.col(f"{ma}.estimated_market_value")),
                "nonfinite_number",
            ),
        )
    )
    tagged = docs.withColumn("reject_reasons", reasons)
    valid = tagged.filter(F.size("reject_reasons") == 0).drop("reject_reasons")
    rejects = tagged.filter(F.size("reject_reasons") > 0)
    return valid, rejects


def parse_bulk_response(
    response: dict, doc_ids: list[str | None]
) -> tuple[list[str | None], list[tuple[str | None, str]]]:
    """Per-item tolerance for the sink's bulk response — NEVER raises.

    Mirrors ``ingestion/bulk_ingest.py:96-108``: when ES answers 200 with
    ``errors: true`` the reference reports and continues — individual
    document failures never interrupt the run. This is the engine twin a
    ``foreachPartition`` writer calls per posted batch: ES's ``items``
    array is in request order, so item *i* correlates to ``doc_ids[i]``.

    Returns ``(acked_ids, failed)`` where ``failed`` pairs each rejected
    doc id with ``"<error.type>: <error.reason>"`` — the dead-letter
    payload (the pre-sink classifier :func:`split_for_bulk` catches the
    *predictable* rejects; this catches whatever the live mapping still
    refuses). A malformed/partial response fails the WHOLE batch as
    retryable rather than guessing per-doc outcomes.
    """
    if "_transport_error" in response:
        reason = f"batch_retryable: transport: {response['_transport_error']}"
        return [], [(d, reason) for d in doc_ids]
    items = response.get("items")
    if not isinstance(items, list) or len(items) != len(doc_ids):
        return [], [(d, "batch_retryable: malformed bulk response") for d in doc_ids]
    acked: list[str | None] = []
    failed: list[tuple[str | None, str]] = []
    for doc_id, item in zip(doc_ids, items):
        # one action per item: {"index": {...}} (or create/update)
        action = next(iter(item.values())) if isinstance(item, dict) and item else {}
        status = action.get("status", 0) if isinstance(action, dict) else 0
        if isinstance(status, int) and 200 <= status < 300:
            acked.append(doc_id)
        else:
            err = action.get("error", {}) if isinstance(action, dict) else {}
            reason = (
                f"{err.get('type', 'unknown')}: {err.get('reason', 'unknown')}"
                if isinstance(err, dict)
                else str(err)
            )
            failed.append((doc_id, reason))
    return acked, failed


def bulk_deliver(
    docs: DataFrame,
    post,
    index_alias: str = INDEX_ALIAS,
    chunk: int = 1000,
) -> DataFrame:
    """Distributed bulk delivery with per-document outcomes — the engine
    twin of the reference's ``send_batch`` loop (``ingestion/
    bulk_ingest.py:50-108,171-190``): each partition slices its docs
    into ``chunk``-sized bulk bodies (reference chunks at 1000), POSTs
    via the pluggable ``post(body) -> response dict`` (requests in
    production, a fake in tests), and classifies every doc from the
    response through :func:`parse_bulk_response` — partial failures
    never interrupt the run.

    Returns ``DataFrame[doc_id, status]`` with ``status='acked'`` or
    the per-item failure reason — the caller writes the non-acked rows
    to the dead-letter path. ``mapPartitions`` is the honest executor
    here (imperative per-partition I/O, the one RDD-API use case);
    delivery state never converges on the driver, so the fan-out scales
    with executors exactly like the committer it replaces."""
    action = json.dumps({"index": {"_index": index_alias}})
    payload = docs.select(
        F.col("id").cast("string").alias("_doc_id"),
        F.to_json(F.struct(*[F.col(c) for c in docs.columns])).alias("_doc"),
    )

    def run(rows):
        ids: list[str | None] = []
        lines: list[str] = []

        def flush():
            if not ids:
                return
            # transport-level failures (timeout, connection refused) are
            # tolerated like the reference's catch-all (bulk_ingest.py:
            # 106-108): the whole chunk becomes retryable, the job never
            # fails — otherwise one unreachable-sink moment fails the
            # batch AFTER the lake append and a retry double-indexes
            try:
                resp = post("\n".join(lines) + "\n")
            except Exception as e:  # noqa: BLE001 — sink faults must not kill the job
                resp = {"_transport_error": str(e)[:200]}
            acked, failed = parse_bulk_response(resp, list(ids))
            ids.clear()
            lines.clear()
            for doc_id in acked:
                yield (doc_id, "acked")
            for doc_id, reason in failed:
                yield (doc_id, reason)

        for row in rows:
            ids.append(row._doc_id)
            lines.extend((action, row._doc))
            if len(ids) >= chunk:
                yield from flush()
        yield from flush()

    # explicit schema: toDF([names]) infers via rdd.first(), an EAGER job
    # that would run partition 0's side-effecting POSTs once at
    # construction time (then again at the real action — duplicate
    # documents under auto-id) and crash outright on an empty batch
    return docs.sparkSession.createDataFrame(
        payload.rdd.mapPartitions(run), "doc_id string, status string"
    )


def to_bulk_ndjson(docs: DataFrame, index_alias: str = INDEX_ALIAS) -> DataFrame:
    """ES Bulk-API NDJSON body (``ingestion/bulk_ingest.py:171-190``).

    One output row per document: the action line and the document line
    joined by ``\\n``, so ``df.write.text`` emits exactly the alternating
    action/doc stream ``send_batch`` posts (the text sink appends the
    row-terminating newline, including the bulk body's mandatory trailing
    one). Batching is the writer's concern — reference chunks at 1000 docs
    (``bulk_ingest.py:42``); Spark-side the natural unit is the partition.

    ``to_json`` omits null fields, matching the dynamic-mapping open-world
    contract (absent field ≡ null in ES).
    """
    action = json.dumps({"index": {"_index": index_alias}})
    doc = F.to_json(F.struct(*[F.col(c) for c in docs.columns]))
    return docs.select(F.concat(F.lit(action + "\n"), doc).alias("value"))
