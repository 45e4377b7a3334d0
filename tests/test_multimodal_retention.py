"""Multimodal plumbing (schema/batching/multi-emit) + retention job."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    documents_as_media,
    extract_features,
    frame_sample,
    resize_media,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.operators.retention import (
    drop_expired,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.sources.readers import (
    load_table,
    write_partitioned,
)


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_media_schema_and_features(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    assert [f.name for f in media.schema.fields] == [f.name for f in MEDIA_SCHEMA.fields]
    feats = extract_features(media)
    row = feats.orderBy("media_id").first()
    src = load_table(spark, sf_dir, "documents").orderBy("doc_id").first()
    payload = src.text.encode("utf-8")
    assert row.n_bytes == len(payload)
    assert row.digest == hashlib.md5(payload).hexdigest()
    assert row.f0 == int(row.digest[0:2], 16)


def test_frame_sample_multi_emit(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(5)
    frames = frame_sample(media, every_n_bytes=64)
    per = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    sizes = {r.media_id: r.nb for r in media.select("media_id", F.octet_length("payload").alias("nb")).collect()}
    for mid, nb in sizes.items():
        assert per[mid] == (nb + 63) // 64


def test_resize_bounds_and_digest(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(5)
    thumbs = resize_media(media, target_bytes=32)
    rows = thumbs.collect()
    src = {
        r.media_id: bytes(r.payload)
        for r in media.select("media_id", "payload").collect()
    }
    assert len(rows) == len(src)
    for r in rows:
        expect = src[r.media_id][:32]
        assert bytes(r.thumb) == expect
        assert len(r.thumb) <= 32
        assert r.orig_bytes == len(src[r.media_id])
        assert r.thumb_digest == hashlib.md5(expect).hexdigest()


def test_retention_partition_drop(spark, tmp_path):
    df = spark.range(10).withColumn(
        "ingest_date",
        F.when(F.col("id") < 5, "2026-07-01").otherwise("2026-08-12"),
    )
    path = str(tmp_path / "tbl")
    write_partitioned(df, path)
    dropped = drop_expired(path, retain_days=30, today=dt.date(2026, 8, 13))
    assert dropped == ["ingest_date=2026-07-01"]
    left = spark.read.parquet(path)
    assert left.count() == 5 and left.select("ingest_date").distinct().count() == 1
