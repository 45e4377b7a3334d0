"""Multimodal column plumbing (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The image/audio codecs are NOT
in this container, so the decode step is STUBBED — clearly marked,
raising ``NotImplementedError`` unless the deterministic fake decoder
is requested — while everything Spark-side (schema, batch iteration,
UDF signatures, partitioning) is real and tested.

Scale: mapInPandas streams Arrow batches — constant memory per task,
no collect; payload bytes never cross a shuffle (all derivations are
map-side). For real codecs, swap ``_fake_decode`` for PIL/ffmpeg calls
inside the same batch loop.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every payload (SURVEY §1.2 analog).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("f0", T.IntegerType()),
        T.StructField("f1", T.IntegerType()),
        T.StructField("f2", T.IntegerType()),
        T.StructField("f3", T.IntegerType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real image decode needs PIL/opencv (not in this container).

    The Spark plumbing around this call (batching, schema, partitioning)
    is real; swap in a codec to productionize."""
    raise NotImplementedError(
        "image codec not available in this environment - use fake=True paths"
    )


def _fake_decode(payload: bytes) -> tuple[int, str, list[int]]:
    """Deterministic fake decoder: md5-derived pseudo-features standing
    in for pixel statistics — stable across engines and runs."""
    digest = hashlib.md5(payload).hexdigest()
    feats = [int(digest[i * 2 : i * 2 + 2], 16) for i in range(4)]
    return len(payload), digest, feats


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the payload bytes inside the executor; only
    the small feature row leaves the stage."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [r[0] for r in rows],
                    "digest": [r[1] for r in rows],
                    "f0": [r[2][0] for r in rows],
                    "f1": [r[2][1] for r in rows],
                    "f2": [r[2][2] for r in rows],
                    "f3": [r[2][3] for r in rows],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled offset
    (multi-emit per input row — the UDTF shape). The 'frame' is a fake
    byte-slice digest; a real implementation decodes at the same
    offsets."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, digests = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                for k, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(mid)
                    nos.append(k)
                    digests.append(
                        hashlib.md5(data[off : off + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame_digest": digests}
            )

    return media.mapInPandas(_sample, schema=out_schema)


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize/thumbnail plumbing: emits a bounded-size derivative per
    payload (truncate-and-digest as the deterministic fake; a real
    implementation decodes, scales, and re-encodes inside the same
    batch loop). Output carries the derivative payload so a downstream
    sink can persist thumbnails — the one multimodal stage whose output
    is itself media."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("orig_bytes", T.IntegerType()),
            T.StructField("thumb", T.BinaryType()),
            T.StructField("thumb_digest", T.StringType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            origs, thumbs, digests = [], [], []
            for payload in pdf["payload"]:
                data = bytes(payload)
                thumb = data[:target_bytes]
                origs.append(len(data))
                thumbs.append(thumb)
                digests.append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_bytes": origs,
                    "thumb": thumbs,
                    "thumb_digest": digests,
                }
            )

    return media.mapInPandas(_resize, schema=out_schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the
    multimodal path is exercisable on the driver's tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
    )
