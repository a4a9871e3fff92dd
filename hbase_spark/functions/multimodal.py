"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
mapInPandas pipelines, partition sizing — while the actual codec work
is stubbed (the container has no image/audio libraries): pass
``fake=True`` for a deterministic fake decoder, or get a clear
NotImplementedError pointing at the integration seam.

Design for 100 TB of media:
- binary payloads stay in parquet; metadata columns (width/height/
  duration/codec) are queryable without touching payload bytes thanks
  to parquet column pruning;
- decode/feature steps are ``mapInPandas`` over Arrow batches so the
  (C-library) decoder amortizes per batch, not per row;
- ``maxRecordsPerBatch``/``files.maxPartitionBytes`` bound executor
  memory when payloads are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, media_id: int, dim: int = 8):
    """Deterministic fake 'decode': derives pixels from a hash of the
    payload so tests exercise the full pipeline shape."""
    h = hash((media_id, len(payload or b"")))
    vals = [((h >> (i * 7)) & 0xFF) / 255.0 for i in range(dim)]
    return {
        "width": 64,
        "height": 64,
        "mean_luma": sum(vals) / dim,
        "feature": [float(v) for v in vals],
    }


def decode_images(media: DataFrame, *, fake: bool = False, batch_dim: int = 8) -> DataFrame:
    """Decode image payloads into features via mapInPandas.

    Real decoders (PIL/libjpeg) plug in at the marked seam; the Spark
    plumbing — Arrow batching, schema, column pruning of untouched
    metadata — is identical either way.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; pass fake=True for the deterministic test decoder "
            "or plug a real decoder into _decode_batch"
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p, m, batch_dim)
                for p, m in zip(pdf["payload"], pdf["media_id"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_luma": [f["mean_luma"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        _decode_batch, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_images(
    media: DataFrame, *, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize image payloads (the thumbnail/normalize step of a vision
    training pipeline) via mapInPandas.

    Real resizer (PIL) plugs in at the seam; the fake path emits a
    deterministic payload derived from the source bytes + target dims
    so downstream stages (re-encode, dedup on resized bytes) are
    exercised end to end.
    """
    if not fake:
        raise NotImplementedError(
            "image resizing requires an image library not present in this "
            "container; pass fake=True for the deterministic test resizer "
            "or plug a real one into _resize_batch"
        )

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = [
                bytes([b % 256 for b in (len(p or b""), width, height)]) + (p or b"")[:16]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_resize_batch, RESIZED_SCHEMA)
    )


def extract_features(
    media: DataFrame, *, dim: int = 8, fake: bool = False
) -> DataFrame:
    """Embedding extraction over any media kind -> (media_id, kind,
    embedding array<float>) — the bridge from multimodal payloads into
    the similarity/ANN operators (functions/similarity.py).  Fake path
    derives a deterministic vector from the payload hash; a real model
    (CLIP et al.) plugs into the same Arrow-batched seam."""
    if not fake:
        raise NotImplementedError(
            "feature extraction requires a model runtime not present in "
            "this container; pass fake=True for the deterministic stub "
            "or plug a real encoder into _feat_batch"
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )

    def _feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = [
                _fake_decode(p, m, dim)["feature"]
                for p, m in zip(pdf["payload"], pdf["media_id"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": embs,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(_feat_batch, schema)


def sample_frames(media: DataFrame, *, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Stub decode; real plumbing: the explode of (media_id, frame_ts)
    happens JVM-side from duration metadata, so the expensive decoder
    only ever sees rows it must decode.
    """
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts"),
    )
    if not fake:
        # plumbing-only path: frame plan without pixel decode
        return frames
    return frames.withColumn(
        "frame_feature",
        F.array(*[(F.xxhash64("media_id", "frame_ts") % 1000) / 1000.0]),
    )


def make_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for pipeline tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(64)])
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "duration_ms": 5000 if kind == "video" else None,
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
