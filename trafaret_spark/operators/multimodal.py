"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media travel as opaque ``binary`` payloads plus a typed metadata struct —
the Spark-native layout for 100 TB multimodal corpora (payload bytes never
pass through Python row-at-a-time; each Arrow batch moves as one buffer).

The actual codecs (PIL/ffmpeg/soundfile) are NOT present in this
environment, so the decode kernels are STUBS: ``decode_image`` etc. raise
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
hash-derived fake decode runs so the Spark-side plumbing — schema,
``mapInPandas`` batch shape, partition sizing — is real and testable.

Design notes for scale:
  * ``mapInPandas`` (not a scalar pandas_udf) because decode changes
    cardinality (frame sampling) and width (feature columns).
  * Batches are capped by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
    for media set it low (e.g. 64) so a batch of payloads fits in worker
    memory — documented here because it is config, not code.
  * Binary payloads should be stored out-of-row at extreme sizes (pointer +
    range into an object store); the ``uri``/``offset``/``length`` fields in
    the metadata struct support that layout.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_TYPE", "with_media_meta", "decode_image_features",
    "sample_video_frames", "audio_features",
]

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_type", T.StringType()),    # image|audio|video
    T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("uri", T.StringType()),           # out-of-row pointer
    T.StructField("offset", T.LongType()),
    T.StructField("length", T.LongType()),
])


def with_media_meta(df: DataFrame, payload_col: str = "payload",
                    media_type: str = "image", fmt: str = "png") -> DataFrame:
    """Attach a typed metadata struct for an inline binary payload column."""
    return df.withColumn("media_meta", F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("string").alias("uri"),
        F.lit(0).cast("long").alias("offset"),
        F.length(F.col(payload_col)).cast("long").alias("length"),
    ))


def _fake_vec(payload: bytes, dim: int) -> list:
    """Deterministic pseudo-feature vector from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    raw = (d * (dim * 4 // len(d) + 1))[: dim * 4]
    return [int.from_bytes(raw[i * 4:(i + 1) * 4], "little") / 2**32
            for i in range(dim)]


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id", dim: int = 16,
                          fake: bool = False) -> DataFrame:
    """payload → resized-image feature vector, via mapInPandas.

    Real path requires PIL (absent here) → NotImplementedError per batch;
    ``fake=True`` runs the deterministic stub with identical schema/batching.
    """
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("img_features", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv — not in this container; "
                    "pass fake=True for plumbing tests")
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "img_features": [_fake_vec(p, dim) for p in pdf[payload_col]],
                "decode_ok": [p is not None for p in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def sample_video_frames(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "doc_id", every_ms: int = 1000,
                        fake: bool = False,
                        fake_duration_ms: int = 5000) -> DataFrame:
    """payload → one row per sampled frame (cardinality-expanding decode).

    Output: (id, frame_idx, frame_ts_ms, frame_features). Real path needs
    ffmpeg; fake path synthesizes ``fake_duration_ms / every_ms`` frames with
    hash-derived features — same schema, same expansion shape.
    """
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_features", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg — not in this container; "
                    "pass fake=True for plumbing tests")
            rows = {k: [] for k in (id_col, "frame_idx", "frame_ts_ms",
                                    "frame_features")}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                n = max(1, fake_duration_ms // every_ms)
                for i in range(n):
                    rows[id_col].append(rid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame_features"].append(
                        _fake_vec((payload or b"") + i.to_bytes(4, "little"), 8))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def audio_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """payload → (id, duration_ms, rms, n_samples) summary row.

    Real path needs soundfile/librosa; fake path derives deterministic
    values from the payload bytes."""
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires soundfile — not in this container; "
                    "pass fake=True for plumbing tests")
            dig = [hashlib.sha256(p or b"").digest() for p in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "duration_ms": [int.from_bytes(d[:4], "little") % 60000 for d in dig],
                "rms": [int.from_bytes(d[4:8], "little") / 2**32 for d in dig],
                "n_samples": [len(p or b"") for p in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)
