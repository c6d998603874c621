"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media travel as opaque ``binary`` payloads plus a typed metadata struct —
the Spark-native layout for 100 TB multimodal corpora (payload bytes never
pass through Python row-at-a-time; each Arrow batch moves as one buffer).

The actual codecs are OPTIONAL dependencies, probed at runtime on the
executors: images probe Pillow (``_probe_pil``), video probes the ffmpeg
binary (``_probe_ffmpeg``), audio probes soundfile with a stdlib-``wave``
fallback (``_probe_audio`` — the WAV path is real with zero extra deps).
When a codec is present the real decode runs and bad bytes yield
``decode_ok=False`` (or zero sampled frames) instead of failing the task;
when absent the kernel raises ``NotImplementedError`` per batch unless
``fake=True``, which runs a deterministic hash-derived fake decode with
identical schema and batching, so the Spark-side plumbing — schema,
``mapInPandas`` batch shape, partition sizing — is real and testable
either way.

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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_TYPE", "with_media_meta", "decode_image_features",
    "sample_video_frames", "audio_features", "phash_images",
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


def _probe_pil():
    """Import Pillow if available (executor-side probe; never a hard dep)."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


def _fake_vec(payload: bytes, dim: int) -> list:
    """Deterministic pseudo-feature vector from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    raw = (d * (dim * 4 // len(d) + 1))[: dim * 4]
    return [int.from_bytes(raw[i * 4:(i + 1) * 4], "little") / 2**32
            for i in range(dim)]


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id", dim: int = 16,
                          fake: bool = False) -> DataFrame:
    """payload → decoded-image feature vector, via mapInPandas.

    Real path (Pillow importable on the executor): decode → grayscale →
    resize to a √dim×√dim thumbnail → [0,1] pixel vector; a row that fails
    to decode yields ``decode_ok=False`` + NULL features rather than
    failing the task (bad bytes are data, not bugs, at corpus scale).
    Without Pillow the kernel raises NotImplementedError per batch unless
    ``fake=True``, which runs the deterministic hash stub with identical
    schema/batching (the plumbing under test in this container).
    """
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("img_features", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ])
    side = max(1, int(dim ** 0.5))

    def _real_vec(image_mod, payload: bytes):
        import io
        try:
            img = image_mod.open(io.BytesIO(payload)).convert("L")
            img = img.resize((side, side))
            px = list(img.getdata())
            vec = [p / 255.0 for p in px][:dim]
            return vec + [0.0] * (dim - len(vec)), True
        except Exception:
            return None, False

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if fake else _probe_pil()
        for pdf in batches:
            if fake:
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "img_features": [_fake_vec(p, dim) for p in pdf[payload_col]],
                    "decode_ok": [p is not None for p in pdf[payload_col]],
                })
                continue
            if image_mod is None:
                raise NotImplementedError(
                    "image decode requires Pillow on the executors — "
                    "not in this container; pass fake=True for plumbing tests")
            feats, oks = [], []
            for p in pdf[payload_col]:
                v, ok = (None, False) if p is None else _real_vec(image_mod, p)
                feats.append(v)
                oks.append(ok)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "img_features": feats, "decode_ok": oks})

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def _probe_ffmpeg():
    """Locate the ffmpeg binary if present (executor-side probe)."""
    import shutil
    return shutil.which("ffmpeg")


def _ffmpeg_frames(ffmpeg: str, payload: bytes, every_ms: int, side: int):
    """Real frame sampling: payload → list of (ts_ms, [0,1] gray vectors)
    via one ffmpeg subprocess (fps filter + rawvideo gray thumbnails).
    Returns None when the bytes don't decode — bad bytes are data, not
    bugs, at corpus scale."""
    import subprocess
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(payload or b"")
        f.flush()
        try:
            proc = subprocess.run(
                [ffmpeg, "-v", "error", "-i", f.name,
                 "-vf", f"fps=1000/{every_ms},scale={side}:{side}",
                 "-pix_fmt", "gray", "-f", "rawvideo", "-"],
                capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    if proc.returncode != 0 or not proc.stdout:
        return None
    frame_len = side * side
    n = len(proc.stdout) // frame_len
    return [(i * every_ms,
             [b / 255.0 for b in proc.stdout[i * frame_len:(i + 1) * frame_len]])
            for i in range(n)]


def sample_video_frames(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "doc_id", every_ms: int = 1000,
                        fake: bool = False,
                        fake_duration_ms: int = 5000) -> DataFrame:
    """payload → one row per sampled frame (cardinality-expanding decode).

    Output: (id, frame_idx, frame_ts_ms, frame_features). Real path probes
    the ffmpeg binary at runtime (the same optional-codec pattern as
    decode_image_features' Pillow probe): every_ms-spaced frames are
    decoded to √64×√64 gray thumbnails and emitted as [0,1] pixel
    vectors; undecodable payloads contribute ZERO rows (sampling
    semantics). Without ffmpeg the kernel raises NotImplementedError per
    batch unless ``fake=True``, which synthesizes
    ``fake_duration_ms / every_ms`` frames with hash-derived features —
    same schema, same expansion shape.
    """
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_features", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ffmpeg = None if fake else _probe_ffmpeg()
        for pdf in batches:
            if not fake and ffmpeg is None:
                raise NotImplementedError(
                    "video decode requires the ffmpeg binary on the "
                    "executors — not in this container; pass fake=True "
                    "for plumbing tests")
            rows = {k: [] for k in (id_col, "frame_idx", "frame_ts_ms",
                                    "frame_features")}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if fake:
                    n = max(1, fake_duration_ms // every_ms)
                    frames = [(i * every_ms,
                               _fake_vec((payload or b"")
                                         + i.to_bytes(4, "little"), 8))
                              for i in range(n)]
                else:
                    frames = _ffmpeg_frames(ffmpeg, payload, every_ms, 8) or []
                for i, (ts_ms, vec) in enumerate(frames):
                    rows[id_col].append(rid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(ts_ms)
                    rows["frame_features"].append(vec)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def _probe_audio():
    """Best-available real audio decoder: soundfile if importable, else the
    stdlib ``wave`` module (WAV-only). Returns ("sf", mod) / ("wave", mod)
    / None."""
    try:
        import soundfile  # noqa: PLC0415
        return ("sf", soundfile)
    except ImportError:
        pass
    try:
        import wave  # noqa: PLC0415
        return ("wave", wave)
    except ImportError:
        return None


def _real_audio(decoder, payload: bytes):
    """(duration_ms, rms, n_samples) or None if the bytes don't decode.

    The stdlib-wave fallback only CLAIMS WAV (RIFF magic): handing it a
    non-RIFF payload raises NotImplementedError rather than returning
    None — otherwise an MP3/FLAC corpus on executors without soundfile
    would 'succeed' with decode_ok=False on every row (a silent
    full-corpus data-quality wipeout instead of a loud missing-codec
    failure)."""
    import io
    kind, mod = decoder
    if kind == "wave" and not (payload or b"").startswith(b"RIFF"):
        raise NotImplementedError(
            "non-WAV audio payload but only the stdlib wave codec is "
            "available — install soundfile on the executors (or pass "
            "fake=True for plumbing tests)")
    try:
        if kind == "sf":
            data, rate = mod.read(io.BytesIO(payload), dtype="float64",
                                  always_2d=True)
            n = data.shape[0]
            if n == 0 or rate <= 0:
                return None
            rms = float(np.sqrt(np.mean(np.square(data))))
            return int(n * 1000 / rate), rms, n
        with mod.open(io.BytesIO(payload), "rb") as w:
            n, rate = w.getnframes(), w.getframerate()
            width = w.getsampwidth()
            raw = w.readframes(n)
        if n == 0 or rate <= 0 or width not in (1, 2, 4):
            return None
        dt = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        samples = np.frombuffer(raw, dtype=dt).astype(np.float64)
        if width == 1:
            samples = (samples - 128.0) / 128.0
        else:
            samples = samples / float(2 ** (8 * width - 1))
        rms = float(np.sqrt(np.mean(np.square(samples)))) if len(samples) else 0.0
        return int(n * 1000 / rate), rms, n
    except Exception:
        return None


def audio_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """payload → (id, duration_ms, rms, n_samples, decode_ok) summary row.

    Real path probes soundfile, falling back to the stdlib ``wave`` module
    (WAV-only — genuinely real, zero extra deps); a payload that fails to
    decode yields ``decode_ok=False`` + NULL metrics rather than failing
    the task. ``fake=True`` derives deterministic values from the payload's
    sha256 (reproducible in SQL — the driver oracle recomputes them)."""
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = None if fake else _probe_audio()
        for pdf in batches:
            if not fake and decoder is None:
                raise NotImplementedError(
                    "audio decode requires soundfile or the stdlib wave "
                    "module on the executors; pass fake=True for plumbing "
                    "tests")
            if fake:
                # failure-shape parity with the real decoder: decode_ok=False
                # (NULL payload) ⇒ all metric columns NULL
                dig = [None if p is None else hashlib.sha256(p).digest()
                       for p in pdf[payload_col]]
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "duration_ms": [None if d is None
                                    else int.from_bytes(d[:4], "little") % 60000
                                    for d in dig],
                    "rms": [None if d is None
                            else int.from_bytes(d[4:8], "little") / 2**32
                            for d in dig],
                    "n_samples": [None if p is None else len(p)
                                  for p in pdf[payload_col]],
                    "decode_ok": [p is not None for p in pdf[payload_col]],
                })
                continue
            out = {k: [] for k in (id_col, "duration_ms", "rms",
                                   "n_samples", "decode_ok")}
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                res = None if p is None else _real_audio(decoder, p)
                out[id_col].append(rid)
                if res is None:
                    out["duration_ms"].append(None)
                    out["rms"].append(None)
                    out["n_samples"].append(None)
                    out["decode_ok"].append(False)
                else:
                    out["duration_ms"].append(res[0])
                    out["rms"].append(res[1])
                    out["n_samples"].append(res[2])
                    out["decode_ok"].append(True)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def phash_images(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Perceptual hash per image payload → ``(id, phash bigint,
    decode_ok)`` — the standard multimodal dedup fingerprint: visually
    near-identical images (recompression, mild resize) hash within a few
    bits, so corpus-scale image dedup becomes
    :func:`dedup.fingerprint_neardup` over this column — banded bucket
    join + Hamming verify, never pixels against pixels.

    Real path (Pillow on the executors): decode → grayscale → 32×32 →
    2-D DCT-II (numpy basis matmul — no scipy) → top-left 8×8 low-
    frequency block → bit_i = coeff_i > median of the 63 non-DC coeffs,
    packed big-endian into one signed int64 (Hamming distance via
    ``bit_count(a XOR b)`` is sign-agnostic). Undecodable bytes yield
    ``decode_ok=False`` + NULL hash, not a task failure.

    ``fake=True`` (no Pillow in this container): a deterministic
    md5-derived 60-bit value per payload (the `_sql_hash60` convention,
    so a DuckDB oracle reproduces it bit-for-bit) — identical schema and
    batching; exact payload duplicates still collide, which is what the
    plumbing tests and the driver oracle exercise.
    """
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("phash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ])

    def _fake_hash(payload: bytes) -> int:
        return int(hashlib.md5(payload).hexdigest()[:15], 16)

    def _real_hash(image_mod, payload: bytes):
        import io
        try:
            img = image_mod.open(io.BytesIO(payload)).convert("L")
            img = img.resize((32, 32))
            px = np.asarray(img, dtype=np.float64)
        except Exception:
            return None, False
        n = 32
        k = np.arange(n)
        basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        low = (basis @ px @ basis.T)[:8, :8].ravel()
        med = np.median(low[1:])
        bits = (low > med).astype(np.uint64)
        h = 0
        for b in bits:
            h = (h << 1) | int(b)
        # two's-complement fold into signed int64
        return h - (1 << 64) if h >= (1 << 63) else h, True

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if fake else _probe_pil()
        for pdf in batches:
            if fake:
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "phash": [None if p is None else _fake_hash(p)
                              for p in pdf[payload_col]],
                    "decode_ok": [p is not None for p in pdf[payload_col]],
                })
                continue
            if image_mod is None:
                raise NotImplementedError(
                    "pHash requires Pillow on the executors — not in this "
                    "container; pass fake=True for plumbing tests")
            hs, oks = [], []
            for p in pdf[payload_col]:
                h, ok = (None, False) if p is None else _real_hash(image_mod, p)
                hs.append(h)
                oks.append(ok)
            yield pd.DataFrame({id_col: pdf[id_col], "phash": hs,
                                "decode_ok": oks})

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)
