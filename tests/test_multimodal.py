"""Multimodal plumbing: schema, batch shape, determinism, stub gating."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import PythonException

from trafaret_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, payload=bytes([i] * (i + 1))) for i in range(6)]
        + [Row(doc_id=99, payload=None)])


class TestMeta:
    def test_media_meta_struct(self, media):
        out = multimodal.with_media_meta(media, media_type="image", fmt="png")
        f = dict(zip(out.schema.fieldNames(), out.schema.fields))["media_meta"]
        assert isinstance(f.dataType, T.StructType)
        r = out.filter(F.col("doc_id") == 3).collect()[0].media_meta
        assert r.media_type == "image" and r.format == "png" and r.length == 4


class TestImageDecode:
    def test_real_path_raises_not_implemented(self, media):
        df = multimodal.decode_image_features(media, fake=False)
        with pytest.raises(PythonException, match="NotImplementedError"):
            df.collect()

    def test_fake_path_schema_and_determinism(self, media):
        out = multimodal.decode_image_features(media, dim=8, fake=True)
        rows = {r.doc_id: r for r in out.collect()}
        assert len(rows) == 7
        assert all(len(r.img_features) == 8 for r in rows.values())
        assert rows[99].decode_ok is False and rows[0].decode_ok is True
        rows2 = {r.doc_id: r for r in out.collect()}
        assert rows[3].img_features == rows2[3].img_features


class TestVideoFrames:
    def test_cardinality_expansion(self, media):
        out = multimodal.sample_video_frames(media, fake=True, every_ms=500,
                                             fake_duration_ms=2000)
        assert out.count() == 7 * 4
        one = out.filter(F.col("doc_id") == 2).orderBy("frame_idx").collect()
        assert [r.frame_idx for r in one] == [0, 1, 2, 3]
        assert [r.frame_ts_ms for r in one] == [0, 500, 1000, 1500]
        # frames of the same payload differ (per-frame salt)
        assert one[0].frame_features != one[1].frame_features


class TestAudio:
    def test_summary_row_per_payload(self, media):
        out = multimodal.audio_features(media, fake=True).collect()
        rows = {r.doc_id: r for r in out}
        assert rows[5].n_samples == 6
        # decode_ok=False ⇒ NULL metrics (same failure shape as the real path)
        assert rows[99].n_samples is None and rows[99].rms is None \
            and rows[99].duration_ms is None
        assert all(0 <= r.rms <= 1 for r in out if r.rms is not None)
        assert rows[99].decode_ok is False and rows[0].decode_ok is True

    @staticmethod
    def _wav_bytes(n_frames=8000, rate=8000, amp=0.5):
        import io
        import math
        import struct
        import wave
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            samples = [int(amp * 32767 * math.sin(2 * math.pi * 440 * i / rate))
                       for i in range(n_frames)]
            w.writeframes(struct.pack(f"<{n_frames}h", *samples))
        return buf.getvalue()

    def test_real_wav_path(self, spark):
        """The REAL audio path (stdlib wave fallback — no optional deps
        needed): a valid WAV decodes to its true duration/sample count and
        a sine's theoretical RMS (amp/√2); junk bytes → decode_ok=False
        with NULL metrics, not a task failure."""
        wav = self._wav_bytes(n_frames=8000, rate=8000, amp=0.5)
        df = spark.createDataFrame(
            [Row(doc_id=1, payload=wav),
             Row(doc_id=2, payload=b"RIFFnot actually audio"),
             Row(doc_id=3, payload=None)])
        rows = {r.doc_id: r for r in
                multimodal.audio_features(df, fake=False).collect()}
        assert rows[1].decode_ok is True
        assert rows[1].duration_ms == 1000 and rows[1].n_samples == 8000
        assert abs(rows[1].rms - 0.5 / 2 ** 0.5) < 1e-3
        assert rows[2].decode_ok is False and rows[2].rms is None
        assert rows[3].decode_ok is False

    def test_wave_only_decoder_rejects_non_riff_loudly(self, spark):
        """With only the stdlib wave codec, a non-RIFF corpus must fail
        loudly (missing codec), not silently mark every row
        decode_ok=False."""
        try:
            import soundfile  # noqa: F401
            pytest.skip("soundfile present — wave-only path not reachable")
        except ImportError:
            pass
        df = spark.createDataFrame([Row(doc_id=1, payload=b"ID3mp3bytes")])
        with pytest.raises(PythonException, match="NotImplementedError"):
            multimodal.audio_features(df, fake=False).collect()


class TestVideoRealProbe:
    def test_raises_without_ffmpeg_only(self, media):
        """Real video path is gated on the ffmpeg binary probe: in this
        container it is absent, so the kernel raises per batch; when
        present the same kernel decodes via _ffmpeg_frames (unit-testable
        only where ffmpeg exists)."""
        if multimodal._probe_ffmpeg() is None:
            df = multimodal.sample_video_frames(media, fake=False)
            with pytest.raises(PythonException, match="NotImplementedError"):
                df.collect()
        else:  # pragma: no cover - container-dependent
            out = multimodal.sample_video_frames(media, fake=False)
            assert out.count() == 0  # junk payloads decode to zero frames
