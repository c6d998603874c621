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
        assert rows[99].n_samples == 0
        assert all(0 <= r.rms <= 1 for r in out)
