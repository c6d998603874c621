"""Round-4 pins: advice fixes (asof broadcast float normalization, audio
fake-path failure shape, check(None) typed probe) and the new
observability / robustness surfaces added this round."""

import math

import pytest
from pyspark.sql import Row, functions as F, types as T

import trafaret_spark as ts
from trafaret_spark.operators import multimodal
from trafaret_spark.operators.asof import asof_join


class TestAsofBroadcastFloatNormalization:
    """strategy='broadcast' groups left rows, so Spark's
    NormalizeFloatingNumbers canonicalizes -0.0 → 0.0 and NaN; 'sort'
    passes the bytes through. Both strategies must agree on MATCHES."""

    @pytest.fixture(scope="class")
    def frames(self, spark):
        left = spark.createDataFrame(
            [("c1", 10.0, -0.0), ("c1", 20.0, float("nan")),
             ("c1", 30.0, 0.5)],
            "conv_id string, ts double, val double")
        right = spark.createDataFrame(
            [("c1", 5.0, "a"), ("c1", 15.0, "b"), ("c1", 25.0, "c")],
            "conv_id string, ts double, state string")
        return left, right

    def _collect(self, left, right, strategy):
        out = asof_join(left, right, on="ts", by="conv_id",
                        direction="backward", strategy=strategy)
        return {r.ts: r for r in out.collect()}

    def test_matches_agree_across_strategies(self, frames):
        left, right = frames
        b = self._collect(left, right, "broadcast")
        s = self._collect(left, right, "sort")
        assert {t: r.state for t, r in b.items()} \
            == {t: r.state for t, r in s.items()} \
            == {10.0: "a", 20.0: "b", 30.0: "c"}

    def test_broadcast_normalizes_negative_zero(self, frames):
        left, right = frames
        b = self._collect(left, right, "broadcast")
        s = self._collect(left, right, "sort")
        # broadcast: -0.0 comes back as +0.0 (documented normalization)
        assert b[10.0].val == 0.0 and math.copysign(1.0, b[10.0].val) == 1.0
        # sort: left bytes untouched, sign of zero preserved
        assert s[10.0].val == 0.0 and math.copysign(1.0, s[10.0].val) == -1.0

    def test_nan_left_value_survives_both(self, frames):
        left, right = frames
        for strategy in ("broadcast", "sort"):
            row = self._collect(left, right, strategy)[20.0]
            assert math.isnan(row.val) and row.state == "b"


class TestAudioFakeFailureShape:
    """fake=True must carry the real decoder's contract: decode_ok=False
    (NULL payload) ⇒ every metric column NULL."""

    def test_null_payload_nulls_metrics(self, spark):
        df = spark.createDataFrame(
            [(1, b"RIFFjunk"), (2, None)],
            T.StructType([T.StructField("doc_id", T.LongType()),
                          T.StructField("payload", T.BinaryType())]))
        rows = {r.doc_id: r for r in
                multimodal.audio_features(df, fake=True).collect()}
        ok = rows[1]
        assert ok.decode_ok and ok.duration_ms is not None \
            and ok.rms is not None and ok.n_samples == 8
        bad = rows[2]
        assert bad.decode_ok is False
        assert bad.duration_ms is None and bad.rms is None \
            and bad.n_samples is None


class TestCheckNoneTypedProbe:
    """check(None) routes through the guard's natural column type, so the
    error code matches what a NULL in a typed table column produces."""

    def test_typed_guards_report_required(self, spark):
        for guard in (ts.Int(), ts.Float(), ts.Bool(), ts.DateTime(),
                      ts.String()):
            with pytest.raises(ts.GuardError) as ei:
                guard.check(None, spark=spark)
            assert ei.value.errors["x"][0] == "required"

    def test_probe_dtypes(self):
        assert isinstance(ts.Int()._null_probe_dtype(), T.LongType)
        assert isinstance(ts.Float()._null_probe_dtype(), T.DoubleType)
        assert isinstance(ts.Bool()._null_probe_dtype(), T.BooleanType)
        assert isinstance(ts.DateTime()._null_probe_dtype(), T.TimestampType)
        assert isinstance(ts.Date()._null_probe_dtype(), T.DateType)
        assert isinstance(ts.Bytes()._null_probe_dtype(), T.BinaryType)
        assert isinstance(ts.String()._null_probe_dtype(), T.StringType)
        # wrappers delegate to the (left/inner) guard
        assert isinstance((ts.Int() & ts.Int(gte=0))._null_probe_dtype(),
                          T.LongType)
        assert isinstance(
            ts.OnError(ts.Float(), "bad")._null_probe_dtype(), T.DoubleType)

    def test_accepts_null_guards_still_pass(self, spark):
        assert ts.ToBool().check(None, spark=spark) is False
        assert ts.Null().check(None, spark=spark) is None
        assert ts.Any().check(None, spark=spark) is None
