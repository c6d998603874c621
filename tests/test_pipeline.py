"""End-to-end pipeline: checkpoint/resume, lineage metrics, leakage-freedom,
byte-stable text (BASELINE.json north_rule acceptance criteria)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from trafaret_spark import datagen
from trafaret_spark.checkpoint import Manifest, bucket_metrics
from trafaret_spark.pipeline import PipelineConfig, run_pipeline


@pytest.fixture()
def paths(tmp_path):
    return {"output_path": str(tmp_path / "out"),
            "quarantine_path": str(tmp_path / "quar"),
            "manifest_dir": str(tmp_path / "manifest")}


def _inputs(spark, n_convs=40):
    tr = datagen.transcripts(spark, n_convs=n_convs, hot_convs=1, hot_turns=500)
    ev = datagen.conv_events(spark, n_convs=n_convs)
    return tr, ev


class TestPipeline:
    def test_run_resume_noop_partial(self, spark, paths):
        tr, ev = _inputs(spark)
        cfg = PipelineConfig(n_buckets=8, **paths)
        s1 = run_pipeline(spark, tr, ev, cfg)
        assert s1["buckets_done"] == 8 and not s1["resumed_noop"]
        assert s1["n_rows"] == tr.count()
        assert s1["n_valid"] == s1["n_rows"]  # clean input: nothing quarantined

        s2 = run_pipeline(spark, tr, ev, cfg)
        assert s2["resumed_noop"]

        os.remove(os.path.join(paths["manifest_dir"], "bucket=3.json"))
        s3 = run_pipeline(spark, tr, ev, cfg)
        assert not s3["resumed_noop"] and s3["buckets_this_run"] == 1
        assert s3["n_rows"] == s1["n_rows"]

    def test_quarantine_and_metrics(self, spark, paths):
        tr, ev = _inputs(spark)
        raw = datagen.to_raw_strings(tr, dirty_frac=0.05)
        cfg = PipelineConfig(n_buckets=4, **paths)
        s = run_pipeline(spark, raw, ev, cfg)
        assert s["n_quarantined"] > 0
        assert s["n_valid"] + s["n_quarantined"] == s["n_rows"]
        q = spark.read.parquet(paths["quarantine_path"])
        assert q.count() == s["n_quarantined"]
        # every manifest carries lineage + per-code metrics
        m = Manifest(paths["manifest_dir"], 4)
        rec = m.read(0)
        assert rec["lineage"]["engine_version"]
        assert rec["metrics"]["n_rows"] > 0
        codes = set()
        for b in range(4):
            codes |= set((m.read(b)["metrics"].get("error_codes") or {}))
        assert "does_not_match_any" in codes  # dirty role values

    def test_text_byte_equal_under_stable_order(self, spark, paths):
        """Per-turn text byte-equality under (conv_id, turn_idx) order."""
        tr, ev = _inputs(spark)
        cfg = PipelineConfig(n_buckets=4, **paths)
        run_pipeline(spark, tr, ev, cfg)
        out = spark.read.parquet(paths["output_path"]) \
            .orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
        src = tr.orderBy("conv_id", "turn_idx") \
            .select("conv_id", "turn_idx", "text")
        got = [(r.conv_id, r.turn_idx, r.text) for r in out.collect()]
        want = [(r.conv_id, r.turn_idx, r.text) for r in src.collect()]
        assert got == want

    def test_zero_temporal_leakage_prefix_invariance(self, spark, paths):
        """Features on a time-truncated table equal the full-table features
        for the surviving prefix rows — no feature reads the future."""
        tr, ev = _inputs(spark, n_convs=20)
        cfg = PipelineConfig(n_buckets=4, **paths)
        run_pipeline(spark, tr, ev, cfg)
        full = spark.read.parquet(paths["output_path"])

        cutoff = tr.agg(F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.6)")) \
            .collect()[0][0]
        cut_expr = F.unix_micros(F.col("ts").cast("timestamp")) <= cutoff
        feat_cols = ["text_len_lag1", "role_lag1", "text_len_avg5",
                     "tool_turns_30m", "session_id", "tool_ffill",
                     "chars_so_far", "score", "state"]
        key = ["conv_id", "turn_idx"]
        # materialize before the output dir is rewritten below
        a = {tuple(r[k] for k in key): tuple(r[c] for c in feat_cols)
             for r in full.filter(cut_expr).select(*key, *feat_cols).collect()}

        for d in paths.values():
            shutil.rmtree(d, ignore_errors=True)
        run_pipeline(spark, tr.filter(cut_expr), ev, cfg)
        prefix = spark.read.parquet(paths["output_path"])
        b = {tuple(r[k] for k in key): tuple(r[c] for c in feat_cols)
             for r in prefix.select(*key, *feat_cols).collect()}
        assert a == b


class TestBucketMetrics:
    def test_counts(self, spark):
        tr = datagen.to_raw_strings(
            datagen.transcripts(spark, n_convs=20), dirty_frac=0.1)
        import trafaret_spark as ts
        from trafaret_spark.pipeline import transcript_schema
        from trafaret_spark import io as tio
        v = ts.apply_schema(tio.add_bucket(tr, "conv_id", 4).drop("bucket"),
                            transcript_schema(raw_ts=True))
        v = tio.add_bucket(v, "conv_id", 4)
        m = bucket_metrics(v).collect()
        assert sum(r.n_rows for r in m) == tr.count()
        assert all(r.n_rows == r.n_valid + r.n_quarantined for r in m)
        assert any(r.error_codes for r in m)
