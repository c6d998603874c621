"""Structured Streaming: stateless validation on a stream, watermarked
session windows, and the custom applyInPandasWithState operator — all driven
through a file source with deterministic micro-batches."""

import os

import pytest
from pyspark.sql import functions as F

import trafaret_spark as ts
from trafaret_spark import datagen, streaming
from trafaret_spark.pipeline import transcript_schema


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = str(base / "src")
    os.makedirs(src, exist_ok=True)
    tr = datagen.transcripts(spark, n_convs=12, hot_convs=0, max_turns=30)
    # two deterministic micro-batch files, split by conversation hash
    tr.filter(F.crc32("conv_id") % 2 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/batch1")
    tr.filter(F.crc32("conv_id") % 2 == 1).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/batch2")
    # watermark flush: append-mode session windows emit only when the
    # watermark passes their end — a sentinel row 30 days ahead closes all
    # real windows before the finite stream stops
    flush = tr.groupBy().agg(F.max("ts").alias("m")).select(
        F.lit("__flush__").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"), F.lit("x").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("m") + F.expr("INTERVAL 30 DAYS")).alias("ts"))
    flush.coalesce(1).write.mode("overwrite").parquet(src + "/batch3")
    return spark, src, tr


def _read_stream(spark, path, schema):
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path + "/batch*"))


def _run(query):
    query.processAllAvailable()
    query.stop()


class TestStreamValidate:
    def test_stateless_validation_on_stream(self, stream_dirs):
        spark, src, tr = stream_dirs
        stream = _read_stream(spark, src, tr.schema)
        validated = streaming.validate_stream(stream, transcript_schema())
        q = (validated.writeStream.format("memory")
             .queryName("val_out").outputMode("append").start())
        _run(q)
        out = spark.sql("SELECT * FROM val_out") \
            .filter(F.col("conv_id") != "__flush__")
        assert out.count() == tr.count()
        # clean synthetic data: everything valid, schema carries errors col
        assert out.filter(F.size("errors") > 0).count() == 0
        assert dict(out.dtypes)["turn_idx"] == "bigint"  # coerced by ToInt


class TestStreamSessionize:
    def test_session_windows_match_batch_sessionizer(self, stream_dirs):
        spark, src, tr = stream_dirs
        stream = _read_stream(spark, src, tr.schema)
        sess = streaming.stream_sessionize(stream, gap_s=1800, watermark_s=7200)
        q = (sess.writeStream.format("memory")
             .queryName("sess_out").outputMode("append").start())
        _run(q)
        got = spark.sql(
            "SELECT conv_id, count(*) AS n_sessions, sum(n_turns) AS n_turns "
            "FROM sess_out GROUP BY conv_id").toPandas().set_index("conv_id")
        # batch oracle: ts-gap sessionizer over the same rows
        from trafaret_spark.operators import features
        batch = (features.Features(by="conv_id", order="turn_idx", ts="ts")
                 .session_id(1800).apply(tr)
                 .groupBy("conv_id")
                 .agg(F.countDistinct("session_id").alias("n_sessions"),
                      F.count(F.lit(1)).alias("n_turns"))
                 ).toPandas().set_index("conv_id")
        for conv in batch.index:
            assert got.loc[conv, "n_sessions"] == batch.loc[conv, "n_sessions"]
            assert got.loc[conv, "n_turns"] == batch.loc[conv, "n_turns"]


class TestStatefulOperator:
    def test_running_turn_stats_across_batches(self, stream_dirs):
        spark, src, tr = stream_dirs
        stream = _read_stream(spark, src, tr.schema)
        out = streaming.running_turn_stats(stream)
        q = (out.writeStream.format("memory")
             .queryName("stats_out").outputMode("update").start())
        _run(q)
        # last update per conversation = final running totals
        got = spark.sql("""
            SELECT conv_id, max(n_turns_total) AS n FROM stats_out
            GROUP BY conv_id""").toPandas().set_index("conv_id")
        expect = tr.groupBy("conv_id").count().toPandas().set_index("conv_id")
        for conv in expect.index:
            assert got.loc[conv, "n"] == expect.loc[conv, "count"]


class TestStreamDedup:
    def test_dedup_within_watermark_matches_batch_groups(self, stream_dirs,
                                                         tmp_path):
        spark, src, tr = stream_dirs
        # duplicate-heavy stream: two files, the second repeats the first's
        # texts (same normalized form) with later timestamps inside the
        # watermark window
        import os
        d = str(tmp_path / "dedup_src")
        os.makedirs(d, exist_ok=True)
        base = tr.limit(40).select("conv_id", "turn_idx", "text", "ts")
        base.coalesce(1).write.mode("overwrite").parquet(d + "/b1")
        base.withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 MINUTES")) \
            .withColumn("text", F.upper("text")) \
            .coalesce(1).write.mode("overwrite").parquet(d + "/b2")
        stream = (spark.readStream.schema(
            spark.read.parquet(d + "/b1").schema)
            .option("maxFilesPerTrigger", 1).parquet(d + "/b*"))
        out = streaming.stream_exact_dedup(stream, watermark_s=3600)
        q = (out.writeStream.format("memory")
             .queryName("dedup_out").outputMode("append").start())
        q.processAllAvailable()
        q.stop()
        got = spark.sql("SELECT dup_group, count(*) c FROM dedup_out "
                        "GROUP BY dup_group")
        # one survivor per normalized-text group (case change is identity)
        assert got.filter(F.col("c") > 1).count() == 0
        from trafaret_spark.operators import dedup as d_ops
        n_groups = (base.select(F.md5(d_ops.normalize_text(F.col("text")))
                                .alias("g")).distinct().count())
        assert got.count() == n_groups
