"""The north-rule pipeline: validate+coerce transcript rows → point-in-time
as-of join of conversation events → windowed features → bucketed, resumable,
manifest-checkpointed table write.

One Spark job per (re)run:

  scan → filter(bucket ∈ remaining) → wide validation select →
  valid/quarantine split → repartitionByRange(conv_id, turn_idx) →
  as-of join → one window pass of features → dynamic-partition write →
  metrics agg → manifest stamps

Shuffle budget: ONE hash exchange for the as-of union-window, ONE range
exchange for the output ordering (Catalyst reuses it for the feature
windows, which share the partition key), plus the tiny metrics agg.
Resume reprocesses only unstamped buckets (partition-pruned filter).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import trafaret_spark as ts
from trafaret_spark import io as tio
from trafaret_spark.checkpoint import Manifest, bucket_metrics
from trafaret_spark.operators.asof import asof_join
from trafaret_spark.operators.features import Features

__all__ = ["PipelineConfig", "run_pipeline", "transcript_schema"]


def transcript_schema(raw_ts: bool = False) -> ts.Schema:
    """The 6-column transcript contract (BASELINE.json input_hint), with
    trafaret-semantics guards (reference: trafaret/base.py Dict/Key/Enum,
    numeric.py Int, base.py DateTime). ``raw_ts=True`` for all-string
    "foreign data" inputs: the permissive RFC-3339-ish parse cascade
    (reference trafaret/contrib/rfc_3339.py) coerces — bad formats land in
    quarantine instead of silently nulling downstream features."""
    ts_guard = ts.DateTimeAny() if raw_ts else ts.Any()
    return ts.Schema(
        ts.Key("conv_id", ts.String()),
        ts.Key("turn_idx", ts.ToInt(gte=0)),
        ts.Key("role", ts.Enum("user", "assistant", "system", "tool")),
        ts.Key("text", ts.String(allow_blank=True)),
        ts.Key("tool", ts.Enum("search", "code", "browse") | ts.Null()),
        ts.Key("ts", ts_guard),
        extras="ignore",
    )


@dataclasses.dataclass
class PipelineConfig:
    output_path: str
    quarantine_path: Optional[str] = None
    manifest_dir: Optional[str] = None
    n_buckets: int = 64
    session_gap_s: float = 1800.0
    asof_tolerance_s: Optional[float] = 6 * 3600.0
    shuffle_partitions: Optional[int] = None


def _features() -> Features:
    return (Features(by="conv_id", order="turn_idx", ts="ts")
            .lag("text_len", 1)
            .lag("role", 1, name="role_lag1")
            .rolling("text_len", "avg", 5, name="text_len_avg5")
            .rolling_time("is_tool_turn", "sum", 1800, name="tool_turns_30m")
            .session_id(1800)
            .backfill("tool", name="tool_ffill")
            .cum("text_len", "sum", name="chars_so_far"))


def run_pipeline(spark: SparkSession, transcripts: DataFrame,
                 events: Optional[DataFrame], cfg: PipelineConfig) -> dict:
    """Run (or resume) the pipeline; returns the manifest summary dict."""
    manifest = Manifest(cfg.manifest_dir or cfg.output_path + "_manifest",
                        cfg.n_buckets)
    remaining = manifest.remaining_buckets()
    t0 = time.time()
    if not remaining:
        return {**manifest.summary(), "resumed_noop": True, "wall_s": 0.0}

    df = tio.add_bucket(transcripts, "conv_id", cfg.n_buckets)
    if len(remaining) < cfg.n_buckets:  # resume: prune completed buckets
        df = df.filter(F.col("bucket").isin(remaining))

    raw_ts = dict(transcripts.dtypes).get("ts") == "string"
    validated = ts.apply_schema(df.drop("bucket"), transcript_schema(raw_ts)) \
        .withColumn("bucket", F.pmod(F.xxhash64(F.col("conv_id")),
                                     F.lit(cfg.n_buckets)))
    # metrics need both valid and quarantined rows → compute pre-split, and
    # persist so split branches + metrics don't re-run validation
    validated.persist()
    metrics_df = bucket_metrics(validated)

    valid, quarantine = ts.split_valid(validated, keep_errors_on_valid=False)

    enriched = valid.withColumn("text_len", F.length("text")) \
        .withColumn("is_tool_turn", (F.col("role") == "tool").cast("int"))
    if events is not None:
        enriched = asof_join(enriched, events, on="ts", by="conv_id",
                             direction="backward",
                             tolerance=cfg.asof_tolerance_s)

    featurized = _features().apply(enriched)

    # stable output ordering: byte-equal text under (conv_id, turn_idx)
    out = featurized.repartitionByRange(
        cfg.shuffle_partitions or spark.sparkContext.defaultParallelism,
        "conv_id", "turn_idx").sortWithinPartitions("conv_id", "turn_idx")

    tio.write_bucketed(out, cfg.output_path, key="conv_id",
                       n_buckets=cfg.n_buckets, mode="overwrite")
    if cfg.quarantine_path:
        q = quarantine.withColumn(
            "errors", F.to_json("errors"))  # JSON-serialized DataError tree
        tio.write_bucketed(q, cfg.quarantine_path, key="conv_id",
                           n_buckets=cfg.n_buckets, mode="overwrite")

    lineage = {
        "app_id": spark.sparkContext.applicationId,
        "inputs": [str(f) for f in transcripts.inputFiles()[:20]],
        "engine_version": ts.__version__,
        "n_buckets": cfg.n_buckets,
    }
    manifest.stamp_from_metrics_df(metrics_df, lineage)
    validated.unpersist()
    return {**manifest.summary(), "resumed_noop": False,
            "wall_s": round(time.time() - t0, 2),
            "buckets_this_run": len(remaining)}
