"""Benchmark the headline pipelines; prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Queries (each forced end-to-end with the noop sink — no collect, no
Catalyst shortcut around unused columns):
  * transcript_pipeline — the north-rule flagship: synthesize transcripts at
    a size scaled to the SF, validate+coerce the 6-column schema, as-of join
    sparse conversation events, lag/rolling/sessionize/backfill features.
    The headline metric is validated+featurized turns/sec on this query.
  * validate_only / asof_only / features_only — pipeline stage splits.
  * window_suite — E5-E10 over the driver's `events` parquet.
  * asof_events — as-of join views→purchases over `events`.
  * dedup_minhash — MinHash+LSH+Jaccard over `documents`.
  * knn_cosine — brute-force top-5 over `embeddings`.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import functions as F

import trafaret_spark as ts
from trafaret_spark import datagen
from trafaret_spark.operators import dedup, features, similarity
from trafaret_spark.operators.asof import asof_join
from trafaret_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_m = re.search(r"sf([0-9.]+)", SF_DIR)
SF = float(_m.group(1)) if _m else 0.1

TRANSCRIPT_SCHEMA = ts.Schema(
    ts.Key("conv_id", ts.String()),
    ts.Key("turn_idx", ts.ToInt(gte=0)),
    ts.Key("role", ts.Enum("user", "assistant", "system", "tool")),
    ts.Key("text", ts.String(allow_blank=True)),
    ts.Key("tool", ts.Enum("search", "code", "browse") | ts.Null()),
    ts.Key("ts", ts.Any()),
)


def _sink(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(CPUS, 16))
    n_convs = max(200, int(20_000 * SF))

    # materialize inputs once so per-query timings measure the operator,
    # not the synthesis expressions
    tr = datagen.transcripts(spark, n_convs=n_convs, partitions=CPUS * 2)
    ev = datagen.conv_events(spark, n_convs=n_convs)
    tr.persist(); ev.persist()
    n_turns = tr.count(); ev.count()

    # single-file parquet at this SF ⇒ one input split; spread rows so the
    # per-row-heavy ops use every core (at real scale the scan has many splits)
    events_pq = spark.read.parquet(f"{SF_DIR}/events.parquet")
    docs_pq = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
    emb_pq = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")) \
        .repartition(CPUS)
    docs_pq.persist(); emb_pq.persist()
    docs_pq.count(); emb_pq.count()

    def transcript_pipeline():
        validated = ts.apply_schema(tr, TRANSCRIPT_SCHEMA)
        valid, _ = ts.split_valid(validated)
        joined = asof_join(valid, ev, on="ts", by="conv_id",
                           direction="backward", tolerance=6 * 3600.0)
        out = (features.Features(by="conv_id", order="turn_idx", ts="ts")
               .lag("score", 1)
               .rolling("score", "avg", 5, name="score_avg5")
               .rolling_time("score", "sum", 1800, name="score_sum30m")
               .session_id(1800)
               .backfill("tool", name="tool_ffill")
               .cum("score", "count", name="n_events_seen")
               .apply(joined))
        _sink(out)

    def validate_only():
        _sink(ts.apply_schema(tr, TRANSCRIPT_SCHEMA))

    def asof_only():
        _sink(asof_join(tr, ev, on="ts", by="conv_id", direction="backward"))

    def features_only():
        out = (features.Features(by="conv_id", order="turn_idx", ts="ts")
               .lag("text", 1).rolling("turn_idx", "max", 5)
               .session_id(1800).backfill("tool").apply(tr))
        _sink(out)

    def window_suite():
        out = (features.Features(by="user_id", order="event_id", ts="ts")
               .lag("value", 1).rolling("value", "avg", 3)
               .rolling_time("value", "sum", 3600)
               .cum("value", "sum").session_id(1800)
               .backfill("props").apply(events_pq))
        _sink(out)

    def asof_events():
        left = events_pq.filter(F.col("event_type") == "view")
        right = events_pq.filter(F.col("event_type") == "purchase") \
            .select("user_id", "ts", "value")
        _sink(asof_join(left, right, on="ts", by="user_id",
                        direction="backward", suffix="_r"))

    def dedup_minhash():
        _sink(dedup.minhash_dedup(docs_pq, threshold=0.5))

    def dedup_ngram_jaccard():
        # finite cap (keeps every sf0.1 block — max ~2.2k docs — so the
        # measured workload is unchanged, but the guard is in the path)
        _sink(dedup.ngram_jaccard_pairs(docs_pq, block_cols=["lang"],
                                        threshold=0.9, n=1,
                                        max_block_size=5000,
                                        on_drop="ignore"))

    def embedding_neardup():
        _sink(similarity.cosine_neardup(emb_pq, threshold=0.3,
                                        nbits=6, bands=8))

    def knn_cosine():
        q = emb_pq.filter(F.col("vec_id") < 20) \
            .select(F.col("vec_id").alias("query_id"), "embedding")
        _sink(similarity.cosine_topk(emb_pq, q, k=5))

    queries = {
        "transcript_pipeline": transcript_pipeline,
        "validate_only": validate_only,
        "asof_only": asof_only,
        "features_only": features_only,
        "window_suite": window_suite,
        "asof_events": asof_events,
        "dedup_minhash": dedup_minhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "embedding_neardup": embedding_neardup,
        "knn_cosine": knn_cosine,
    }

    # min-of-N per query (r2 verdict #8): host vCPU scheduling swings
    # identical sub-second runs up to 40%, so a single timed run records
    # the scheduler, not the engine. One warm-up (JIT/codegen/broadcast),
    # then the min over N timed runs.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        fn()  # warm
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline suite wall-clock (transcript validate+asof+features "
                  "pipeline + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "n_turns": n_turns,
        "turns_per_sec_pipeline": round(n_turns / timings["transcript_pipeline"], 1),
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
