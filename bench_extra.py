"""Round-7 optimization harness: per-query noop-sink isolation + plan dump.

NOT the driver bench (bench.py is frozen). This file exists so the
optimization round can (a) time each bench query in isolation with the
same methodology, (b) dump `.explain("formatted")` for every query to
plans/<tag>/<query>_<phase>.txt, and (c) time sub-stages of the heavy
operators (candidate generation vs verify) without touching bench.py.

Usage:
  python bench_extra.py --phase before --tag r07 [--plans-only] [query ...]

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import time
from contextlib import redirect_stdout

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="before")
    ap.add_argument("--tag", default="r07")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("bench_extra", cores=CPUS,
                      shuffle_partitions=max(CPUS, 16))
    sc = spark.sparkContext
    n_convs = max(200, int(20_000 * SF))

    tr = datagen.transcripts(spark, n_convs=n_convs, partitions=CPUS * 2)
    ev = datagen.conv_events(spark, n_convs=n_convs)
    tr.persist(); ev.persist()
    tr.count(); ev.count()

    events_pq = spark.read.parquet(f"{SF_DIR}/events.parquet")
    docs_pq = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(CPUS)
    emb_pq = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")) \
        .repartition(CPUS)
    docs_pq.persist(); emb_pq.persist()
    docs_pq.count(); emb_pq.count()

    # ---- the exact bench.py query set (DataFrame builders) --------------
    def transcript_pipeline():
        validated = ts.apply_schema(tr, TRANSCRIPT_SCHEMA)
        valid, _ = ts.split_valid(validated)
        joined = asof_join(valid, ev, on="ts", by="conv_id",
                           direction="backward", tolerance=6 * 3600.0)
        return (features.Features(by="conv_id", order="turn_idx", ts="ts")
                .lag("score", 1)
                .rolling("score", "avg", 5, name="score_avg5")
                .rolling_time("score", "sum", 1800, name="score_sum30m")
                .session_id(1800)
                .backfill("tool", name="tool_ffill")
                .cum("score", "count", name="n_events_seen")
                .apply(joined))

    def validate_only():
        return ts.apply_schema(tr, TRANSCRIPT_SCHEMA)

    def asof_only():
        return asof_join(tr, ev, on="ts", by="conv_id", direction="backward")

    def features_only():
        return (features.Features(by="conv_id", order="turn_idx", ts="ts")
                .lag("text", 1).rolling("turn_idx", "max", 5)
                .session_id(1800).backfill("tool").apply(tr))

    def window_suite():
        return (features.Features(by="user_id", order="event_id", ts="ts")
                .lag("value", 1).rolling("value", "avg", 3)
                .rolling_time("value", "sum", 3600)
                .cum("value", "sum").session_id(1800)
                .backfill("props").apply(events_pq))

    def asof_events():
        left = events_pq.filter(F.col("event_type") == "view")
        right = events_pq.filter(F.col("event_type") == "purchase") \
            .select("user_id", "ts", "value")
        return asof_join(left, right, on="ts", by="user_id",
                         direction="backward", suffix="_r")

    def dedup_minhash():
        return dedup.minhash_dedup(docs_pq, threshold=0.5)

    def dedup_ngram_jaccard():
        return dedup.ngram_jaccard_pairs(docs_pq, block_cols=["lang"],
                                         threshold=0.9, n=1,
                                         max_block_size=5000,
                                         on_drop="ignore")

    def embedding_neardup():
        return similarity.cosine_neardup(emb_pq, threshold=0.3,
                                         nbits=6, bands=8)

    def knn_cosine():
        q = emb_pq.filter(F.col("vec_id") < 20) \
            .select(F.col("vec_id").alias("query_id"), "embedding")
        return similarity.cosine_topk(emb_pq, q, k=5)

    # ---- sub-stage probes (heavy operators decomposed) ------------------
    def emb_lsh_candidates_only():
        banded = emb_pq.select(
            F.col("vec_id"),
            F.posexplode(similarity.lsh_band_buckets(
                F.col("embedding"), 6, 8, 7)).alias("band", "bucket"))
        a = banded.select(F.col("vec_id").alias("a"), "band", "bucket")
        b = banded.select(F.col("vec_id").alias("b"), "band", "bucket")
        return (a.join(b, ["band", "bucket"]).filter(F.col("a") < F.col("b"))
                .select("a", "b").dropDuplicates(["a", "b"]))

    def minhash_candidates_only():
        return dedup.minhash_lsh_candidates(docs_pq)

    builders = {
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
        "emb_lsh_candidates_only": emb_lsh_candidates_only,
        "minhash_candidates_only": minhash_candidates_only,
    }
    bench_set = [q for q in builders if not q.endswith("_only") or
                 q in ("validate_only", "asof_only", "features_only")]
    sel = args.queries or bench_set

    plan_dir = f"plans/{args.tag}"
    os.makedirs(plan_dir, exist_ok=True)
    timings: dict[str, float] = {}
    for name in sel:
        df = builders[name]()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{plan_dir}/{name}_{args.phase}.txt", "w") as fh:
            fh.write(buf.getvalue())
        if args.plans_only:
            continue
        sc.setJobDescription(f"{args.tag}/{args.phase}: {name}")
        _sink(df)  # warm
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            _sink(df)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        sc.setJobDescription(None)
    print(json.dumps({"phase": args.phase, "sf": SF, "cpus": CPUS,
                      "queries": timings,
                      "value": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
