"""One scaling-run measurement at a single parallelism level.

Usage: python scripts/scaling_run.py <cores>

Runs the north-rule flagship pipeline — validate+coerce the dirty all-string
transcript table, split quarantine, as-of join the sparse event stream,
point-in-time window features — over a FIXED input (same rows, same file
layout, same partition count) regardless of core count, so two invocations
at different parallelism measure strong scaling of identical work.

The input is materialized once to ``.scaling_cache/`` (parquet) so both
runs read byte-identical files and synthesis cost is excluded. Timed runs
sink to the noop writer (full execution, no collect). Prints ONE JSON line.

Evidence protocol (BASELINE.json north_rule): the sandbox has no multi-node
cluster, so N vs 4N *executors* is proxied by local[8] vs local[32] —
same JVM memory, same shuffle partition count, 4× task slots.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import trafaret_spark as ts  # noqa: E402
from trafaret_spark import datagen  # noqa: E402
from trafaret_spark.operators import features  # noqa: E402
from trafaret_spark.operators.asof import asof_join  # noqa: E402
from trafaret_spark.pipeline import transcript_schema  # noqa: E402
from trafaret_spark.session import get_spark  # noqa: E402

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "40000"))
PARTITIONS = int(os.environ.get("SPARK_GRAFT_SCALE_PARTS", "64"))
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scaling_cache")
# the sandbox VM's vCPUs are host-scheduled: identical runs vary several-fold
# when the host is busy (wide bursts suffer most). MIN over N runs is the
# noise-robust estimator of the machine's actual capability at each level.
TIMED_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "5"))


def materialize(spark) -> None:
    """Write the fixed input once (any core count may do it — deterministic)."""
    tr_path = f"{CACHE}/transcripts_raw_{N_CONVS}"
    ev_path = f"{CACHE}/events_{N_CONVS}"
    if not os.path.exists(tr_path + "/_SUCCESS"):
        tr = datagen.transcripts(spark, n_convs=N_CONVS, partitions=PARTITIONS)
        datagen.to_raw_strings(tr).write.mode("overwrite").parquet(tr_path)
    if not os.path.exists(ev_path + "/_SUCCESS"):
        datagen.conv_events(spark, n_convs=N_CONVS) \
            .repartition(PARTITIONS // 4).write.mode("overwrite").parquet(ev_path)


def pipeline(spark):
    raw = spark.read.parquet(f"{CACHE}/transcripts_raw_{N_CONVS}")
    ev = spark.read.parquet(f"{CACHE}/events_{N_CONVS}")
    validated = ts.apply_schema(raw, transcript_schema(raw_ts=True))
    valid, _quarantine = ts.split_valid(validated)
    joined = asof_join(valid, ev, on="ts", by="conv_id",
                       direction="backward", tolerance=6 * 3600.0)
    out = (features.Features(by="conv_id", order="turn_idx", ts="ts")
           .lag("score", 1)
           .rolling("score", "avg", 5, name="score_avg5")
           .rolling_time("score", "sum", 1800, name="score_sum30m")
           .session_id(1800)
           .backfill("tool", name="tool_ffill")
           .cum("score", "count", name="n_seen")
           .apply(joined))
    return out


def main() -> None:
    cores = int(sys.argv[1])
    # identical JVM memory + GC at both parallelism levels: only the task
    # slot count differs (the N vs 4N executor proxy). Heap sized so GC is
    # never the measured bottleneck; code cache sized so the JIT never
    # disables on the wide generated validation projection (a full code
    # cache silently reverts all 32 threads to the interpreter — measured
    # 10× slowdowns with run-to-run variance before these flags).
    spark = get_spark(f"scaling-{cores}", cores=cores,
                      shuffle_partitions=PARTITIONS,
                      **{"spark.driver.memory": "28g",
                         "spark.driver.extraJavaOptions":
                         "-XX:+UseG1GC -XX:ReservedCodeCacheSize=1g "
                         "-XX:+UseCodeCacheFlushing -XX:-DontCompileHugeMethods"})
    materialize(spark)
    n_turns = spark.read.parquet(f"{CACHE}/transcripts_raw_{N_CONVS}").count()

    def run():
        pipeline(spark).write.format("noop").mode("overwrite").save()

    run()  # warm: codegen, JIT, file listing, broadcast
    times = []
    for _ in range(TIMED_RUNS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    sec = min(times)
    print(json.dumps({
        "cores": cores,
        "n_turns": n_turns,
        "n_convs": N_CONVS,
        "partitions": PARTITIONS,
        "seconds_min": round(sec, 3),
        "seconds_median": round(statistics.median(times), 3),
        "seconds_all": [round(t, 3) for t in times],
        "turns_per_sec": round(n_turns / sec, 1),
    }))


if __name__ == "__main__":
    main()
