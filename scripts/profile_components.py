"""Time connected_components on the REAL conv near-dup pair graph.

Usage: python scripts/profile_components.py <cores>

Context (round 6): the conv-curation DAG's serial tail is the
driver-sequenced component loop. The round-6 same-day A/B showed the
unconditional pointer jump REGRESSED the whole DAG 13% at 4 cores
(93.8 s -> 106.2 s) because real near-dup graphs are shallow — the jump
paid a labels self-join every round and saved zero rounds. This script
measures CC alone on the exact pair graph the DAG feeds it (minhash
pairs over the 44,199 stutter-repaired/structurally-filtered/
exact-deduped renders of the 50k-conv corpus), across jump policies:

    always   jump_after=0   (the r6-HEAD-before-fix behavior)
    deferred jump_after=2   (the adaptive default)
    never    jump_after=99  (the r5 prop-only behavior)

Output: rounds + wall seconds (min over TIMED_RUNS, fresh loop per run)
per policy, plus the pair-graph cardinality.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trafaret_spark.operators import dedup  # noqa: E402
from trafaret_spark.session import get_spark  # noqa: E402

from profile_minhash import CACHE, N_CONVS, TIMED_RUNS, materialize_renders  # noqa: E402


def materialize_pairs(spark) -> str:
    path = f"{CACHE}/convpairs_{N_CONVS}"
    if not os.path.exists(path + "/_SUCCESS"):
        docs = spark.read.parquet(materialize_renders(spark))
        (dedup.minhash_dedup(docs, threshold=0.7)
         .write.mode("overwrite").parquet(path))
    return path


def main() -> None:
    cores = int(sys.argv[1])
    spark = get_spark(f"profile-components-{cores}", cores=cores,
                      shuffle_partitions=64,
                      **{"spark.driver.memory": "28g"})
    ppath = materialize_pairs(spark)
    pairs = spark.read.parquet(ppath)
    out: dict = {"cores": cores, "n_pairs": pairs.count(),
                 "n_nodes": None, "timed_runs": TIMED_RUNS}

    def run(jump_after: int):
        stats: dict = {}
        comp = dedup.connected_components(spark.read.parquet(ppath),
                                          jump_after=jump_after,
                                          stats=stats)
        n = comp.count()  # forces the final labels (already checkpointed)
        return stats["rounds"], n

    policies = {"always": 0, "deferred": 2, "never": 99}
    for name, ja in policies.items():
        rounds, n_nodes = run(ja)  # warm
        out["n_nodes"] = n_nodes
        times = []
        for _ in range(TIMED_RUNS):
            t0 = time.perf_counter()
            run(ja)
            times.append(time.perf_counter() - t0)
        out[name] = {"jump_after": ja, "rounds": rounds,
                     "seconds_min": round(min(times), 3),
                     "seconds_all": [round(t, 3) for t in times]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
