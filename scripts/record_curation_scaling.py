"""Aggregate curation scaling passes into BENCH/scaling.json.

Usage:
    python scripts/record_curation_scaling.py N 4N KEY_SUFFIX \
        [--round roundK] <legN.json>... --hi <leg4N.json>...

e.g. ``... 1 4 primary_1_to_4 --round round6 runs/d1a.json --hi runs/d4a.json``

Each input file is one ``scaling_curation.py`` output line (a JSON dict
with ``dedup`` and/or ``ann`` blocks). Per leg the estimator is the MIN
across all passes' seconds_min — the documented noise-robust protocol:
host-scheduled vCPUs swing identical runs up to 40%, so legs aggregate
several passes. Writes ``round4_{dedup,ann}_<KEY_SUFFIX>`` entries;
prose notes (knee decomposition, caveats) are added by hand afterwards.
"""

from __future__ import annotations

import json
import os
import sys


WORKLOADS = ("dedup", "ann", "bm25", "conv")


def load(paths):
    runs = [json.load(open(p)) for p in paths]
    out = {}
    for w in WORKLOADS:
        if not all(w in r for r in runs):
            continue
        times = [t for r in runs for t in r[w]["seconds_all"]]
        out[w] = {
            "seconds_min": min(r[w]["seconds_min"] for r in runs),
            "seconds_all": times,
            "passes": len(runs),
        }
        if w == "conv" and all("conv_prefixes" in r for r in runs):
            # stage decomposition: per prefix, min across passes (only
            # when EVERY pass recorded prefixes — a mixed set would
            # KeyError, and a partial min would misstate the protocol)
            out[w]["prefixes"] = {
                k: min(r["conv_prefixes"][k] for r in runs)
                for k in runs[0]["conv_prefixes"]}
    out["meta"] = runs[0]
    return out


def main():
    lo_cores, hi_cores, suffix = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    argv = sys.argv[4:]
    round_prefix = None
    if argv and argv[0] == "--round":
        round_prefix = argv[1]
        argv = argv[2:]
    split = argv.index("--hi")
    lo, hi = load(argv[:split]), load(argv[split + 1:])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCH", "scaling.json")
    data = json.load(open(path))
    m = lo["meta"]
    factor = hi_cores / lo_cores
    for w in WORKLOADS:
        if w not in lo or w not in hi:
            continue
        t_lo, t_hi = lo[w]["seconds_min"], hi[w]["seconds_min"]
        n_key = {"ann": "n_vecs", "conv": "n_convs"}.get(w, "n_docs")
        entry = {
            "workload": m[w].get("workload", w),
            "input": {n_key: m.get(n_key), "partitions": m["partitions"]},
            "N_cores": lo_cores,
            "N": {"seconds_min": t_lo, "seconds_all": lo[w]["seconds_all"],
                  "passes": lo[w]["passes"]},
            "4N_cores": hi_cores,
            "4N": {"seconds_min": t_hi, "seconds_all": hi[w]["seconds_all"],
                   "passes": hi[w]["passes"]},
            "speedup": round(t_lo / t_hi, 3),
            "efficiency": round(t_lo / t_hi / factor, 3),
        }
        if w == "dedup" and "capped_bucket_drops" in m:
            entry["capped_bucket_drops"] = m["capped_bucket_drops"]
        if w == "conv":
            entry["input"]["n_turns"] = m.get("n_turns")
            entry["convs_after"] = m.get("convs_after")
            # marginal per-stage seconds at each leg (difference of
            # cumulative lazy prefixes, min across passes)
            entry["stage_decomposition"] = {
                "N": lo[w].get("prefixes"), "4N": hi[w].get("prefixes")}
        rnd = round_prefix or ("round5" if w == "conv" else "round4")
        data[f"{rnd}_{w}_{suffix}"] = entry
        print(f"{w}: t{lo_cores}={t_lo} t{hi_cores}={t_hi} "
              f"eff={entry['efficiency']}")
    json.dump(data, open(path, "w"), indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
