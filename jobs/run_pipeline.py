"""spark-submit entrypoint for the transcript feature pipeline.

    spark-submit --py-files trafaret_spark.zip jobs/run_pipeline.py \
        --input  /data/transcripts \
        --events /data/conv_events \
        --output /data/features \
        --buckets 256

Resumable: rerunning with the same --output picks up the manifest and
processes only unstamped buckets. On a cluster, pass no --cores and let
spark-submit own the master/executor topology.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local-dev fallback: `python jobs/run_pipeline.py` puts jobs/ on sys.path,
# not the repo root; under spark-submit --py-files the package zip is shipped
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript table path")
    ap.add_argument("--events", default=None, help="conversation-events path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--quarantine", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--tolerance-s", type=float, default=6 * 3600.0)
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] for dev; omit under spark-submit on a cluster")
    args = ap.parse_args()

    from trafaret_spark.pipeline import PipelineConfig, run_pipeline
    from trafaret_spark.session import get_spark

    spark = get_spark("trafaret_spark.pipeline", cores=args.cores)
    transcripts = spark.read.parquet(args.input)
    events = spark.read.parquet(args.events) if args.events else None
    cfg = PipelineConfig(output_path=args.output,
                         quarantine_path=args.quarantine,
                         n_buckets=args.buckets,
                         asof_tolerance_s=args.tolerance_s)
    summary = run_pipeline(spark, transcripts, events, cfg)
    print(json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()
