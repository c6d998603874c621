"""spark-submit entrypoint for the transcript CURATION pipeline
(stutter dedup → structural quarantine — repair-then-validate, see
curation_pipeline.run_curation — → exact + minhash near-dup conversation
dedup → token-budget truncation → bucketed write):

    spark-submit --py-files trafaret_spark.zip jobs/run_curation.py \
        --input  /data/transcripts \
        --output /data/curated \
        --quarantine /data/quarantined \
        --neardup-threshold 0.8 \
        --max-tokens 8192 \
        --buckets 256 \
        --checkpoint-dir hdfs:///tmp/cc_ckpt

Prints the per-stage audit (turns/conversations surviving each stage) as
one JSON line. On a cluster pass no --cores and let spark-submit own the
topology; pass --checkpoint-dir so the near-dup component loop survives
executor preemption.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript turns path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--quarantine", default=None)
    ap.add_argument("--neardup-threshold", type=float, default=0.8,
                    help="<=0 disables the near-dup stage")
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--keep-invalid", action="store_true",
                    help="skip the structural quarantine stage")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--audit", default="exact",
                    choices=["exact", "approx", "off"],
                    help="per-stage audit tier: exact distinct counts, "
                         "HLL approx (the 10^12-turn default), or none")
    ap.add_argument("--neardup-on-drop", default="warn",
                    choices=["warn", "error", "ignore"],
                    help="hot-bucket cap observability for the near-dup "
                         "stage; warn/error record drop counts in the audit")
    ap.add_argument("--neardup-max-bucket-size", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] for dev; omit under spark-submit")
    args = ap.parse_args()

    from trafaret_spark.curation_pipeline import CurationConfig, run_curation
    from trafaret_spark.session import get_spark

    spark = get_spark("trafaret_spark.curation", cores=args.cores)
    turns = spark.read.parquet(args.input)
    cfg = CurationConfig(
        output_path=args.output,
        quarantine_path=args.quarantine,
        neardup_threshold=(args.neardup_threshold
                           if args.neardup_threshold > 0 else None),
        max_tokens=args.max_tokens,
        n_buckets=args.buckets,
        drop_invalid=not args.keep_invalid,
        checkpoint_dir=args.checkpoint_dir,
        audit=args.audit,
        neardup_on_drop=args.neardup_on_drop,
        neardup_max_bucket_size=args.neardup_max_bucket_size,
    )
    audit = run_curation(spark, turns, cfg)
    print(json.dumps(audit, sort_keys=True))


if __name__ == "__main__":
    main()
