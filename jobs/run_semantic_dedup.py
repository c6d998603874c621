"""spark-submit entrypoint for SemDeDup-style embedding curation
(similarity.semantic_dedup: cluster_assign → per-cluster cosine near-dup
→ keep_canonical → bucketed write):

    spark-submit --py-files trafaret_spark.zip jobs/run_semantic_dedup.py \
        --input  /data/embeddings \
        --output /data/embeddings_deduped \
        --n-centroids 1024 \
        --threshold 0.95 \
        --train-centroids \
        --buckets 256 \
        --checkpoint-dir hdfs:///tmp/cc_ckpt

Prints a one-line JSON audit (rows in/out, removed). ``--train-centroids``
runs the spherical k-means trainer on a bounded deterministic sample
(train_ivf_centroids); without it the codebook is the deterministic
smallest-ids default — fine for dedup, where any consistent partition of
the space works. Pass --checkpoint-dir on a cluster so the component loop
survives executor preemption.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="embeddings parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--n-centroids", type=int, default=256)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--max-block-size", type=int, default=10_000,
                    help="per-cluster quadratic cap; drops warn")
    ap.add_argument("--train-centroids", action="store_true",
                    help="spherical k-means codebook instead of the "
                         "deterministic smallest-ids default")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] for dev; omit under spark-submit")
    args = ap.parse_args()

    from trafaret_spark.io import write_bucketed
    from trafaret_spark.operators.similarity import (semantic_dedup,
                                                     train_ivf_centroids)
    from trafaret_spark.session import get_spark

    spark = get_spark("trafaret_spark.semantic_dedup", cores=args.cores)
    emb = spark.read.parquet(args.input)
    cents = (train_ivf_centroids(emb, n_centroids=args.n_centroids,
                                 id_col=args.id_col, vec_col=args.vec_col)
             if args.train_centroids else None)
    out = semantic_dedup(emb, centroids=cents, n_centroids=args.n_centroids,
                         threshold=args.threshold, id_col=args.id_col,
                         vec_col=args.vec_col,
                         max_block_size=args.max_block_size,
                         checkpoint_dir=args.checkpoint_dir)
    # one persisted pass: the write and the audit count share the result
    out = out.persist()
    write_bucketed(out, args.output, key=args.id_col, n_buckets=args.buckets)
    n_in, n_out = emb.count(), out.count()
    out.unpersist()
    print(json.dumps({"rows_in": n_in, "rows_out": n_out,
                      "removed": n_in - n_out,
                      "output_path": args.output}, sort_keys=True))


if __name__ == "__main__":
    main()
