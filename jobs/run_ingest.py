"""spark-submit entrypoint for the INCREMENTAL dedup ingest loop — the
job an ever-growing corpus runs per arriving batch instead of re-deduping
from scratch (per-ingest cost is O(batch + touched index rows), measured
in BENCH/BASELINE.md §2e):

    spark-submit --py-files trafaret_spark.zip jobs/run_ingest.py \
        --batch     /data/incoming/2026-08-19 \
        --index     /data/dedup_index \
        --batch-id  2026-08-19 \
        --pairs-out /data/dedup_pairs \
        --mode text            # or: embedding

Bands the batch (minhash over text, or sign-LSH over embeddings),
APPENDS its index rows to the persisted store under
``ingest_batch=<batch-id>`` (dynamic partition overwrite — retrying a
failed batch id rewrites exactly its own partitions, never duplicates),
probes the store index-level (history is never re-read as text/vectors),
and writes the incremental candidate pairs under the batch-id partition
of ``--pairs-out``. Prints one JSON line: pair count + cap-drop audit.

LSH/minhash parameters must stay FIXED for the lifetime of a store; they
are exposed as flags so a store's recipe can be pinned in the submitting
workflow. For a continuously arriving stream use
``streaming.stream_minhash_dedup_sink`` / ``stream_embedding_dedup_sink``
(same stores, same contract) instead of cron-driven batches.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", required=True, help="new batch parquet path")
    ap.add_argument("--index", required=True, help="persisted index store")
    ap.add_argument("--batch-id", required=True)
    ap.add_argument("--pairs-out", required=True,
                    help="candidate pairs root (partitioned by ingest_batch)")
    ap.add_argument("--mode", default="text",
                    choices=["text", "embedding"])
    ap.add_argument("--id-col", default=None,
                    help="default: doc_id (text) / vec_id (embedding)")
    ap.add_argument("--content-col", default=None,
                    help="default: text (text) / embedding (embedding)")
    # minhash recipe (text mode)
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--ngram", type=int, default=3)
    # sign-LSH recipe (embedding mode)
    ap.add_argument("--nbits", type=int, default=10)
    ap.add_argument("--dim", type=int, default=None)
    # shared
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--max-bucket-size", type=int, default=1000)
    ap.add_argument("--on-drop", default="warn",
                    choices=["warn", "error", "ignore"])
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] for dev; omit under spark-submit")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from trafaret_spark.session import get_spark

    spark = get_spark("trafaret_spark.ingest", cores=args.cores)
    batch = spark.read.parquet(args.batch)
    stats: dict = {}
    kw = dict(max_bucket_size=args.max_bucket_size, on_drop=args.on_drop)
    if args.on_drop != "ignore":
        kw["drop_stats"] = stats
    bid = str(getattr(args, "batch_id"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        if args.mode == "text":
            from trafaret_spark.operators import dedup
            pairs = dedup.minhash_index_ingest(
                batch, args.index, bid,
                text_col=args.content_col or "text",
                id_col=args.id_col or "doc_id",
                num_hashes=args.num_hashes, bands=args.bands,
                n=args.ngram, seed=args.seed, **kw)
        else:
            from trafaret_spark.operators import similarity
            pairs = similarity.embedding_index_ingest(
                batch, args.index, bid,
                id_col=args.id_col or "vec_id",
                vec_col=args.content_col or "embedding",
                nbits=args.nbits, bands=args.bands, seed=args.seed,
                dim=args.dim, **kw)
        pairs = pairs.persist()
        (pairs.withColumn("ingest_batch", F.lit(bid))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch").parquet(args.pairs_out))
    # Audit-count the returned frame, NOT a read-back of --pairs-out: a
    # batch with zero candidate pairs writes no partition files, and if
    # the root holds no prior batch either, the read-back raises
    # UNABLE_TO_INFER_SCHEMA after the index store was already appended
    # (advice r6). The persist above shares one materialization between
    # the write and the count.
    audit = {
        "batch_id": bid,
        "mode": args.mode,
        "candidate_pairs": pairs.count(),
        "dropped_buckets": stats.get("dropped_buckets", 0),
        "dropped_rows": stats.get("dropped_rows", 0),
    }
    unpersist = stats.get("unpersist")
    if unpersist:
        unpersist()
    pairs.unpersist()
    print(json.dumps(audit, sort_keys=True))


if __name__ == "__main__":
    main()
