"""Stage-wise profile of the MinHash near-dup path on LONG texts.

Usage: python scripts/profile_minhash.py <cores> [n_convs]

Context (round-6 perf candidate): the conversation-curation DAG spends
~80% of its wall time in minhash near-dup over conversation RENDERS
(~440 tokens each), and the measured pairs-stage throughput there is
~2x lower per shingle than the document-dedup workload (0.26M vs 0.44M
shingles/s at 4 cores). Before touching the minhash path, measure where
the time goes on render-length texts. Cumulative prefixes of the
candidate pipeline, timed with the scaling protocol (fresh plan per run,
1 warm + min over timed runs, noop sink):

    tokens   split(normalize) + per-token hash        (HOF transform)
    grams    + n-gram combine fold                     (2x zip_with)
    shingle  + array_distinct                          (set view)
    sig      + minhash_from_hashes                     (Arrow kernel)
    band     + banding projection                      (posexplode + slices)
    cands    full minhash_lsh_candidates               (+ bucket exchange,
                                                        pair explode, distinct)
    dedup    full minhash_dedup                        (+ jaccard verify)

Marginal stage cost = difference of consecutive prefixes. The input is
the EXACT frame the conv DAG feeds minhash: stutter-repaired,
structurally-filtered, exact-deduped renders of the 50k-conv
clone_transcripts corpus (44,199 renders), materialized once to the
scaling cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trafaret_spark import datagen  # noqa: E402
from trafaret_spark.operators import conversations, dedup  # noqa: E402
from trafaret_spark.operators.dedup import (  # noqa: E402
    _positional_gram_hashes, minhash_from_hashes, shingle_hashes,
)
from trafaret_spark.operators.hashing import tok_hash  # noqa: E402
from trafaret_spark.session import get_spark  # noqa: E402

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "50000"))
PARTITIONS = int(os.environ.get("SPARK_GRAFT_SCALE_PARTS", "64"))
TIMED_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scaling_cache")
NUM_HASHES, BANDS, NGRAM = 64, 16, 3


def materialize_renders(spark) -> str:
    """Renders exactly as the conv DAG's near-dup stage sees them."""
    path = f"{CACHE}/renders_{N_CONVS}"
    if not os.path.exists(path + "/_SUCCESS"):
        cpath = f"{CACHE}/cloneconvs_{N_CONVS}"
        if not os.path.exists(cpath + "/_SUCCESS"):
            datagen.clone_transcripts(spark, n_convs=N_CONVS,
                                      partitions=PARTITIONS) \
                .write.mode("overwrite").parquet(cpath)
        turns = spark.read.parquet(cpath)
        t = conversations.dedup_stutter(turns)
        rep = conversations.conversation_report(t, dense_from=None)
        bad = rep.filter(~F.col("is_valid")).select("conv_id")
        t = t.join(bad, ["conv_id"], "left_anti")
        t = conversations.dedup_conversations(t)
        (conversations.render_conversation(t, out_col="text")
         .select(F.col("conv_id").alias("doc_id"), "text")
         .repartition(PARTITIONS)
         .write.mode("overwrite").parquet(path))
    return path


def measure(make_df) -> float:
    def run():
        make_df().write.format("noop").mode("overwrite").save()

    run()
    times = []
    for _ in range(TIMED_RUNS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return round(min(times), 3)


def main() -> None:
    cores = int(sys.argv[1])
    spark = get_spark(f"profile-minhash-{cores}", cores=cores,
                      shuffle_partitions=PARTITIONS,
                      **{"spark.driver.memory": "28g"})
    rpath = materialize_renders(spark)
    docs = spark.read.parquet(rpath).select("doc_id", "text")
    out: dict = {"cores": cores, "n_docs": docs.count(),
                 "timed_runs": TIMED_RUNS}
    out["mean_tokens"] = round(docs.select(F.avg(F.size(F.split(
        F.col("text"), r"\s+")))).collect()[0][0], 1)

    def fresh():
        return spark.read.parquet(rpath).select("doc_id", "text")

    def p_tokens():
        return fresh().select("doc_id", F.transform(
            F.split(dedup.normalize_text(F.col("text")), r"\s+"),
            lambda t: tok_hash(t, False)).alias("__th"))

    def p_grams():
        return fresh().select("doc_id", _positional_gram_hashes(
            F.col("text"), NGRAM, False).alias("__gh"))

    def p_shingle():
        return fresh().select("doc_id", shingle_hashes(
            F.col("text"), n=NGRAM).alias("__hs"))

    def p_sig():
        return p_shingle().select("doc_id", minhash_from_hashes(
            F.col("__hs"), NUM_HASHES).alias("__sig"))

    def p_band():
        rows_per_band = NUM_HASHES // BANDS
        sig = F.col("__sig")
        return p_sig().select(
            "doc_id",
            F.posexplode(F.transform(
                F.sequence(F.lit(0), F.lit(BANDS - 1)),
                lambda b: F.xxhash64(F.array_join(F.transform(
                    F.slice(sig, b * rows_per_band + F.lit(1), rows_per_band),
                    lambda x: x.cast("string")), ","), b),
            )).alias("band", "bucket"))

    def p_cands():
        return dedup.minhash_lsh_candidates(fresh())

    def p_dedup():
        return dedup.minhash_dedup(fresh(), threshold=0.7)

    prefixes = [("tokens", p_tokens), ("grams", p_grams),
                ("shingle", p_shingle), ("sig", p_sig), ("band", p_band),
                ("cands", p_cands), ("dedup", p_dedup)]
    cum = {}
    for name, fn in prefixes:
        cum[name] = measure(fn)
    out["cumulative_sec"] = cum
    names = [n for n, _ in prefixes]
    out["marginal_sec"] = {
        names[0]: cum[names[0]],
        **{names[i]: round(cum[names[i]] - cum[names[i - 1]], 3)
           for i in range(1, len(names))}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
