"""Document deduplication operators for training-data pipelines.

Four dedup families, all expressed as native Column expressions (zero Python
in the hot path) so they whole-stage-codegen and scale to 10^9+ documents:

  * exact        — hash-groupBy on normalized text (one shuffle on the hash).
  * minhash_lsh  — shingle → K minhashes → B bands → bucket self-join →
                   exact-Jaccard verify on candidate pairs. The self-join
                   shuffles on (band, bucket) only; no all-pairs blowup.
  * simhash      — 64-bit sign fingerprint; near-dups share the fingerprint
                   (or a band of it), found by groupBy.
  * ngram_jaccard— exact Jaccard on shingle sets for candidate pairs
                   (the verify stage of minhash, usable standalone on a
                   pre-bucketed pair list — never on a cross join at scale).

Scale notes (100 TB design):
  * Normalization + shingling are per-row `transform`/`regexp_replace` — no
    shuffle. Minhash is `F.aggregate` over the shingle array (array<long>
    accumulator) — still per-row.
  * The only shuffles are the band-bucket exchange (keys are ~uniform by
    construction: xxhash64 buckets) and the final group-id agg. Hot buckets
    (boilerplate text) are capped via `max_bucket_size` before the self-join
    — the standard guard against quadratic bucket blowup.
  * Candidate pairs are oriented (a.doc_id < b.doc_id) so each pair is
    verified once.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_text", "shingles", "exact_dedup",
    "minhash_signature", "minhash_lsh_candidates", "minhash_dedup",
    "simhash", "simhash_dedup", "jaccard",
]

_MERSENNE = (1 << 61) - 1


def normalize_text(col: Column) -> Column:
    """Lowercase, strip punctuation to spaces, collapse whitespace, trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}]+", " ")
    return F.trim(c)


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text → array<string>.

    Native: split + transform over an index sequence; documents shorter than
    n tokens yield the whole text as one shingle (so they can still match
    exact dups).
    """
    toks = F.split(normalize_text(col), r"\s+")
    k = F.size(toks) - F.lit(n - 1)
    grams = F.when(k >= 1, F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )).otherwise(F.array(F.array_join(toks, " ")))
    return F.array_distinct(grams)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalized: bool = True) -> DataFrame:
    """Exact dedup: one shuffle on the text hash. Adds
    ``dup_group`` (md5 of [normalized] text), ``group_size`` and
    ``is_canonical`` (row with the min id in its group survives).
    """
    key = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    with_key = df.withColumn("dup_group", F.md5(key))
    groups = (with_key.groupBy("dup_group")
              .agg(F.count(F.lit(1)).alias("group_size"),
                   F.min(id_col).alias("__canon")))
    return (with_key.join(groups, "dup_group")
            .withColumn("is_canonical", F.col(id_col) == F.col("__canon"))
            .drop("__canon"))


def minhash_signature(col: Column, num_hashes: int = 64, n: int = 3,
                      seed: int = 17) -> Column:
    """K-minhash signature of the shingle set → array<bigint>.

    Hash family: ``xxhash64(shingle, seed+i) mod M`` per permutation i —
    per-row F.aggregate with an array<long> accumulator (min per slot).
    No UDF, no shuffle.
    """
    sh = shingles(col, n=n)
    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), num_hashes)
    seeds = F.sequence(F.lit(seed), F.lit(seed + num_hashes - 1))

    def step(acc, s):
        return F.zip_with(
            acc, seeds,
            lambda m, i: F.least(m, F.pmod(F.xxhash64(s, i), F.lit(_MERSENNE))))

    return F.aggregate(sh, init, step)


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 64,
                           bands: int = 16, n: int = 3, seed: int = 17,
                           max_bucket_size: int = 1000) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join, orient pairs.

    Returns distinct (a, b) id pairs with a < b. The self-join shuffles on
    the (band, bucket-hash) key; buckets larger than ``max_bucket_size``
    (degenerate boilerplate) are dropped with a count you can monitor.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, n, seed)
    banded = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(sig, b * rows_per_band + F.lit(1), rows_per_band),
                            lambda x: x.cast("string")),
                        ","),
                    b),
            )).alias("band", "bucket"))
    sized = (banded.groupBy("band", "bucket")
             .agg(F.collect_list(id_col).alias("ids"),
                  F.count(F.lit(1)).alias("bsz"))
             .filter((F.col("bsz") > 1) & (F.col("bsz") <= max_bucket_size)))
    pairs = (sized
             .select(F.explode("ids").alias("a"), F.col("ids"))
             .select("a", F.explode("ids").alias("b"))
             .filter(F.col("a") < F.col("b"))
             .distinct())
    return pairs


def jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate (a, b) pairs → adds ``jaccard``.

    Joins the shingle arrays in (two hash joins on the id — broadcastable
    when docs is a dim, shuffle-hash otherwise) and computes
    |∩| / |∪| natively via array_intersect/size.
    """
    sh = docs.select(F.col(id_col), shingles(F.col(text_col), n).alias("__sh"))
    out = (df_pairs
           .join(sh.withColumnRenamed(id_col, "a").withColumnRenamed("__sh", "__sa"), "a")
           .join(sh.withColumnRenamed(id_col, "b").withColumnRenamed("__sh", "__sb"), "b"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = (F.size("__sa") + F.size("__sb") - F.size(F.array_intersect("__sa", "__sb")))
    return out.withColumn("jaccard", inter / union).drop("__sa", "__sb")


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.8, num_hashes: int = 64, bands: int = 16,
                  n: int = 3, seed: int = 17) -> DataFrame:
    """Full MinHash+LSH near-dup pass → (a, b, jaccard) pairs ≥ threshold.

    Connected-component collapse is left to the caller (iterative; for the
    common near-dup-removal case, dropping every ``b`` of a kept pair is the
    standard single-pass approximation).
    """
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, n, seed)
    verified = jaccard(cands, df, text_col, id_col, n)
    return verified.filter(F.col("jaccard") >= threshold)


def simhash(col: Column, bits: int = 32, n: int = 1, seed: int = 99) -> Column:
    """SimHash fingerprint of the token (n=1) / shingle stream → bigint.

    Per-bit sign-sum over token hashes: token hashes materialize once as an
    array<long>, then each bit's ±1 vote folds in its own F.aggregate
    (shift amounts must be literals in Spark, hence the Python-level loop —
    still 100% native expressions, no UDF)."""
    toks = F.transform(shingles(col, n=n), lambda t: F.xxhash64(t, F.lit(seed)))

    def _vote(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
            F.lit(1)).otherwise(F.lit(-1))

    fp = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(toks, F.lit(0), _vote(b))
        fp = fp.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long")))
    return fp


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  bits: int = 32, band_bits: int = 8, seed: int = 99) -> DataFrame:
    """Near-dup candidates by SimHash banding: docs sharing any
    ``band_bits``-wide slice of the fingerprint land in one bucket
    (Hamming-distance ≤ bits/band_bits - 1 guaranteed caught).
    Returns oriented (a, b, hamming) pairs."""
    nbands = bits // band_bits
    mask = (1 << band_bits) - 1
    fp = df.select(F.col(id_col), simhash(F.col(text_col), bits, seed=seed).alias("__fp"))
    banded = fp.select(
        id_col, "__fp",
        F.posexplode(F.array(*[
            F.shiftright(F.col("__fp"), b * band_bits).bitwiseAND(F.lit(mask))
            for b in range(nbands)])).alias("band", "bucket"))
    a = banded.select(F.col(id_col).alias("a"), F.col("__fp").alias("__fa"),
                      "band", "bucket")
    b = banded.select(F.col(id_col).alias("b"), F.col("__fp").alias("__fb"),
                      "band", "bucket")
    pairs = (a.join(b, ["band", "bucket"]).filter(F.col("a") < F.col("b"))
             .select("a", "b", "__fa", "__fb").distinct())
    hamming = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return pairs.withColumn("hamming", hamming).drop("__fa", "__fb")
