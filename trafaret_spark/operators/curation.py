"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, per-key caps, and sequence packing.

These cover the three standard steps between dedup and the tokenizer in a
web-scale curation flow:

  * ``ngram_decontaminate`` — flag/remove corpus documents that share
    n-grams with an evaluation benchmark (the GPT-3 appendix-C / Llama
    style 13-gram overlap check). Spark plan: the benchmark's distinct
    gram-hash set is orders of magnitude smaller than the corpus, so it
    BROADCASTS; the corpus side is one scan (shingle hashes are computed
    once per row, exploded, hash-joined map-side) and the per-doc hit
    count partially aggregates before its shuffle. No all-pairs join
    anywhere.
  * ``cap_per_key`` — keep at most ``n`` rows per key (per-domain caps,
    per-source quotas). Exact two-phase mode bounds hot keys: a salted
    partial top-n runs before the per-key exchange, so no single reducer
    ever sorts a whole hot domain.
  * ``pack_sequences`` — concat-and-chunk packing: assign every document
    its pack id / offset under a fixed token capacity, the exact layout a
    sequence-packed training run reads. Pure window arithmetic over a
    cumulative token sum — one exchange per shard column.

Shingle semantics (normalization, whole-text fold for short docs, the
fast/portable hash families) are shared with the dedup family —
operators/dedup.py `shingle_hashes` — so decontamination buckets agree
bit-for-bit with the minhash/Jaccard operators' view of a document.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from trafaret_spark.operators.colnames import temp_col
from trafaret_spark.operators.dedup import shingle_hashes

__all__ = ["ngram_decontaminate", "decontaminate", "cap_per_key",
           "pack_sequences", "chunk_documents"]


def ngram_decontaminate(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 13, min_hits: int = 1,
                        portable: bool = False,
                        broadcast_benchmark: bool = True) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns one row per corpus document: ``id_col``, ``n_grams`` (distinct
    n-gram count), ``n_hits`` (how many of them appear anywhere in the
    benchmark), ``overlap_frac`` = n_hits/n_grams, and ``contaminated``
    (n_hits >= min_hits). Documents shorter than ``n`` tokens fold to a
    single whole-text gram (same rule as `dedup.shingles`), so exact short
    duplicates of benchmark lines still flag.

    Scale story (100 TB corpus, ~10^7-gram benchmark): the benchmark gram
    set reduces to distinct hashes and broadcasts (`broadcast_benchmark`),
    so the corpus side is ONE scan — shingle hashes computed once per row,
    exploded, left-joined against the broadcast map-side — and the only
    exchange carries one partially-aggregated row per document (exploded
    rows of a doc are co-partitioned, so the per-doc count collapses
    before the shuffle). ``portable=True`` selects the md5/mod-M31 hash
    family the DuckDB oracle reproduces bit-for-bit.

    ``broadcast_benchmark`` SIZE BOUND: the explicit ``F.broadcast`` hint
    bypasses AQE's size check, so an oversized "benchmark" becomes a
    driver/executor OOM instead of a plan fallback. The broadcast table
    is one long per distinct gram hash (~8 B + 2-3× relation overhead):
    eval benchmarks (10^6-10^7 grams, tens of MB) are safely inside the
    default; past ~10^8 distinct grams (≳ 2 GB materialized) pass
    ``broadcast_benchmark=False`` — the join then falls to AQE, which
    still broadcasts when the set actually fits and otherwise plans a
    shuffle join on the (uniform) gram-hash key. Results are identical
    either way (tests pin the equivalence).
    """
    grams = shingle_hashes(F.col(text_col), n=n, portable=portable)
    bench = (benchmark.select(F.explode(
        shingle_hashes(F.col(text_col), n=n, portable=portable))
        .alias("gram")).distinct()
        .withColumn("_hit", F.lit(1)))
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    corpus_g = corpus.select(F.col(id_col), grams.alias("_grams")) \
        .select(id_col, F.size("_grams").alias("n_grams"),
                F.explode("_grams").alias("gram"))
    out = (corpus_g.join(bench, "gram", "left")
           .groupBy(id_col)
           .agg(F.max("n_grams").alias("n_grams"),
                F.count("_hit").alias("n_hits")))
    return out.select(
        id_col, "n_grams", "n_hits",
        F.round(F.col("n_hits") / F.greatest(F.col("n_grams"), F.lit(1)),
                9).alias("overlap_frac"),
        (F.col("n_hits") >= F.lit(min_hits)).alias("contaminated"))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 13, min_hits: int = 1,
                  portable: bool = False,
                  broadcast_benchmark: bool = True) -> DataFrame:
    """The end-state: corpus rows (all columns) with contaminated documents
    removed — `ngram_decontaminate` distilled to an anti-join against the
    flagged id set (small: broadcast by AQE when it fits)."""
    flagged = ngram_decontaminate(
        corpus, benchmark, text_col=text_col, id_col=id_col, n=n,
        min_hits=min_hits, portable=portable,
        broadcast_benchmark=broadcast_benchmark) \
        .filter(F.col("contaminated")).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")


def cap_per_key(df: DataFrame, key_cols: Union[str, Sequence[str]],
                n: int, order_by: Sequence[Column],
                salt_partitions: Optional[int] = None,
                salt_col: Optional[str] = None) -> DataFrame:
    """Keep at most ``n`` rows per key — per-domain caps, per-source quotas.

    ``order_by`` must be a TOTAL order within a key (include a unique
    tiebreak column) or the kept set is nondeterministic under retries.

    Default plan: one `row_number` window (one exchange + per-key sort).
    A key holding 10^9 rows makes that one task's sort; for such hot keys
    pass ``salt_partitions=S`` and ``salt_col=<unique col>``: a partial
    top-n runs per (key, pmod(xxhash64(salt_col), S)) BEFORE the per-key
    exchange, so at most n·S rows per key reach the final window — the
    same two-phase shape as `partitioning.salted_agg`. Exact for any
    ``salt_col``: every row of the true top-n wins its own salt bucket.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if salt_partitions is not None:
        if salt_col is None:
            raise ValueError("salt_partitions requires salt_col "
                             "(a unique column to derive salt buckets)")
        salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_partitions))
        pre = Window.partitionBy(*keys, salt).orderBy(*order_by)
        pre_rn = temp_col(df, "__cap_pre_rn")
        df = df.withColumn(pre_rn, F.row_number().over(pre)) \
            .filter(F.col(pre_rn) <= n).drop(pre_rn)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    rn = temp_col(df, "__cap_rn")
    return df.withColumn(rn, F.row_number().over(w)) \
        .filter(F.col(rn) <= n).drop(rn)


def pack_sequences(df: DataFrame, capacity: int,
                   token_col: str = "n_tokens",
                   order_by: Union[str, Sequence[str]] = "doc_id",
                   shard_col: Optional[str] = None,
                   counter: Optional[callable] = None,
                   text_col: Optional[str] = None) -> DataFrame:
    """Concat-and-chunk sequence packing: the token stream formed by
    concatenating documents in ``order_by`` order is cut into fixed
    ``capacity``-token packs, and every document is annotated with where
    it lands: ``pack_id`` (pack containing its first token), ``offset``
    (its first token's position within that pack) and ``n_chunks`` (how
    many packs it spans — 1 unless it straddles a boundary).

    This is the layout GPT-style pretraining actually reads (documents
    are not padded; they straddle pack boundaries), so the assignment is
    pure prefix-sum arithmetic: cum_before = sum(tokens) over the
    preceding rows; pack_id = cum_before div capacity. Zero-token rows
    get n_chunks = 1 at their current offset. ``token_col`` must be
    non-negative (a negative count corrupts every later offset in its
    shard — validate upstream; a count this operator could trust is
    exactly what `textstats.token_count` produces).

    The unit the budget meters is pluggable (r5 verdict #5 — production
    packing budgets are BPE tokens, not whitespace tokens): either
    precompute ``token_col`` yourself, or pass ``counter=`` (a
    ``Column -> Column`` callable: ``textstats.bpe_ish_token_count``, or
    ``textstats.token_counter_udf(<real tokenizer>)`` for an
    Arrow-batched library tokenizer) together with ``text_col`` and the
    count is computed in the same pass — ``token_col`` is then ignored.
    The prefix-sum arithmetic is unit-agnostic and exact past 2^53
    either way.

    Scale: one window exchange on ``shard_col`` (pack ids are then local
    to a shard — at 10^12 docs pack WITHIN shards; a global single-stream
    order (shard_col=None) funnels the cumsum through one partition and
    is only for small frames). ``order_by`` must be a total order within
    a shard for a deterministic layout.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    clash = {"pack_id", "offset", "n_chunks"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has columns {sorted(clash)}; "
                         f"rename them before packing")
    drop_tok = None
    if counter is not None:
        if text_col is None:
            raise ValueError("counter= requires text_col= (the column "
                             "to tokenize)")
        drop_tok = temp_col(df, "__pack_tok")
        df = df.withColumn(drop_tok, counter(F.col(text_col)).cast("long"))
        token_col = drop_tok
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    part = [shard_col] if shard_col is not None else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum(token_col).over(w),
                            F.lit(0)).cast("long")
    tok = F.col(token_col).cast("long")
    cap = F.lit(capacity).cast("long")
    # integral `div`, NOT floor(a / b): long/long divides as doubles, and
    # past 2^53 cumulative tokens the rounded pack_id contradicts the
    # exact pmod offset (pack_id*capacity + offset != cum_before) —
    # within 10x of this module's own 10^12-doc claims for a
    # lightly-sharded run. `div` is exact at any scale.
    pack_id = F.call_function("div", cum_before, cap)
    last_pack = F.call_function("div", cum_before + tok - F.lit(1), cap)
    out = df.select(
        "*",
        pack_id.alias("pack_id"),
        F.pmod(cum_before, F.lit(capacity)).alias("offset"),
        F.when(tok > 0, last_pack - pack_id + 1).otherwise(F.lit(1))
        .cast("long").alias("n_chunks"))
    return out.drop(drop_tok) if drop_tok else out


def chunk_documents(df: DataFrame, max_tokens: int,
                    stride: Optional[int] = None, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Stride-overlapped token-window chunking: split each document into
    chunks of at most ``max_tokens`` whitespace tokens whose starts are
    ``stride`` tokens apart — the standard context-window prep before
    embedding or long-document training (``stride == max_tokens`` for
    disjoint chunks, ``stride < max_tokens`` for overlap).

    Complements :func:`pack_sequences` (which concatenates ACROSS
    documents under a capacity): chunking cuts WITHIN a document and
    keeps provenance. Output = the input row fanned out per chunk with
    ``chunk_idx`` (0-based), ``start_tok`` (1-based token offset of the
    chunk in the document), ``n_chunk_tokens`` and ``chunk_text``.

    Conventions: tokens are trim + whitespace-split (the
    ``textstats.token_count`` unit; chunk text re-joins with single
    spaces, so intra-document whitespace runs are normalized).
    Whitespace-only documents emit NO chunks (filter them or union back
    as needed). A tail start whose chunk would be a pure suffix of the
    previous chunk is dropped — the kept starts are the prefix
    1, 1+stride, … while the previous chunk does not already reach the
    document's end, so every document with ≥ 1 token emits ≥ 1 chunk
    and the last chunk always covers the final token.

    Scale shape: pure scan-side fan-out (one posexplode, no shuffle, no
    UDF); the gram arrays never materialize more than one document's
    tokens per row. At 100 TB the output is bounded by
    ceil(T/stride) chunks per document — budget the downstream
    partition count for output bytes ≈ input bytes × max_tokens/stride.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    stride = max_tokens if stride is None else stride
    if not 1 <= stride <= max_tokens:
        raise ValueError(f"stride must be in [1, max_tokens], got {stride}")
    clash = {"chunk_idx", "start_tok", "n_chunk_tokens",
             "chunk_text"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has columns {sorted(clash)}; "
                         f"rename them before chunking")
    t = F.trim(F.col(text_col))
    toks = F.split(t, r"\s+")
    n_tok = F.when(t == "", F.lit(0)).otherwise(F.size(toks))
    starts = F.when(n_tok > 0, F.filter(
        F.sequence(F.lit(1), n_tok, F.lit(stride)),
        lambda s: (s == 1) | (s - stride + max_tokens - 1 < n_tok))
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.transform(starts, lambda s: F.struct(
        s.alias("start_tok"),
        F.least(F.lit(max_tokens), n_tok - s + 1).alias("n_chunk_tokens"),
        F.array_join(F.slice(toks, s, max_tokens), " ").alias("chunk_text")))
    out = df.select("*", F.posexplode(chunk).alias("chunk_idx", "__chunk"))
    return (out.select("*", "__chunk.start_tok", "__chunk.n_chunk_tokens",
                       "__chunk.chunk_text")
            .drop("__chunk"))
