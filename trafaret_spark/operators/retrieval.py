"""BM25 full-text retrieval over a document corpus.

The retrieval op a training-data pipeline needs next to embedding ANN
(similarity.py): sparse lexical top-k — "find the corpus documents that
match these query strings" — used for eval-set decontamination sweeps,
targeted quality audits, and hard-negative mining. Okapi BM25 with the
Lucene idf variant::

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))

Spark-first plan (no Python anywhere):

1. postings build — ONE explode + groupBy(term, doc) shuffle; term df via
   a second groupBy on the (already unique) (term, doc) rows.
2. ultra-common terms are DROPPED via ``max_df_frac`` (default 0.5):
   stopword-grade terms carry near-zero idf but quadratic posting joins —
   this is the skew/blowup guard, same philosophy as dedup.capped_blocks,
   and it is part of the scoring contract (the oracle applies the same
   cut). Set to 1.0 to disable.
3. queries are the small side → distinct query terms broadcast-join the
   postings (no shuffle of the posting table for the match).
4. per-(query, doc) score agg, then the salted two-phase exact top-k
   (same shape as similarity.cosine_topk — no single-reducer rank).

Determinism contract: per-term contributions are quantized to integer
micro-units (``floor(contrib · 10^6)``) BEFORE summation, so scores are
exact integers — independent of partial-agg order and bit-reproducible by
the DuckDB oracle. The FP operation ORDER of ``contrib`` below is
normative (any algebraic rearrangement may round differently); ``ln`` is
the one libm call (documented 1-ulp cross-engine risk, same acceptance as
the rounded cosine oracles).

Reference analogue: none (trafaret has no retrieval); prompt-mandated
training-data op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from trafaret_spark.operators.dedup import normalize_text

__all__ = ["tokens", "build_postings", "corpus_stats", "bm25_topk",
           "bm25_topk_from_postings", "SCORE_SCALE"]

SCORE_SCALE = 1_000_000  # micro-unit quantization of per-term contributions


def corpus_stats(corpus: DataFrame, text_col: str = "text") -> tuple[int, float]:
    """(n_docs, avgdl) for :func:`bm25_topk_from_postings` — computed at
    index-build time alongside :func:`build_postings` and stored with the
    persisted index (the postings alone can't recover them: EMPTY docs
    count into N and avgdl but produce no posting rows). One bounded agg
    collected to two scalars; ``avgdl`` is the exact-integer double
    division the scoring contract treats as normative."""
    lens = corpus.select(tokens(F.col(text_col)).alias("__toks")) \
        .select(F.size("__toks").alias("dl"))
    row = lens.agg(F.count(F.lit(1)).alias("n"),
                   F.sum("dl").alias("sdl")).collect()[0]
    if not row["n"]:
        raise ValueError("corpus_stats: empty corpus")
    return int(row["n"]), row["sdl"] / row["n"]


def tokens(col: Column) -> Column:
    """Normalized word tokens as array<string>; blank OR NULL text →
    empty array (split of '' would yield [''], a phantom term; a NULL
    array would make ``size()`` ANSI-mode-dependent — -1 legacy vs NULL
    ANSI — breaking the library's ANSI-neutral contract in every
    downstream count)."""
    norm = normalize_text(col)
    return F.when(norm.isNull() | (norm == ""),
                  F.array().cast("array<string>")) \
        .otherwise(F.split(norm, r"\s+"))


def build_postings(corpus: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted index: one row per (term, doc) with ``tf`` (term count in
    doc) and ``dl`` (doc token length). One explode + one shuffle on
    (term, id). Empty docs produce no postings (dl still counted into
    avgdl by :func:`bm25_topk`, which reads lengths separately)."""
    t = corpus.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    return (t.select(id_col, F.size("__toks").alias("dl"),
                     F.explode("__toks").alias("term"))
            .groupBy("term", id_col, "dl")
            .agg(F.count(F.lit(1)).alias("tf")))


def bm25_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id", query_text_col: str = "text",
              k1: float = 1.2, b: float = 0.75,
              max_df_frac: float = 0.5,
              partial_partitions: int = 64) -> DataFrame:
    """Exact BM25 top-k: (query_id, doc_id, score, rank), rank 1 = best,
    ties broken by doc id. Documents sharing no surviving query term are
    unscored (absent), so a query can return fewer than ``k`` rows.

    ``score`` is the quantized sum / 10^6 (see module docstring); ranking
    uses the exact integer sum. Query term multiplicity is ignored
    (standard BM25 practice — a term counts once per query).

    Scale: the posting build is the only corpus shuffle; the query-term
    match is a broadcast join (queries are the small side by definition);
    the ``max_df_frac`` cut bounds the worst posting list at
    ``max_df_frac·N`` rows; top-k is two-phase salted (no single-reducer
    rank). The corpus-stats agg (N, Σdl) is one bounded job collected to
    two scalars. At 100 TB, build the index ONCE with
    :func:`build_postings`, persist it (parquet bucketed by term), and
    run query batches through :func:`bm25_topk_from_postings` — this
    convenience wrapper recomputes the index per call.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    n_docs, avgdl = corpus_stats(corpus, text_col)
    post = build_postings(corpus, id_col, text_col)
    return bm25_topk_from_postings(
        post, queries, n_docs=n_docs, avgdl=avgdl, k=k, id_col=id_col,
        query_id_col=query_id_col, query_text_col=query_text_col,
        k1=k1, b=b, max_df_frac=max_df_frac,
        partial_partitions=partial_partitions)


def bm25_topk_from_postings(post: DataFrame, queries: DataFrame,
                            n_docs: int, avgdl: float, k: int = 10,
                            id_col: str = "doc_id",
                            query_id_col: str = "query_id",
                            query_text_col: str = "text",
                            k1: float = 1.2, b: float = 0.75,
                            max_df_frac: float = 0.5,
                            partial_partitions: int = 64) -> DataFrame:
    """BM25 top-k against a prebuilt inverted index — the production path
    when many query batches hit one corpus: postings come from
    :func:`build_postings` (possibly read back from a term-bucketed
    table, so the match join needs no posting shuffle at all), and the
    corpus constants ``n_docs`` / ``avgdl`` (which include EMPTY docs the
    postings can't see) are passed in from the index-build run. Same
    output and determinism contract as :func:`bm25_topk`.
    """
    if not 0.0 < max_df_frac <= 1.0:
        raise ValueError(f"max_df_frac must be in (0, 1], got {max_df_frac}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_docs < 1:
        raise ValueError(f"n_docs must be >= 1, got {n_docs}")

    stats = post.groupBy("term").agg(F.count(F.lit(1)).alias("df")) \
        .filter(F.col("df") <= F.lit(float(max_df_frac) * n_docs))
    # normative idf FP order: ln(1 + (N - df + 0.5) / (df + 0.5))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    scored_post = post.join(stats.withColumn("idf", idf).drop("df"), "term")

    q_terms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(tokens(F.col(query_text_col))))
         .alias("term"))
    # normative contribution FP order, then micro-unit quantization
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    contrib = F.col("idf") * ((tf * F.lit(k1 + 1.0))
                              / (tf + F.lit(k1) * (F.lit(1.0 - b)
                                                   + F.lit(b) * (dl / F.lit(avgdl)))))
    matched = (scored_post.join(F.broadcast(q_terms), "term")
               .withColumn("__cq", F.floor(contrib * F.lit(SCORE_SCALE))
                           .cast("long")))
    per_doc = matched.groupBy(query_id_col, id_col) \
        .agg(F.sum("__cq").alias("__sq"))

    # salted two-phase exact top-k (cosine_topk's shape): phase 1 bounds
    # every reducer to ~|candidates|/partial_partitions rows, phase 2
    # ranks ≤ partial_partitions·k survivors per query. Integer scores →
    # no NaN/NULL ordering cases.
    salted = per_doc.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(partial_partitions)))
    part = (salted.groupBy(query_id_col, "__salt")
            .agg(F.slice(F.array_sort(F.collect_list(
                F.struct((-F.col("__sq")).alias("__key"),
                         F.col(id_col), F.col("__sq")))), 1, k)
                .alias("__cand")))
    cand = (part.select(query_id_col, F.explode("__cand").alias("__c"))
            .select(query_id_col, F.col(f"__c.{id_col}").alias(id_col),
                    F.col("__c.__sq").alias("__sq")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__sq"),
                                                 F.asc(id_col))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .withColumn("score", F.col("__sq") / F.lit(float(SCORE_SCALE)))
            .drop("__sq"))
