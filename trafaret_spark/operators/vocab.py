"""Corpus vocabulary extraction + deterministic token-id encoding.

The step between curation and tokenizer training: build the (token,
count, token_id) table a BPE/unigram trainer seeds from, and encode
documents to id sequences against it. Ids are DETERMINISTIC — ordered by
(count desc, token asc) — so two runs (or two engines) over the same
corpus assign identical ids, and a persisted vocab keeps old encodings
valid (ids only append as the corpus grows monotonically... re-training
reassigns: persist the vocab table, don't re-derive it per run).

Scale shape: one token explode + one groupBy(token) count (uniform key),
one global rank. The rank is a single-partition window over the VOCAB
table (≤ a few million rows — vocabulary, not corpus, cardinality), not
over the corpus. Encoding is a broadcast-or-shuffle join of exploded
tokens against the vocab (AQE broadcasts when it fits) followed by a
per-document re-assembly groupBy — the document's tokens stay together
through one exchange on the id column.

Reference analogue: none (prompt-mandated training-data op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafaret_spark.operators.retrieval import tokens

__all__ = ["build_vocab", "encode_tokens"]


def build_vocab(df: DataFrame, text_col: str = "text",
                min_count: int = 1,
                max_size: "int | None" = None) -> DataFrame:
    """Vocabulary table ``(token, count, token_id)`` over the corpus's
    normalized tokens (``retrieval.tokens`` — the same normalization the
    BM25/LM families use, so their vocabularies agree). ``token_id`` is
    0-based, ordered by (count desc, token asc): deterministic across
    runs, retries, and engines. ``min_count`` drops the long tail before
    ranking; ``max_size`` keeps the top-N after it (both optional).

    The ranking window is intentionally single-partition: it runs over
    the aggregated VOCAB (bounded by distinct-token cardinality, not the
    corpus) after the map-side-combined count shuffle, so at 100 TB of
    text the window input is still only the vocabulary.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    counts = (df.select(F.explode(tokens(F.col(text_col))).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("count"))
              .filter(F.col("count") >= min_count))
    w = Window.orderBy(F.col("count").desc(), F.col("token"))
    ranked = counts.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("long"))
    if max_size is not None:
        if max_size < 1:
            raise ValueError(f"max_size must be >= 1, got {max_size}")
        ranked = ranked.filter(F.col("token_id") < max_size)
    return ranked


def encode_tokens(df: DataFrame, vocab: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  oov_id: "int | None" = None,
                  name: str = "token_ids") -> DataFrame:
    """Encode each document's normalized token sequence to
    ``array<long>`` ids against ``vocab`` (a :func:`build_vocab` table,
    typically read back from its persisted parquet). Out-of-vocabulary
    tokens become ``oov_id`` (or are DROPPED when ``oov_id`` is None —
    state the choice, don't default silently into one). Adds ``name``
    plus ``n_tokens`` and ``n_oov``.

    Position-faithful: the explode carries each token's position and the
    re-assembly sorts by it, so ids come back in document order whatever
    the shuffle did. One join (AQE broadcasts a small vocab) + one
    groupBy on the document id.
    """
    pos_tok = (df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("__pos", "token")))
    joined = pos_tok.join(vocab.select("token", "token_id"),
                          ["token"], "left")
    if oov_id is not None:
        enc = F.coalesce(F.col("token_id"), F.lit(int(oov_id)).cast("long"))
    else:
        enc = F.col("token_id")
    per_doc = (joined
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum(F.when(F.col("token_id").isNull(), 1)
                          .otherwise(0)).cast("long").alias("n_oov"),
                    F.array_sort(F.collect_list(
                        F.struct(F.col("__pos").alias("p"),
                                 enc.alias("v")))).alias("__pv")))
    ids = F.filter(F.transform(F.col("__pv"), lambda s: s["v"]),
                   lambda v: v.isNotNull())
    out = per_doc.select(id_col, "n_tokens", "n_oov", ids.alias(name))
    # docs with zero tokens never reach the explode — restore as empty
    base = df.select(id_col).distinct()
    return (base.join(out, [id_col], "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"),
                    F.coalesce("n_oov", F.lit(0)).cast("long")
                    .alias("n_oov"),
                    F.coalesce(F.col(name),
                               F.array().cast("array<bigint>")).alias(name)))
