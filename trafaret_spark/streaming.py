"""Structured Streaming surface for the transcript engine.

The validation stage (one wide projection) is stateless, so
``apply_schema`` works on a streaming DataFrame unchanged — this module adds
the stateful pieces a streaming ingest needs:

  * ``validate_stream``      — validate+coerce + valid/quarantine routing for
                               ``foreachBatch`` sinks;
  * ``stream_sessionize``    — watermarked session windows per conversation
                               (built-in ``session_window`` — gap semantics
                               identical to the batch ts-gap sessionizer for
                               in-order events);
  * ``running_turn_stats``   — custom stateful operator via
                               ``applyInPandasWithState`` (Arrow-batched,
                               never per-row Python): running turn count +
                               last-tool backfill per conversation across
                               micro-batches.

Scale notes: state is keyed by conv_id (the same key every batch operator
shuffles on), watermarks bound state size, and the stateful op emits one row
per (conv, batch) — state store size is O(live conversations), not O(turns).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from trafaret_spark.schema import Schema
from trafaret_spark.validate import apply_schema

__all__ = ["validate_stream", "stream_sessionize", "running_turn_stats",
           "stream_exact_dedup", "stream_minhash_dedup_sink",
           "stream_embedding_dedup_sink"]


def validate_stream(stream_df: DataFrame, schema: Schema,
                    errors_col: str = "errors") -> DataFrame:
    """Vectorized validate+coerce on a streaming DataFrame (stateless
    projection — identical semantics to the batch stage)."""
    return apply_schema(stream_df, schema, errors_col=errors_col)


def stream_sessionize(df: DataFrame, by: str = "conv_id", ts: str = "ts",
                      gap_s: float = 1800.0,
                      watermark_s: float = 3600.0) -> DataFrame:
    """Watermarked per-conversation session aggregation: one output row per
    (conv, session window) with turn count and span. Late rows beyond the
    watermark are dropped (bounded state at 10^12-turn scale)."""
    wm = df.withWatermark(ts, f"{int(watermark_s)} seconds")
    return (wm.groupBy(F.col(by),
                       F.session_window(F.col(ts), f"{int(gap_s)} seconds"))
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.min(ts).alias("session_start"),
                 F.max(ts).alias("session_end"))
            .select(by, F.col("session_window.start").alias("window_start"),
                    F.col("session_window.end").alias("window_end"),
                    "n_turns", "session_start", "session_end"))


def stream_exact_dedup(df: DataFrame, text_col: str = "text",
                       ts: str = "ts", watermark_s: float = 3600.0,
                       normalized: bool = True) -> DataFrame:
    """Streaming exact dedup: keep the first document per normalized-text
    hash, with state bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — two docs more than ``watermark_s``
    apart may both survive, the standard streaming-dedup contract; exact
    global dedup is the batch operator's job).

    The dedup key is the same md5-of-normalized-text as
    ``dedup.exact_dedup``, so a streaming ingest and a batch backfill
    agree on group identity. State store size is O(distinct texts inside
    the watermark), not O(stream)."""
    from trafaret_spark.operators.dedup import normalize_text
    key = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    keyed = (df.withColumn("dup_group", F.md5(key))
             .withWatermark(ts, f"{int(watermark_s)} seconds"))
    return keyed.dropDuplicatesWithinWatermark(["dup_group"])


def stream_minhash_dedup_sink(index_path: str, pairs_path: str, **kw):
    """``foreachBatch`` sink for streaming near-dup detection: each
    micro-batch is banded once, appended to the persisted LSH index store
    at ``index_path`` (``dedup.minhash_index_ingest``), and its
    incremental candidate pairs — vs ALL history plus the batch itself —
    land under ``pairs_path/ingest_batch=<id>``.

    Both writes are dynamic-partition overwrites keyed by the micro-batch
    id, so a batch replayed after a failure rewrites exactly its own
    partitions: the sink is effectively-once without any dedup on read.
    State lives entirely in the two parquet stores (no state store),
    so the stream restarts from any checkpoint without rebuild.
    ``**kw`` forwards to :func:`~trafaret_spark.operators.dedup.
    minhash_index_ingest` (minhash params must stay fixed per store).

    Usage::

        q = (stream.writeStream
             .foreachBatch(stream_minhash_dedup_sink(idx, pairs))
             .option("checkpointLocation", ckpt).start())
    """
    from trafaret_spark.operators.dedup import minhash_index_ingest
    return _ingest_sink(minhash_index_ingest, index_path, pairs_path, **kw)


def stream_embedding_dedup_sink(index_path: str, pairs_path: str, **kw):
    """The embedding twin of :func:`stream_minhash_dedup_sink`: each
    micro-batch of ``(vec_id, embedding)`` rows is sign-LSH-bucketed
    once, appended to the persisted band-index store
    (``similarity.embedding_index_ingest``), and its incremental
    candidate pairs vs all history land under
    ``pairs_path/ingest_batch=<id>`` — same store layout, same
    effectively-once replay contract, no state store. ``**kw`` forwards
    to the ingest (LSH params must stay fixed per store); feed the pair
    stream to an exact-cosine verify against the vector table when
    scores are needed."""
    from trafaret_spark.operators.similarity import embedding_index_ingest
    return _ingest_sink(embedding_index_ingest, index_path, pairs_path,
                        **kw)


def _ingest_sink(ingest_fn, index_path: str, pairs_path: str, **kw):
    """Shared foreachBatch body: ingest the micro-batch into the index
    store, write its candidate pairs under the batch-id partition (both
    dynamic overwrites keyed by micro-batch id — replay-idempotent)."""
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = str(batch_id)
        pairs = ingest_fn(batch_df, index_path, bid, **kw)
        (pairs.withColumn("ingest_batch", F.lit(bid))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch").parquet(pairs_path))

    return _sink


_STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("last_tool", T.StringType()),
])
_OUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("n_turns_total", T.LongType()),
    T.StructField("last_tool", T.StringType()),
])


def _turn_stats_fn(key: Tuple[str], pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterable[pd.DataFrame]:
    """Arrow-batched stateful update: running turn count + tool backfill."""
    n, last_tool = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        tools = pdf["tool"].dropna()
        if len(tools):
            # rows arrive ordered within a micro-batch file source; take the
            # last non-null tool by turn order
            ordered = pdf.dropna(subset=["tool"]).sort_values("turn_idx")
            last_tool = str(ordered["tool"].iloc[-1])
    state.update((n, last_tool))
    yield pd.DataFrame({"conv_id": [key[0]], "n_turns_total": [n],
                        "last_tool": [last_tool]})


def running_turn_stats(df: DataFrame, by: str = "conv_id") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per
    conversation, the running turn count and forward-filled last tool across
    micro-batches — the streaming analogue of the batch backfill feature."""
    return (df.groupBy(by)
            .applyInPandasWithState(_turn_stats_fn,
                                    outputStructType=_OUT_SCHEMA,
                                    stateStructType=_STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
