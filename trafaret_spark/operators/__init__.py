"""Dataflow operators: as-of join, range join, windowed features, time
rollup, dedup, similarity, text analysis, multimodal plumbing."""

from trafaret_spark.operators.asof import asof_join
from trafaret_spark.operators.features import (
    Features,
    LeakageError,
    backfill,
    session_stats,
    sessionize,
    time_rollup,
)
from trafaret_spark.operators.curation import (
    cap_per_key,
    decontaminate,
    ngram_decontaminate,
    pack_sequences,
)
from trafaret_spark.operators.conversations import (
    conversation_features,
    conversation_report,
    dedup_conversations,
    dedup_stutter,
    neardup_conversations,
    render_conversation,
    truncate_turns,
    turn_errors,
)
from trafaret_spark.operators.lmscore import (
    BigramLM,
    lm_score,
    train_bigram_lm,
)
from trafaret_spark.operators.rangejoin import range_join
from trafaret_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_from_postings,
    build_postings,
)
from trafaret_spark.operators.sampling import (
    assign_splits,
    mixture_sample,
    sample_by_hash,
    stratified_sample_by_hash,
)

__all__ = [
    "asof_join", "range_join",
    "Features", "LeakageError", "sessionize", "session_stats", "backfill",
    "time_rollup", "sample_by_hash", "stratified_sample_by_hash",
    "mixture_sample", "assign_splits",
    "ngram_decontaminate", "decontaminate", "cap_per_key", "pack_sequences",
    "bm25_topk", "bm25_topk_from_postings", "build_postings",
    "BigramLM", "train_bigram_lm", "lm_score",
    "turn_errors", "conversation_report", "dedup_stutter", "truncate_turns",
    "render_conversation", "dedup_conversations", "neardup_conversations",
    "conversation_features",
]
