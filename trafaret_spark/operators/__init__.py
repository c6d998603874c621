"""Dataflow operators: as-of join, windowed features, dedup, similarity,
text analysis, multimodal plumbing."""

from trafaret_spark.operators.asof import asof_join
from trafaret_spark.operators.features import (
    Features,
    LeakageError,
    backfill,
    session_stats,
    sessionize,
)

__all__ = [
    "asof_join",
    "Features", "LeakageError", "sessionize", "session_stats", "backfill",
]
