"""Partitioning control + skew mitigation (SURVEY.md E11/E12).

At 10^12-turn scale the conversation key is heavy-tailed (a few agent
conversations run to 10^5+ turns). Strategies:

  * `repartition_by_conv` — explicit range repartition so window/as-of stages
    shuffle once and sort locally;
  * `detect_skew` — cheap sampled groupBy to find hot keys;
  * `salted_agg` — two-phase (salt → partial agg → final agg) rewrite for
    associative aggregations over hot keys. Windows that need full per-key
    order (lag/backfill) cannot be salted without breaking semantics; those
    rely on AQE skew handling + the fact that a single conversation, even at
    10^5 turns, fits one task comfortably (~MBs).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["repartition_by_conv", "detect_skew", "salted_agg", "with_salt"]


def repartition_by_conv(df: DataFrame, by: Union[str, Sequence[str]] = "conv_id",
                        order: Optional[str] = "turn_idx",
                        n: Optional[int] = None) -> DataFrame:
    """Range-partition on (by, order) for stable, byte-equal output ordering
    (SURVEY.md E10) and co-located window evaluation."""
    cols = ([by] if isinstance(by, str) else list(by)) + ([order] if order else [])
    if n:
        return df.repartitionByRange(n, *cols)
    return df.repartitionByRange(*cols)


def detect_skew(df: DataFrame, key: str = "conv_id",
                threshold_rows: int = 100_000, sample: float = 0.01) -> list:
    """Sampled hot-key detection; returns key values whose estimated row count
    exceeds threshold_rows. Cheap: one pass over a 1% sample."""
    est = (df.sample(sample, seed=7)
           .groupBy(key).count()
           .filter(F.col("count") * (1.0 / sample) > threshold_rows))
    return [r[key] for r in est.collect()]


def with_salt(df: DataFrame, key: str = "conv_id", buckets: int = 16,
              salt_col: str = "__salt",
              salt_from: Optional[Sequence[str]] = None) -> DataFrame:
    """Deterministic salt splitting one hot key across ``buckets`` reducers
    for associative aggs.

    The salt hashes row CONTENT (``salt_from`` columns, default: every
    column) — stable across task retries, unlike
    ``monotonically_increasing_id`` whose value depends on which task
    attempt a row lands in (a retried partial agg would re-bucket rows and
    double-count under speculative execution). Fully duplicate rows share a
    bucket, which only costs salting entropy in the degenerate
    all-rows-identical case."""
    cols = list(salt_from) if salt_from else df.columns
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)))


def salted_agg(df: DataFrame, key: Union[str, Sequence[str]], aggs: dict,
               buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed keys: groupBy(key, salt) partial →
    groupBy(key) final. `aggs` maps output name -> (fn, col) with fn in
    {sum, count, min, max}; avg is decomposed into sum/count automatically.

    Note: Spark's hash aggregate already does map-side partial aggregation,
    which removes most skew for aggs; this explicit rewrite is for the case
    where per-key state is too big for one reducer (e.g. collect-like aggs)
    or AQE is disabled.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salted = with_salt(df, keys[0], buckets)

    partial_exprs, final_exprs = [], []
    for name, (fn, col) in aggs.items():
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{name}"))
            final_exprs.append(F.min(f"__p_{name}").alias(name))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{name}"))
            final_exprs.append(F.max(f"__p_{name}").alias(name))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{name}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{name}"))
            final_exprs.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name))
        else:
            raise ValueError(f"unsupported salted agg fn {fn!r}")

    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
