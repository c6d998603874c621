"""Windowed point-in-time feature layer (SURVEY.md E5-E8).

A ``Features`` builder collects lag/lead, rolling (row- and time-frame),
sessionization, backfill, and cumulative specs, then ``apply(df)`` emits them
in ONE select pass. All frames end at the current row (``rowsBetween(-k, 0)``
/ ``rangeBetween(-s, 0)``) so no feature can read a future turn — zero
temporal leakage by construction.

``lead`` is leaky by definition; ``apply(point_in_time=True)`` (the default)
rejects any plan containing it — the plan linter Catalyst has no concept of
(SURVEY.md §4.2.3). Pass ``point_in_time=False`` only for offline label
construction.

Windows share ``partitionBy(by)``, so Catalyst plans a single hash exchange
on the conversation key and at most two sorts (one per distinct ordering:
turn-index frames and time-range frames).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["Features", "LeakageError", "sessionize", "session_stats",
           "backfill", "time_rollup"]

_AGG = {
    "sum": F.sum, "avg": F.avg, "mean": F.avg, "min": F.min, "max": F.max,
    "count": F.count, "stddev": F.stddev, "first": F.first, "last": F.last,
}


class LeakageError(ValueError):
    """A feature plan reads future rows in point-in-time mode."""


@dataclasses.dataclass
class _Spec:
    name: str
    kind: str          # lag|lead|rolling|rolling_time|session|backfill|cum
    col: Optional[str] = None
    fn: str = "sum"
    k: int = 1
    seconds: float = 0.0
    leaky: bool = False


class Features:
    """Declarative feature plan over (by, order, ts)-shaped tables."""

    def __init__(self, by: Union[str, Sequence[str]] = "conv_id",
                 order: str = "turn_idx", ts: str = "ts"):
        self.by = list(by) if isinstance(by, (list, tuple)) else [by]
        self.order = order
        self.ts = ts
        self.specs: list[_Spec] = []

    # ---- builders -------------------------------------------------------
    def lag(self, col: str, k: int = 1, name: Optional[str] = None) -> "Features":
        self.specs.append(_Spec(name or f"{col}_lag{k}", "lag", col, k=k))
        return self

    def lead(self, col: str, k: int = 1, name: Optional[str] = None) -> "Features":
        self.specs.append(_Spec(name or f"{col}_lead{k}", "lead", col, k=k, leaky=True))
        return self

    def rolling(self, col: str, fn: str = "avg", window: int = 3,
                name: Optional[str] = None) -> "Features":
        """Trailing row frame: current row + previous window-1 rows."""
        self.specs.append(_Spec(name or f"{col}_{fn}{window}", "rolling", col,
                                fn=fn, k=window))
        return self

    def rolling_time(self, col: str, fn: str = "sum", seconds: float = 600,
                     name: Optional[str] = None) -> "Features":
        """Trailing time frame: rows with ts in [t - seconds, t]."""
        self.specs.append(_Spec(name or f"{col}_{fn}{int(seconds)}s",
                                "rolling_time", col, fn=fn, seconds=seconds))
        return self

    def cum(self, col: str, fn: str = "sum", name: Optional[str] = None) -> "Features":
        self.specs.append(_Spec(name or f"{col}_cum{fn}", "cum", col, fn=fn))
        return self

    def session_id(self, gap_seconds: float = 1800,
                   name: str = "session_id") -> "Features":
        """ts-gap sessionization: a new session starts when the gap since the
        previous turn exceeds gap_seconds; ids are 0-based per conversation."""
        self.specs.append(_Spec(name, "session", seconds=gap_seconds))
        return self

    def backfill(self, col: str, name: Optional[str] = None) -> "Features":
        """Forward-fill the last non-null value (sparse tool/role features)."""
        self.specs.append(_Spec(name or f"{col}_ffill", "backfill", col))
        return self

    # ---- compile --------------------------------------------------------
    def apply(self, df: DataFrame, point_in_time: bool = True) -> DataFrame:
        leaky = [s.name for s in self.specs if s.leaky]
        if point_in_time and leaky:
            raise LeakageError(
                f"features {leaky} read future rows; pass point_in_time=False "
                "only for offline label construction")

        w_row = Window.partitionBy(*self.by).orderBy(self.order)

        exprs: list[Column] = [F.col(c) for c in df.columns]
        for s in self.specs:
            if s.kind == "lag":
                e = F.lag(s.col, s.k).over(w_row)
            elif s.kind == "lead":
                e = F.lead(s.col, s.k).over(w_row)
            elif s.kind == "rolling":
                e = _AGG[s.fn](s.col).over(
                    w_row.rowsBetween(-(s.k - 1), Window.currentRow))
            elif s.kind == "rolling_time":
                ts_us = F.unix_micros(F.col(self.ts).cast("timestamp"))
                w_rng = (Window.partitionBy(*self.by).orderBy(ts_us)
                         .rangeBetween(-int(s.seconds * 1e6), 0))
                e = _AGG[s.fn](s.col).over(w_rng)
            elif s.kind == "cum":
                e = _AGG[s.fn](s.col).over(
                    w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            elif s.kind == "session":
                # integer-microsecond gap: exact boundary semantics (a double
                # division could flip `gap > threshold` at representation edges)
                ts_us = F.unix_micros(F.col(self.ts).cast("timestamp"))
                gap = ts_us - F.lag(ts_us).over(w_row)
                is_new = F.when(gap > F.lit(int(s.seconds * 1_000_000)), 1).otherwise(0)
                e = F.sum(is_new).over(
                    w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            elif s.kind == "backfill":
                e = F.last(s.col, ignorenulls=True).over(
                    w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            else:  # pragma: no cover
                raise ValueError(s.kind)
            exprs.append(e.alias(s.name))
        return df.select(*exprs)


# ---- standalone conveniences --------------------------------------------

def sessionize(df: DataFrame, by="conv_id", ts="ts", order="turn_idx",
               gap_seconds: float = 1800, name: str = "session_id") -> DataFrame:
    return Features(by=by, order=order, ts=ts).session_id(gap_seconds, name).apply(df)


def backfill(df: DataFrame, cols: Sequence[str], by="conv_id",
             order="turn_idx", suffix: str = "_ffill") -> DataFrame:
    f = Features(by=by, order=order)
    for c in cols:
        f.backfill(c, name=c + suffix)
    return f.apply(df)


def session_stats(df_with_sessions: DataFrame, by="conv_id",
                  session_col: str = "session_id", ts: str = "ts") -> DataFrame:
    """Per-session aggregates (hash agg; partial+final — Catalyst-native)."""
    return (df_with_sessions
            .groupBy(*([by] if isinstance(by, str) else list(by)), session_col)
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.min(ts).alias("session_start"),
                 F.max(ts).alias("session_end"),
                 (F.unix_micros(F.max(ts).cast("timestamp"))
                  - F.unix_micros(F.min(ts).cast("timestamp")))
                 .cast("double").alias("duration_us")))


def time_rollup(df: DataFrame, ts: str = "ts", every: str = "1 hour",
                aggs: dict | None = None, by=None) -> DataFrame:
    """Hypertable-style time-bucket rollup: one row per (by-keys, bucket)
    with the requested aggregates — the continuous-aggregate primitive of
    timeseries stores, expressed as ``groupBy(window(ts, every))`` so
    Catalyst runs it as a partial+final hash aggregate (map-side combine,
    ONE shuffle on the (by, bucket) key; bucket cardinality is
    span/``every``, so the key is never skewed by a hot conversation).

    ``aggs`` maps output name -> (fn, col) with fn in
    {sum, count, min, max, avg} (same spec as partitioning.salted_agg).
    Output: by-keys, ``bucket_start``, ``bucket_end``, aggregates.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    aggs = aggs or {"n_rows": ("count", "*")}
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
           "avg": F.avg}
    exprs = []
    for name, (fn, col) in aggs.items():
        if fn not in fns:
            raise ValueError(f"unsupported rollup agg {fn!r}")
        src = F.lit(1) if (fn == "count" and col == "*") else F.col(col)
        exprs.append(fns[fn](src).alias(name))
    out = (df.groupBy(*by, F.window(F.col(ts), every).alias("__w"))
           .agg(*exprs))
    return out.select(*by,
                      F.col("__w.start").alias("bucket_start"),
                      F.col("__w.end").alias("bucket_end"),
                      *[F.col(n) for n in aggs])
