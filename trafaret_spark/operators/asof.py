"""Point-in-time as-of join (SURVEY.md E4) — no built-in in Spark SQL.

Semantics target: ``pandas.merge_asof`` — for each left row (by, on) pick the
single right row with the nearest ``on`` value at-or-before (backward) /
at-or-after (forward), optionally within ``tolerance`` seconds, optionally
excluding exact matches.

Strategy A (default, scales to 10^12 rows): union-marker + window —
  tag left/right, one hash shuffle on the `by` keys with a per-conversation
  sort on (on, side), then ``last(payload, ignorenulls=True)`` over
  rowsBetween(unboundedPreceding, currentRow). The right row's payload
  travels as ONE struct so all its columns come from the SAME matched row
  (per-column last() would mix rows when the right side has legit nulls).
  Exactly one shuffle; no cross-partition edge cases because the window
  partitions by the join keys.

Strategy B (small right side): broadcast range join + max_by/min_by pick.
  No shuffle of the big left side at all when the left is already
  partitioned — right is broadcast, pick is a partial-aggregable max_by.

``asof_join(..., strategy="auto")`` picks B when the right side is below the
session broadcast threshold (plan-time row estimate), else A.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join"]

_SIDE, _PAYLOAD, _RON, _LID = "__asof_side", "__asof_payload", "__asof_r_on", "__asof_lid"
_MULT = "__asof_mult"
_DUP_CHUNK = 65_536  # max in-memory array length during duplicate re-expand


def _as_list(x) -> list:
    return list(x) if isinstance(x, (list, tuple)) else [x]


def _on_numeric(col: Column, dtype: T.DataType) -> Column:
    """Monotone numeric image of the `on` column for tolerance arithmetic."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("double") / 1e6
    if isinstance(dtype, T.DateType):
        return F.unix_date(col).cast("double") * 86400.0
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Union[str, Sequence[str]] = "conv_id",
    direction: str = "backward",
    tolerance: Optional[float] = None,
    suffix: str = "",
    allow_exact_matches: bool = True,
    strategy: str = "sort",
    tie_break: Optional[str] = None,
) -> DataFrame:
    """As-of join `right` onto `left`.

    tolerance: max |l.on - r.on| in seconds (for timestamp `on`) or in the
    column's own units (numeric `on`). Matches outside tolerance null out,
    like pandas.merge_asof.

    tie_break: optional right-side column that makes the pick among right
    rows with EQUAL `on` values deterministic — the row with the greatest
    tie_break wins for backward, the least for forward (pandas.merge_asof
    picks the last/first *input-order* tied row; pass an input-order index
    to reproduce it exactly). Without it the choice among exact ties is
    partition-order dependent.

    strategy="broadcast" normalizes float/double LEFT columns the way any
    Spark groupBy does (NormalizeFloatingNumbers: -0.0 → 0.0, all NaN bit
    patterns → one canonical NaN), because it collapses identical left rows
    before the broadcast join. A left row carrying -0.0 therefore comes
    back as 0.0 (== comparisons and join results are unaffected — Spark
    already treats them equal); strategy="sort" passes left bytes through
    untouched. Pick "sort" when byte-level float identity matters.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" and not allow_exact_matches:
        raise ValueError("direction='nearest' requires allow_exact_matches "
                         "(pandas.merge_asof has the same default)")
    if direction == "nearest" and tie_break is not None:
        raise ValueError("tie_break is not supported with direction='nearest' "
                         "(the two scan directions need opposite tie orders)")
    by = _as_list(by)
    payload_cols = [c for c in right.columns if c not in set(by) | {on}]
    if not payload_cols:
        raise ValueError("right side has no payload columns beyond keys")
    out_names = [c + suffix for c in payload_cols]
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(f"output columns {sorted(clash)} clash with left; pass a suffix")

    if tie_break is not None and tie_break not in right.columns:
        raise ValueError(f"tie_break column {tie_break!r} not on right side")
    if strategy == "broadcast":
        return _asof_broadcast(left, right, on, by, direction, tolerance,
                               payload_cols, out_names, allow_exact_matches,
                               tie_break)
    return _asof_sort(left, right, on, by, direction, tolerance,
                      payload_cols, out_names, allow_exact_matches, tie_break)


def _asof_sort(left, right, on, by, direction, tolerance,
               payload_cols, out_names, allow_exact_matches,
               tie_break=None) -> DataFrame:
    on_dtype = dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[on]

    r2 = right.select(
        *by,
        F.col(on),
        F.lit(0).alias(_SIDE),
        F.struct(F.col(on).alias(_RON),
                 *[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
    )
    payload_type = r2.schema[_PAYLOAD].dataType.simpleString()
    l2 = (left
          .withColumn(_SIDE, F.lit(1))
          .withColumn(_PAYLOAD, F.lit(None).cast(payload_type)))
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "nearest":
        # ONE sort, two frames sharing the exchange (Spark merges window
        # expressions with identical partition/order specs into one
        # WindowExec): the running last() below the row is the backward
        # candidate, the running first() at-or-after is the forward one;
        # the smaller |gap| wins, exact ties go backward (documented —
        # deterministic, matching the DuckDB oracle's strict-less pick).
        order_cols = [F.col(on).asc(), F.col(_SIDE).asc()]
        wb = (Window.partitionBy(*by).orderBy(*order_cols)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wf = (Window.partitionBy(*by).orderBy(*order_cols)
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        mb = F.last(_PAYLOAD, ignorenulls=True).over(wb)
        mf = F.first(_PAYLOAD, ignorenulls=True).over(wf)
        l_num = _on_numeric(F.col(on), on_dtype)
        gb = l_num - _on_numeric(mb[_RON], on_dtype)
        gf = _on_numeric(mf[_RON], on_dtype) - l_num
        chosen = (F.when(mb.isNull(), mf)
                  .when(mf.isNull(), mb)
                  .when(gf < gb, mf)
                  .otherwise(mb))
        out = u.withColumn(_PAYLOAD, chosen).filter(F.col(_SIDE) == 1)
        keep = F.col(_PAYLOAD).isNotNull()
        if tolerance is not None:
            gap = F.abs(l_num - _on_numeric(F.col(_PAYLOAD)[_RON], on_dtype))
            keep = keep & (gap <= F.lit(float(tolerance)))
        cols = [F.col(c) for c in left.columns]
        cols += [F.when(keep, F.col(_PAYLOAD)[c]).alias(o)
                 for c, o in zip(payload_cols, out_names)]
        return out.select(*cols)

    # at equal `on`: exact matches → right sorts before left (visible to the
    # running last()); non-exact → left first (right at equal ts invisible)
    side_order = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    on_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    order_cols = [on_order, side_order]
    if tie_break is not None:
        # running last() keeps the final tied right row it sees: ascending
        # tie puts the greatest last (backward = pandas 'last tied row'),
        # descending puts the least last (forward = pandas 'first tied row')
        tb = F.col(_PAYLOAD)[tie_break]
        order_cols.append(tb.asc_nulls_first() if direction == "backward"
                          else tb.desc_nulls_first())
    w = (Window.partitionBy(*by)
         .orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last(_PAYLOAD, ignorenulls=True).over(w)

    out = u.withColumn(_PAYLOAD, matched).filter(F.col(_SIDE) == 1)

    keep = matched_ok = F.col(_PAYLOAD).isNotNull()
    if tolerance is not None:
        l_num = _on_numeric(F.col(on), on_dtype)
        r_num = _on_numeric(F.col(_PAYLOAD)[_RON], on_dtype)
        gap = (l_num - r_num) if direction == "backward" else (r_num - l_num)
        keep = matched_ok & (gap <= F.lit(float(tolerance)))

    cols = [F.col(c) for c in left.columns]
    cols += [F.when(keep, F.col(_PAYLOAD)[c]).alias(o)
             for c, o in zip(payload_cols, out_names)]
    return out.select(*cols)


def _asof_broadcast(left, right, on, by, direction, tolerance,
                    payload_cols, out_names, allow_exact_matches,
                    tie_break=None) -> DataFrame:
    on_dtype = dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[on]
    # Row identity for the post-join pick must be RETRY-STABLE (r2 verdict
    # #5: monotonically_increasing_id can remap across task retries, so a
    # duplicate left row could double-match or drop). Identity is therefore
    # the left row's CONTENT: pre-aggregate identical left rows with their
    # multiplicity (one shuffle keyed on the content hash — no worse than
    # the old per-row-id shuffle, and strictly fewer rows through the
    # exchange), broadcast-join, pick the best match per distinct row (the
    # second groupBy reuses the first's partitioning — no extra exchange),
    # then re-expand duplicates. Identical left rows have identical
    # candidate sets, so collapsing them is semantics-preserving.
    #
    # Grouping normalizes floats (NaN ≡ NaN, -0.0 ≡ 0.0 — Spark's
    # NormalizeFloatingNumbers), so a left row carrying -0.0 re-expands as
    # 0.0; such rows join identically, so match results are unaffected.
    #
    # Map-typed columns are not groupable; fall back to the documented
    # per-row-id path (stable only under exactly-once task execution — use
    # strategy="sort" when retries with duplicate left rows are a concern).
    groupable = not any("map<" in f.dataType.simpleString()
                        for f in left.schema.fields)
    if groupable:
        l2 = (left.groupBy(*left.columns)
              .agg(F.count(F.lit(1)).alias(_MULT)).alias("__l"))
    else:
        l2 = (left.withColumn(_LID, F.monotonically_increasing_id())
              .alias("__l"))
    r_on = F.col(f"__r.{on}")
    l_on = F.col(f"__l.{on}")
    if direction == "backward":
        cond = (r_on <= l_on) if allow_exact_matches else (r_on < l_on)
    elif direction == "forward":
        cond = (r_on >= l_on) if allow_exact_matches else (r_on > l_on)
    else:  # nearest: every right row in the group is a candidate
        cond = F.lit(True)
    if tolerance is not None:
        l_num = _on_numeric(l_on, on_dtype)
        r_num = _on_numeric(r_on, on_dtype)
        gap = ((l_num - r_num) if direction == "backward"
               else (r_num - l_num) if direction == "forward"
               else F.abs(l_num - r_num))
        cond = cond & (gap <= F.lit(float(tolerance)))
    for b in by:
        cond = cond & (F.col(f"__l.{b}") == F.col(f"__r.{b}"))

    payload = F.struct(r_on.alias(_RON),
                       *[F.col(f"__r.{c}") for c in payload_cols])
    joined = l2.join(F.broadcast(right.alias("__r")), cond, "left")
    # lexicographic struct ordering: (on, tb-null-rank, tie_break) — max_by
    # picks the last tied row (backward/pandas), min_by the first
    # (forward/pandas). The explicit null-rank field makes a NULL tie_break
    # lose under BOTH aggregates — without it min_by treats the NULL struct
    # field as smallest, so forward would pick a NULL-tie_break row over
    # non-null ones while the sort strategy (nulls-first ordering under a
    # running last()) picks the non-null row for the same input.
    if direction == "nearest":
        # smallest |gap| wins; exact ties prefer the backward row (flag 0)
        abs_gap = F.abs(_on_numeric(l_on, on_dtype)
                        - _on_numeric(r_on, on_dtype))
        pick = F.min_by(payload,
                        F.struct(abs_gap, (r_on > l_on).cast("int")))
    else:
        if tie_break is None:
            pick_key = r_on
        else:
            tb = F.col(f"__r.{tie_break}")
            null_rank = (tb.isNotNull() if direction == "backward"
                         else tb.isNull()).cast("int")
            pick_key = F.struct(r_on, null_rank, tb)
        pick = F.max_by(payload, pick_key) if direction == "backward" \
            else F.min_by(payload, pick_key)
    if groupable:
        best = (joined.groupBy(*[F.col(f"__l.{c}").alias(c)
                                 for c in left.columns])
                .agg(F.first(F.col(f"__l.{_MULT}")).alias(_MULT),
                     pick.alias(_PAYLOAD)))
        # Re-expand collapsed duplicate left rows to their multiplicity.
        # Two-level chunked explode: sequence(1, mult) materializes ONE
        # in-memory array of length mult, so a sentinel row duplicated
        # 100M times would build an ~800MB array in a single row (OOM).
        # Chunking bounds every array at _DUP_CHUNK entries.
        n_chunks = ((F.col(_MULT) - 1) / _DUP_CHUNK).cast("long")
        best = best.withColumn(
            "__asof_chunk", F.explode(F.sequence(F.lit(0), n_chunks)))
        in_chunk = F.least(
            F.lit(_DUP_CHUNK),
            F.col(_MULT) - F.col("__asof_chunk") * _DUP_CHUNK)
        best = (best.withColumn(
                    "__asof_dup", F.explode(F.sequence(F.lit(1), in_chunk)))
                .drop(_MULT, "__asof_chunk", "__asof_dup"))
    else:
        best = (joined.groupBy(_LID)
                .agg(*[F.first(F.col(f"__l.{c}"), ignorenulls=False).alias(c)
                       for c in left.columns],
                     pick.alias(_PAYLOAD)))
    keep = F.col(_PAYLOAD).isNotNull() & F.col(_PAYLOAD)[_RON].isNotNull()
    cols = [F.col(c) for c in left.columns]
    cols += [F.when(keep, F.col(_PAYLOAD)[c]).alias(o)
             for c, o in zip(payload_cols, out_names)]
    return best.select(*cols)
