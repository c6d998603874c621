"""Deterministic hash-based sampling for training-data pipelines.

At 100 TB you never sample with ``rand()``: resumed/retried jobs must pick
the SAME rows, subsets must nest (a 1% sample ⊂ the 10% sample), and two
engines auditing each other must agree. The standard construction is a
keyed hash threshold — keep a row iff ``h(key) mod D < rate·D`` — which is
a pure scan-side filter: no shuffle, no state, pushdown-friendly, and the
sample is a function of the data alone.

Hash families mirror operators/hashing.py: ``xxhash64`` (fast, production)
or the portable md5/mod-M31 family that DuckDB reproduces bit-for-bit (the
driver oracle recomputes the exact sample membership).

Reference analogue: none — brief-mandated training-data op (the reference
is a validation library); the determinism contract follows the same
cross-engine-reproducibility rules as operators/hashing.py.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trafaret_spark.operators.hashing import M31, tok31

__all__ = ["sample_hash", "sample_by_hash", "stratified_sample_by_hash",
           "assign_splits", "assign_splits_by_group",
           "mixture_thresholds", "mixture_sample"]

_SEP = "\x1f"        # unit separator: never appears in normal text/keys
_NULL_MARK = "\x1e"  # record separator: encodes a NULL key value
_FAST_D = 1 << 31


def sample_hash(key_cols: Sequence[str], seed: int = 0,
                portable: bool = False) -> Column:
    """Non-negative sampling hash in [0, D) over the key columns + seed.

    D = 2^31 (fast xxhash64 path) or M31 (portable md5 path — the DuckDB
    mirror is ``TOK31_DUCKDB`` over the same coalesced concat_ws key).
    Columns are cast to string and joined with an unambiguous separator so
    (\"ab\", \"c\") never collides with (\"a\", \"bc\"); NULL key values
    encode as a record-separator marker (concat_ws would silently SKIP
    them, making ('x', NULL) collide with (NULL, 'x') and all-NULL keys
    share one hash).
    """
    if not key_cols:
        raise ValueError("sample_hash: key_cols must be non-empty — with no "
                         "key the hash is constant and the sample is "
                         "all-or-nothing")
    parts = [F.lit(str(seed))] + [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_MARK))
        for c in key_cols]
    key = F.concat_ws(_SEP, *parts)
    if portable:
        return tok31(key)
    return F.pmod(F.xxhash64(key), F.lit(_FAST_D))


def _threshold(rate: float, portable: bool) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * (M31 if portable else _FAST_D))


def sample_by_hash(df: DataFrame, key_cols: Union[str, Sequence[str]],
                   rate: float, seed: int = 0,
                   portable: bool = False) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows keyed by
    ``key_cols``: scan-side filter, no shuffle, stable under retries and
    across engines; samples NEST across rates (rate 0.01 ⊆ rate 0.1 for
    the same key/seed), which is what makes staged data ablations
    comparable. Change ``seed`` for an independent sample."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    thr = _threshold(rate, portable)
    return df.filter(sample_hash(key_cols, seed, portable) < F.lit(thr))


def stratified_sample_by_hash(df: DataFrame, strata_col: str,
                              rates: Mapping[str, float],
                              key_cols: Union[str, Sequence[str]],
                              default_rate: float = 0.0, seed: int = 0,
                              portable: bool = False) -> DataFrame:
    """Per-stratum rates (e.g. downsample 'en' to 10%, keep 'fi' whole) in
    ONE scan-side filter: the stratum value selects a hash threshold via a
    CASE expression — no per-stratum jobs, no shuffle, same determinism
    and nesting guarantees as :func:`sample_by_hash`.

    ``key_cols`` is REQUIRED and must identify rows (e.g. the id column):
    hashing the stratum column itself would give every row of a stratum
    the same hash, degenerating each rate to an all-or-nothing coin flip
    instead of a ~rate fraction."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if key_cols == [strata_col]:
        raise ValueError(
            "stratified_sample_by_hash: key_cols must not be just the "
            "stratum column — a per-stratum-constant hash makes each rate "
            "all-or-nothing; pass the row id column(s)")
    h = sample_hash(key_cols, seed, portable)
    thr: Column = F.lit(_threshold(default_rate, portable))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(_threshold(rate, portable))).otherwise(thr)
    return df.filter(h < thr)


_MAX_MIXTURE_DOMAINS = 100_000


def mixture_thresholds(counts: Mapping[str, int],
                       weights: Mapping[str, float],
                       portable: bool = False) -> dict[str, int]:
    """Per-domain hash thresholds realizing the LARGEST downsample of the
    given per-domain ``counts`` whose proportions match normalized
    ``weights`` (no domain is upsampled: the binding domain — the one
    that runs out first, argmin count/weight, ties by name — keeps
    everything; every other domain keeps the matching fraction).

    The exact formula is part of the cross-engine contract (the DuckDB
    oracle recomputes it bit-for-bit), so the floating-point operation
    ORDER below is normative::

        thr[d] = floor(D * w[d] * count[b] / (w[b] * count[d]))

    with D = M31 (portable) or 2^31, and b the binding domain. All
    factors are IEEE doubles; any algebraic rearrangement may round
    differently and change the sample by a row.
    """
    import math
    if not weights:
        raise ValueError("mixture weights must be non-empty")
    bad = {d: w for d, w in weights.items() if not w > 0.0}
    if bad:
        raise ValueError(f"mixture weights must be > 0, got {bad}")
    missing = sorted(d for d in weights if not counts.get(d))
    if missing:
        raise ValueError(
            f"mixture domains with no rows: {missing} — a strict mixture "
            f"including them is impossible; drop them from weights")
    b = min(weights, key=lambda d: (counts[d] / weights[d], d))
    d_max = M31 if portable else _FAST_D
    return {
        d: min(d_max, math.floor(
            d_max * weights[d] * counts[b] / (weights[b] * counts[d])))
        for d in weights}


def mixture_sample(df: DataFrame, domain_col: str,
                   weights: Mapping[str, float],
                   key_cols: Union[str, Sequence[str]],
                   seed: int = 0, portable: bool = False) -> DataFrame:
    """Deterministically downsample to a target domain MIXTURE (the
    data-mixture op of LLM corpus prep: "20% code, 30% web, …"): the
    largest subset whose per-domain proportions approximate normalized
    ``weights``, never upsampling. Domains absent from ``weights`` are
    dropped. Same determinism/nesting/retry guarantees as
    :func:`sample_by_hash` (it IS a per-domain hash threshold underneath,
    via :func:`mixture_thresholds`).

    Execution: one bounded groupBy count on ``domain_col`` (collected —
    legal because its size is the domain cardinality, capped at 100k),
    then ONE scan-side CASE filter. At 100 TB this is a cheap count job
    plus a pushdown-friendly scan — no shuffle of the data itself.

    Approximation note: hash sampling hits each domain's target count in
    expectation (±O(√n) per domain), which is the standard contract —
    exact-count sampling would need a per-domain global sort.
    """
    counts_rows = df.groupBy(domain_col).count() \
        .limit(_MAX_MIXTURE_DOMAINS + 1).collect()
    if len(counts_rows) > _MAX_MIXTURE_DOMAINS:
        raise ValueError(
            f"mixture_sample: more than {_MAX_MIXTURE_DOMAINS} distinct "
            f"domains in {domain_col!r} — not a mixture column")
    counts = {r[0]: r[1] for r in counts_rows}
    thr_map = mixture_thresholds(counts, weights, portable)
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = sample_hash(key_cols, seed, portable)
    thr: Column = F.lit(0)
    for value, t in sorted(thr_map.items()):
        thr = F.when(F.col(domain_col) == value, F.lit(t)).otherwise(thr)
    return df.filter(h < thr)


def assign_splits(df: DataFrame, key_cols: Union[str, Sequence[str]],
                  weights: Mapping[str, float], seed: int = 0,
                  out_col: str = "split",
                  portable: bool = False) -> DataFrame:
    """Deterministic train/val/test (or any k-way) split assignment:
    adds ``out_col`` naming each row's split, keyed by ``key_cols`` —
    every row of an entity (e.g. a conversation) lands in the SAME
    split, so grouped entities never leak across the boundary.

    ``weights`` maps split name → fraction (must sum to ~1 within 1e-9;
    insertion order is normative — the hash space is carved into
    consecutive ranges in that order, so adding a NEW last split with
    rescaled weights keeps earlier assignments maximally stable).
    Membership = the same scan-side hash as :func:`sample_by_hash` (same
    key/seed ⇒ a row's split agrees with its sample membership), zero
    shuffle, stable under retries and across engines in ``portable``
    mode. Thresholds are exact ints (``int(cum_weight * D)``, computed
    in float64 with one multiply per accumulated weight — normative for
    oracles); the LAST split is the ``otherwise`` branch (no threshold
    of its own), so rounding can never leave a row unassigned.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not weights:
        raise ValueError("assign_splits: weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"assign_splits: weights must sum to 1, "
                         f"got {total!r}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("assign_splits: weights must be non-negative")
    d = M31 if portable else _FAST_D
    h = sample_hash(key_cols, seed, portable)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        thr = int(cum * d)
        expr = (F.when(h < F.lit(thr), F.lit(name)) if expr is None
                else expr.when(h < F.lit(thr), F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def assign_splits_by_group(df: DataFrame, pairs: DataFrame,
                           weights: Mapping[str, float], seed: int = 0,
                           id_col: str = "doc_id", out_col: str = "split",
                           portable: bool = False, max_iter: int = 25,
                           checkpoint_dir: "str | None" = None) -> DataFrame:
    """LEAKAGE-SAFE split assignment: :func:`assign_splits` keyed on each
    row's near-dup COMPONENT instead of its own id, so a duplicate
    family can never straddle the train/val/test boundary — the classic
    eval-contamination hole id-keyed splitting leaves open (a near-dup
    of a training doc lands in val and inflates the score).

    ``pairs`` is any dedup family's (a, b) output; rows in no pair key
    on their own id, and every component keys on its MIN member id — so
    a doc that is not duplicated gets exactly the split plain
    :func:`assign_splits` would give it (same hash, same seed), and
    growing a component only ever re-keys the non-minimal members.
    Adds ``out_col``; one components pass + one broadcast-able join over
    the duplicated-doc set, then the usual scan-side hash CASE.
    """
    from trafaret_spark.operators.colnames import temp_col
    from trafaret_spark.operators.dedup import connected_components
    comp = connected_components(pairs, max_iter=max_iter,
                                checkpoint_dir=checkpoint_dir)
    # alias the components column through temp_col like `grp`: an input
    # frame that already carries a `component` column would otherwise hit
    # an ambiguous reference / wrong drop below (advice r6)
    cmp_col = temp_col(df, "__split_cmp")
    joined = df.join(comp.select(F.col("node").alias(id_col),
                                 F.col("component").alias(cmp_col)),
                     [id_col], "left")
    grp = temp_col(df, "__split_grp")
    keyed = joined.withColumn(
        grp, F.coalesce(F.col(cmp_col), F.col(id_col)))
    out = assign_splits(keyed, grp, weights, seed=seed, out_col=out_col,
                        portable=portable)
    return out.drop(grp, cmp_col)
