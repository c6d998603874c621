"""Deterministic, fully-distributed synthesis of the transcript input table
(FIXTURES.md §1-3; BASELINE.json input_hint).

Schema: (conv_id string, turn_idx int, role string, text string,
         tool string nullable ~15%, ts timestamp monotone per conv).

Generation is hash-derived (xxhash64(conv, turn, tag, seed)) so it is
seed-stable, order-independent, and runs as pure Column expressions on
``spark.range`` — no driver-side loops, scales to any size. The turn-count
distribution has a heavy tail plus explicit hot conversations so skew
mitigation is actually exercised (SURVEY.md §7 risks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["transcripts", "conv_events", "to_raw_strings"]

_BASE_TS = "2026-03-01 00:00:00"
_WORDS = ("the quick brown fox jumps over a lazy dog while answering "
          "questions about spark partitions and window functions "
          "résumé naïve 文字化け тест ✓").split(" ")


def _u(tag: int, seed: int, *cols) -> "F.Column":
    """Deterministic uniform [0,1) from hashed columns."""
    return (F.pmod(F.xxhash64(*cols, F.lit(tag), F.lit(seed)), F.lit(1_000_000))
            .cast("double") / 1e6)


def transcripts(spark: SparkSession, n_convs: int = 200, seed: int = 42,
                hot_convs: int = 2, hot_turns: int = 10_000,
                max_turns: int = 200, partitions: int | None = None) -> DataFrame:
    """Multi-turn conversation transcripts; ~Zipf turn counts + hot tail."""
    conv = (spark.range(n_convs)
            .select(F.col("id").alias("cid"),
                    F.format_string("conv-%06d", F.col("id")).alias("conv_id")))
    # turn counts: 5..max_turns skewed low, except the hot conversations
    u_n = _u(1, seed, F.col("cid"))
    n_turns = F.when(F.col("cid") < hot_convs, F.lit(hot_turns)).otherwise(
        (F.lit(5) + F.pow(u_n, 2.5) * F.lit(max_turns - 5)).cast("int"))
    turns = conv.select("cid", "conv_id",
                        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"))

    u_role = _u(2, seed, F.col("cid"), F.col("turn_idx"))
    u_tool = _u(3, seed, F.col("cid"), F.col("turn_idx"))
    u_gap = _u(4, seed, F.col("cid"), F.col("turn_idx"))
    u_gap2 = _u(5, seed, F.col("cid"), F.col("turn_idx"))
    u_txt = _u(6, seed, F.col("cid"), F.col("turn_idx"))

    role = (F.when((F.col("turn_idx") == 0) & (u_role < 0.3), F.lit("system"))
            .when(u_tool < 0.08, F.lit("tool"))
            .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
            .otherwise(F.lit("assistant")))
    tool = F.when(
        u_tool < 0.15,
        F.element_at(F.array(F.lit("search"), F.lit("code"), F.lit("browse")),
                     (u_role * 3).cast("int") + 1))
    # deterministic pseudo-text: empty ~3%, unicode-bearing word soup otherwise
    words = F.array(*[F.lit(w) for w in _WORDS])
    n_words = (u_txt * 12).cast("int") + 1
    text = F.when(u_txt < 0.03, F.lit("")).otherwise(F.concat_ws(
        " ",
        F.concat(F.lit("t"), F.col("turn_idx").cast("string")),
        F.array_join(F.slice(words, ((u_role * 10).cast("int") + 1), 6), " "),
        F.when(u_gap2 > 0.9, F.lit("✓ émojis 文")).otherwise(F.lit("ok")),
        F.repeat(F.lit("pad "), (u_txt * F.lit(20)).cast("int")),
    ))
    # inter-turn gaps: mostly < 300 s, ~4% > 1800 s (session boundaries)
    gap = F.when(u_gap2 < 0.04, F.lit(1800.0) + u_gap * 1200.0) \
        .otherwise(F.lit(5.0) + u_gap * 290.0)

    w = Window.partitionBy("cid").orderBy("turn_idx") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offset = F.sum(gap).over(w) + _u(7, seed, F.col("cid")) * 86400.0
    ts = F.timestamp_micros(
        (F.unix_micros(F.to_timestamp(F.lit(_BASE_TS)))
         + (offset * 1e6).cast("long")))

    out = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
    if partitions:
        out = out.repartitionByRange(partitions, "conv_id", "turn_idx")
    return out


def conv_events(spark: SparkSession, n_convs: int = 200, seed: int = 42,
                events_per_conv: int = 8) -> DataFrame:
    """Sparse per-conversation event stream (as-of right side, FIXTURES.md §3).
    Some conversations get zero events (null-match path); event ts are
    scattered across each conversation's time span, some before the first
    turn and some after the last."""
    conv = (spark.range(n_convs)
            .select(F.col("id").alias("cid"),
                    F.format_string("conv-%06d", F.col("id")).alias("conv_id")))
    n_ev = F.when(_u(11, seed, F.col("cid")) < 0.15, F.lit(0)) \
        .otherwise((_u(12, seed, F.col("cid")) * events_per_conv).cast("int") + 1)
    ev = conv.select(
        "cid", "conv_id",
        F.explode(F.sequence(F.lit(1), n_ev)).alias("ev_idx"))
    u_t = _u(13, seed, F.col("cid"), F.col("ev_idx"))
    u_s = _u(14, seed, F.col("cid"), F.col("ev_idx"))
    # spread over ~6h around the conversation start used by transcripts()
    offset = (u_t * 6 * 3600.0 - 600.0) + _u(7, seed, F.col("cid")) * 86400.0
    ts = F.timestamp_micros(
        (F.unix_micros(F.to_timestamp(F.lit(_BASE_TS)))
         + (offset * 1e6).cast("long")))
    return ev.select(
        "conv_id",
        ts.alias("ts"),
        F.round(u_s * 100.0, 2).alias("score"),
        F.element_at(F.array(F.lit("open"), F.lit("active"), F.lit("closed")),
                     (u_t * 3).cast("int") + 1).alias("state"),
    )


def to_raw_strings(df: DataFrame, seed: int = 42, dirty_frac: float = 0.02) -> DataFrame:
    """All-string 'foreign data' variant with injected defects at
    hash-deterministic rows (FIXTURES.md §2) — the validation-stage input."""
    u = _u(21, seed, F.col("conv_id"), F.col("turn_idx"))
    u2 = _u(22, seed, F.col("conv_id"), F.col("turn_idx"))
    d = F.lit(dirty_frac)
    turn_s = F.col("turn_idx").cast("string")
    return df.select(
        F.when(u < d * 0.25, F.lit("")).otherwise(F.col("conv_id")).alias("conv_id"),
        (F.when(u.between(d * 0.25, d * 0.5), F.concat(turn_s, F.lit(".0")))
         .when(u.between(d * 0.5, d * 0.75), F.lit("-1"))
         .when(u.between(d * 0.75, d), F.lit("not-a-number"))
         .otherwise(turn_s)).alias("turn_idx"),
        F.when(u2 < d, F.lit("robot")).otherwise(F.col("role")).alias("role"),
        F.col("text"),
        F.when(u2.between(d, 2 * d), F.lit("hammer")).otherwise(F.col("tool")).alias("tool"),
        (F.when(u2.between(2 * d, 3 * d),
                F.date_format("ts", "dd-MM-yyyy"))
         .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))).alias("ts"),
    )
