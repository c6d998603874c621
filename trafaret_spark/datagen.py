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

__all__ = ["transcripts", "conv_events", "to_raw_strings",
           "documents", "embeddings", "clone_transcripts"]

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


def documents(spark: SparkSession, n_docs: int = 10_000, seed: int = 7,
              dup_frac: float = 0.15, mutate_rate: float = 0.05,
              vocab_size: int = 500, min_tokens: int = 20,
              max_tokens: int = 120, hot_docs: int = 0, hot_bases: int = 4,
              partitions: int | None = None) -> DataFrame:
    """Deterministic document corpus ``(doc_id, text, lang)`` with a
    CONTROLLED near-dup fraction — the dedup-family scaling input.

    ~``dup_frac`` of docs are token-level mutations of a base doc (same
    token stream with ~``mutate_rate`` of positions swapped), so
    MinHash/SimHash/ngram dedup finds real clusters at any scale. The
    LAST ``hot_docs`` ids are boilerplate: mutations of only ``hot_bases``
    distinct bases, giving clusters of ~hot_docs/hot_bases near-identical
    docs — the degenerate shape the LSH hot-bucket cap exists for. Pure
    Column expressions on ``spark.range`` — no driver data, scales to any
    ``n_docs``.
    """
    n_base = max(1, int(n_docs * (1.0 - dup_frac)))
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_hot = F.col("doc_id") >= n_docs - hot_docs
    is_dup = (F.col("doc_id") >= n_base) | is_hot
    src = (F.when(is_hot,
                  F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed + 3)),
                         F.lit(hot_bases)))
           .when(is_dup,
                 F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed)),
                        F.lit(n_base))).otherwise(F.col("doc_id")))
    n_tok = (F.lit(min_tokens)
             + (_u(41, seed, src) * (max_tokens - min_tokens)).cast("int"))

    def tok(i):
        base_idx = F.pmod(F.xxhash64(src, i, F.lit(seed + 1)),
                          F.lit(vocab_size))
        # boilerplate is near-identical (0.1× the mutation rate) — that is
        # precisely the shape whose LSH buckets blow past max_bucket_size
        rate = F.when(is_hot, F.lit(mutate_rate / 10)) \
            .otherwise(F.lit(mutate_rate))
        mut = is_dup & (_u(42, seed, F.col("doc_id"), i) < rate)
        idx = F.when(mut, F.pmod(F.xxhash64(F.col("doc_id"), i,
                                            F.lit(seed + 2)),
                                 F.lit(vocab_size))).otherwise(base_idx)
        return F.concat(F.lit("w"), idx.cast("string"))

    text = F.array_join(
        F.transform(F.sequence(F.lit(0), n_tok - 1), tok), " ")
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"),
                F.lit("zh")),
        (_u(43, seed, src) * 5).cast("int") + 1)
    out = base.select("doc_id", text.alias("text"), lang.alias("lang"),
                      is_dup.alias("is_dup"))
    if partitions:
        out = out.repartition(partitions, "doc_id")
    return out


def embeddings(spark: SparkSession, n_vecs: int = 10_000, dim: int = 64,
               seed: int = 11, n_clusters: int = 64, noise: float = 0.3,
               partitions: int | None = None) -> DataFrame:
    """Deterministic cluster-structured embeddings ``(vec_id,
    embedding array<float>)`` — the ANN-family scaling input. Each vector
    is its cluster's center plus hash-derived noise, so LSH/IVF recall is
    non-trivial and reproducible. Pure Column expressions."""
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    c = F.pmod(F.col("vec_id"), F.lit(n_clusters))

    def comp(j):
        center = (_u(51, seed, c, j) - 0.5) * 2.0
        jitter = (_u(52, seed, F.col("vec_id"), j) - 0.5) * 2.0 * noise
        return (center + jitter).cast("float")

    vec = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp)
    out = base.select("vec_id", vec.alias("embedding"))
    if partitions:
        out = out.repartition(partitions, "vec_id")
    return out


def clone_transcripts(spark: SparkSession, n_convs: int = 50_000,
                      seed: int = 13, clone_frac: float = 0.10,
                      near_frac: float = 0.05, echo_frac: float = 0.10,
                      bad_frac: float = 0.02, min_turns: int = 6,
                      max_turns: int = 40, words_per_turn: int = 25,
                      vocab_size: int = 4096,
                      partitions: int | None = None) -> DataFrame:
    """Deterministic transcript corpus with PLANTED curation structure —
    the conversation-family scaling input (every run_curation stage
    provably non-vacuous at any scale):

    * ids partition by RANGE (auditable): the first ``1 - clone_frac -
      near_frac`` of conversations are unique bases; the next
      ``clone_frac`` render byte-identical to a hash-picked base (exact
      conv dedup removes them); the last ``near_frac`` equal a base
      except the FINAL turn gains a per-conv unique token (they survive
      exact dedup and must be caught by minhash NEAR-dup).
    * ``echo_frac`` of conversations (clones included) carry one
      consecutive retry echo — a repeated (role, text) turn — which
      stutter dedup must repair FIRST: un-repaired, an echoed exact
      clone would not render identical to its base (the repair-then-
      dedup order is load-bearing, exactly as in run_curation).
    * ``bad_frac`` open illegally (role 'tool' at turn 0) — structural
      quarantine fodder. A clone whose hash-picked BASE is bad renders
      differently from it (role derives from the clone's own flag, text
      from the base) and the base is quarantined anyway, so
      ~``bad_frac x (clone_frac + near_frac)`` of conversations
      (~0.3% at defaults) land as effectively-unique rather than in
      their planted category — the recorded per-stage survivor counts
      are exact measurements either way.

    Pure Column expressions on ``spark.range`` — no driver data, scales
    to any ``n_convs``. Text derives from the SOURCE id so clones match
    their base token-for-token.
    """
    n_near = int(n_convs * near_frac)
    n_clone = int(n_convs * clone_frac)
    n_base = n_convs - n_clone - n_near
    conv = spark.range(n_convs).select(F.col("id").alias("cid"))
    is_near = F.col("cid") >= n_convs - n_near
    is_clone = (F.col("cid") >= n_base) & ~is_near
    src = F.when(is_clone | is_near,
                 F.pmod(F.xxhash64(F.col("cid"), F.lit(seed)),
                        F.lit(n_base))).otherwise(F.col("cid"))
    n_turns = (F.lit(min_turns)
               + (F.pow(_u(31, seed, src), 2.0)
                  * (max_turns - min_turns)).cast("int"))
    is_echo = _u(33, seed, F.col("cid")) < echo_frac
    is_bad = _u(35, seed, F.col("cid")) < bad_frac
    # echo duplicates turn k (1..n_turns-1): rows i > k re-derive
    # role/text from i-1, so rows k and k+1 agree in (role, text) —
    # distinct turn_idx, consecutive in order: a stutter
    echo_at = (_u(34, seed, F.col("cid")) * (n_turns - 1)).cast("int") + 1
    rows = conv.select(
        "cid", src.alias("src"), n_turns.alias("nt"), is_bad.alias("bad"),
        is_near.alias("near"), is_echo.alias("echo"),
        echo_at.alias("k"),
        F.explode(F.sequence(
            F.lit(0), n_turns - 1 + is_echo.cast("int"))).alias("i"))
    tix = F.when(F.col("echo") & (F.col("i") > F.col("k")),
                 F.col("i") - 1).otherwise(F.col("i"))
    role = (F.when(tix == 0, F.when(F.col("bad"), F.lit("tool"))
                              .otherwise(F.lit("user")))
            .when(tix % 2 == 1, F.lit("assistant"))
            .otherwise(F.lit("user")))

    def word(j):
        idx = F.pmod(F.xxhash64(F.col("src"), tix, j, F.lit(seed + 1)),
                     F.lit(vocab_size))
        return F.concat(F.lit("w"), idx.cast("string"))

    text = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(words_per_turn - 1)), word),
        " ")
    text = F.when(F.col("near") & (tix == F.col("nt") - 1),
                  F.concat(text, F.lit(" uniq"),
                           F.col("cid").cast("string"))).otherwise(text)
    ts = F.timestamp_micros(
        F.unix_micros(F.to_timestamp(F.lit(_BASE_TS)))
        + F.col("cid") * F.lit(10_000_000)
        + F.col("i") * F.lit(30_000_000))
    out = rows.select(
        F.format_string("conv-%08d", F.col("cid")).alias("conv_id"),
        F.col("i").cast("int").alias("turn_idx"),
        role.alias("role"), text.alias("text"), ts.alias("ts"))
    if partitions:
        out = out.repartition(partitions, "conv_id")
    return out
