"""Conversation-structure operators for multi-turn transcript curation.

The engine's flagship input is a transcript table ``(conv_id, turn_idx,
role, text, tool, ts)`` (BASELINE input_hint). Before such a table feeds
the as-of/feature layer — or an SFT training run — a curation pipeline
needs conversation-LEVEL structure checks and transforms that the per-row
guard layer (guards.py) cannot express, because they relate a turn to its
neighbours:

* :func:`turn_errors` / :func:`conversation_report` — structural
  validation: dense turn indices, legal role transitions, monotonic
  timestamps. Per-turn error codes follow the same errors-array
  convention as the guard layer (validate.py), so downstream splitting /
  quarantine logic is shared.
* :func:`dedup_stutter` — drop consecutive repeated turns (agent
  stutter / retry echo), the transcript analogue of exact dedup.
* :func:`truncate_turns` — longest prefix (or suffix) of each
  conversation under a token budget, cut at turn boundaries.
* :func:`render_conversation` — deterministic single-string chat render
  per conversation (stable ``order_by`` ordering), the byte-equality
  surface for the north-star "per-turn text byte-equal under stable
  (conv_id, turn_idx) ordering" invariant.
* :func:`dedup_conversations` — exact conversation-LEVEL dedup keyed on
  the render (whole-conversation duplicates that per-document dedup
  misses because each turn is short boilerplate).
* :func:`conversation_features` — per-conversation rollup features
  (role mix, char volume, response latency in exact integer µs).

Scale: every operator here is ONE window/group exchange on the
conversation key — the same ``hashpartitioning(conv_id)`` the as-of join
and the feature layer already use, so in a fused pipeline Catalyst reuses
one exchange across all of them. No driver-side loops, no Python UDFs:
all logic is Catalyst Column expressions (whole-stage codegen), so at
10^12 turns each operator is a shuffle-once, stream-through pass.
Conversations are assumed to fit a partition (transcripts are KB-MB —
the 100 TB risk is conversation COUNT, which partitions freely).

Reference analogue: none — the reference validates rows in isolation
(trafaret/base.py check-contract); these are the brief-mandated
transcript-pipeline extensions of the same "validate, report codes, keep
going" philosophy (per-turn codes, not exceptions).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from trafaret_spark.operators.colnames import temp_col

__all__ = [
    "DEFAULT_TRANSITIONS", "DEFAULT_START_ROLES",
    "turn_errors", "conversation_report", "dedup_stutter",
    "truncate_turns", "render_conversation", "render_with_spans",
    "dedup_conversations", "neardup_conversations",
    "conversation_features",
]

# Legal (previous role -> current role) moves for a standard
# system/user/assistant/tool chat. A "system" preamble turn may only open
# the conversation; tools answer assistants; the assistant may follow a
# tool result with another tool call or a reply.
DEFAULT_TRANSITIONS: frozenset[tuple[str, str]] = frozenset({
    ("system", "user"),
    ("user", "assistant"),
    ("assistant", "user"),
    ("assistant", "tool"),
    ("tool", "assistant"),
    ("tool", "tool"),
})

DEFAULT_START_ROLES: frozenset[str] = frozenset({"system", "user"})

# Error-code vocabulary (snake_case, mirroring codes.py style).
ERR_NULL_ORDER = "null_order"        # ordering key (turn_idx) is NULL
ERR_TURN_GAP = "turn_gap"            # turn_idx not dense from 0
ERR_BAD_START = "bad_start_role"     # first turn's role not allowed to open
ERR_BAD_TRANSITION = "bad_transition"  # (prev_role, role) not in the policy
ERR_TS_REGRESS = "ts_regress"        # ts earlier than the previous turn's
ERR_NULL_ROLE = "null_role"          # role is NULL


def _conv_window(by: Sequence[str], order: str) -> Window:
    # NULLS FIRST explicitly: Spark's asc default, but made explicit so
    # the oracle SQL (DuckDB defaults to NULLS LAST) can mirror it.
    return Window.partitionBy(*by).orderBy(F.col(order).asc_nulls_first())


def _listify(by: Union[str, Sequence[str]]) -> list[str]:
    return [by] if isinstance(by, str) else list(by)


def turn_errors(df: DataFrame,
                by: Union[str, Sequence[str]] = "conv_id",
                order: str = "turn_idx",
                role_col: str = "role",
                ts_col: Optional[str] = "ts",
                transitions: frozenset = DEFAULT_TRANSITIONS,
                start_roles: frozenset = DEFAULT_START_ROLES,
                dense_from: Optional[int] = 0,
                out_col: str = "turn_errs") -> DataFrame:
    """Per-turn structural error codes as ``array<string>`` ``out_col``.

    Checks, each a lag-window comparison (codes in registry order):

    * ``null_order`` — the ordering key itself is NULL. Such a turn
      can satisfy no dense-index or neighbour comparison (three-valued
      logic makes them all NULL → silent), so it gets its own code; NULL
      keys sort FIRST (explicit, so oracles can mirror Spark's default).
      Gap checks against a NULL-keyed neighbour don't fire — the
      conversation is already flagged by the NULL-keyed turn itself.
    * ``turn_gap`` — ``order`` is not dense: first turn != ``dense_from``
      or a later turn != previous + 1 (pass ``dense_from=None`` to skip).
    * ``null_role`` / ``bad_start_role`` / ``bad_transition`` — role
      present, allowed to open, and (prev, cur) in ``transitions``.
    * ``ts_regress`` — ``ts_col`` strictly earlier than the previous
      turn's (NULL timestamps never regress; pass ``ts_col=None`` to
      skip).

    One window exchange on ``by``; everything else is scan-side codegen.
    An empty array means the turn is structurally sound. The array is
    ordered by the check list above, so equality comparisons (and the
    DuckDB oracle) are deterministic. "First turn" means row number 1
    under the window order (NOT "lag is NULL", which a NULL ordering key
    on the previous row would fake).
    """
    by = _listify(by)
    w = _conv_window(by, order)
    prev_role = F.lag(role_col, 1).over(w)
    prev_order = F.lag(order, 1).over(w)
    is_first = F.row_number().over(w) == 1

    checks: list[tuple[str, Column]] = []
    checks.append((ERR_NULL_ORDER, F.col(order).isNull()))
    if dense_from is not None:
        checks.append((ERR_TURN_GAP, F.when(
            is_first, F.col(order) != F.lit(dense_from)
        ).otherwise(F.col(order) != prev_order + F.lit(1))))
    role = F.col(role_col)
    checks.append((ERR_NULL_ROLE, role.isNull()))
    checks.append((ERR_BAD_START,
                   is_first & role.isNotNull()
                   & ~role.isin(*sorted(start_roles))))
    # Membership of the (prev, cur) pair in the legal-move set compiles to
    # a boolean OR chain — pure codegen, no lookup structure needed; the
    # policy set is tiny (|roles|^2 at most).
    legal = F.lit(False)
    for p, c in sorted(transitions):
        legal = legal | ((prev_role == F.lit(p)) & (role == F.lit(c)))
    checks.append((ERR_BAD_TRANSITION,
                   ~is_first & role.isNotNull() & prev_role.isNotNull()
                   & ~legal))
    if ts_col is not None:
        prev_ts = F.lag(ts_col, 1).over(w)
        checks.append((ERR_TS_REGRESS,
                       F.col(ts_col).isNotNull() & prev_ts.isNotNull()
                       & (F.col(ts_col) < prev_ts)))

    errs = F.array_compact(F.array(*[
        F.when(cond, F.lit(code)) for code, cond in checks]))
    return df.withColumn(out_col, errs)


def conversation_report(df: DataFrame,
                        by: Union[str, Sequence[str]] = "conv_id",
                        order: str = "turn_idx",
                        errs_col: str = "turn_errs",
                        **turn_errors_kwargs) -> DataFrame:
    """Per-conversation structural verdict: ``n_turns``, ``n_bad_turns``,
    ``first_err`` (code of the earliest bad turn, by ``order``; ties
    broken by check order within the turn), ``is_valid``.

    Runs :func:`turn_errors` first unless ``errs_col`` already exists.
    The groupBy key equals the window partition key, so Catalyst plans
    ONE exchange for both steps.
    """
    by = _listify(by)
    if errs_col not in df.columns:
        df = turn_errors(df, by=by, order=order, out_col=errs_col,
                         **turn_errors_kwargs)
    bad = F.size(F.col(errs_col)) > 0
    first_struct = F.min(F.when(bad, F.struct(
        F.col(order).alias("o"),
        F.col(errs_col)[0].alias("code"))))
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(bad.cast("int")).alias("n_bad_turns"),
        first_struct["code"].alias("first_err"),
        (F.sum(bad.cast("int")) == 0).alias("is_valid"),
    )


def dedup_stutter(df: DataFrame,
                  by: Union[str, Sequence[str]] = "conv_id",
                  order: str = "turn_idx",
                  role_col: str = "role",
                  text_col: str = "text") -> DataFrame:
    """Drop a turn when it exactly repeats the PREVIOUS turn's
    (role, text) in the same conversation — agent stutter / retry echo
    removal. The first occurrence survives; a run of k identical turns
    keeps 1. NULL text equals NULL text (a repeated null turn is still a
    stutter): comparison uses null-safe equality.

    One lag window on ``by``; scan-side filter. Turn indices are NOT
    re-densified (callers that need dense indices re-rank afterwards) so
    surviving rows are byte-identical to their input rows.
    """
    by = _listify(by)
    w = _conv_window(by, order)
    same = (F.col(role_col).eqNullSafe(F.lag(role_col, 1).over(w))
            & F.col(text_col).eqNullSafe(F.lag(text_col, 1).over(w))
            # lag yields NULL for the first row of both columns; require a
            # previous ROW (row 2 onward under the window order)
            & (F.row_number().over(w) > 1))
    stut = temp_col(df, "__stutter")
    return df.withColumn(stut, same).filter(~F.col(stut)).drop(stut)


def truncate_turns(df: DataFrame, max_tokens: int,
                   by: Union[str, Sequence[str]] = "conv_id",
                   order: str = "turn_idx",
                   token_col: str = "n_tokens",
                   keep: str = "head",
                   counter: "callable | None" = None,
                   text_col: "str | None" = None) -> DataFrame:
    """Keep the longest prefix (``keep='head'``) or suffix
    (``keep='tail'``) of each conversation whose token sum fits
    ``max_tokens``, cutting ONLY at turn boundaries (a turn either fits
    whole or is dropped — the SFT convention; a turn larger than the
    whole budget is dropped with the rest of its side).

    Cumulative-sum window over ``by`` ordered by ``order`` (descending
    for ``tail``), then a scan-side filter — one exchange. NULL token
    counts count as 0 (sum ignores NULL); negative counts are invalid
    upstream (same contract as curation.pack_sequences).

    The metered unit is pluggable (r5 verdict #5): precompute
    ``token_col``, or pass ``counter=`` (``Column -> Column``, e.g.
    ``textstats.bpe_ish_token_count`` or ``textstats.token_counter_udf(
    <real BPE tokenizer>)``) with ``text_col`` to compute it in the same
    pass — ``token_col`` is then ignored.
    """
    if max_tokens < 0:
        raise ValueError(f"max_tokens must be >= 0, got {max_tokens}")
    if keep not in ("head", "tail"):
        raise ValueError(f"keep must be 'head' or 'tail', got {keep!r}")
    by = _listify(by)
    drop_tok = None
    if counter is not None:
        if text_col is None:
            raise ValueError("counter= requires text_col= (the column "
                             "to tokenize)")
        drop_tok = temp_col(df, "__trunc_tok")
        df = df.withColumn(drop_tok, counter(F.col(text_col)).cast("long"))
        token_col = drop_tok
    direction = F.col(order).asc() if keep == "head" else F.col(order).desc()
    w = Window.partitionBy(*by).orderBy(direction) \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.coalesce(F.col(token_col), F.lit(0))).over(w)
    ct = temp_col(df, "__cum_tok")
    out = df.withColumn(ct, cum) \
        .filter(F.col(ct) <= F.lit(max_tokens)).drop(ct)
    return out.drop(drop_tok) if drop_tok else out


def render_conversation(df: DataFrame,
                        by: Union[str, Sequence[str]] = "conv_id",
                        order: str = "turn_idx",
                        role_col: str = "role",
                        text_col: str = "text",
                        open_tag: str = "<|",
                        close_tag: str = "|>",
                        sep: str = "\n",
                        out_col: str = "rendered") -> DataFrame:
    """Render each conversation to ONE deterministic string:
    ``open_tag + role + close_tag + text`` per turn, joined by ``sep``
    in ``order`` order. NULL role/text render as empty strings (the
    render never drops a turn — structural repair belongs to
    :func:`turn_errors` / :func:`dedup_stutter` upstream).

    Output: one row per conversation — ``by`` columns, ``n_turns``,
    ``n_chars`` (codepoints of the render), ``out_col``. Determinism:
    ``array_sort`` on the collected (order, role, text) structs gives a
    total order as long as ``order`` is unique per conversation (struct
    comparison falls through to role/text on ties, still total). This is
    the byte-equality surface for the north-star per-turn-text
    invariant: two engines rendering the same table must agree on every
    byte of ``out_col``.

    Scale: one groupBy exchange on ``by``; per-group state is the
    conversation itself (KB-MB). ``collect_list`` over 10^12 turns is
    fine BECAUSE the group key is the conversation — no global collect
    anywhere.
    """
    by = _listify(by)
    turn = F.struct(F.col(order).alias("o"),
                    F.coalesce(F.col(role_col), F.lit("")).alias("r"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("t"))
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(turn)),
            lambda s: F.concat(F.lit(open_tag), s["r"], F.lit(close_tag),
                               s["t"])),
        sep)
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_turns"),
        rendered.alias(out_col),
    ).withColumn("n_chars", F.length(F.col(out_col)))


def dedup_conversations(df: DataFrame,
                        by: Union[str, Sequence[str]] = "conv_id",
                        order: str = "turn_idx",
                        role_col: str = "role",
                        text_col: str = "text",
                        open_tag: str = "<|",
                        close_tag: str = "|>",
                        sep: str = "\n",
                        keep_hash: bool = False) -> DataFrame:
    """Exact CONVERSATION-level dedup: two conversations are duplicates
    when their deterministic renders (:func:`render_conversation` —
    per-turn role+text in ``order`` order) are byte-equal; the member
    with the smallest ``by`` key survives and its original turn rows are
    returned byte-identical (``keep_hash=True`` appends the group's
    ``conv_hash`` md5 column to each surviving row).

    This is the transcript analogue of ``dedup.keep_canonical``: web-scale
    SFT corpora carry whole-conversation duplicates (re-scrapes, mirrored
    forums) that per-document dedup misses because each individual turn is
    short boilerplate. Content identity = the render, so it inherits the
    render's caveat: a text that embeds the tag/separator byte sequence
    could collide — pick tags outside the corpus alphabet for adversarial
    inputs (the md5 itself adds no practical collisions).

    Plan (all codegen, no Python): ① the render's ONE groupBy exchange on
    ``by`` → one md5 row per conversation; ② a min-struct agg per hash
    (shuffle carries one row per CONVERSATION, not per turn); ③ the
    surviving key set semi-joins the turn table (AQE broadcasts it when
    #conversations is small; otherwise one hash join on ``by`` — the same
    key the turn table's other stages already shuffle on). At 10^12 turns
    the only full-size exchange is ①, shared with every other
    conversation-level stage in a fused pipeline.
    """
    by = _listify(by)
    rendered = render_conversation(df, by=by, order=order,
                                   role_col=role_col, text_col=text_col,
                                   open_tag=open_tag, close_tag=close_tag,
                                   sep=sep, out_col="__render")
    hashed = rendered.select(*by, F.md5(F.col("__render")).alias("conv_hash"))
    winner_struct = F.min(F.struct(*[F.col(c) for c in by])).alias("__win")
    winners = (hashed.groupBy("conv_hash").agg(winner_struct)
               .select("conv_hash",
                       *[F.col(f"__win.{c}").alias(c) for c in by]))
    if keep_hash:
        return df.join(winners.select(*by, "conv_hash"), by, "inner")
    return df.join(winners.select(*by), by, "left_semi")


def conversation_features(df: DataFrame,
                          by: Union[str, Sequence[str]] = "conv_id",
                          order: str = "turn_idx",
                          role_col: str = "role",
                          text_col: str = "text",
                          ts_col: Optional[str] = "ts",
                          user_role: str = "user",
                          assistant_role: str = "assistant") -> DataFrame:
    """Per-conversation rollup features — the conversation-LEVEL signals a
    transcript curation/quality pipeline filters and stratifies on:

    * ``n_turns``; ``n_user_turns`` / ``n_assistant_turns`` /
      ``n_other_turns`` (role mix); NULL roles count as other.
    * ``total_chars`` / ``avg_turn_chars`` — codepoint volume (NULL text
      counts 0 chars; avg over ALL turns, round-6 for oracle stability).
    * ``n_responses`` / ``avg_response_secs`` / ``max_response_secs`` —
      a *response* is an ``assistant_role`` turn directly following a
      ``user_role`` turn (window order = ``order``); latency is the ts
      delta in seconds. Latency stats aggregate EXACT integer µs (sum /
      count / max of longs — deterministic under Spark's partial-agg
      reordering, unlike a double ``avg``) and divide once at the end
      (round-6). Pairs with a NULL ts on either side are excluded from
      the latency stats but still count in ``n_responses``;
      ``ts_col=None`` skips all four ts-derived columns.
    * ``duration_secs`` — max(ts) − min(ts) over the conversation.

    ONE window + ONE groupBy on the same ``by`` key — Catalyst plans a
    single exchange; everything else is scan-side codegen. At 10^12 turns
    this is a shuffle-once stream-through pass, fusable with
    :func:`turn_errors` / the feature layer on the same key.
    """
    by = _listify(by)
    role = F.col(role_col)
    is_user = role.eqNullSafe(F.lit(user_role))
    is_asst = role.eqNullSafe(F.lit(assistant_role))
    chars = F.coalesce(F.length(text_col), F.lit(0)).cast("long")

    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(is_user.cast("long")).alias("n_user_turns"),
        F.sum(is_asst.cast("long")).alias("n_assistant_turns"),
        F.sum((~(is_user | is_asst)).cast("long")).alias("n_other_turns"),
        F.sum(chars).alias("total_chars"),
        F.round(F.sum(chars) / F.count(F.lit(1)), 6).alias("avg_turn_chars"),
    ]
    if ts_col is not None:
        w = _conv_window(by, order)
        prev_role = F.lag(role_col, 1).over(w)
        prev_ts = F.lag(ts_col, 1).over(w)
        is_resp = is_asst & prev_role.eqNullSafe(F.lit(user_role))
        # exact integer µs delta; NULL when either ts is NULL. The
        # .cast("timestamp") bridges TIMESTAMP_NTZ inputs (session TZ is
        # UTC — same convention as features.py:120)
        lat_us = F.when(is_resp,
                        F.unix_micros(F.col(ts_col).cast("timestamp"))
                        - F.unix_micros(prev_ts.cast("timestamp")))
        resp_c = temp_col(df, "__is_resp")
        lat_c = temp_col(df, "__lat_us")
        df = df.withColumn(resp_c, is_resp).withColumn(lat_c, lat_us)
        n_lat = F.count(lat_c)
        aggs += [
            F.sum(F.col(resp_c).cast("long")).alias("n_responses"),
            F.when(n_lat > 0,
                   F.round(F.sum(lat_c) / n_lat / F.lit(1_000_000.0), 6))
             .alias("avg_response_secs"),
            F.round(F.max(lat_c) / F.lit(1_000_000.0), 6)
             .alias("max_response_secs"),
            F.round((F.unix_micros(F.max(ts_col).cast("timestamp"))
                     - F.unix_micros(F.min(ts_col).cast("timestamp")))
                    / F.lit(1_000_000.0), 6).alias("duration_secs"),
        ]
    return df.groupBy(*by).agg(*aggs)


def neardup_conversations(df: DataFrame,
                          by: str = "conv_id",
                          order: str = "turn_idx",
                          role_col: str = "role",
                          text_col: str = "text",
                          threshold: float = 0.7,
                          num_hashes: int = 64,
                          bands: int = 16,
                          n: int = 3,
                          seed: int = 17,
                          max_bucket_size: int = 1000,
                          open_tag: str = "<|",
                          close_tag: str = "|>",
                          sep: str = "\n",
                          portable: bool = False,
                          on_drop: str = "ignore",
                          drop_stats: Optional[dict] = None,
                          max_iter: int = 25,
                          checkpoint_dir: Optional[str] = None) -> DataFrame:
    """NEAR-dup conversation-level dedup: MinHash+LSH over the
    deterministic render, then canonical-member collapse — the
    transcript analogue of ``dedup.minhash_dedup`` + ``keep_canonical``.

    :func:`dedup_conversations` only removes byte-identical
    conversations; web-scale SFT corpora also carry *near*-identical
    ones (re-scrapes with one turn edited, truncated mirrors, template
    chats differing in a greeting). Here two conversations are near-dups
    when the word-``n``-gram Jaccard similarity of their renders
    (:func:`render_conversation` — per-turn role+text in ``order``
    order) is ≥ ``threshold``; within each connected near-dup component
    the smallest ``by`` key survives, and its original turn rows are
    returned byte-identical.

    ``by`` must be a SINGLE column (it becomes the MinHash doc id).
    ``portable``/``on_drop``/``seed``/``num_hashes``/``bands``/``n``
    flow to :func:`trafaret_spark.operators.dedup.minhash_dedup`;
    ``max_iter``/``checkpoint_dir`` to
    :func:`~trafaret_spark.operators.dedup.connected_components` (pass a
    reliable ``checkpoint_dir`` on long cluster runs).

    With an audited ``on_drop`` ("warn"/"error"), pass ``drop_stats={}``
    to get the hot-bucket cap's ``dropped_buckets`` / ``dropped_rows``
    counts back as data (a silently under-deduped boilerplate corpus is
    the failure mode the cap guard exists to surface — r4 verdict #1).
    Cache lifetime is handled HERE: the component collapse checkpoints
    the pair graph eagerly, so the audit's shared bucket-table cache is
    fully consumed by return time and is released before returning —
    callers never hold (or leak) an unpersist handle.

    Plan at 10^12 turns: ① the render's ONE groupBy exchange on ``by``
    collapses the turn table to one row per conversation (~10^9 rows —
    three orders of magnitude smaller), so the whole
    shingle→signature→band→verify pipeline runs at conversation
    cardinality; ② LSH bucket self-join on uniform (band, bucket) keys
    with the hot-bucket cap; ③ component collapse iterates over the
    near-dup pair graph only (≪ corpus); ④ one anti-join of the loser id
    set back onto the turn table, on the same ``by`` key as ①.
    """
    if not isinstance(by, str):
        raise ValueError("neardup_conversations needs a single `by` column "
                         "(it becomes the MinHash doc id)")
    from trafaret_spark.operators import dedup as _dedup
    render_c = temp_col(df, "__render")
    rendered = render_conversation(df, by=by, order=order, role_col=role_col,
                                   text_col=text_col, open_tag=open_tag,
                                   close_tag=close_tag, sep=sep,
                                   out_col=render_c)
    ds = drop_stats if drop_stats is not None \
        else ({} if on_drop != "ignore" else None)
    pairs = _dedup.minhash_dedup(rendered, text_col=render_c, id_col=by,
                                 threshold=threshold, num_hashes=num_hashes,
                                 bands=bands, n=n, seed=seed,
                                 max_bucket_size=max_bucket_size,
                                 portable=portable, on_drop=on_drop,
                                 drop_stats=ds)
    out = _dedup.keep_canonical(df, pairs, id_col=by, max_iter=max_iter,
                                checkpoint_dir=checkpoint_dir)
    if ds is not None and "unpersist" in ds:
        # keep_canonical's component loop checkpointed the pair graph
        # eagerly — the audit's bucket cache has served both consumers
        ds.pop("unpersist")()
    return out


def render_with_spans(df: DataFrame,
                      by: Union[str, Sequence[str]] = "conv_id",
                      order: str = "turn_idx",
                      role_col: str = "role",
                      text_col: str = "text",
                      open_tag: str = "<|",
                      close_tag: str = "|>",
                      sep: str = "\n",
                      out_col: str = "rendered") -> DataFrame:
    """:func:`render_conversation` plus the per-turn character spans an
    SFT pipeline needs for LOSS MASKING: training on assistant text only
    requires knowing where each turn's text lives in the rendered
    string. Adds ``spans`` — one ``struct(o, role, text_start,
    text_end)`` per turn in render order, where ``[text_start,
    text_end)`` are 0-based CODEPOINT offsets of exactly the turn's text
    (header excluded), i.e. ``substring(rendered, text_start + 1,
    text_end - text_start)`` reproduces the turn text byte-for-byte.
    Filter the array by role scan-side (``F.filter(F.col("spans"),
    lambda s: s["role"] == "assistant")``) to get the mask regions.

    ``rendered`` is byte-identical to :func:`render_conversation`'s
    (same sort, tags, separator, NULL coalescing — NULL text renders
    empty, giving an empty span). ``order`` values are cast to long in
    ``spans.o``. Same single-exchange plan; the span fold appends one
    struct per turn, so per-group cost is quadratic in TURNS PER
    CONVERSATION only — conversations are KB-MB, never corpus-scale.
    """
    by = _listify(by)
    turn = F.struct(F.col(order).cast("long").alias("o"),
                    F.coalesce(F.col(role_col), F.lit("")).alias("r"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("t"))
    sorted_turns = F.array_sort(F.collect_list(turn))
    rendered = F.array_join(
        F.transform(
            sorted_turns,
            lambda s: F.concat(F.lit(open_tag), s["r"], F.lit(close_tag),
                               s["t"])),
        sep)
    ot, ct, ns = len(open_tag), len(close_tag), len(sep)
    span_t = ("array<struct<o:bigint,role:string,"
              "text_start:bigint,text_end:bigint>>")
    acc0 = F.struct(F.lit(0).cast("long").alias("pos"),
                    F.array().cast(span_t).alias("sp"))

    def _step(acc, s):
        t_start = acc["pos"] + F.lit(ot) + F.length(s["r"]) + F.lit(ct)
        t_end = t_start + F.length(s["t"])
        span = F.struct(s["o"].alias("o"), s["r"].alias("role"),
                        t_start.cast("long").alias("text_start"),
                        t_end.cast("long").alias("text_end"))
        return F.struct((t_end + F.lit(ns)).cast("long").alias("pos"),
                        F.concat(acc["sp"], F.array(span)).alias("sp"))

    spans = F.aggregate(sorted_turns, acc0, _step, lambda a: a["sp"])
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_turns"),
        rendered.alias(out_col),
        spans.alias("spans"),
    ).withColumn("n_chars", F.length(F.col(out_col)))
