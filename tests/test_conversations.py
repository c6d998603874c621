"""Conversation-structure operators: per-turn error codes, per-conversation
reports, stutter dedup, token-budget truncation, deterministic rendering —
plus the data-mixture sampler. Complements the driver oracles (which attest
DuckDB value parity on events-derived transcripts) with hand-built
conversations whose expected codes are known by construction."""

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from trafaret_spark.operators import conversations, sampling
from trafaret_spark.operators.hashing import M31


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _conv(spark, rows):
    return spark.createDataFrame([
        Row(conv_id=c, turn_idx=i, role=r, text=t, ts=ts)
        for (c, i, r, t, ts) in rows])


@pytest.fixture(scope="module")
def legal(spark):
    # a perfectly legal conversation: system -> user -> assistant -> tool
    # -> tool -> assistant -> user
    return _conv(spark, [
        ("a", 0, "system", "sys prompt", _ts(0)),
        ("a", 1, "user", "hi", _ts(1)),
        ("a", 2, "assistant", "hello", _ts(2)),
        ("a", 3, "tool", "result", _ts(3)),
        ("a", 4, "tool", "result2", _ts(4)),
        ("a", 5, "assistant", "done", _ts(5)),
        ("a", 6, "user", "thanks", _ts(6)),
    ])


class TestTurnErrors:
    def test_legal_conversation_is_clean(self, legal):
        out = conversations.turn_errors(legal).collect()
        assert all(r.turn_errs == [] for r in out)

    def test_each_code_fires(self, spark):
        df = _conv(spark, [
            ("b", 1, "tool", "x", _ts(0)),      # gap (starts at 1) + bad start
            ("b", 3, "user", "y", _ts(2)),      # gap (1->3), tool->user illegal
            ("b", 4, None, "z", _ts(1)),        # null role, ts regresses
        ])
        got = {r.turn_idx: r.turn_errs
               for r in conversations.turn_errors(df).collect()}
        assert got[1] == ["turn_gap", "bad_start_role"]
        assert got[3] == ["turn_gap", "bad_transition"]
        assert got[4] == ["null_role", "ts_regress"]

    def test_dense_from_none_skips_gap_check(self, spark):
        df = _conv(spark, [("c", 5, "user", "x", _ts(0)),
                           ("c", 9, "assistant", "y", _ts(1))])
        out = conversations.turn_errors(df, dense_from=None).collect()
        assert all(r.turn_errs == [] for r in out)

    def test_ts_col_none_skips_regress(self, spark):
        df = _conv(spark, [("d", 0, "user", "x", _ts(5)),
                           ("d", 1, "assistant", "y", _ts(1))])
        out = {r.turn_idx: r.turn_errs
               for r in conversations.turn_errors(df, ts_col=None).collect()}
        assert out[1] == []

    def test_custom_policy(self, spark):
        df = _conv(spark, [("e", 0, "user", "x", _ts(0)),
                           ("e", 1, "user", "y", _ts(1))])
        out = {r.turn_idx: r.turn_errs for r in conversations.turn_errors(
            df, transitions=frozenset({("user", "user")})).collect()}
        assert out[1] == []

    def test_single_exchange_plan(self, legal):
        plan = conversations.turn_errors(legal) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "EvalPython" not in plan


class TestConversationReport:
    def test_report_shape(self, spark, legal):
        bad = _conv(spark, [
            ("b", 0, "user", "x", _ts(0)),
            ("b", 1, "tool", "y", _ts(1)),      # user->tool illegal
            ("b", 2, "assistant", "z", _ts(2)),
        ])
        out = {r.conv_id: r for r in conversations.conversation_report(
            legal.unionByName(bad)).collect()}
        a, b = out["a"], out["b"]
        assert (a.n_turns, a.n_bad_turns, a.first_err, a.is_valid) == \
            (7, 0, None, True)
        assert (b.n_turns, b.n_bad_turns, b.first_err, b.is_valid) == \
            (3, 1, "bad_transition", False)

    def test_first_err_is_earliest_turn(self, spark):
        df = _conv(spark, [
            ("c", 0, "user", "x", _ts(5)),
            ("c", 1, "assistant", "y", _ts(1)),   # ts_regress at turn 1
            ("c", 2, None, "z", _ts(2)),          # null_role at turn 2
        ])
        r = conversations.conversation_report(df).collect()[0]
        assert r.first_err == "ts_regress" and r.n_bad_turns == 2

    def test_precomputed_errs_col_reused(self, legal):
        pre = conversations.turn_errors(legal)
        out = conversations.conversation_report(pre).collect()[0]
        assert out.is_valid


class TestDedupStutter:
    def test_collapses_runs_keeps_first(self, spark):
        df = _conv(spark, [
            ("a", 0, "user", "hi", _ts(0)),
            ("a", 1, "assistant", "ok", _ts(1)),
            ("a", 2, "assistant", "ok", _ts(2)),   # stutter
            ("a", 3, "assistant", "ok", _ts(3)),   # stutter
            ("a", 4, "assistant", "done", _ts(4)),
            ("a", 5, "user", "ok", _ts(5)),        # same text, new role: keep
        ])
        kept = sorted(r.turn_idx
                      for r in conversations.dedup_stutter(df).collect())
        assert kept == [0, 1, 4, 5]

    def test_null_text_stutters(self, spark):
        df = _conv(spark, [("a", 0, "user", None, _ts(0)),
                           ("a", 1, "user", None, _ts(1)),
                           ("z", 0, "user", "anchor", _ts(0))])
        kept = [r.turn_idx for r in
                conversations.dedup_stutter(df).collect()
                if r.conv_id == "a"]
        assert kept == [0]

    def test_first_turn_always_survives(self, spark):
        df = _conv(spark, [("a", 0, "user", "x", _ts(0)),
                           ("b", 0, "user", "x", _ts(0))])
        assert conversations.dedup_stutter(df).count() == 2


class TestTruncateTurns:
    def _budget_df(self, spark):
        rows = [("a", i, "user", "t", _ts(i)) for i in range(5)]
        df = _conv(spark, rows)
        return df.withColumn("n_tokens", F.lit(10) * (F.col("turn_idx") + 1))

    def test_head_keeps_longest_prefix(self, spark):
        # cum: 10, 30, 60, 100, 150 -> budget 100 keeps turns 0..3
        out = conversations.truncate_turns(self._budget_df(spark), 100)
        assert sorted(r.turn_idx for r in out.collect()) == [0, 1, 2, 3]

    def test_tail_keeps_longest_suffix(self, spark):
        # reversed cum: 50, 90, 120 -> budget 100 keeps turns 4, 3
        out = conversations.truncate_turns(self._budget_df(spark), 100,
                                           keep="tail")
        assert sorted(r.turn_idx for r in out.collect()) == [3, 4]

    def test_oversized_first_turn_drops_all(self, spark):
        out = conversations.truncate_turns(self._budget_df(spark), 5)
        assert out.count() == 0

    def test_null_tokens_count_zero(self, spark):
        df = _conv(spark, [("a", 0, "user", "x", _ts(0))]) \
            .withColumn("n_tokens", F.lit(None).cast("long"))
        assert conversations.truncate_turns(df, 0).count() == 1

    def test_bad_args_raise(self, spark):
        df = self._budget_df(spark)
        with pytest.raises(ValueError, match="max_tokens"):
            conversations.truncate_turns(df, -1)
        with pytest.raises(ValueError, match="keep"):
            conversations.truncate_turns(df, 10, keep="middle")


class TestRenderConversation:
    def test_render_bytes(self, spark):
        df = _conv(spark, [
            ("a", 1, "assistant", "hello", _ts(1)),
            ("a", 0, "user", "hi", _ts(0)),   # out of order on purpose
        ])
        r = conversations.render_conversation(df).collect()[0]
        assert r.rendered == "<|user|>hi\n<|assistant|>hello"
        assert (r.n_turns, r.n_chars) == (2, len(r.rendered))

    def test_null_role_text_render_empty(self, spark):
        df = _conv(spark, [("a", 0, None, None, _ts(0)),
                           ("z", 0, "user", "anchor", _ts(0))])
        r = {x.conv_id: x for x in
             conversations.render_conversation(df).collect()}["a"]
        assert r.rendered == "<||>"

    def test_custom_tags(self, spark):
        df = _conv(spark, [("a", 0, "user", "x", _ts(0))])
        r = conversations.render_conversation(
            df, open_tag="[", close_tag="] ", sep="||").collect()[0]
        assert r.rendered == "[user] x"

    def test_single_exchange_plan(self, spark):
        df = _conv(spark, [("a", 0, "user", "x", _ts(0))])
        plan = conversations.render_conversation(df) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


@pytest.fixture(scope="module")
def mix_docs(spark):
    # 300 en, 60 de, 40 zh: with weights en .5 / de .2 / zh .3, zh is the
    # binding domain (40/.3 = 133 < de 300, en 600)
    rows = ([Row(doc_id=i, lang="en") for i in range(300)]
            + [Row(doc_id=300 + i, lang="de") for i in range(60)]
            + [Row(doc_id=360 + i, lang="zh") for i in range(40)])
    return spark.createDataFrame(rows)


class TestMixtureSample:
    WEIGHTS = {"en": 0.5, "de": 0.2, "zh": 0.3}

    def test_thresholds_binding_domain_keeps_all(self):
        thr = sampling.mixture_thresholds(
            {"en": 300, "de": 60, "zh": 40}, self.WEIGHTS, portable=True)
        assert thr["zh"] == M31                      # binding: keep all
        # en target = 40/.3*.5 = 66.67 docs -> threshold = that fraction,
        # in the docstring's normative FP operation order
        assert thr["en"] == math.floor(M31 * 0.5 * 40 / (0.3 * 300))
        assert thr["de"] < M31

    def test_mixture_proportions(self, mix_docs):
        out = sampling.mixture_sample(
            mix_docs, "lang", self.WEIGHTS, key_cols="doc_id", seed=1)
        counts = {r.lang: r.cnt for r in
                  out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        assert counts["zh"] == 40                    # binding kept whole
        # expectation 66.7 en / 26.7 de, hash noise is O(sqrt(n))
        assert 50 <= counts["en"] <= 85
        assert 15 <= counts["de"] <= 40

    def test_unweighted_domains_dropped(self, spark, mix_docs):
        extra = mix_docs.unionByName(
            spark.createDataFrame([Row(doc_id=999, lang="fr")]))
        out = sampling.mixture_sample(
            extra, "lang", self.WEIGHTS, key_cols="doc_id")
        assert out.filter(F.col("lang") == "fr").count() == 0

    def test_deterministic_and_nested_in_seedspace(self, mix_docs):
        a = {r.doc_id for r in sampling.mixture_sample(
            mix_docs, "lang", self.WEIGHTS, key_cols="doc_id", seed=2).collect()}
        b = {r.doc_id for r in sampling.mixture_sample(
            mix_docs, "lang", self.WEIGHTS, key_cols="doc_id", seed=2).collect()}
        assert a == b

    def test_bad_inputs_raise(self, mix_docs):
        with pytest.raises(ValueError, match="non-empty"):
            sampling.mixture_sample(mix_docs, "lang", {}, key_cols="doc_id")
        with pytest.raises(ValueError, match="> 0"):
            sampling.mixture_sample(mix_docs, "lang", {"en": 0.0},
                                    key_cols="doc_id")
        with pytest.raises(ValueError, match="no rows"):
            sampling.mixture_sample(mix_docs, "lang", {"en": 1.0, "xx": 1.0},
                                    key_cols="doc_id")


class TestDedupConversations:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            ("a", 0, "user", "hi"), ("a", 1, "assistant", "hello"),
            ("b", 0, "user", "hi"), ("b", 1, "assistant", "hello"),
            ("c", 0, "user", "hi"), ("c", 1, "assistant", "different"),
        ]
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx long, role string, text string")

    def test_smallest_key_survives(self, corpus):
        out = conversations.dedup_conversations(corpus)
        assert sorted({r.conv_id for r in out.collect()}) == ["a", "c"]
        assert out.count() == 4  # turn rows of survivors, untouched

    def test_rows_byte_identical(self, corpus):
        out = conversations.dedup_conversations(corpus)
        got = sorted(tuple(r) for r in out.collect())
        want = sorted(tuple(r) for r in corpus.collect()
                      if r.conv_id in ("a", "c"))
        assert got == want

    def test_keep_hash_groups(self, corpus):
        out = conversations.dedup_conversations(corpus, keep_hash=True)
        hashes = {r.conv_id: r.conv_hash for r in out.collect()}
        assert set(hashes) == {"a", "c"} and hashes["a"] != hashes["c"]

    def test_order_invariance(self, spark):
        # same content, rows arriving in shuffled turn order → still dups
        d1 = spark.createDataFrame(
            [("x", 1, "assistant", "t"), ("x", 0, "user", "s"),
             ("y", 0, "user", "s"), ("y", 1, "assistant", "t")],
            "conv_id string, turn_idx long, role string, text string")
        out = conversations.dedup_conversations(d1)
        assert {r.conv_id for r in out.collect()} == {"x"}

    def test_no_python_single_turn_exchange(self, corpus):
        plan = conversations.dedup_conversations(corpus) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


class TestConversationFeatures:
    @pytest.fixture(scope="class")
    def feats(self, spark):
        rows = [
            ("c1", 0, "system", "be nice", "2024-01-01 00:00:00"),
            ("c1", 1, "user", "hi", "2024-01-01 00:00:10"),
            ("c1", 2, "assistant", "hello!", "2024-01-01 00:00:12.5"),
            ("c1", 3, "user", "bye", "2024-01-01 00:00:20"),
            ("c1", 4, "assistant", "bye", "2024-01-01 00:00:24"),
            ("c2", 0, "user", None, None),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx long, role string,"
                  " text string, ts string") \
            .withColumn("ts", F.col("ts").cast("timestamp"))
        out = conversations.conversation_features(df)
        return {r.conv_id: r for r in out.collect()}

    def test_role_mix_and_chars(self, feats):
        c1 = feats["c1"]
        assert (c1.n_turns, c1.n_user_turns, c1.n_assistant_turns,
                c1.n_other_turns) == (5, 2, 2, 1)
        assert c1.total_chars == 7 + 2 + 6 + 3 + 3
        assert c1.avg_turn_chars == round(21 / 5, 6)

    def test_response_latency_exact(self, feats):
        c1 = feats["c1"]
        assert c1.n_responses == 2
        # latencies 2.5s and 4.0s — exact µs arithmetic
        assert c1.avg_response_secs == 3.25
        assert c1.max_response_secs == 4.0
        assert c1.duration_secs == 24.0

    def test_null_ts_conversation(self, feats):
        c2 = feats["c2"]
        assert c2.n_turns == 1 and c2.n_responses == 0
        assert c2.avg_response_secs is None
        assert c2.max_response_secs is None
        assert c2.total_chars == 0

    def test_single_exchange_no_python(self, spark):
        df = spark.createDataFrame(
            [("c", 0, "user", "x", None)],
            "conv_id string, turn_idx long, role string, text string,"
            " ts timestamp")
        plan = conversations.conversation_features(df) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1 and "EvalPython" not in plan


class TestNeardupConversations:
    @pytest.fixture(scope="class")
    def neardup_corpus(self, spark):
        # three content groups, each word-distinct so no cross-group
        # near-dups: group 1 = a perfect copy (z1) and a one-word-edited
        # near-copy (z2) of conversation a; group 2 = b alone; group 3 =
        # c and its truncated mirror (z3, last turn dropped). Eight-turn
        # conversations keep the near-dup renders' gram-Jaccard ≥ ~0.85,
        # where BOTH hash families' 16×4 LSH detection probability is
        # ≥ 1 - 1e-5 (a 4-turn variant sat at j≈0.63, where one family
        # deterministically missed the pair — detection sets are
        # family-dependent at the threshold edge by design)
        def turns(conv, prefix, n_turns=8, edit_last=None, drop_last=False):
            rows = []
            for i in range(n_turns - (1 if drop_last else 0)):
                words = " ".join(f"{prefix}t{i}w{j}" for j in range(6))
                if edit_last is not None and i == n_turns - 1:
                    words = words.rsplit(" ", 1)[0] + " " + edit_last
                rows.append((conv, i, "user" if i % 2 == 0 else "assistant",
                             words))
            return rows
        rows = (turns("a", "aa")
                + turns("z1", "aa")
                + turns("z2", "aa", edit_last="EDITED")
                + turns("b", "bb", n_turns=2)
                + turns("c", "cc")
                + turns("z3", "cc", drop_last=True))
        return spark.createDataFrame(
            [Row(conv_id=c, turn_idx=i, role=r, text=t)
             for (c, i, r, t) in rows])

    def test_canonical_survives_neardups_removed(self, neardup_corpus):
        out = conversations.neardup_conversations(
            neardup_corpus, threshold=0.5)
        assert set(r.conv_id for r in out.select("conv_id").distinct()
                   .collect()) == {"a", "b", "c"}

    def test_surviving_rows_byte_identical(self, neardup_corpus):
        out = conversations.neardup_conversations(
            neardup_corpus, threshold=0.5)
        got = sorted((r.conv_id, r.turn_idx, r.role, r.text)
                     for r in out.collect())
        want = sorted((r.conv_id, r.turn_idx, r.role, r.text)
                      for r in neardup_corpus.filter(
                          F.col("conv_id").isin("a", "b", "c")).collect())
        assert got == want

    def test_high_threshold_keeps_near_misses(self, neardup_corpus):
        # at threshold 1.0 only the EXACT copy (z1) collapses; the edited
        # and truncated variants survive
        out = conversations.neardup_conversations(
            neardup_corpus, threshold=1.0)
        assert set(r.conv_id for r in out.select("conv_id").distinct()
                   .collect()) == {"a", "b", "c", "z2", "z3"}

    def test_portable_matches_fast(self, neardup_corpus):
        fast = conversations.neardup_conversations(
            neardup_corpus, threshold=0.5)
        port = conversations.neardup_conversations(
            neardup_corpus, threshold=0.5, portable=True)
        assert sorted(map(tuple, fast.collect())) == \
            sorted(map(tuple, port.collect()))

    def test_multi_by_rejected(self, neardup_corpus):
        with pytest.raises(ValueError, match="single"):
            conversations.neardup_conversations(
                neardup_corpus, by=["conv_id", "role"])
