"""BM25 retrieval + bigram-LM quality scoring: hand-computable fixtures
(exact scores vs a pure-Python reference), plan shape, and edge cases.
Cross-engine value parity is attested by the driver oracles (ret_bm25,
lm_bits)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from trafaret_spark.operators import lmscore, retrieval


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id=0, text="spark shuffle join"),
        Row(doc_id=1, text="spark spark broadcast join"),
        Row(doc_id=2, text="window aggregate"),
        Row(doc_id=3, text="shuffle shuffle shuffle partition"),
        Row(doc_id=4, text=""),
    ]
    return spark.createDataFrame(rows)


def _bm25_reference(corpus_rows, query_terms, k1=1.2, b=0.75,
                    max_df_frac=1.0):
    """Row-at-a-time reference implementation (the oracle the operator
    must match exactly, including quantization)."""
    docs = {r.doc_id: r.text.split() if r.text else [] for r in corpus_rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for d, toks in docs.items():
        s = 0
        for t in set(query_terms):
            tf = toks.count(t)
            if not tf or df[t] > max_df_frac * n:
                continue
            idf = math.log(1.0 + (float(n) - df[t] + 0.5) / (df[t] + 0.5))
            c = idf * ((tf * (k1 + 1.0))
                       / (tf + k1 * ((1.0 - b) + b * (len(toks) / avgdl))))
            s += math.floor(c * retrieval.SCORE_SCALE)
        if s:
            scores[d] = s
    return scores


class TestBm25:
    def test_matches_reference_exactly(self, spark, corpus):
        qs = spark.createDataFrame([Row(query_id=1, text="spark shuffle")])
        out = {r.doc_id: (r.rank, r.score) for r in
               retrieval.bm25_topk(corpus, qs, k=10,
                                   max_df_frac=1.0).collect()}
        ref = _bm25_reference(corpus.collect(), ["spark", "shuffle"])
        ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        assert set(out) == set(ref)
        for rank, (d, sq) in enumerate(ranked, 1):
            assert out[d] == (rank, sq / float(retrieval.SCORE_SCALE))

    def test_tf_saturation_vs_repeat(self, spark, corpus):
        # doc 3 has tf=3 'shuffle' but BM25 saturates: it must still beat
        # single-occurrence docs, but by less than 3x
        qs = spark.createDataFrame([Row(query_id=1, text="shuffle")])
        out = {r.doc_id: r.score for r in
               retrieval.bm25_topk(corpus, qs, k=10,
                                   max_df_frac=1.0).collect()}
        assert out[3] > out[0] and out[3] < 3 * out[0]

    def test_max_df_frac_drops_common_terms(self, spark, corpus):
        # 'spark' df=2/5=0.4, 'shuffle' df=2/5=0.4 -> cut at 0.3 kills both
        qs = spark.createDataFrame([Row(query_id=1, text="spark shuffle")])
        out = retrieval.bm25_topk(corpus, qs, k=10, max_df_frac=0.3)
        assert out.count() == 0

    def test_query_term_multiplicity_ignored(self, spark, corpus):
        q1 = spark.createDataFrame([Row(query_id=1, text="spark")])
        q2 = spark.createDataFrame([Row(query_id=1, text="spark spark spark")])
        a = {(r.doc_id, r.score) for r in
             retrieval.bm25_topk(corpus, q1, max_df_frac=1.0).collect()}
        b = {(r.doc_id, r.score) for r in
             retrieval.bm25_topk(corpus, q2, max_df_frac=1.0).collect()}
        assert a == b

    def test_no_python_in_plan_and_query_broadcast(self, spark, corpus):
        qs = spark.createDataFrame([Row(query_id=1, text="spark")])
        plan = retrieval.bm25_topk(corpus, qs, max_df_frac=1.0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "BroadcastExchange" in plan

    def test_bad_args_raise(self, spark, corpus):
        qs = spark.createDataFrame([Row(query_id=1, text="x")])
        with pytest.raises(ValueError, match="max_df_frac"):
            retrieval.bm25_topk(corpus, qs, max_df_frac=0.0)
        with pytest.raises(ValueError, match="k must"):
            retrieval.bm25_topk(corpus, qs, k=0)
        with pytest.raises(ValueError, match="empty corpus"):
            retrieval.bm25_topk(corpus.filter(F.lit(False)), qs)

    def test_from_postings_matches_corpus_path(self, spark, corpus):
        qs = spark.createDataFrame([Row(query_id=1, text="spark shuffle")])
        via_corpus = {(r.doc_id, r.rank, r.score) for r in
                      retrieval.bm25_topk(corpus, qs, k=10,
                                          max_df_frac=1.0).collect()}
        post = retrieval.build_postings(corpus)
        n = corpus.count()
        sdl = corpus.select(F.size(retrieval.tokens(F.col("text")))
                            .alias("dl")).agg(F.sum("dl")).collect()[0][0]
        via_index = {(r.doc_id, r.rank, r.score) for r in
                     retrieval.bm25_topk_from_postings(
                         post, qs, n_docs=n, avgdl=sdl / n, k=10,
                         max_df_frac=1.0).collect()}
        assert via_corpus == via_index

    def test_postings_shape(self, corpus):
        p = {(r.term, r.doc_id): (r.tf, r.dl)
             for r in retrieval.build_postings(corpus).collect()}
        assert p[("spark", 1)] == (2, 4)
        assert p[("shuffle", 3)] == (3, 4)
        assert not any(d == 4 for (_, d) in p)  # empty doc: no postings


class TestBigramLM:
    def test_known_probabilities(self, spark):
        # train: one doc "a b a b" -> bigrams (a,b)x2? no: a b / b a / a b
        train = spark.createDataFrame([Row(doc_id=0, text="a b a b")])
        model = lmscore.train_bigram_lm(train, alpha=0.5)
        assert model.vocab_size == 3  # {a, b} + 1
        c2 = {(r.w1, r.w2): r.c2 for r in model.bigrams.collect()}
        c1 = {r.w1: r.c1 for r in model.contexts.collect()}
        assert c2 == {("a", "b"): 2, ("b", "a"): 1}
        assert c1 == {"a": 2, "b": 1}

    def _expected_bits(self, pairs, c2, c1, v, alpha=0.5):
        sq = sum(math.floor(math.log((c2.get(p, 0) + alpha)
                                     / (c1.get(p[0], 0) + alpha * v))
                            * lmscore.LOGP_SCALE) for p in pairs)
        return -(sq / len(pairs)) / float(lmscore.LOGP_SCALE) / math.log(2.0)

    def test_score_matches_reference(self, spark):
        train = spark.createDataFrame([Row(doc_id=0, text="a b a b")])
        model = lmscore.train_bigram_lm(train, alpha=0.5)
        score = spark.createDataFrame([Row(doc_id=1, text="a b c")])
        r = lmscore.lm_score(score, model).collect()[0]
        exp = self._expected_bits([("a", "b"), ("b", "c")],
                                  {("a", "b"): 2, ("b", "a"): 1},
                                  {"a": 2, "b": 1}, 3)
        assert r.n_bigrams == 2
        assert r.bits_per_token == pytest.approx(exp, abs=1e-12)

    def test_in_domain_scores_lower_than_junk(self, spark):
        train = spark.createDataFrame(
            [Row(doc_id=i, text="the quick brown fox jumps over the lazy dog")
             for i in range(20)])
        model = lmscore.train_bigram_lm(train)
        probe = spark.createDataFrame([
            Row(doc_id=100, text="the quick brown fox"),
            Row(doc_id=101, text="dog lazy jumps brown quick xqzw"),
        ])
        got = {r.doc_id: r.bits_per_token
               for r in lmscore.lm_score(probe, model).collect()}
        assert got[100] < got[101]

    def test_short_docs_score_null(self, spark):
        train = spark.createDataFrame([Row(doc_id=0, text="a b")])
        model = lmscore.train_bigram_lm(train)
        probe = spark.createDataFrame([Row(doc_id=1, text="solo"),
                                       Row(doc_id=2, text="")])
        out = {r.doc_id: r for r in lmscore.lm_score(probe, model).collect()}
        assert set(out) == {1, 2}
        assert all(r.n_bigrams == 0 and r.bits_per_token is None
                   for r in out.values())

    def test_no_python_in_plan(self, spark):
        train = spark.createDataFrame([Row(doc_id=0, text="a b c")])
        model = lmscore.train_bigram_lm(train)
        plan = lmscore.lm_score(train, model, broadcast_model=True) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "BroadcastExchange" in plan

    def test_bad_alpha_raises(self, spark):
        train = spark.createDataFrame([Row(doc_id=0, text="a b")])
        with pytest.raises(ValueError, match="alpha"):
            lmscore.train_bigram_lm(train, alpha=0.0)
