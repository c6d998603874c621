"""ANN / similarity search vs a numpy brute-force oracle."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from trafaret_spark.operators import similarity

DIM, N = 16, 60


def _vecs():
    rng = np.random.RandomState(7)
    v = rng.randn(N, DIM)
    v[1] = v[0] + 0.01 * rng.randn(DIM)   # near-dup of 0
    v[2] = -v[0]                          # anti-correlated
    return v


@pytest.fixture(scope="module")
def corpus(spark):
    v = _vecs()
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v[i]]) for i in range(N)])


def _oracle_topk(v, qid, k):
    sims = v @ v[qid] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[qid]))
    order = np.lexsort((np.arange(N), -sims))   # sim desc, id asc
    return [(int(i), float(sims[i])) for i in order[:k]]


class TestCosineTopK:
    def test_matches_numpy(self, corpus):
        v = _vecs()
        q = corpus.filter(F.col("vec_id") < 3) \
            .select(F.col("vec_id").alias("query_id"), "embedding")
        got = similarity.cosine_topk(corpus, q, k=5).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.sim))
        for qid in range(3):
            mine = sorted(by_q[qid])
            expect = _oracle_topk(v, qid, 5)
            assert [m[1] for m in mine] == [e[0] for e in expect]
            for (_, _, s), (_, es) in zip(mine, expect):
                assert abs(s - es) < 1e-9

    def test_self_is_rank1(self, corpus):
        q = corpus.filter(F.col("vec_id") == 0) \
            .select(F.col("vec_id").alias("query_id"), "embedding")
        top = similarity.cosine_topk(corpus, q, k=2).orderBy("rank").collect()
        assert top[0].vec_id == 0 and abs(top[0].sim - 1.0) < 1e-9
        assert top[1].vec_id == 1  # the planted near-dup


class TestLshTopK:
    def test_recall_of_planted_near_dup(self, corpus):
        q = corpus.filter(F.col("vec_id") == 0) \
            .select(F.col("vec_id").alias("query_id"), "embedding")
        got = similarity.lsh_cosine_topk(corpus, q, k=3, nbits=6, bands=6) \
            .orderBy("rank").collect()
        ids = [r.vec_id for r in got]
        assert 0 in ids        # self always shares every bucket
        assert 1 in ids        # near-identical vector shares sign buckets
        assert got[0].vec_id == 0

    def test_subset_of_exact_scores(self, corpus):
        v = _vecs()
        q = corpus.filter(F.col("vec_id") < 2) \
            .select(F.col("vec_id").alias("query_id"), "embedding")
        for r in similarity.lsh_cosine_topk(corpus, q, k=5, nbits=4, bands=3).collect():
            exact = float(v[r.query_id] @ v[r.vec_id]
                          / (np.linalg.norm(v[r.query_id]) * np.linalg.norm(v[r.vec_id])))
            assert abs(r.sim - exact) < 1e-9


class TestPrimitives:
    def test_dot_and_norm(self, spark):
        df = spark.createDataFrame([Row(a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0])])
        r = df.select(similarity.dot(F.col("a"), F.col("b")).alias("d"),
                      similarity.l2_norm(F.col("a")).alias("n")).collect()[0]
        assert r.d == 32.0
        assert abs(r.n - 14 ** 0.5) < 1e-12


class TestCosineNeardup:
    def test_blocked_matches_numpy(self, spark):
        v = _vecs()
        df = spark.createDataFrame(
            [Row(vec_id=i, label=i % 3, embedding=[float(x) for x in v[i]])
             for i in range(N)])
        got = {(r.a, r.b): r.sim for r in similarity.cosine_neardup(
            df, threshold=0.5, block_cols=["label"]).collect()}
        norms = np.linalg.norm(v, axis=1)
        expect = {}
        for a in range(N):
            for b in range(a + 1, N):
                if a % 3 != b % 3:
                    continue
                s = float(v[a] @ v[b] / (norms[a] * norms[b]))
                if s >= 0.5:
                    expect[(a, b)] = s
        assert set(got) == set(expect)
        for k in got:
            assert abs(got[k] - expect[k]) < 1e-9
        assert (0, 1) not in got  # near-dup planted in different labels (0 vs 1)

    def test_lsh_finds_planted_near_dup(self, spark):
        v = _vecs()
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(x) for x in v[i]]) for i in range(N)])
        got = {(r.a, r.b): r.sim for r in similarity.cosine_neardup(
            df, threshold=0.9, nbits=6, bands=8).collect()}
        assert (0, 1) in got and got[(0, 1)] > 0.99
        assert all(s >= 0.9 for s in got.values())


class TestIvfDegenerateCentroids:
    def test_zero_norm_centroid_does_not_break_assignment(self, spark):
        """A zero vector in the codebook yields NaN cosine sims; the
        natural-order sort key must still produce a total order (the old
        comparator was non-transitive here and TimSort could reject it)."""
        from pyspark.sql import functions as F
        rows = [(0, [0.0, 0.0, 0.0, 0.0])] + \
               [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(1, 40)]
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = corpus.filter(F.col("vec_id").isin(1, 2)) \
            .select(F.col("vec_id").alias("query_id"), "embedding")
        # head-based centroids include the zero vector (vec_id 0)
        out = similarity.ivf_cosine_topk(corpus, q, k=3, n_centroids=4,
                                         nprobe=2).collect()
        assert len(out) > 0
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        for qid, rs in by_q.items():
            ranks = sorted(r.rank for r in rs)
            assert ranks == list(range(1, len(rs) + 1))


class TestPoolEmbeddings:
    def test_mean_pool_exact(self, spark):
        df = spark.createDataFrame([
            Row(g="a", embedding=[1.0, 2.0, 3.0]),
            Row(g="a", embedding=[3.0, 4.0, 5.0]),
            Row(g="b", embedding=[10.0, 0.0, -2.0]),
        ])
        out = {r.g: r for r in
               similarity.pool_embeddings(df, "g").collect()}
        assert out["a"].pooled == [2.0, 3.0, 4.0]
        assert out["a"].n_pooled == 2
        assert out["b"].pooled == [10.0, 0.0, -2.0]

    def test_sum_pool_and_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [Row(g="a", embedding=[1.5, -0.5]),
             Row(g="a", embedding=[0.5, 0.5]),
             Row(g="a", embedding=None)],
            "g string, embedding array<double>")
        r = similarity.pool_embeddings(df, "g", agg="sum").collect()[0]
        assert r.pooled == [2.0, 0.0]
        assert r.n_pooled == 2

    def test_quantization_is_order_independent(self, spark):
        # 0.1 + 0.2 != 0.3 in doubles; quantized int sums are exact, so
        # the pooled value is bit-identical however partials combine
        rows = [Row(g="a", embedding=[0.1]), Row(g="a", embedding=[0.2]),
                Row(g="a", embedding=[0.3])]
        one = similarity.pool_embeddings(
            spark.createDataFrame(rows).coalesce(1), "g").collect()[0]
        many = similarity.pool_embeddings(
            spark.createDataFrame(rows).repartition(7), "g").collect()[0]
        assert one.pooled == many.pooled
        assert one.pooled[0] == pytest.approx(0.2, abs=1e-6)

    def test_ragged_position_wise(self, spark):
        df = spark.createDataFrame([
            Row(g="a", embedding=[2.0, 4.0, 6.0]),
            Row(g="a", embedding=[4.0, 8.0]),
        ])
        r = similarity.pool_embeddings(df, "g").collect()[0]
        assert r.pooled == [3.0, 6.0, 6.0]
        assert r.n_pooled == 2

    def test_bad_agg_raises(self, spark):
        df = spark.createDataFrame([Row(g="a", embedding=[1.0])])
        with pytest.raises(ValueError, match="mean|sum"):
            similarity.pool_embeddings(df, "g", agg="max")
