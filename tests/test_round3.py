"""Round-3 property tests: the rewritten plan paths must be semantically
invisible — broadcast as-of's content-derived identity, cosine_topk's
two-phase partial top-k, and range_join's exact long-interval path each
get a randomized equivalence check against a naive reference."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from trafaret_spark.operators import similarity
from trafaret_spark.operators.asof import asof_join
from trafaret_spark.operators.rangejoin import range_join


# ---------------------------------------------------------------------------
# broadcast as-of with duplicate left rows ≡ sort strategy
# ---------------------------------------------------------------------------

def asof_case():
    # small domains force ties AND exact duplicate left rows
    lrow = st.tuples(st.integers(0, 2), st.integers(0, 20))
    rrow = st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 99))
    return st.tuples(st.lists(lrow, min_size=1, max_size=15),
                     st.lists(rrow, min_size=0, max_size=15),
                     st.sampled_from(["backward", "forward", "nearest"]),
                     st.sampled_from([None, 5.0]))


@pytest.mark.usefixtures("spark")
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(asof_case())
def test_broadcast_equals_sort_with_duplicate_left_rows(spark, case):
    lrows, rrows, direction, tolerance = case
    left = spark.createDataFrame([(f"c{c}", float(s)) for c, s in lrows],
                                 "conv_id string, ts double")
    right = spark.createDataFrame(
        [(f"c{c}", float(s), v) for c, s, v in rrows] or
        [("zz", 0.0, 0)],  # createDataFrame needs rows; zz matches nothing
        "conv_id string, ts double, rv long")
    # collapse right ts ties so the pick is strategy-independent
    right = right.groupBy("conv_id", "ts").agg(F.max("rv").alias("rv"))

    def run(strategy):
        out = asof_join(left, right, on="ts", by="conv_id",
                        direction=direction, tolerance=tolerance,
                        suffix="_r", strategy=strategy).toPandas()
        return sorted((r.conv_id, r.ts, -1 if r.rv_r is None or
                       (isinstance(r.rv_r, float) and np.isnan(r.rv_r))
                       else int(r.rv_r))
                      for r in out.itertuples())

    assert run("broadcast") == run("sort")


# ---------------------------------------------------------------------------
# two-phase cosine_topk ≡ naive single-window rank
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.integers(0, 2**31 - 1), st.integers(1, 40), st.integers(1, 4))
def test_two_phase_topk_equals_single_window(spark, seed, n_corpus, k):
    rng = np.random.RandomState(seed)
    dim = 4
    vecs = rng.randint(-3, 4, size=(n_corpus, dim)).astype(float)
    # inject exact duplicates to force sim ties across salt partitions
    if n_corpus >= 2:
        vecs[n_corpus // 2] = vecs[0]
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n_corpus)],
        "vec_id long, embedding array<double>")
    queries = corpus.limit(3).select(F.col("vec_id").alias("query_id"),
                                     "embedding")

    got = similarity.cosine_topk(corpus, queries, k=k,
                                 partial_partitions=3).toPandas()

    # naive reference: score everything, one global window
    q = queries.select("query_id", F.col("embedding").alias("__qv"))
    c = corpus.select("vec_id", F.col("embedding").alias("__cv"))
    scored = (c.crossJoin(q)
              .withColumn("sim", similarity.cosine(F.col("__qv"),
                                                   F.col("__cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    exp = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "vec_id", "sim", "rank").toPandas())

    key = lambda df: sorted(
        (int(r.query_id), int(r.vec_id), int(r.rank),
         None if r.sim is None or np.isnan(r.sim) else round(float(r.sim), 9))
        for r in df.itertuples())
    assert key(got) == key(exp)


# ---------------------------------------------------------------------------
# range_join with spans straddling the bucket cap ≡ naive range predicate
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.integers(0, 2**31 - 1), st.integers(1, 20), st.integers(0, 12))
def test_range_join_exact_across_cap(spark, seed, n_left, n_right):
    rng = np.random.RandomState(seed)
    cap, width = 3, 10.0  # intervals longer than 30 take the long path
    left = spark.createDataFrame(
        [(int(i), float(rng.uniform(0, 200))) for i in range(n_left)],
        "lid long, ts double")
    rrows = []
    for j in range(n_right):
        s = float(rng.uniform(0, 200))
        span = float(rng.choice([rng.uniform(0, 25), rng.uniform(40, 150)]))
        rrows.append((int(j), s, s + span))
    right = spark.createDataFrame(rrows or [(0, 1.0, 0.5)],
                                  "rid long, start double, end double")
    got = {(r.lid, r.rid_r) for r in
           range_join(left, right, on="ts", bucket_width=width,
                      max_buckets_per_interval=cap, suffix="_r").collect()}
    naive = {(r.lid, r.rid) for r in
             left.join(right, (left["ts"] >= right["start"])
                       & (left["ts"] <= right["end"])).collect()}
    assert got == naive
