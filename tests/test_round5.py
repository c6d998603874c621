"""Round-5 regression tests: lm_bucket, cluster_assign, corpus_stats /
persisted-index BM25, minhash drop_stats observability + cache lifetime,
run_curation audit tiers + near-dup drop surfacing, range_join probe
persist, and the decontaminate non-broadcast equivalence."""

import datetime as dt

import numpy as np
import pytest
from pyspark import StorageLevel
from pyspark.sql import Row
from pyspark.sql import functions as F


def _persisted_ids(spark):
    """Ids of currently-persisted RDDs (leak probe). Set-of-ids, not a
    count: the shared session's ContextCleaner unpersists older tests'
    localCheckpoint RDDs asynchronously, so a raw count can DROP between
    two probes — "no NEW ids" is the order-robust assertion."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {k for k in m.keySet().toArray()}


class TestLmBucket:
    def test_int_buckets_and_labels(self, spark):
        from trafaret_spark.operators.lmscore import lm_bucket
        df = spark.createDataFrame(
            [(1, 3.0), (2, 4.99), (3, 5.0), (4, 9.9), (5, None)],
            "doc_id long, bits_per_token double")
        got = {r.doc_id: r.lm_bucket
               for r in lm_bucket(df, [4.99, 5.06]).collect()}
        # half-open: below edges[0] -> 0; [e0, e1) -> 1; >= e1 -> 2
        assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: None}
        lab = {r.doc_id: r.lm_bucket
               for r in lm_bucket(df, [4.99, 5.06],
                                  labels=["head", "middle", "tail"])
               .collect()}
        assert lab == {1: "head", 2: "middle", 3: "middle", 4: "tail",
                       5: None}

    def test_composes_with_lm_score(self, spark):
        from trafaret_spark.operators import lmscore
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma " * (i + 2)) for i in range(6)],
            "doc_id long, text string")
        model = lmscore.train_bigram_lm(docs)
        out = lmscore.lm_bucket(lmscore.lm_score(docs, model), [2.0])
        rows = out.collect()
        assert all(r.lm_bucket in (0, 1) for r in rows)
        # the bucket must agree with re-applying the edge to the value
        assert all((r.bits_per_token < 2.0) == (r.lm_bucket == 0)
                   for r in rows)

    def test_bad_args_raise(self, spark):
        from trafaret_spark.operators.lmscore import lm_bucket
        df = spark.createDataFrame([(1, 1.0)],
                                   "doc_id long, bits_per_token double")
        with pytest.raises(ValueError, match="non-empty"):
            lm_bucket(df, [])
        with pytest.raises(ValueError, match="strictly increasing"):
            lm_bucket(df, [2.0, 2.0])
        with pytest.raises(ValueError, match="need 3 labels"):
            lm_bucket(df, [1.0, 2.0], labels=["a", "b"])


class TestLmBucketByKey:
    @pytest.fixture(scope="class")
    def scored(self, spark):
        # two domains with disjoint bits ranges: per-domain terciles must
        # differ from any global bucketing
        rows = ([(i, "a", float(i)) for i in range(1, 10)]
                + [(100 + i, "b", 100.0 + i) for i in range(1, 10)]
                + [(999, "a", None), (998, "c", None)])
        return spark.createDataFrame(
            rows, "doc_id long, lang string, bits_per_token double")

    def test_per_key_terciles(self, spark, scored):
        from trafaret_spark.operators.lmscore import (lm_bucket_edges,
                                                      lm_bucket_by_key)
        edges = lm_bucket_edges(scored, by="lang")
        e = {r.lang: r.edges for r in edges.collect()}
        assert set(e) == {"a", "b"}        # NULL-bits-only 'c' excluded
        # exact interpolated terciles of 1..9
        assert e["a"] == [pytest.approx((9 - 1) * (1 / 3) + 1),
                          pytest.approx((9 - 1) * (2 / 3) + 1)]
        out = lm_bucket_by_key(scored, edges, by="lang",
                               labels=["head", "middle", "tail"])
        got = {r.doc_id: r.lm_bucket for r in out.collect()}
        # domain a: 1,2,3 head | 4,5,6 middle (edge 3.67, 6.33) | 7,8,9 tail
        assert [got[i] for i in (1, 3, 4, 6, 7, 9)] == \
            ["head", "head", "middle", "middle", "tail", "tail"]
        # domain b buckets by ITS OWN edges, not a's
        assert [got[101], got[105], got[109]] == ["head", "middle", "tail"]
        assert got[999] is None and got[998] is None  # NULL bits / no edges

    def test_broadcast_and_no_corpus_shuffle(self, scored):
        from trafaret_spark.operators.lmscore import (lm_bucket_edges,
                                                      lm_bucket_by_key)
        out = lm_bucket_by_key(scored, lm_bucket_edges(scored, by="lang"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_corpus_edges_column_survives(self, spark, scored):
        # temp_col convention: a corpus that already carries an 'edges'
        # column must neither crash (ambiguous reference) nor lose it
        from trafaret_spark.operators.lmscore import (lm_bucket_edges,
                                                      lm_bucket_by_key)
        with_edges = scored.withColumn("edges", F.lit("keep-me"))
        out = lm_bucket_by_key(with_edges, lm_bucket_edges(scored, by="lang"),
                               by="lang")
        rows = out.collect()
        assert all(r.edges == "keep-me" for r in rows)
        assert sum(r.lm_bucket is not None for r in rows) == 18

    def test_bad_args_raise(self, spark, scored):
        from trafaret_spark.operators.lmscore import (lm_bucket_edges,
                                                      lm_bucket_by_key)
        with pytest.raises(ValueError, match="strictly increasing"):
            lm_bucket_edges(scored, q=[0.5, 0.5])
        with pytest.raises(ValueError, match="in \\(0, 1\\)"):
            lm_bucket_edges(scored, q=[0.0, 0.5])
        edges = lm_bucket_edges(scored, by="lang")
        # label-count validation went LAZY in r6 (ADVICE r5: the eager
        # agg-collect executed the per-key quantile job twice) — the
        # mismatch now raises from inside the single scoring pass
        out = lm_bucket_by_key(scored, edges, by="lang", labels=["x", "y"])
        with pytest.raises(Exception, match="requires every edges array"):
            out.collect()


class TestLmBucketProperty:
    def test_bucket_equals_searchsorted(self, spark):
        # property sweep without a per-example Spark job: one DataFrame of
        # (case_id, bits) pairs per edge set, compared against numpy's
        # half-open searchsorted (side='right' ⇔ count of edges <= x)
        from trafaret_spark.operators.lmscore import lm_bucket
        rng = np.random.RandomState(3)
        for _ in range(5):
            edges = sorted(set(np.round(rng.uniform(0, 10, 4), 3)))
            vals = list(np.round(rng.uniform(-1, 11, 40), 3)) + list(edges)
            df = spark.createDataFrame(
                [(i, float(v)) for i, v in enumerate(vals)],
                "doc_id long, bits_per_token double")
            got = {r.doc_id: r.lm_bucket
                   for r in lm_bucket(df, edges).collect()}
            want = np.searchsorted(edges, vals, side="right")
            assert got == {i: int(w) for i, w in enumerate(want)}


class TestClusterAssign:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rng = np.random.RandomState(5)
        rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
        return rows, spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def test_matches_brute_force_argmax(self, vecs):
        from trafaret_spark.operators.similarity import cluster_assign
        rows, df = vecs
        out = {r.vec_id: r.cluster_id
               for r in cluster_assign(df, n_centroids=4).collect()}
        mat = np.array([v for _, v in rows])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cent = mat[:4]  # default codebook = smallest-4-ids rows
        want = np.argmax(mat @ cent.T, axis=1)
        assert out == {i: int(want[i]) for i in range(40)}
        assert len(set(out.values())) > 1  # non-vacuous: >1 cluster used

    def test_scan_side_no_exchange(self, vecs):
        from trafaret_spark.operators.similarity import (cluster_assign,
                                                         centroid_literal)
        _, df = vecs
        cents = df.orderBy("vec_id").limit(4).select(
            F.col("vec_id").cast("int").alias("__cid"),
            F.col("embedding").alias("__cv"))
        # user-supplied codebook path: assignment itself adds NO exchange
        out = cluster_assign(df, centroids=cents)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "cluster_id" in out.columns

    def test_nprobe_soft_assignment(self, vecs):
        from trafaret_spark.operators.similarity import cluster_assign
        _, df = vecs
        out = cluster_assign(df, n_centroids=4, nprobe=2)
        per = out.groupBy("vec_id").count().collect()
        assert all(r["count"] == 2 for r in per)

    def test_collision_raises(self, vecs):
        from trafaret_spark.operators.similarity import cluster_assign
        _, df = vecs
        with pytest.raises(ValueError, match="already has"):
            cluster_assign(df.withColumn("cluster_id", F.lit(0)))


class TestSemanticDedup:
    def test_keeps_one_per_semantic_group(self, spark):
        from trafaret_spark.operators.similarity import semantic_dedup
        rng = np.random.RandomState(9)
        base = rng.randn(6, 8)
        rows = []
        for i, v in enumerate(base):       # 6 well-separated originals
            rows.append((i, [float(x) for x in v]))
            if i < 3:                      # 3 get a near-identical clone;
                # clone ids sit ABOVE every original so the default
                # smallest-ids codebook is built from separated originals
                # (a clone chosen as its own centroid can split its pair
                # across clusters — the documented SemDeDup recall trade)
                rows.append((100 + i,
                             [float(x) for x in v + rng.randn(8) * 1e-3]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(df, n_centroids=6, threshold=0.99)
        kept = sorted(r.vec_id for r in out.collect())
        # each clone collapses onto its original; originals survive
        assert kept == [0, 1, 2, 3, 4, 5]
        # surviving rows byte-identical to input
        want = {r[0]: r[1] for r in rows}
        assert all(r.embedding == want[r.vec_id] for r in out.collect())

    def test_idempotent(self, spark):
        from trafaret_spark.operators.similarity import semantic_dedup
        rng = np.random.RandomState(11)
        rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(12)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        once = semantic_dedup(df, n_centroids=4, threshold=0.95)
        twice = semantic_dedup(once, n_centroids=4, threshold=0.95)
        assert sorted(map(tuple, once.collect())) == \
            sorted(map(tuple, twice.collect()))


class TestCorpusStatsAndPersistedIndex:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [(1, "spark shuffles data between stages"),
             (2, "broadcast joins avoid the shuffle"),
             (3, ""),                       # empty doc: in N/avgdl, no postings
             (4, None),                     # NULL text: ditto
             (5, "data data data shuffle stages")],
            "doc_id long, text string")

    def test_counts_empty_and_null_docs(self, spark, corpus):
        from trafaret_spark.operators.retrieval import corpus_stats
        n, avgdl = corpus_stats(corpus)
        assert n == 5
        assert avgdl == (5 + 5 + 0 + 0 + 5) / 5
        with pytest.raises(ValueError, match="empty corpus"):
            corpus_stats(corpus.filter(F.lit(False)))

    def test_bm25_topk_equals_stats_plus_postings(self, spark, corpus):
        # pins the round-5 refactor: bm25_topk == corpus_stats +
        # build_postings + bm25_topk_from_postings (ret_bm25's executed
        # expressions are unchanged)
        from trafaret_spark.operators import retrieval
        qs = spark.createDataFrame([(1, "data shuffle"), (2, "broadcast")],
                                   "query_id long, text string")
        cold = retrieval.bm25_topk(corpus, qs, k=3)
        n, avgdl = retrieval.corpus_stats(corpus)
        post = retrieval.build_postings(corpus)
        split = retrieval.bm25_topk_from_postings(post, qs, n_docs=n,
                                                  avgdl=avgdl, k=3)
        assert sorted(map(tuple, cold.collect())) == \
            sorted(map(tuple, split.collect()))

    def test_persisted_index_roundtrip_equals_cold(self, spark, corpus,
                                                   tmp_path):
        # THE production path at 100 TB: build once, persist term-bucketed,
        # read back, score — must equal the cold path exactly
        from trafaret_spark.operators import retrieval
        from trafaret_spark.io import write_bucketed, read_table
        qs = spark.createDataFrame([(1, "data shuffle stages")],
                                   "query_id long, text string")
        n, avgdl = retrieval.corpus_stats(corpus)
        write_bucketed(retrieval.build_postings(corpus),
                       str(tmp_path / "idx"), key="term", n_buckets=4)
        post = read_table(spark, str(tmp_path / "idx")).drop("bucket")
        warm = retrieval.bm25_topk_from_postings(post, qs, n_docs=n,
                                                 avgdl=avgdl, k=5)
        cold = retrieval.bm25_topk(corpus, qs, k=5)
        assert sorted(map(tuple, cold.collect())) == \
            sorted(map(tuple, warm.collect()))


class TestDropStats:
    @pytest.fixture(scope="class")
    def hot_corpus(self, spark):
        rows = [(i, "alpha beta gamma delta epsilon zeta eta theta")
                for i in range(8)]
        rows += [(100, "one two three four five six seven eight nine")]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_requires_audited_mode(self, hot_corpus):
        from trafaret_spark.operators.dedup import minhash_lsh_candidates
        with pytest.raises(ValueError, match="drop_stats requires"):
            minhash_lsh_candidates(hot_corpus, drop_stats={},
                                   on_drop="ignore")

    def test_warn_populates_counts_and_handle(self, hot_corpus):
        from trafaret_spark.operators.dedup import minhash_lsh_candidates
        spark = hot_corpus.sparkSession
        base = _persisted_ids(spark)
        ds = {}
        with pytest.warns(RuntimeWarning, match="dropping"):
            out = minhash_lsh_candidates(hot_corpus, max_bucket_size=4,
                                         on_drop="warn", drop_stats=ds)
        assert ds["dropped_buckets"] > 0
        assert ds["dropped_rows"] >= ds["dropped_buckets"] * 5
        assert out.count() == 0            # every dup bucket over the cap
        assert callable(ds["unpersist"])
        ds.pop("unpersist")()              # caller owns the cache lifetime
        assert not _persisted_ids(spark) - base  # released — no leak

    def test_handleless_warn_releases_cache(self, hot_corpus):
        # advice r4: without a drop_stats handle the audit's shared cache
        # must be released before returning, not leaked for the session
        from trafaret_spark.operators.dedup import minhash_lsh_candidates
        spark = hot_corpus.sparkSession
        base = _persisted_ids(spark)
        with pytest.warns(RuntimeWarning, match="dropping"):
            out = minhash_lsh_candidates(hot_corpus, max_bucket_size=4,
                                         on_drop="warn")
        assert not _persisted_ids(spark) - base
        assert out.count() == 0            # lazy output still usable

    def test_neardup_conversations_consumes_handle(self, spark):
        from trafaret_spark.operators.conversations import (
            neardup_conversations)
        text = "please reset my password it is broken again today"
        rows = []
        for c in range(6):                 # 6 identical 2-turn convs
            rows += [(f"c{c}", 0, "user", text),
                     (f"c{c}", 1, "assistant", text + " ok")]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx long, role string, text string")
        # the lazy path leaves connected_components' localCheckpoint RDDs
        # persisted by design (ContextCleaner reclaims them on GC) — the
        # audited path must leave exactly the SAME residue, i.e. add no
        # cache of its own
        base = _persisted_ids(spark)
        neardup_conversations(df, threshold=0.5, max_bucket_size=4).count()
        lazy_residue = len(_persisted_ids(spark) - base)
        ds = {}
        before = _persisted_ids(spark)
        with pytest.warns(RuntimeWarning, match="dropping"):
            out = neardup_conversations(df, threshold=0.5,
                                        max_bucket_size=4, on_drop="warn",
                                        drop_stats=ds)
            out.count()
        assert ds["dropped_buckets"] > 0
        assert "unpersist" not in ds       # operator consumed the handle
        assert len(_persisted_ids(spark) - before) <= lazy_residue


def _mk_turns(conv, texts, start_role="user"):
    rows = []
    for i, txt in enumerate(texts):
        role = (start_role if i == 0
                else ("assistant" if i % 2 == 1 else "user"))
        rows.append(Row(conv_id=conv, turn_idx=i, role=role, text=txt,
                        ts=dt.datetime(2024, 1, 1, 0, i)))
    return rows


@pytest.fixture(scope="module")
def curation_corpus(spark):
    # 8 NEAR-identical conversations (a long shared body + one unique
    # trailing token each): exact dedup keeps all 8, then the LSH near-dup
    # stage buckets them together — a hot bucket over a small cap
    body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = []
    for c in range(8):
        rows += _mk_turns(f"dup{c}", [body, body + f" uniq{c}"])
    rows += _mk_turns("solo", ["one two three four five",
                               "six seven eight nine ten"])
    return spark.createDataFrame(rows)


class TestRunCurationObservability:
    def test_warn_default_surfaces_drops(self, spark, curation_corpus,
                                         tmp_path):
        from trafaret_spark.curation_pipeline import (CurationConfig,
                                                      run_curation)
        cfg = CurationConfig(output_path=str(tmp_path / "o1"),
                             neardup_threshold=0.5,
                             neardup_max_bucket_size=4, n_buckets=2)
        with pytest.warns(RuntimeWarning, match="dropping"):
            audit = run_curation(spark, curation_corpus, cfg)
        nd = audit["stages"]["near_dedup"]
        assert nd["dropped_buckets"] > 0   # the cap FIRED and is recorded
        assert nd["dropped_rows"] > 0
        # the drops mean the dups were NOT collapsed — 8 dups + solo
        # survive near-dup (exact dedup already merged the byte-identical
        # renders, so what the cap actually cost is visible in the audit)
        assert nd["conversations"] <= audit["stages"]["exact_dedup"][
            "conversations"]

    def test_error_mode_raises(self, spark, curation_corpus, tmp_path):
        from trafaret_spark.curation_pipeline import (CurationConfig,
                                                      run_curation)
        cfg = CurationConfig(output_path=str(tmp_path / "o2"),
                             neardup_threshold=0.5,
                             neardup_max_bucket_size=4,
                             neardup_on_drop="error", n_buckets=2)
        with pytest.raises(ValueError, match="max_bucket_size=4"):
            run_curation(spark, curation_corpus, cfg)

    def test_bad_config_values_raise(self, spark, curation_corpus,
                                     tmp_path):
        from trafaret_spark.curation_pipeline import (CurationConfig,
                                                      run_curation)
        with pytest.raises(ValueError, match="audit must be"):
            run_curation(spark, curation_corpus, CurationConfig(
                output_path=str(tmp_path / "o3"), audit="verbose"))
        with pytest.raises(ValueError, match="neardup_on_drop must be"):
            run_curation(spark, curation_corpus, CurationConfig(
                output_path=str(tmp_path / "o4"), neardup_on_drop="loud"))


class TestAuditTiers:
    def _run(self, spark, corpus, tmp_path, name, **kw):
        from trafaret_spark.curation_pipeline import (CurationConfig,
                                                      run_curation)
        kw = {"neardup_threshold": 0.5, "max_tokens": 12, "n_buckets": 2,
              **kw}
        cfg = CurationConfig(output_path=str(tmp_path / name), **kw)
        audit = run_curation(spark, corpus, cfg)
        out = spark.read.parquet(str(tmp_path / name)).drop("bucket")
        return audit, sorted(map(tuple, out.collect()))

    def test_approx_and_off_match_exact_output(self, spark,
                                               curation_corpus, tmp_path):
        exact_a, exact_o = self._run(spark, curation_corpus, tmp_path,
                                     "exact", audit="exact")
        approx_a, approx_o = self._run(spark, curation_corpus, tmp_path,
                                       "approx", audit="approx")
        off_a, off_o = self._run(spark, curation_corpus, tmp_path,
                                 "off", audit="off")
        assert exact_o == approx_o == off_o   # audit NEVER changes output
        assert exact_a["audit_mode"] == "exact"
        # HLL is exact at these cardinalities: counts agree with exact
        for st in exact_a["stages"]:
            assert approx_a["stages"][st]["turns"] == \
                exact_a["stages"][st]["turns"]
            assert approx_a["stages"][st]["conversations"] == \
                exact_a["stages"][st]["conversations"]
        # off: no count keys anywhere, but near-dup drop counts SURVIVE
        # (the one observable every tier must keep)
        assert all("turns" not in v for v in off_a["stages"].values())
        assert "dropped_buckets" in off_a["stages"]["near_dedup"]

    def test_off_with_quarantine_equals_exact(self, spark,
                                              curation_corpus, tmp_path):
        # the riskiest lifecycle branch: audit="off" defers the `bad`
        # cache release until after the final write (its second consumer,
        # the anti-join, materializes only there) — output AND quarantine
        # must equal the exact tier's
        from trafaret_spark.curation_pipeline import (CurationConfig,
                                                      run_curation)
        corpus = curation_corpus.unionByName(spark.createDataFrame(
            _mk_turns("bad1", ["one two", "three four"],
                      start_role="tool")))   # illegal opener -> quarantine

        def both(name, mode):
            cfg = CurationConfig(output_path=str(tmp_path / f"{name}_o"),
                                 quarantine_path=str(tmp_path / f"{name}_q"),
                                 neardup_threshold=0.5, n_buckets=2,
                                 audit=mode)
            run_curation(spark, corpus, cfg)
            o = spark.read.parquet(str(tmp_path / f"{name}_o")).drop("bucket")
            q = spark.read.parquet(str(tmp_path / f"{name}_q")).drop("bucket")
            return (sorted(map(tuple, o.collect())),
                    sorted(map(tuple, q.collect())))

        assert both("qx", "exact") == both("qo", "off")

    def test_storage_level_override(self, spark, curation_corpus,
                                    tmp_path):
        _, out = self._run(spark, curation_corpus, tmp_path, "disk",
                           storage_level=StorageLevel.DISK_ONLY)
        _, ref = self._run(spark, curation_corpus, tmp_path, "mem")
        assert out == ref

    def test_no_persisted_leak_after_run(self, spark, curation_corpus,
                                         tmp_path):
        # with near-dup disabled there is no connected-components loop
        # (whose localCheckpoint RDDs stay persisted by design until GC),
        # so EVERY persist run_curation takes must be released on return
        base = _persisted_ids(spark)
        self._run(spark, curation_corpus, tmp_path, "leak",
                  neardup_threshold=None)
        assert not _persisted_ids(spark) - base


class TestRangeJoinProbePersist:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        left = spark.createDataFrame(
            [(float(t), f"p{t}") for t in range(0, 100, 5)],
            "ts double, tag string")
        # one long interval (spans 20 buckets at width 5) + short ones
        right = spark.createDataFrame(
            [(0.0, 100.0, "LONG"), (10.0, 12.0, "s1"), (40.0, 43.0, "s2")],
            "start double, end double, label string")
        return left, right

    def test_warn_equals_ignore_with_long_rows(self, frames):
        from trafaret_spark.operators.rangejoin import range_join
        left, right = frames
        with pytest.warns(RuntimeWarning, match="interval"):
            warn = range_join(left, right, bucket_width=5.0,
                              max_buckets_per_interval=4, on_long="warn",
                              max_long_intervals=10)
            got_w = sorted(map(tuple, warn.collect()))
        ign = range_join(left, right, bucket_width=5.0,
                         max_buckets_per_interval=4, on_long="ignore")
        assert got_w == sorted(map(tuple, ign.collect()))

    def test_probe_checkpoint_reclaimed_not_cached(self, frames):
        # the probe materializes the long side via localCheckpoint, NOT a
        # DataFrame persist: no CacheManager entry can outlive the caller
        # — once the result frame is dropped, the ContextCleaner reclaims
        # the checkpoint blocks (poll: cleaning is async on GC)
        import gc
        import time
        from trafaret_spark.operators.rangejoin import range_join
        left, right = frames
        spark = left.sparkSession
        base = _persisted_ids(spark)
        out = range_join(left, right.filter(F.col("label") != "LONG"),
                         bucket_width=5.0, max_buckets_per_interval=4,
                         on_long="warn")
        assert out.count() > 0
        del out
        # generous deadline: ContextCleaner reclamation is async behind
        # JVM GC weak-ref processing, which a loaded box (parallel Spark
        # sessions on shared vCPUs) can delay well past 30 s — observed
        # once in a full-suite run that passed in isolation
        deadline = time.time() + 90
        while _persisted_ids(spark) - base and time.time() < deadline:
            gc.collect()                     # drop the py4j handle…
            spark._jvm.System.gc()           # …then let the JVM GC reach
            time.sleep(0.5)                  # the ContextCleaner weak refs
        assert not _persisted_ids(spark) - base


class TestDecontaminateBroadcastEquivalence:
    def test_non_broadcast_path_identical(self, spark):
        # verdict r4 item: broadcast_benchmark=False (AQE decides) must be
        # result-identical to the forced-broadcast default
        from trafaret_spark.operators.curation import ngram_decontaminate
        corpus = spark.createDataFrame(
            [(i, f"tok{i} " * 3 + "the quick brown fox jumps over dogs "
              + f"pad{i % 4} " * 2) for i in range(30)],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(1, "the quick brown fox jumps over dogs")],
            "doc_id long, text string")
        a = ngram_decontaminate(corpus, bench, n=5)
        b = ngram_decontaminate(corpus, bench, n=5,
                                broadcast_benchmark=False)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))
        plan_a = a._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_a or "BroadcastNestedLoop" \
            in plan_a


class TestEmptyBucketedWrite:
    def test_empty_write_reads_back_with_schema(self, spark, tmp_path):
        # an empty partitioned write must stay READABLE (zero invalid
        # conversations -> empty quarantine is a legitimate outcome;
        # pre-fix it left only _SUCCESS and read-back raised)
        from trafaret_spark.io import write_bucketed, read_table
        df = spark.createDataFrame(
            [], "conv_id string, turn_idx long, text string")
        write_bucketed(df, str(tmp_path / "empty"), key="conv_id",
                       n_buckets=4)
        back = read_table(spark, str(tmp_path / "empty"))
        assert back.count() == 0
        assert {"conv_id", "turn_idx", "text", "bucket"} <= set(back.columns)

    def test_nonempty_write_unchanged(self, spark, tmp_path):
        from trafaret_spark.io import write_bucketed, read_table
        df = spark.createDataFrame([("a", 0, "x"), ("b", 1, "y")],
                                   "conv_id string, turn_idx long, text string")
        write_bucketed(df, str(tmp_path / "full"), key="conv_id", n_buckets=4)
        back = read_table(spark, str(tmp_path / "full"))
        assert sorted((r.conv_id, r.turn_idx, r.text)
                      for r in back.collect()) == \
            [("a", 0, "x"), ("b", 1, "y")]
