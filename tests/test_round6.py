"""Round-6 additions: empty-write rerun sequences (ADVICE r5 medium),
lazy lm_bucket_by_key label validation, range_join reliable checkpoints,
pointer-jump connected components, pluggable token counters, and the
sem_dedup composed query's non-vacuity pins."""

import warnings

import pytest
from pyspark.sql import functions as F


SCHEMA = "conv_id string, turn_idx long, text string"


class TestEmptyWriteRerunSequences:
    """ADVICE r5 (medium): the empty-schema marker must survive the
    empty → non-empty and non-empty → empty rerun orders, not just the
    fresh-path cases test_round5 pins."""

    def _write(self, spark, rows, path):
        from trafaret_spark.io import write_bucketed
        df = spark.createDataFrame(rows, SCHEMA)
        write_bucketed(df, path, key="conv_id", n_buckets=4)

    def test_empty_then_nonempty_rerun_reads_clean(self, spark, tmp_path):
        # pre-fix: the root-level zero-row marker survived the second
        # write (dynamic overwrite never deletes root files) and read-back
        # died with 'Conflicting directory structures'
        from trafaret_spark.io import read_table
        path = str(tmp_path / "t")
        self._write(spark, [], path)
        self._write(spark, [("a", 0, "x"), ("b", 1, "y")], path)
        back = read_table(spark, path)
        assert sorted((r.conv_id, r.turn_idx, r.text)
                      for r in back.collect()) == \
            [("a", 0, "x"), ("b", 1, "y")]

    def test_nonempty_then_empty_rerun_keeps_rows_documented(self, spark,
                                                             tmp_path):
        # dynamic partition overwrite of an EMPTY frame rewrites nothing —
        # the previous rows remain readable (the documented resume
        # semantics; "now empty" requires deleting the path first)
        from trafaret_spark.io import read_table
        path = str(tmp_path / "t")
        self._write(spark, [("a", 0, "x")], path)
        self._write(spark, [], path)
        back = read_table(spark, path)
        assert [(r.conv_id, r.turn_idx, r.text) for r in back.collect()] == \
            [("a", 0, "x")]

    def test_empty_empty_rerun_still_empty_with_schema(self, spark,
                                                       tmp_path):
        from trafaret_spark.io import read_table
        path = str(tmp_path / "t")
        self._write(spark, [], path)
        self._write(spark, [], path)
        back = read_table(spark, path)
        assert back.count() == 0
        assert {"conv_id", "turn_idx", "text", "bucket"} <= set(back.columns)

    def test_legacy_root_marker_cleaned_by_nonempty_write(self, spark,
                                                          tmp_path):
        # a pre-r6 layout (zero-row data file at the table ROOT) must be
        # repaired by the next non-empty write instead of corrupting it
        from trafaret_spark.io import read_table
        path = str(tmp_path / "t")
        spark.createDataFrame([], SCHEMA).write.parquet(path)  # legacy marker
        self._write(spark, [("a", 0, "x")], path)
        back = read_table(spark, path)
        assert [(r.conv_id, r.turn_idx, r.text) for r in back.collect()] == \
            [("a", 0, "x")]


class TestLmBucketByKeyLazyValidation:
    """ADVICE r5: the eager edges.agg().collect() label check executed the
    per-key quantile job twice; validation now rides inside the returned
    plan (assert_true), so building the plan runs ZERO jobs."""

    def _scored(self, spark):
        return spark.createDataFrame(
            [("en", 1.0), ("en", 2.0), ("en", 3.0), ("de", None)],
            "lang string, bits_per_token double")

    def test_plan_construction_runs_no_job(self, spark):
        from trafaret_spark.operators.lmscore import lm_bucket_by_key
        # an edges frame that raises on ANY execution: if label validation
        # were still eager, lm_bucket_by_key itself would blow up here
        poison = spark.createDataFrame([("en", [1.5])],
                                       "lang string, edges array<double>") \
            .withColumn("edges",
                        F.when(F.assert_true(F.lit(False),
                                             F.lit("edges executed")).isNull(),
                               F.col("edges")))
        out = lm_bucket_by_key(self._scored(spark), poison, by="lang",
                               labels=("lo", "hi"))
        with pytest.raises(Exception, match="edges executed"):
            out.collect()

    def test_mis_sized_labels_raise_at_execution(self, spark):
        from trafaret_spark.operators.lmscore import lm_bucket_by_key
        edges = spark.createDataFrame([("en", [1.5, 2.5])],
                                      "lang string, edges array<double>")
        out = lm_bucket_by_key(self._scored(spark), edges, by="lang",
                               labels=("lo", "hi"))  # need 3 for 2 edges
        with pytest.raises(Exception,
                           match="requires every edges array"):
            out.collect()

    def test_correct_labels_unchanged(self, spark):
        from trafaret_spark.operators.lmscore import lm_bucket_by_key
        edges = spark.createDataFrame([("en", [1.5, 2.5])],
                                      "lang string, edges array<double>")
        out = lm_bucket_by_key(self._scored(spark), edges, by="lang",
                               labels=("head", "middle", "tail"))
        got = {(r.lang, r.bits_per_token): r.lm_bucket
               for r in out.collect()}
        assert got == {("en", 1.0): "head", ("en", 2.0): "middle",
                       ("en", 3.0): "tail",
                       ("de", None): None}  # key absent from edges -> NULL


class TestPointerJumpComponents:
    """r5 verdict #4: cut the driver-sequenced serial tail — pointer
    jumping makes round count O(log diameter), so a deep chain no longer
    needs diameter-many rounds."""

    def test_high_diameter_chain_rounds_logarithmic(self, spark):
        from trafaret_spark.operators import dedup
        # 255-edge path graph: plain min-label propagation needs 255
        # rounds (FAR past max_iter=25 -> split components + warning);
        # with the jump it must close in ~log2(256) rounds
        pairs = spark.createDataFrame([(i, i + 1) for i in range(255)],
                                      "a int, b int")
        stats: dict = {}
        with warnings.catch_warnings():
            # non-convergence fails; don't escalate unrelated warning
            # classes (py4j GC ResourceWarnings fire asynchronously)
            warnings.simplefilter("error", RuntimeWarning)
            got = {r["node"]: r["component"] for r in
                   dedup.connected_components(pairs, max_iter=25,
                                              stats=stats).collect()}
        assert set(got.values()) == {0} and len(got) == 256
        assert stats["rounds"] <= 12, stats

    def test_star_and_mixed_graph_still_exact(self, spark):
        from trafaret_spark.operators import dedup
        # star + triangle + isolated pair: labels must equal the exact
        # union-find min per component
        edges = [(10, 2), (10, 5), (10, 7),          # star, min 2
                 (20, 21), (21, 22), (22, 20),       # triangle, min 20
                 (30, 31)]                           # pair, min 30
        pairs = spark.createDataFrame(edges, "a int, b int")
        stats: dict = {}
        got = {r["node"]: r["component"] for r in
               dedup.connected_components(pairs, stats=stats).collect()}
        assert got == {10: 2, 2: 2, 5: 2, 7: 2,
                       20: 20, 21: 20, 22: 20,
                       30: 30, 31: 30}
        assert stats["rounds"] <= 4

    def test_jump_policy_equivalence(self, spark):
        # always / deferred / never jumping must all yield the exact
        # union-find min labels; the policy only changes ROUND count.
        # Mixed shape: a 9-edge chain (deep) + a star (shallow).
        from trafaret_spark.operators import dedup
        edges = [(i, i + 1) for i in range(100, 109)] + \
                [(50, 41), (50, 42), (50, 43)]
        pairs = spark.createDataFrame(edges, "a int, b int")
        want = {**{n: 100 for n in range(100, 110)},
                **{50: 41, 41: 41, 42: 41, 43: 41}}
        rounds = {}
        for ja in (0, 2, 99):
            stats: dict = {}
            got = {r["node"]: r["component"] for r in
                   dedup.connected_components(pairs, jump_after=ja,
                                              stats=stats).collect()}
            assert got == want, ja
            rounds[ja] = stats["rounds"]
        # deferring by 2 costs at most 2 extra rounds over always-jump;
        # prop-only pays O(diameter) on the chain
        assert rounds[0] <= rounds[2] <= rounds[0] + 2
        assert rounds[99] >= 9


    def test_jaccard_shingles_candidates_only_and_single_pipeline(
            self, spark):
        # Round-6 perf fix: the verify stage shingles ONLY docs that
        # appear in a candidate pair (explode -> one join -> shingle ->
        # pivot) instead of re-shingling the whole corpus once per join
        # side. Pins (a) jaccard values identical to a brute-force
        # oracle, and (b) the expensive candidate pipeline is planned
        # exactly once — the pair plan is referenced once by
        # construction, so the pandas_udf signature stage appears once
        # in the executed plan regardless of AQE's join-strategy picks
        # (a broadcast-converted consumer would NOT reuse a shuffle
        # exchange — the trap the single-reference shape avoids).
        from trafaret_spark.operators import dedup
        base = " ".join(f"w{i}" for i in range(40))
        rows = [(1, base), (2, base + " tail tail"),
                (3, "entirely different text " * 10),
                (4, base.replace("w3", "x3"))]
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        out = dedup.minhash_dedup(docs, threshold=0.5, num_hashes=16,
                                  bands=8)
        got = {(r.a, r.b): r.jaccard for r in out.collect()}

        def sh(text):
            toks = text.split()
            return {tuple(toks[i:i + 3]) for i in range(len(toks) - 2)}

        for (a, b), j in got.items():
            sa, sb = sh(rows[a - 1][1]), sh(rows[b - 1][1])
            assert abs(j - len(sa & sb) / len(sa | sb)) < 1e-12

        out.write.format("noop").mode("overwrite").save()
        executed = out._jdf.queryExecution().executedPlan().toString()
        final = executed.split("== Initial Plan ==")[0]  # AQE echoes both
        assert final.count("ArrowEvalPython") == 1, final

    def test_fused_kernel_portable_signature_bit_identical(self, spark):
        # the fused grams->minima Arrow kernel must reproduce the staged
        # shingle_hashes -> minhash_from_hashes portable signatures
        # BIT-FOR-BIT (multiset minima == set minima; same polynomial) —
        # this is what keeps every minhash SQL-oracle attestation valid.
        # Shapes covered: normal doc, heavy shingle repetition (multiset
        # vs set), exactly n tokens, < n tokens (whole-text fold), one
        # token, empty string.
        from trafaret_spark.operators import dedup
        texts = ["the quick brown fox jumps over the lazy dog",
                 "spam spam spam spam spam spam spam",
                 "alpha beta gamma",
                 "alpha beta",
                 "solo",
                 ""]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                   "doc_id int, text string")
        staged = df.select(
            "doc_id",
            dedup.minhash_from_hashes(
                dedup.shingle_hashes(F.col("text"), n=3, portable=True),
                num_hashes=32, seed=17).alias("sig"))
        fused = df.select(
            "doc_id",
            dedup.minhash_signature(F.col("text"), num_hashes=32, n=3,
                                    seed=17, portable=True).alias("sig"))
        got_s = {r.doc_id: r.sig for r in staged.collect()}
        got_f = {r.doc_id: r.sig for r in fused.collect()}
        assert got_s == got_f

    def test_jump_self_join_reuses_exchange(self, spark):
        # the jump's two `prop` branches must materialize ONE shuffle
        # (ReusedExchange), not recompute the propagation join twice
        # labels are checkpointed each round, so the RESULT's executed
        # plan is a scan — pin reuse on the in-round plan shape instead
        from pyspark.sql import functions as SF
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "a int, b int")
        edges = (pairs.select(SF.col("a").alias("x"), SF.col("b").alias("y"))
                 .unionByName(pairs.select(SF.col("b").alias("x"),
                                           SF.col("a").alias("y"))))
        labels = edges.select("x").distinct() \
            .withColumn("component", SF.col("x"))
        nbr = (edges.join(labels.select(SF.col("x").alias("y"),
                                        SF.col("component").alias("nc")), "y")
               .groupBy("x").agg(SF.min("nc").alias("nmin")))
        prop = (labels.join(nbr, "x", "left")
                .select("x", SF.least(SF.col("component"),
                                      SF.coalesce(SF.col("nmin"),
                                                  SF.col("component")))
                        .alias("component")))
        lbl = prop.select(SF.col("x").alias("__jx"),
                          SF.col("component").alias("__jc"))
        j = prop.join(lbl, prop["component"] == lbl["__jx"], "left")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan or "reused" in plan.lower(), plan


class TestPluggableTokenCounter:
    """r5 verdict #5: the token-budget operators must meter a pluggable
    unit (BPE tokens in production), not only whitespace tokens."""

    ROWS = [(1, "hello world foo"),        # 3 ws tokens
            (2, "a,b,c!!!"),               # punct-heavy: BPE-ish differs
            (3, None),                     # NULL text
            (4, "x " * 50)]                # long doc

    def _docs(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, text string")

    @staticmethod
    def _ref_pack(counts, capacity):
        """Driver-side prefix-sum reference for pack assignment."""
        out, cum = {}, 0
        for doc_id, n in counts:
            n = n or 0
            out[doc_id] = (cum // capacity, cum % capacity,
                           1 if n == 0 else (cum + n - 1) // capacity
                           - cum // capacity + 1)
            cum += n
        return out

    def _check_pack(self, spark, counter, counter_py):
        from trafaret_spark.operators.curation import pack_sequences
        docs = self._docs(spark)
        out = pack_sequences(docs, capacity=8, counter=counter,
                             text_col="text", order_by="doc_id")
        got = {r.doc_id: (r.pack_id, r.offset, r.n_chunks)
               for r in out.collect()}
        counts = [(d, None if t is None else counter_py(t))
                  for d, t in self.ROWS]
        assert got == self._ref_pack(counts, 8)
        assert set(out.columns) == {"doc_id", "text", "pack_id", "offset",
                                    "n_chunks"}  # temp count col dropped

    def test_pack_with_bpe_ish_native_counter(self, spark):
        from trafaret_spark.operators.textstats import bpe_ish_token_count
        import re

        def bpe_py(t):  # mirror of the native expression
            n = 0
            for p in re.findall(r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s]|\s+)", t):
                if p.strip() != "":
                    n += max(1, int(len(p) / 4))
            return n
        self._check_pack(spark, bpe_ish_token_count, bpe_py)

    def test_pack_with_arrow_tokenizer_udf(self, spark):
        from trafaret_spark.operators.textstats import token_counter_udf
        fake_bpe = lambda t: len(t) // 3 + 1  # stand-in for a real encoder
        self._check_pack(spark, token_counter_udf(fake_bpe), fake_bpe)

    def test_batch_tokenizer_and_vectorized_plan(self, spark):
        from trafaret_spark.operators.textstats import token_counter_udf
        counter = token_counter_udf(
            lambda texts: [len(t.split()) for t in texts], batch=True)
        docs = self._docs(spark)
        out = docs.withColumn("n", counter(F.col("text")))
        got = {r.doc_id: r.n for r in out.collect()}
        assert got == {1: 3, 2: 1, 3: None, 4: 50}
        # Arrow-batched, never row-at-a-time Python
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_truncate_with_counter(self, spark):
        from trafaret_spark.operators.conversations import truncate_turns
        from trafaret_spark.operators.textstats import token_counter_udf
        turns = spark.createDataFrame(
            [("c1", 0, "aaaa"), ("c1", 1, "bbbbbb"), ("c1", 2, "cc")],
            "conv_id string, turn_idx long, text string")
        # unit = chars: budget 10 keeps turns 0 (4) + 1 (6), drops 2
        out = truncate_turns(turns, 10, counter=token_counter_udf(len),
                             text_col="text")
        assert sorted(r.turn_idx for r in out.collect()) == [0, 1]
        assert set(out.columns) == {"conv_id", "turn_idx", "text"}

    def test_counter_requires_text_col(self, spark):
        from trafaret_spark.operators.curation import pack_sequences
        with pytest.raises(ValueError, match="requires text_col"):
            pack_sequences(self._docs(spark), 8, counter=lambda c: c)

    def test_curation_pipeline_bpe_budget(self, spark, tmp_path):
        from trafaret_spark.curation_pipeline import (CurationConfig,
                                                      run_curation)
        from trafaret_spark.io import read_table
        from trafaret_spark.operators.textstats import bpe_ish_token_count
        turns = spark.createDataFrame(
            [("c1", 0, "user", "hello hello hello hello"),
             ("c1", 1, "assistant", "!!!! " * 20),   # BPE-expensive turn
             ("c1", 2, "user", "bye")],
            "conv_id string, turn_idx long, role string, text string")
        cfg = CurationConfig(output_path=str(tmp_path / "out"),
                             ts_col=None, neardup_threshold=None,
                             max_tokens=10, audit="off",
                             token_counter=bpe_ish_token_count)
        run_curation(spark, turns, cfg)
        kept = sorted(r.turn_idx
                      for r in read_table(spark, str(tmp_path / "out"))
                      .collect())
        # whitespace budget would keep turn 0 (4 tokens); BPE-ish counts
        # 'hello'=1 each -> turn 0 costs 4, turn 1 costs 80 -> cut there
        assert kept == [0]


class TestSemDedupDriverQuery:
    """Non-vacuity pins for the composed sem_dedup driver oracle
    (driver-contract lesson: a green composed row can be vacuous). The
    planted rows guarantee every stage does real work on driver data."""

    SF = "/root/testdata/sf0.001"

    def test_planted_structure(self, spark):
        import __spark_entry__ as entry_mod
        out = {r.vec_id
               for r in entry_mod.q_sem_dedup(spark, self.SF).collect()}
        # in-cluster near-dup chain: smallest planted id survives alone
        assert 9000001 in out
        assert 9000002 not in out and 9000003 not in out
        # cross-cluster near-dup pair: cosine 0.9945 >= θ but the coarse
        # clusters differ, so SemDeDup misses it — BOTH survive (the
        # documented recall trade)
        assert 9000004 in out and 9000005 in out

    def test_cross_cluster_pair_really_is_near_dup(self, spark):
        # pin the recall-trade premise itself: the missed pair would pass
        # the threshold if blocked together
        import numpy as np
        from __spark_entry__ import _SEM_PLANT, _SEM_THRESHOLD
        v4 = np.array(dict(_SEM_PLANT)[9000004])
        v5 = np.array(dict(_SEM_PLANT)[9000005])
        cos = float(v4 @ v5 / (np.linalg.norm(v4) * np.linalg.norm(v5)))
        assert cos >= _SEM_THRESHOLD
        # and they genuinely land in different clusters of the literal
        # codebook (argmax over basis centroids = argmax component)
        assert int(np.argmax(v4)) != int(np.argmax(v5))


_INC_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india "
              "juliet kilo lima mike november oscar papa quebec romeo "
              "sierra tango uniform victor whiskey xray yankee zulu").split()


def _inc_docs(spark):
    """Corpus for the incremental-dedup contracts: near-dup families
    spanning the old/new split, a hot boilerplate bucket, unique chaff."""
    rows = []
    # 6 near-dup families of 3 (one-token mutation) spanning old/new
    for fam in range(6):
        base = " ".join(_INC_WORDS[(fam + i) % len(_INC_WORDS)]
                        for i in range(30))
        for j in range(3):
            toks = base.split()
            if j:
                toks[5 + j] = f"mut{fam}{j}"
            rows.append((fam * 10 + j, " ".join(toks)))
    # 8 identical boilerplate docs (ids 100..107) — the hot bucket
    boiler = " ".join(_INC_WORDS[:25])
    for i in range(8):
        rows.append((100 + i, boiler))
    # unique chaff
    for i in range(5):
        rows.append((200 + i, " ".join(
            _INC_WORDS[(7 * i + k) % len(_INC_WORDS)] + str(i * 31 + k)
            for k in range(30))))
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestIncrementalDedup:
    """Incremental near-dup against a persisted LSH band index: the
    per-ingest production path that never re-shingles history. The
    contract under test: incremental(new, index(old)) == batch(old ∪ new)
    restricted to pairs touching a new doc, including cap behavior."""

    def _docs(self, spark):
        return _inc_docs(spark)

    @staticmethod
    def _split(docs):
        new = docs.filter(F.col("doc_id") % 3 == 0)
        old = docs.filter(F.col("doc_id") % 3 != 0)
        return new, old

    def _expected(self, docs, new_ids, **kw):
        from trafaret_spark.operators import dedup
        batch = dedup.minhash_lsh_candidates(docs, **kw)
        return {(r.a, r.b) for r in batch.collect()
                if r.a in new_ids or r.b in new_ids}

    def test_matches_batch_union_restriction(self, spark):
        from trafaret_spark.operators import dedup
        docs = self._docs(spark)
        new, old = self._split(docs)
        new_ids = {r.doc_id for r in new.select("doc_id").collect()}
        idx = dedup.minhash_band_index(old)
        got = {(r.a, r.b) for r in
               dedup.minhash_lsh_candidates_incremental(
                   dedup.minhash_band_index(new), idx).collect()}
        exp = self._expected(docs, new_ids)
        assert got == exp
        # non-vacuous in both kinds
        assert any(a in new_ids and b in new_ids for a, b in got)
        assert any((a in new_ids) != (b in new_ids) for a, b in got)

    def test_persisted_index_roundtrip_and_zero_signature_stages(
            self, spark, tmp_path):
        from trafaret_spark.io import read_table, write_bucketed
        from trafaret_spark.operators import dedup
        docs = self._docs(spark)
        new, old = self._split(docs)
        new_ids = {r.doc_id for r in new.select("doc_id").collect()}
        # the production ingest loop: history's index is already in the
        # store; the batch's index is computed ONCE (its only signature
        # run) and appended, then the probe reads both sides as narrow
        # index rows. band is an existing column: write_bucketed
        # partitions by it directly (16 dirs), no extra hash-bucket col
        path_old = str(tmp_path / "lsh_idx_old")
        path_new = str(tmp_path / "lsh_idx_new")
        write_bucketed(dedup.minhash_band_index(old), path_old,
                       bucket_col="band")
        write_bucketed(dedup.minhash_band_index(new), path_new,
                       bucket_col="band")
        cands = dedup.minhash_lsh_candidates_incremental(
            read_table(spark, path_new), read_table(spark, path_old))
        got = {(r.a, r.b) for r in cands.collect()}
        assert got == self._expected(docs, new_ids)
        # the probe itself is pure index-level: ZERO Arrow signature
        # stages in the executed plan (no text is ever re-shingled)
        final = cands._jdf.queryExecution().executedPlan().toString()
        assert final.count("ArrowEvalPython") == 0, final

    def test_cap_counts_union_and_drop_stats(self, spark):
        from trafaret_spark.operators import dedup
        docs = self._docs(spark)
        new, old = self._split(docs)
        new_ids = {r.doc_id for r in new.select("doc_id").collect()}
        boiler_ids = set(range(100, 108))
        idx = dedup.minhash_band_index(old)
        stats = {}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            inc = dedup.minhash_lsh_candidates_incremental(
                dedup.minhash_band_index(new), idx, max_bucket_size=5,
                on_drop="warn", drop_stats=stats)
            got = {(r.a, r.b) for r in inc.collect()}
        try:
            # 8 identical docs > cap 5: counted over old ∪ new, so the
            # bucket drops even though only 3 of its members are new
            assert stats["dropped_buckets"] >= 1
            assert stats["dropped_rows"] >= 8
            assert not any(a in boiler_ids or b in boiler_ids
                           for a, b in got)
            assert got == self._expected(docs, new_ids, max_bucket_size=5)
        finally:
            stats["unpersist"]()

    def test_verified_incremental_dedup(self, spark):
        from trafaret_spark.operators import dedup
        docs = self._docs(spark)
        new, old = self._split(docs)
        new_ids = {r.doc_id for r in new.select("doc_id").collect()}
        got = {(r.a, r.b, round(r.jaccard, 6)) for r in
               dedup.minhash_dedup_incremental(
                   new, dedup.minhash_band_index(old), old,
                   threshold=0.5).collect()}
        batch = dedup.minhash_dedup(docs, threshold=0.5)
        exp = {(r.a, r.b, round(r.jaccard, 6)) for r in batch.collect()
               if r.a in new_ids or r.b in new_ids}
        assert got == exp and got


class TestExactIncrementalDedup:
    """Exact dedup against a persisted hash index: incremental(new,
    index(old)) must equal exact_dedup(old ∪ new) restricted to the new
    rows, column for column."""

    def test_matches_batch_union_restriction(self, spark):
        from trafaret_spark.operators import dedup
        docs = _inc_docs(spark)
        new = docs.filter(F.col("doc_id") % 3 == 0)
        old = docs.filter(F.col("doc_id") % 3 != 0)
        new_ids = {r.doc_id for r in new.select("doc_id").collect()}
        idx = dedup.exact_hash_index(old)
        cols = ("doc_id", "dup_group", "group_size", "is_canonical")
        got = {tuple(r[c] for c in cols) for r in
               dedup.exact_dedup_incremental(new, idx).collect()}
        exp = {tuple(r[c] for c in cols) for r in
               dedup.exact_dedup(docs).collect() if r.doc_id in new_ids}
        assert got == exp
        # non-vacuous: the boilerplate group spans old and new, so some
        # new row must see group_size > its in-batch count and lose
        # canonicity to a historical doc (id 100 is old, 102 is new)
        by_id = {t[0]: t for t in got}
        assert by_id[102][2] == 8 and by_id[102][3] is False
        # and a batch-only group where the new row IS canonical
        assert any(t[3] for t in got)

    def test_index_merge_equals_full_build(self, spark):
        from trafaret_spark.operators import dedup
        docs = _inc_docs(spark)
        parts = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
        merged = dedup.exact_index_merge(
            *[dedup.exact_hash_index(p) for p in parts])
        full = dedup.exact_hash_index(docs)
        as_set = lambda d: {(r.dup_group, r.n_docs, r.canon_id)
                            for r in d.collect()}
        assert as_set(merged) == as_set(full)


class TestMinhashIndexIngest:
    """The ingest loop: band → append under ingest_batch=<id> → probe.
    Across sequential batches every full-batch candidate pair must be
    emitted exactly once (in the ingest of its later member), and a
    replayed batch id must be idempotent."""

    def _batches(self, spark):
        docs = _inc_docs(spark)
        return docs, [docs.filter(F.col("doc_id") % 3 == k)
                      for k in range(3)]

    def test_sequential_ingests_partition_the_pair_set(
            self, spark, tmp_path):
        from trafaret_spark.operators import dedup
        docs, batches = self._batches(spark)
        path = str(tmp_path / "store")
        per_batch = []
        for i, b in enumerate(batches):
            got = {(r.a, r.b) for r in
                   dedup.minhash_index_ingest(b, path, str(i)).collect()}
            per_batch.append(got)
        full = {(r.a, r.b) for r in
                dedup.minhash_lsh_candidates(docs).collect()}
        assert set().union(*per_batch) == full
        for i in range(3):
            for j in range(i):
                assert not (per_batch[i] & per_batch[j])

    def test_replayed_batch_id_is_idempotent(self, spark, tmp_path):
        from trafaret_spark.io import read_table
        from trafaret_spark.operators import dedup
        docs, batches = self._batches(spark)
        path = str(tmp_path / "store")
        dedup.minhash_index_ingest(batches[0], path, "0").collect()
        first = {(r.a, r.b) for r in
                 dedup.minhash_index_ingest(batches[1], path, "1").collect()}
        n_idx = read_table(spark, path).count()
        # the failure-retry: same batch id again
        replay = {(r.a, r.b) for r in
                  dedup.minhash_index_ingest(batches[1], path, "1").collect()}
        assert replay == first
        assert read_table(spark, path).count() == n_idx

    def test_streaming_sink_effectively_once(self, spark, tmp_path):
        from trafaret_spark import streaming
        from trafaret_spark.operators import dedup
        docs, batches = self._batches(spark)
        src = str(tmp_path / "src")
        for i, b in enumerate(batches):
            b.coalesce(1).write.mode("overwrite").parquet(
                f"{src}/batch{i}")
        idx = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src + "/batch*"))
        q = (stream.writeStream
             .foreachBatch(streaming.stream_minhash_dedup_sink(idx, pairs))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        q.processAllAvailable()
        q.stop()
        got = {(r.a, r.b) for r in
               spark.read.parquet(pairs).select("a", "b").collect()}
        full = {(r.a, r.b) for r in
                dedup.minhash_lsh_candidates(docs).collect()}
        assert got == full and got


class TestR7PendingIncQueries:
    """The r7-pending incremental driver queries (see the R7_PENDING block
    in __spark_entry__.py) must already be oracle-green value-level, so
    round-7 registration is a pure dict move."""

    SF = "/root/testdata/sf0.001"

    def test_pending_queries_match_their_oracles(self, spark):
        import sys
        import duckdb
        sys.path.insert(0, "/root/repo/scripts")
        import __spark_entry__ as entry
        from check_contract import normalize
        con = duckdb.connect()
        for t in ("documents", "embeddings", "events"):
            con.sql(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{self.SF}/{t}.parquet'")
        oracles = entry.r7_pending_oracles()
        assert set(entry.R7_PENDING_QUERIES) == set(oracles)
        for name, fn in entry.R7_PENDING_QUERIES.items():
            a = normalize(fn(spark, self.SF).toPandas())
            b = normalize(con.sql(oracles[name]).df())
            assert len(a) > 0, name
            assert list(a.columns) == list(b.columns), name
            assert a.equals(b), f"{name}: value mismatch"

    def test_pending_names_not_yet_registered(self):
        import __spark_entry__ as entry
        # the window-budget deferral: registering early would break the
        # r6 staleness invariant (see the R7_PENDING comment block)
        assert not (set(entry.R7_PENDING_QUERIES) & set(entry.queries()))
        assert not (set(entry.r7_pending_oracles()) & set(entry.oracle_sql()))


def _inc_vecs(spark):
    """Embedding corpus for the incremental contracts: exact-dup and
    perturbed near-dup families spanning the old/new split (identical
    vectors collide in every LSH band, so non-vacuity is guaranteed),
    plus well-separated chaff and one NULL vector."""
    import numpy as np
    rng = np.random.RandomState(42)
    rows = []
    # 5 families of 3: one base direction, one exact dup, one tiny
    # perturbation. Id offsets vary the old/new (%3) split topology per
    # family: two-new (new×new pairs), all-old (the restriction must
    # drop these), and one-new (new×old pairs).
    offsets = [(0, 3, 1), (1, 2, 4), (0, 1, 2)]
    for fam in range(5):
        base = rng.randn(16)
        base /= np.linalg.norm(base)
        for j in range(3):
            v = base.copy()
            if j == 2:
                v = v + 0.01 * rng.randn(16)
                v /= np.linalg.norm(v)
            rows.append((fam * 12 + offsets[fam % 3][j],
                         [float(x) for x in v]))
    # chaff: independent random directions
    for i in range(10):
        v = rng.randn(16)
        v /= np.linalg.norm(v)
        rows.append((200 + i, [float(x) for x in v]))
    rows.append((300, None))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestEmbeddingIncrementalDedup:
    """Incremental embedding near-dup against a persisted sign-LSH band
    index — the embedding twin of TestIncrementalDedup. Contract:
    incremental(new, index(old)) == cosine_neardup(old ∪ new, LSH path,
    same params) restricted to pairs touching a new vector."""

    KW = dict(nbits=6, bands=4, seed=7, dim=16)

    @staticmethod
    def _split(vecs):
        new = vecs.filter(F.col("vec_id") % 3 == 0)
        old = vecs.filter(F.col("vec_id") % 3 != 0)
        return new, old

    def _expected(self, vecs, new_ids, threshold):
        from trafaret_spark.operators import similarity
        batch = similarity.cosine_neardup(vecs, threshold=threshold,
                                          **self.KW)
        return {(r.a, r.b, round(r.sim, 6)) for r in batch.collect()
                if r.a in new_ids or r.b in new_ids}

    def test_matches_batch_union_restriction(self, spark):
        from trafaret_spark.operators import similarity
        vecs = _inc_vecs(spark)
        new, old = self._split(vecs)
        new_ids = {r.vec_id for r in new.select("vec_id").collect()}
        idx = similarity.embedding_band_index(old, **self.KW)
        got = {(r.a, r.b, round(r.sim, 6)) for r in
               similarity.embedding_dedup_incremental(
                   new, idx, old, threshold=0.9, **self.KW).collect()}
        exp = self._expected(vecs, new_ids, 0.9)
        assert got == exp
        # non-vacuous in both kinds: new×new and new×old pairs exist
        assert any(a in new_ids and b in new_ids for a, b, _ in got)
        assert any((a in new_ids) != (b in new_ids) for a, b, _ in got)
        # and the restriction bites: the full batch has old×old pairs too
        full = {(r.a, r.b) for r in similarity.cosine_neardup(
            vecs, threshold=0.9, **self.KW).collect()}
        assert {(a, b) for a, b, _ in got} < full

    def test_persisted_index_probe_is_index_level(self, spark, tmp_path):
        from trafaret_spark.io import read_table, write_bucketed
        from trafaret_spark.operators import similarity
        vecs = _inc_vecs(spark)
        new, old = self._split(vecs)
        path_old = str(tmp_path / "emb_idx_old")
        path_new = str(tmp_path / "emb_idx_new")
        write_bucketed(similarity.embedding_band_index(old, **self.KW),
                       path_old, bucket_col="band")
        write_bucketed(similarity.embedding_band_index(new, **self.KW),
                       path_new, bucket_col="band")
        cands = similarity.embedding_lsh_candidates_incremental(
            read_table(spark, path_new), read_table(spark, path_old))
        got = {(r.a, r.b) for r in cands.collect()}
        new_ids = {r.vec_id for r in new.select("vec_id").collect()}
        exp = {(a, b) for a, b, _ in self._expected(vecs, new_ids, -1.1)}
        assert got == exp
        # pure index-level probe: ZERO Arrow bucketing stages — vectors
        # are never re-projected from the persisted store
        final = cands._jdf.queryExecution().executedPlan().toString()
        assert final.count("ArrowEvalPython") == 0, final

    def test_sequential_ingests_partition_candidates(self, spark,
                                                     tmp_path):
        from trafaret_spark.operators import similarity
        vecs = _inc_vecs(spark)
        path = str(tmp_path / "emb_idx_store")
        steps = []
        for m in range(3):
            batch = vecs.filter(F.col("vec_id") % 3 == m)
            steps.append({(r.a, r.b) for r in similarity.
                          embedding_index_ingest(batch, path, str(m),
                                                 **self.KW).collect()})
        # step m emits exactly the full-batch pairs whose LATER member
        # (by ingest order) arrived at step m: the steps PARTITION the
        # full candidate set
        full = {(r.a, r.b) for r in similarity.cosine_neardup(
            vecs, threshold=-1.1, **self.KW).collect()}
        assert set().union(*steps) == full
        assert sum(len(s) for s in steps) == len(full)
        # replay idempotence: re-ingesting the latest batch id leaves the
        # store and its output unchanged (dynamic partition overwrite
        # rewrites that batch's partitions, never appends). An EARLIER id
        # replayed later would legitimately see the batches ingested
        # after it — probe output is "vs the rest of the store", and the
        # store is the same, so index rows still aren't duplicated.
        replay = {(r.a, r.b) for r in similarity.embedding_index_ingest(
            vecs.filter(F.col("vec_id") % 3 == 2), path, "2",
            **self.KW).collect()}
        assert replay == steps[2]


class TestRepetitionFeatures:
    """Gopher repetition rules: hand-computed masses, edge cases, and the
    count-then-mass top tie-break."""

    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id int, text string")
        from trafaret_spark.operators import textstats
        out = textstats.repetition_features(df, **kw)
        return {r.doc_id: r.asDict() for r in out.collect()}

    def test_hand_computed_masses(self, spark):
        got = self._run(spark, [
            (1, "a b a b a b"),          # 11 chars; "a b" x3, "b a" x2
            (2, "x y z w"),              # 7 chars; all 2-grams unique
            (3, ""),                     # no grams
            (4, "q"),                    # fewer tokens than n
        ], top_ns=(2,), dup_ns=(2,))
        one = got[1]
        assert abs(one["top_2gram_char_frac"] - 9 / 11) < 1e-9
        # every-occurrence duplicate mass: (3 + 2) x len("a b") = 15
        assert abs(one["dup_2gram_char_frac"] - 15 / 11) < 1e-9
        # a count-1 gram is still "the most frequent" when nothing repeats
        assert abs(got[2]["top_2gram_char_frac"] - 3 / 7) < 1e-9
        assert got[2]["dup_2gram_char_frac"] == 0.0
        assert got[3]["top_2gram_char_frac"] == 0.0
        assert got[4]["top_2gram_char_frac"] == 0.0

    def test_top_tiebreak_prefers_larger_mass(self, spark):
        # "aa b" and "c dd" both occur twice; tie broken by char mass —
        # equal here (4 each), so top = 2 x 4 = 8 regardless of which
        got = self._run(spark, [(1, "aa b c dd aa b c dd")],
                        top_ns=(2,), dup_ns=())
        # 19 chars; most frequent 2-grams: "aa b" x2, "b c" x2, "c dd" x2,
        # "dd aa" x1 -> top mass = max count 2, mass max(8, 6, 8) = 8
        assert abs(got[1]["top_2gram_char_frac"] - 8 / 19) < 1e-9

    def test_default_gopher_column_set(self, spark):
        got = self._run(spark, [(1, "one two three " * 12)])
        cols = set(got[1]) - {"doc_id", "text"}
        assert cols == ({f"top_{n}gram_char_frac" for n in (2, 3, 4)}
                        | {f"dup_{n}gram_char_frac"
                           for n in (5, 6, 7, 8, 9, 10)})
        # a 12x-repeated phrase is pathological under every rule
        assert all(got[1][c] > 0.5 for c in cols)

    def test_scan_side_plan(self, spark):
        from trafaret_spark.operators import textstats
        df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
        out = textstats.repetition_features(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestChunkDocuments:
    """Stride-overlapped token-window chunking: coverage, suffix-drop,
    provenance, and plan shape."""

    def _chunks(self, spark, rows, **kw):
        from trafaret_spark.operators import curation
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = curation.chunk_documents(df, **kw)
        return [(r.doc_id, r.chunk_idx, r.start_tok, r.n_chunk_tokens,
                 r.chunk_text)
                for r in out.orderBy("doc_id", "chunk_idx").collect()]

    def test_overlap_and_suffix_drop(self, spark):
        got = self._chunks(spark, [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")],
                           max_tokens=4, stride=2)
        # start 9's chunk (t9 t10) is a suffix of start 7's -> dropped;
        # the last kept chunk covers the final token
        assert got == [(1, 0, 1, 4, "t1 t2 t3 t4"),
                       (1, 1, 3, 4, "t3 t4 t5 t6"),
                       (1, 2, 5, 4, "t5 t6 t7 t8"),
                       (1, 3, 7, 4, "t7 t8 t9 t10")]

    def test_disjoint_short_and_empty(self, spark):
        got = self._chunks(spark, [(1, "a b c"), (2, ""), (3, "   "),
                                   (4, "x1 x2 x3 x4 x5 x6 x7 x8")],
                           max_tokens=4)
        # short doc -> one partial chunk; blank docs -> no rows;
        # exact multiple -> clean disjoint cover
        assert got == [(1, 0, 1, 3, "a b c"),
                       (4, 0, 1, 4, "x1 x2 x3 x4"),
                       (4, 1, 5, 4, "x5 x6 x7 x8")]

    def test_every_token_covered(self, spark):
        text = " ".join(f"w{i}" for i in range(23))
        got = self._chunks(spark, [(1, text)], max_tokens=5, stride=3)
        covered = set()
        for _, _, start, n, _ in got:
            covered |= set(range(start, start + n))
        assert covered == set(range(1, 24))
        # strict progress: starts are the arithmetic prefix
        assert [s for _, _, s, _, _ in got] == \
            sorted({1 + 3 * i for i in range(len(got))})

    def test_param_validation_and_clash(self, spark):
        from trafaret_spark.operators import curation
        df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
        with pytest.raises(ValueError, match="max_tokens"):
            curation.chunk_documents(df, 0)
        with pytest.raises(ValueError, match="stride"):
            curation.chunk_documents(df, 4, stride=5)
        with pytest.raises(ValueError, match="already has columns"):
            curation.chunk_documents(df.withColumn("chunk_idx", F.lit(1)), 4)

    def test_scan_side_plan(self, spark):
        from trafaret_spark.operators import curation
        df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
        out = curation.chunk_documents(df, 2, stride=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestCleanLines:
    """C4 line-level cleaning: keep rules, flags, and the filter
    end-state."""

    DOC = ("Good sentence with words.\n"
           "short one.\n"                 # < 3 words -> dropped
           "No terminal punct here\n"     # no punct -> dropped
           "Ends with a bang!\n"
           "Is this kept?\n"
           "\"Quoted ending works.\"\n"
           "   \n")                       # blank -> dropped

    def test_keep_rules(self, spark):
        from trafaret_spark.operators import textstats
        df = spark.createDataFrame([(1, self.DOC)],
                                   "doc_id int, text string")
        r = textstats.clean_lines(df).collect()[0]
        assert r.text_clean.split("\n") == [
            "Good sentence with words.", "Ends with a bang!",
            "Is this kept?", "\"Quoted ending works.\""]
        # 8 split elements: 7 physical lines + the empty string after the
        # trailing newline — 4 kept, 4 dropped
        assert r.n_lines_kept == 4 and r.n_lines_dropped == 4
        assert not r.has_lorem_ipsum and not r.has_curly_brace

    def test_flags_and_punct_opt_out(self, spark):
        from trafaret_spark.operators import textstats
        df = spark.createDataFrame(
            [(1, "some Lorem Ipsum filler text"),
             (2, "function f() { return 1; }"),
             (3, "three plain words\nand two\nmore here yes")],
            "doc_id int, text string")
        got = {r.doc_id: r for r in textstats.clean_lines(
            df, require_terminal_punct=False).collect()}
        assert got[1].has_lorem_ipsum and not got[1].has_curly_brace
        assert got[2].has_curly_brace
        # without the punct rule only the word-count rule applies
        assert got[3].n_lines_kept == 2 and got[3].n_lines_dropped == 1

    def test_c4_filter_end_state(self, spark):
        from trafaret_spark.operators import textstats
        df = spark.createDataFrame(
            [(1, self.DOC),                          # 4 lines kept -> stays
             (2, "Only one good line here.\nbad"),   # < 3 kept -> dropped
             (3, self.DOC + "\nlorem ipsum."),       # flag -> dropped
             (4, self.DOC.replace("bang", "{ang"))], # flag -> dropped
            "doc_id int, text string")
        out = textstats.c4_filter(df, min_lines_kept=3)
        rows = out.collect()
        assert [r.doc_id for r in rows] == [1]
        assert rows[0].text.split("\n")[0] == "Good sentence with words."
        assert out.columns == df.columns  # schema preserved

    def test_scan_side_plan(self, spark):
        from trafaret_spark.operators import textstats
        df = spark.createDataFrame([(1, "a b c.")], "doc_id int, text string")
        plan = (textstats.c4_filter(df)._jdf.queryExecution()
                .executedPlan().toString())
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestEmbeddingStreamingSink:
    """stream_embedding_dedup_sink: the micro-batched union of pair
    outputs equals the full-batch candidate set (same contract the
    minhash sink pins)."""

    def test_streaming_sink_covers_full_candidates(self, spark, tmp_path):
        from trafaret_spark import streaming
        from trafaret_spark.operators import similarity
        vecs = _inc_vecs(spark)
        src = str(tmp_path / "src")
        for m in range(3):
            vecs.filter(F.col("vec_id") % 3 == m).coalesce(1) \
                .write.mode("overwrite").parquet(f"{src}/batch{m}")
        idx = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        kw = dict(nbits=6, bands=4, dim=16)
        stream = (spark.readStream
                  .schema("vec_id long, embedding array<double>")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src + "/batch*"))
        q = (stream.writeStream
             .foreachBatch(streaming.stream_embedding_dedup_sink(
                 idx, pairs, **kw))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        q.processAllAvailable()
        q.stop()
        got = {(r.a, r.b) for r in
               spark.read.parquet(pairs).select("a", "b").collect()}
        full = {(r.a, r.b) for r in similarity.cosine_neardup(
            vecs, threshold=-1.1, **{**kw, "seed": 7}).collect()}
        assert got == full and got


class TestDupSpanReport:
    """Exact-substring duplication report: span-union coverage (overlaps
    counted once), whole-text fold for short docs, corpus-wide counting."""

    ROWS = [
        (1, "a b c d e f g h"),    # every 3-gram shared with doc 4
        (2, "x y c d e z w q"),    # one shared run "c d e"
        (3, "unique words only here"),
        (4, "a b c d e f g h"),    # exact dup of 1
        (5, "pp qq"),              # short: whole-text gram
        (6, "pp qq"),              # short exact dup
    ]

    def _report(self, spark, rows, **kw):
        from trafaret_spark.operators import dedup
        df = spark.createDataFrame(rows, "doc_id int, text string")
        return {r.doc_id: r for r in
                dedup.dup_span_report(df, **kw).collect()}

    def test_values(self, spark):
        got = self._report(spark, self.ROWS, k=3, portable=True)
        assert got[1].dup_token_coverage == 1.0
        assert got[1].dup_gram_frac == 1.0
        # doc 2: the single shared 3-gram at position 2 covers 3 of 8
        assert got[2].n_dup_grams == 1
        assert abs(got[2].dup_token_coverage - 3 / 8) < 1e-9
        assert got[3].n_dup_grams == 0
        assert got[3].dup_token_coverage == 0.0
        # short exact dups: whole-text gram, full coverage
        assert got[5].n_grams == 1 and got[5].dup_token_coverage == 1.0

    def test_overlapping_spans_count_once(self, spark):
        # "m n o p" shared twice WITHIN one doc at overlapping offsets:
        # spans [0..3] and [5..8] in doc 1 (both occurrences duplicated
        # because the gram count is corpus-wide >= 2)
        rows = [(1, "m n o p q m n o p"),
                (2, "zz yy xx")]
        got = self._report(spark, rows, k=4, portable=True)
        # grams of doc 1: mnop(0) nopq(1) opqm(2) pqmn(3) qmno(4) mnop(5)
        # -> only "m n o p" repeats; spans [0..3] + [5..8] = 8 of 9 tokens
        assert got[1].n_dup_grams == 2
        assert abs(got[1].dup_token_coverage - 8 / 9) < 1e-9

    def test_adjacent_overlap_union(self, spark):
        # duplicated grams at positions 0 and 1 overlap: union covers
        # tokens 0..3 (4 of 5), not 6
        rows = [(1, "a b c d e"), (2, "a b c d zz")]
        got = self._report(spark, rows, k=3, portable=True)
        assert got[1].n_dup_grams == 2  # abc, bcd shared
        assert abs(got[1].dup_token_coverage - 4 / 5) < 1e-9

    def test_param_validation(self, spark):
        from trafaret_spark.operators import dedup
        df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError, match="k must"):
            dedup.dup_span_report(df, k=0)
        with pytest.raises(ValueError, match="min_count"):
            dedup.dup_span_report(df, min_count=1)


class TestDsir:
    """DSIR importance weighting: sign/ordering of log-weights, NULL
    evidence handling, and the Gumbel-top-k selection contract."""

    def _corpora(self, spark):
        from trafaret_spark.operators import lmscore
        target_train = spark.createDataFrame(
            [(100 + i, "alpha beta gamma delta") for i in range(4)],
            "doc_id long, text string")
        source_train = spark.createDataFrame(
            [(200 + i, "omega psi chi phi") for i in range(4)],
            "doc_id long, text string")
        t = lmscore.train_bigram_lm(target_train)
        s = lmscore.train_bigram_lm(source_train)
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"),     # target-like -> positive
             (2, "omega psi chi"),        # source-like -> negative
             (3, "zz"),                   # < 2 tokens -> NULL
             (4, "alpha beta alpha beta")],
            "doc_id long, text string")
        return t, s, docs

    def test_logweights_sign_and_null(self, spark):
        from trafaret_spark.operators import lmscore
        t, s, docs = self._corpora(spark)
        got = {r.doc_id: r for r in
               lmscore.dsir_logweights(docs, t, s).collect()}
        assert got[1].logw_bits > 0 > got[2].logw_bits
        assert got[3].logw_bits is None and got[3].n_bigrams == 0
        assert got[4].n_bigrams == 3
        # net target-leaning despite one unseen (beta, alpha) bigram
        assert got[4].logw_bits > 0

    def test_top_k_matches_bruteforce_and_salting(self, spark):
        from trafaret_spark.operators import lmscore
        t, s, docs = self._corpora(spark)
        out = lmscore.dsir_top_k(docs, 2, t, s, seed=7)
        # brute force: rank ALL eligible docs by the same audit key the
        # operator emits; its kept set must be the key's true top-2
        all_keys = {r.doc_id: r["dsir_key"] for r in
                    lmscore.dsir_top_k(docs, 10, t, s, seed=7).collect()}
        expect = set(sorted(all_keys, key=lambda d: -all_keys[d])[:2])
        assert {r.doc_id for r in out.collect()} == expect
        # NULL-evidence doc never selected even with room
        assert 3 not in all_keys
        # salted two-phase == plain window
        salted = lmscore.dsir_top_k(docs, 2, t, s, seed=7,
                                    salt_partitions=4)
        assert {r.doc_id for r in salted.collect()} == expect

    def test_portable_hash_family(self, spark):
        from trafaret_spark.operators import lmscore
        t, s, docs = self._corpora(spark)
        rows = lmscore.dsir_top_k(docs, 3, t, s, seed=7,
                                  portable=True).collect()
        assert len(rows) == 3 and all(
            r["dsir_key"] is not None for r in rows)


class TestRenderWithSpans:
    """Span-annotated render: every span must reproduce its turn's text
    by substring, and the render must equal render_conversation's."""

    ROWS = [
        ("c1", 0, "system", "be helpful"),
        ("c1", 1, "user", "héllo ☃ unicode"),     # multi-codepoint
        ("c1", 2, "assistant", None),              # NULL text -> empty span
        ("c1", 3, None, "orphan"),                 # NULL role
        ("c2", 0, "user", ""),                     # empty text
        ("c2", 1, "assistant", "answer!"),
    ]

    def _out(self, spark):
        from trafaret_spark.operators import conversations
        df = spark.createDataFrame(
            self.ROWS, "conv_id string, turn_idx long, role string, "
                       "text string")
        return df, conversations.render_with_spans(df)

    def test_spans_substring_roundtrip(self, spark):
        df, out = self._out(spark)
        rows = {r.conv_id: r for r in out.collect()}
        texts = {(c, o): (t if t is not None else "")
                 for c, o, _, t in self.ROWS}
        for cid, r in rows.items():
            for s in r.spans:
                got = r.rendered[s.text_start:s.text_end]
                assert got == texts[(cid, s.o)], (cid, s.o, got)
        # NULL text -> empty span, not a dropped turn
        c1 = {s.o: s for s in rows["c1"].spans}
        assert c1[2].text_start == c1[2].text_end
        assert len(rows["c1"].spans) == 4

    def test_render_matches_render_conversation(self, spark):
        from trafaret_spark.operators import conversations
        df, out = self._out(spark)
        base = {r.conv_id: r.rendered for r in
                conversations.render_conversation(df).collect()}
        got = {r.conv_id: r.rendered for r in out.collect()}
        assert got == base
        # spans cover the text regions in order and stay inside bounds
        for r in out.collect():
            prev_end = -1
            for s in r.spans:
                assert 0 <= s.text_start <= s.text_end <= len(r.rendered)
                assert s.text_start > prev_end
                prev_end = s.text_end

    def test_role_filter_mask(self, spark):
        _, out = self._out(spark)
        masked = out.select(
            "conv_id",
            F.filter(F.col("spans"),
                     lambda s: s["role"] == "assistant").alias("m"))
        got = {r.conv_id: [(s.text_start, s.text_end) for s in r.m]
               for r in masked.collect()}
        assert len(got["c1"]) == 1 and len(got["c2"]) == 1


class TestRemoveDupSpans:
    """ExactSubstr end-state: duplicated runs removed (every occurrence),
    raw tokens preserved, short-dup docs emptied, unique docs intact."""

    def _out(self, spark, rows, **kw):
        from trafaret_spark.operators import dedup
        df = spark.createDataFrame(rows, "doc_id int, text string")
        return {r.doc_id: r for r in
                dedup.remove_dup_spans(df, **kw).collect()}

    def test_removal_semantics(self, spark):
        got = self._out(spark, [
            (1, "A b c d e f g h"),
            (2, "x y c d e z w q"),
            (3, "unique words only here"),
            (4, "A b c d e f g h"),
            (5, "pp qq"), (6, "pp qq"),
        ], k=3, portable=True)
        assert got[1].text_despanned == "" and got[1].n_tokens_removed == 8
        # only the shared "c d e" run goes; raw case/order preserved
        assert got[2].text_despanned == "x y z w q"
        assert got[3].text_despanned == "unique words only here"
        assert got[3].n_tokens_removed == 0
        # short exact dup folds to one whole-text gram -> emptied
        assert got[5].text_despanned == "" and got[5].n_tokens == 2

    def test_case_sensitive_unlike_report(self, spark):
        # raw-token hashing: "C d e" != "c d e", so no span is duplicated
        got = self._out(spark, [(1, "a b C d e"), (2, "x y c d e")],
                        k=3, portable=True)
        assert got[1].n_tokens_removed == 0 == got[2].n_tokens_removed

    def test_overlapping_runs_merge(self, spark):
        # "a b c d" shared -> grams abc, bcd both dup; union covers 0..3
        got = self._out(spark, [(1, "a b c d zz"), (2, "a b c d yy")],
                        k=3, portable=True)
        assert got[1].text_despanned == "zz"
        assert got[1].n_tokens_removed == 4

    def test_blank_text(self, spark):
        got = self._out(spark, [(1, ""), (2, "   "), (3, "w1 w2 w3")],
                        k=2, portable=True)
        assert got[1].text_despanned == "" and got[1].n_tokens == 0
        assert got[2].n_tokens == 0 and got[3].n_tokens_removed == 0


class TestVocab:
    """Vocabulary extraction + deterministic encoding."""

    ROWS = [(1, "b b a c"), (2, "a b X!"), (3, ""), (4, "zz a")]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id int, text string")

    def test_deterministic_ids(self, spark):
        from trafaret_spark.operators import vocab
        v = {r.token: (r["count"], r.token_id) for r in
             vocab.build_vocab(self._df(spark)).collect()}
        # count desc, token asc: a and b tie at 3 -> a gets 0
        assert v["a"] == (3, 0) and v["b"] == (3, 1)
        assert v["x"][0] == 1  # normalized (lowercase, punct stripped)
        assert len({tid for _, tid in v.values()}) == len(v)

    def test_min_count_and_max_size(self, spark):
        from trafaret_spark.operators import vocab
        df = self._df(spark)
        top = vocab.build_vocab(df, min_count=2)
        assert {r.token for r in top.collect()} == {"a", "b"}
        capped = vocab.build_vocab(df, max_size=3)
        assert capped.count() == 3

    def test_encode_positions_and_oov(self, spark):
        from trafaret_spark.operators import vocab
        df = self._df(spark)
        v = vocab.build_vocab(df).filter("token_id < 3")
        with_oov = {r.doc_id: (r.token_ids, r.n_oov) for r in
                    vocab.encode_tokens(df, v, oov_id=-1).collect()}
        assert with_oov[1] == ([1, 1, 0, 2], 0)   # order-faithful
        assert with_oov[4] == ([-1, 0], 1)
        assert with_oov[3] == ([], 0)             # blank doc restored
        dropped = {r.doc_id: r.token_ids for r in
                   vocab.encode_tokens(df, v).collect()}
        assert dropped[4] == [0]


class TestKeepBest:
    """Quality-pick dedup end-state: highest score survives per
    component, min-id only breaks ties; NULL scores always lose."""

    def test_quality_pick(self, spark):
        from trafaret_spark.operators import dedup
        # components: {1,2,3} and {10,11}; 20 unpaired
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "a long, b long")
        docs = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9), (10, None), (11, 0.1),
             (20, 0.0)],
            "doc_id long, q double")
        kept = {r.doc_id for r in
                dedup.keep_best(docs, pairs, "q").collect()}
        # 2 beats 3 on the id tiebreak at q=0.9; 11's 0.1 beats 10's NULL
        assert kept == {2, 11, 20}

    def test_matches_keep_canonical_on_constant_score(self, spark):
        from trafaret_spark.operators import dedup
        pairs = spark.createDataFrame([(5, 3), (3, 9)], "a long, b long")
        docs = spark.createDataFrame([(i, 1.0) for i in (3, 5, 9, 7)],
                                     "doc_id long, q double")
        best = {r.doc_id for r in
                dedup.keep_best(docs, pairs, "q").collect()}
        canon = {r.doc_id for r in
                 dedup.keep_canonical(docs, pairs).collect()}
        assert best == canon == {3, 7}


class TestPhashAndFingerprintNeardup:
    """pHash plumbing (fake path) + the generic fingerprint pair join."""

    def test_fake_phash_deterministic_and_collides_on_dups(self, spark):
        from trafaret_spark.operators import multimodal
        rows = [(1, b"same bytes"), (2, b"same bytes"),
                (3, b"other bytes"), (4, None)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: (r.phash, r.decode_ok) for r in
               multimodal.phash_images(df, fake=True).collect()}
        assert got[1] == got[2] and got[1][1]
        assert got[3][0] != got[1][0]
        assert got[4] == (None, False)
        # deterministic across runs
        again = {r.doc_id: r.phash for r in
                 multimodal.phash_images(df, fake=True).collect()}
        assert {d: p for d, (p, _) in got.items()} == again

    def test_fingerprint_neardup_hamming(self, spark):
        from trafaret_spark.operators import dedup
        # 16-bit fingerprints, 4-bit bands: within-hamming-3 pairs are
        # GUARANTEED found; hamming computed exactly
        rows = [(1, 0b1111000011110000), (2, 0b1111000011110001),  # d=1
                (3, 0b1111000011111111),                           # d(1,3)=4
                (4, None)]
        df = spark.createDataFrame(rows, "doc_id long, fp long")
        out = {(r.a, r.b): r.hamming for r in
               dedup.fingerprint_neardup(df, "fp", bits=16, band_bits=4)
               .collect()}
        assert out[(1, 2)] == 1
        assert out[(1, 3)] == 4   # still found (shares the low band? no —
        # shares band 2 and 3) and verified exactly
        assert out[(2, 3)] == 3
        filt = {(r.a, r.b) for r in
                dedup.fingerprint_neardup(df, "fp", bits=16, band_bits=4,
                                          max_hamming=2).collect()}
        assert filt == {(1, 2)}

    def test_phash_into_neardup_end_to_end(self, spark):
        from trafaret_spark.operators import dedup, multimodal
        rows = [(i, f"payload {i % 3}".encode()) for i in range(9)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        fp = multimodal.phash_images(df, fake=True)
        pairs = dedup.fingerprint_neardup(fp, "phash", bits=60,
                                          band_bits=15, max_hamming=0)
        got = {(r.a, r.b) for r in pairs.collect()}
        # exact payload clusters {0,3,6} {1,4,7} {2,5,8} -> 3 pairs each
        expect = {(a, b) for m in range(3)
                  for a in range(m, 9, 3) for b in range(m, 9, 3) if a < b}
        assert got == expect


class TestSplitsByGroup:
    """Leakage-safe splits: near-dup families never straddle a split;
    un-duplicated docs keep their plain assign_splits split."""

    W = {"train": 0.6, "val": 0.2, "test": 0.2}

    def test_families_stay_together_singletons_stable(self, spark):
        from trafaret_spark.operators import sampling
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "a long, b long")
        docs = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 10, 11, 20, 21, 22, 23, 24)],
            "doc_id long")
        got = {r.doc_id: r.split for r in sampling.assign_splits_by_group(
            docs, pairs, self.W, seed=3, portable=True).collect()}
        assert got[1] == got[2] == got[3]
        assert got[10] == got[11]
        plain = {r.doc_id: r.split for r in sampling.assign_splits(
            docs, "doc_id", self.W, seed=3, portable=True).collect()}
        for d in (20, 21, 22, 23, 24):   # singletons: identical split
            assert got[d] == plain[d]
        # the component keys on its min id -> family split == the min
        # member's plain split
        assert got[1] == plain[1] and got[10] == plain[10]

    def test_all_rows_assigned(self, spark):
        from trafaret_spark.operators import sampling
        pairs = spark.createDataFrame([(1, 2)], "a long, b long")
        docs = spark.createDataFrame([(i,) for i in range(50)],
                                     "doc_id long")
        out = sampling.assign_splits_by_group(docs, pairs, self.W)
        rows = out.collect()
        assert len(rows) == 50
        assert {r.split for r in rows} <= set(self.W)
        assert all(r.split is not None for r in rows)
