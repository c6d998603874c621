"""Dedup operators vs single-node Python oracles (SURVEY.md §5.2 Tier F)."""

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from trafaret_spark.operators import dedup

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the QUICK brown fox, jumps over the lazy dog near the river bank!"),  # near-exact of 0
    (2, "The quick brown fox jumps over the lazy dog near the river bend"),    # 1-word delta of 0
    (3, "spark partitions shuffle data across executors during wide stages"),
    (4, "spark partitions shuffle data across executors during wide stages"),  # exact dup of 3
    (5, "completely different text about cooking pasta with tomato sauce"),
    (6, ""),                                                                    # empty doc
    (7, "short text"),                                                          # < n tokens
]


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"[^\w]+", " ", s.lower(), flags=re.UNICODE)).strip()


def _shingles(s: str, n=3) -> set:
    toks = _norm(s).split(" ") if _norm(s) else [""]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _jac(a: str, b: str, n=3) -> float:
    sa, sb = _shingles(a, n), _shingles(b, n)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


class TestExactDedup:
    def test_groups_and_canonical(self, docs):
        rows = {r.doc_id: r for r in dedup.exact_dedup(docs).collect()}
        # 1 normalizes to the same text as 0 → same group; 0 is canonical
        assert rows[0].dup_group == rows[1].dup_group
        assert rows[0].is_canonical and not rows[1].is_canonical
        assert rows[0].group_size == 2
        # exact dup pair 3/4
        assert rows[3].dup_group == rows[4].dup_group
        assert rows[3].is_canonical and not rows[4].is_canonical
        # 2 differs by a word → own group
        assert rows[2].dup_group != rows[0].dup_group
        assert rows[2].group_size == 1

    def test_non_normalized(self, docs):
        rows = {r.doc_id: r for r in
                dedup.exact_dedup(docs, normalized=False).collect()}
        assert rows[0].dup_group != rows[1].dup_group  # case/punct differ
        assert rows[3].dup_group == rows[4].dup_group


class TestJaccard:
    def test_matches_python_oracle(self, spark, docs):
        pairs = spark.createDataFrame(
            [Row(a=0, b=1), Row(a=0, b=2), Row(a=0, b=5), Row(a=3, b=4)])
        got = {(r.a, r.b): r.jaccard for r in
               dedup.jaccard(pairs, docs).collect()}
        for (a, b), j in got.items():
            expect = _jac(DOCS[a][1], DOCS[b][1])
            assert abs(j - expect) < 1e-9, (a, b, j, expect)
        assert got[(0, 1)] == 1.0        # identical after normalization
        assert got[(3, 4)] == 1.0
        assert got[(0, 5)] == 0.0


class TestMinhash:
    def test_signature_shape_and_determinism(self, docs):
        sig = docs.select(
            dedup.minhash_signature(F.col("text"), num_hashes=32).alias("s"))
        rows = [r.s for r in sig.collect()]
        assert all(len(s) == 32 for s in rows)
        rows2 = [r.s for r in sig.collect()]
        assert rows == rows2

    def test_similar_docs_share_signature_slots(self, docs):
        sig = {r.doc_id: r.s for r in docs.select(
            "doc_id", dedup.minhash_signature(F.col("text"), 64).alias("s")).collect()}
        agree_01 = sum(x == y for x, y in zip(sig[0], sig[1])) / 64
        agree_05 = sum(x == y for x, y in zip(sig[0], sig[5])) / 64
        assert agree_01 == 1.0            # identical shingle sets
        assert agree_05 < 0.2             # unrelated docs

    def test_end_to_end_finds_near_dups(self, docs):
        pairs = {(r.a, r.b): r.jaccard
                 for r in dedup.minhash_dedup(docs, threshold=0.5).collect()}
        assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
        assert (3, 4) in pairs
        assert all(j >= 0.5 for j in pairs.values())
        assert (0, 5) not in pairs

    def test_bucket_cap_drops_degenerate_buckets(self, spark):
        same = spark.createDataFrame(
            [Row(doc_id=i, text="identical boilerplate text repeated everywhere")
             for i in range(20)])
        cands = dedup.minhash_lsh_candidates(same, max_bucket_size=5)
        assert cands.count() == 0  # every bucket overflows the cap


class TestSimhash:
    def test_identical_fingerprints(self, docs):
        fp = {r.doc_id: r.f for r in docs.select(
            "doc_id", dedup.simhash(F.col("text")).alias("f")).collect()}
        assert fp[3] == fp[4]
        assert fp[0] != fp[5]

    def test_near_dups_low_hamming(self, docs):
        got = {(r.a, r.b): r.hamming for r in dedup.simhash_dedup(docs).collect()}
        if (3, 4) in got:
            assert got[(3, 4)] == 0
        # oriented pairs only
        assert all(a < b for a, b in got)


class TestNgramJaccardPairs:
    def test_blocked_pairs_match_python_oracle(self, spark):
        rows = [Row(doc_id=i, text=t, grp=g) for i, (_, t) in enumerate(DOCS)
                for g in [["x", "y"][i % 2]]]
        df = spark.createDataFrame(rows)
        got = {(r.a, r.b): r.jaccard for r in dedup.ngram_jaccard_pairs(
            df, block_cols=["grp"], threshold=0.0, n=1).collect()}
        # every oriented same-block pair present, value == python set jaccard
        for a in range(len(DOCS)):
            for b in range(a + 1, len(DOCS)):
                if a % 2 != b % 2:
                    assert (a, b) not in got
                    continue
                assert abs(got[(a, b)] - _jac(DOCS[a][1], DOCS[b][1], n=1)) < 1e-9

    def test_threshold_filters(self, spark, docs):
        df = docs.withColumn("grp", F.lit("all"))
        got = {(r.a, r.b) for r in dedup.ngram_jaccard_pairs(
            df, block_cols=["grp"], threshold=0.9, n=1).collect()}
        assert (0, 1) in got and (3, 4) in got
        assert (0, 5) not in got

    def test_block_cap_drop_is_observable(self, spark):
        """A degenerate hot block must be dropped AND the drop surfaced
        (r2 verdict #3: the cap existed but was silent and unused by the
        shipped queries)."""
        rows = ([Row(doc_id=i, text=f"doc number {i}", grp="hot")
                 for i in range(30)] +
                [Row(doc_id=100 + i, text=f"cold doc {i}", grp="cold")
                 for i in range(3)])
        df = spark.createDataFrame(rows)
        with pytest.warns(RuntimeWarning, match=r"dropping 1 block\(s\) \(30 rows\)"):
            out = dedup.ngram_jaccard_pairs(df, block_cols=["grp"],
                                            threshold=0.0, n=1,
                                            max_block_size=10)
            pairs = {(r.a, r.b) for r in out.collect()}
        assert pairs and all(a >= 100 for a, _ in pairs)  # only cold block
        with pytest.raises(ValueError, match="max_block_size=10"):
            dedup.ngram_jaccard_pairs(df, block_cols=["grp"], threshold=0.0,
                                      n=1, max_block_size=10, on_drop="error")
        # ignore: lazy, no warning, same result
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("error")
            out = dedup.ngram_jaccard_pairs(df, block_cols=["grp"],
                                            threshold=0.0, n=1,
                                            max_block_size=10,
                                            on_drop="ignore")
            assert {(r.a, r.b) for r in out.collect()} == pairs


class TestKeepCanonical:
    def test_dedup_end_state(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in
             [(1, "x"), (2, "x"), (3, "x"), (10, "y"), (11, "y"), (20, "z")]])
        pairs = spark.createDataFrame(
            [Row(a=1, b=2), Row(a=2, b=3), Row(a=10, b=11)])
        kept = sorted(r.doc_id for r in
                      dedup.keep_canonical(df, pairs).collect())
        # smallest id per component survives; unpaired rows always survive
        assert kept == [1, 10, 20]

    def test_no_pairs_keeps_everything(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a")])
        pairs = spark.createDataFrame([], "a long, b long")
        assert dedup.keep_canonical(df, pairs).count() == 1
