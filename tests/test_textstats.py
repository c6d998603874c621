"""Text analysis operators vs Python oracles."""

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from trafaret_spark.operators import textstats

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "der Hund ist nicht mit der Katze und ich bin da"),
    (2, "le chat est dans la maison pour le moment"),
    (3, "12345 67890 !!! ???"),
    (4, ""),
    (5, "   "),
    (6, "word " * 50),
    (7, "el perro es una mascota por la casa en madrid"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


class TestTokenCount:
    def test_whitespace_tokens(self, docs):
        got = {r.doc_id: r.n for r in docs.select(
            "doc_id", textstats.token_count(F.col("text")).alias("n")).collect()}
        for i, t in DOCS:
            expect = len(t.split()) if t.strip() else 0
            assert got[i] == expect, (i, got[i], expect)

    def test_bpe_ish_reasonable(self, docs):
        got = {r.doc_id: r.n for r in docs.select(
            "doc_id", textstats.bpe_ish_token_count(F.col("text")).alias("n")).collect()}
        assert got[4] == 0 and got[5] == 0
        assert got[0] >= 9            # at least one per word
        assert got[3] >= 10           # digits count individually


class TestQuality:
    def test_features_match_python(self, docs):
        rows = {r.doc_id: r for r in textstats.quality_features(docs).collect()}
        for i, t in DOCS:
            r = rows[i]
            n_chars = max(len(t), 1)
            assert r.alpha_ratio == pytest.approx(
                len(re.sub(r"[^A-Za-z]", "", t)) / n_chars)
            assert r.digit_ratio == pytest.approx(
                len(re.sub(r"[^0-9]", "", t)) / n_chars)

    def test_score_ordering(self, docs):
        s = {r.doc_id: r.quality for r in textstats.quality_score(docs).collect()}
        assert s[0] > s[3]            # prose beats digit soup
        assert s[0] > s[4]            # prose beats empty
        assert s[6] <= 0.75           # repetition penalized


class TestLangId:
    def test_marker_langs(self, docs):
        got = {r.doc_id: r.lang_pred for r in textstats.lang_id(docs).collect()}
        assert got[0] == "en"
        assert got[1] == "de"
        assert got[2] == "fr"
        assert got[7] == "es"
        assert got[3] == "und" and got[4] == "und"


class TestFingerprint:
    def test_whitespace_punct_invariant(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=0, text="Hello, world! Nice   day."),
            Row(doc_id=1, text="hello world nice day"),
            Row(doc_id=2, text="hello world nice days"),
        ])
        fp = {r.doc_id: r.fingerprint for r in textstats.fingerprint(df).collect()}
        assert fp[0] == fp[1]
        assert fp[0] != fp[2]

    def test_order_sensitive(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=0, text="alpha beta gamma"),
            Row(doc_id=1, text="gamma beta alpha"),
        ])
        fp = {r.doc_id: r.fingerprint for r in textstats.fingerprint(df).collect()}
        assert fp[0] != fp[1]


class TestCorpusReport:
    def test_report_values(self, spark):
        from pyspark.sql import Row
        df = spark.createDataFrame(
            [Row(lang="en", text="one two three"),
             Row(lang="en", text="four five"),
             Row(lang="en", text=None),
             Row(lang="de", text="eins")],
            "lang string, text string")
        out = {r.lang: r for r in
               textstats.corpus_report(df, by="lang").collect()}
        en = out["en"]
        assert (en.n_docs, en.n_null_text, en.total_tokens) == (3, 1, 5)
        # NULL text excluded from shape stats: docs of 3 and 2 tokens
        assert en.mean_tokens == 2.5 and en.p50_tokens == 2.5
        assert (en.min_tokens, en.max_tokens) == (2, 3)
        assert en.total_chars == len("one two three") + len("four five")
        assert en.share == 0.75
        assert out["de"].share == 0.25

    def test_all_null_group(self, spark):
        from pyspark.sql import Row
        df = spark.createDataFrame([Row(lang="xx", text=None)],
                                   "lang string, text string")
        r = textstats.corpus_report(df, by="lang").collect()[0]
        assert r.total_tokens == 0 and r.total_chars == 0
        assert r.mean_tokens is None and r.p50_tokens is None
