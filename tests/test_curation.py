"""Deterministic sampling + PII redaction: determinism/nesting properties
and bit-level DuckDB parity (the same checks the driver oracle runs)."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from trafaret_spark.operators import sampling, textstats
from trafaret_spark.operators.hashing import M31


@pytest.fixture(scope="module")
def docs(spark):
    rows = [Row(doc_id=i, lang=["en", "de", "fr"][i % 3],
                text=f"doc {i} body") for i in range(300)]
    return spark.createDataFrame(rows)


class TestSampleByHash:
    def test_deterministic_and_scan_side(self, docs):
        a = {r.doc_id for r in
             sampling.sample_by_hash(docs, "doc_id", 0.3).collect()}
        b = {r.doc_id for r in
             sampling.sample_by_hash(docs, "doc_id", 0.3).collect()}
        assert a == b and 0 < len(a) < 300
        plan = sampling.sample_by_hash(docs, "doc_id", 0.3) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_samples_nest_across_rates(self, docs):
        small = {r.doc_id for r in
                 sampling.sample_by_hash(docs, "doc_id", 0.1).collect()}
        big = {r.doc_id for r in
               sampling.sample_by_hash(docs, "doc_id", 0.4).collect()}
        assert small <= big

    def test_seed_gives_independent_sample(self, docs):
        a = {r.doc_id for r in
             sampling.sample_by_hash(docs, "doc_id", 0.3, seed=0).collect()}
        b = {r.doc_id for r in
             sampling.sample_by_hash(docs, "doc_id", 0.3, seed=1).collect()}
        assert a != b

    def test_rate_bounds(self, docs):
        with pytest.raises(ValueError):
            sampling.sample_by_hash(docs, "doc_id", 1.5)
        assert sampling.sample_by_hash(docs, "doc_id", 0.0).count() == 0
        assert sampling.sample_by_hash(docs, "doc_id", 1.0).count() == 300

    def test_portable_matches_duckdb(self, docs, tmp_path):
        p = str(tmp_path / "docs.parquet")
        docs.write.mode("overwrite").parquet(p)
        got = sorted(r.doc_id for r in
                     sampling.sample_by_hash(docs, "doc_id", 0.25, seed=7,
                                             portable=True).collect())
        thr = int(0.25 * M31)
        exp = sorted(r[0] for r in duckdb.sql(f"""
            SELECT doc_id FROM '{p}/*.parquet'
            WHERE (CAST(concat('0x', substr(md5(
                     concat_ws(chr(31), '7', CAST(doc_id AS VARCHAR))),
                   1, 15)) AS BIGINT) % {M31}) < {thr}""").fetchall())
        assert got == exp and len(got) > 0

    def test_stratified_rates(self, docs):
        out = sampling.stratified_sample_by_hash(
            docs, "lang", {"en": 1.0, "de": 0.0}, key_cols="doc_id")
        langs = {r.lang for r in out.collect()}
        n_en = out.filter(F.col("lang") == "en").count()
        assert "de" not in langs
        assert n_en == docs.filter(F.col("lang") == "en").count()
        assert out.filter(F.col("lang") == "fr").count() == 0  # default 0.0


class TestRedactPII:
    CASES = [
        (1, "mail me at bob.smith+x@example.co.uk today"),
        (2, "server at 10.0.255.3 went down"),
        (3, "call +1 (555) 123-4567 or 555-987-6543"),
        (4, "clean text, nothing to scrub"),
        (5, "two mails a@b.io c@d.org and ip 1.2.3.4"),
        # digit-run safety: 10-digit windows inside longer numeric ids /
        # epoch-ms timestamps must NOT be redacted (boundary-anchored phone)
        (6, "order 17553920000001 at ts 1755392000123 ok"),
        (7, "intl +15551234567 and spaced 1 555 987 6543"),
    ]

    def test_redacts_and_counts(self, spark):
        df = spark.createDataFrame(self.CASES, "doc_id long, text string")
        rows = {r.doc_id: r for r in textstats.redact_pii(df).collect()}
        assert "@" not in rows[1].text and rows[1].n_email == 1
        assert "10.0.255.3" not in rows[2].text and rows[2].n_ipv4 == 1
        assert rows[3].n_phone == 2 and "4567" not in rows[3].text
        assert rows[4].text == "clean text, nothing to scrub"
        assert rows[5].n_email == 2 and rows[5].n_ipv4 == 1
        assert rows[5].text.count("[REDACTED]") == 3
        assert rows[6].text == self.CASES[5][1] and rows[6].n_phone == 0
        assert rows[7].n_phone == 2 and "4567" not in rows[7].text \
            and "6543" not in rows[7].text

    def test_matches_duckdb(self, spark, tmp_path):
        df = spark.createDataFrame(self.CASES, "doc_id long, text string")
        p = str(tmp_path / "pii.parquet")
        df.write.mode("overwrite").parquet(p)
        got = {r.doc_id: (r.text, r.n_email, r.n_ipv4, r.n_phone)
               for r in textstats.redact_pii(df).collect()}
        pats = textstats.PII_PATTERNS
        p_email, p_ipv4, p_phone = pats["email"], pats["ipv4"], pats["phone"]
        red = "text"
        for kind in sorted(pats):
            red = f"regexp_replace({red}, '{pats[kind]}', '[REDACTED]', 'g')"
        exp = {r[0]: (r[1], r[2], r[3], r[4]) for r in duckdb.sql(f"""
            SELECT doc_id, {red} AS text,
                   len(regexp_extract_all(text, '{p_email}')) AS n_email,
                   len(regexp_extract_all(text, '{p_ipv4}')) AS n_ipv4,
                   len(regexp_extract_all(text, '{p_phone}')) AS n_phone
            FROM '{p}/*.parquet'""").fetchall()}
        assert got == exp

    def test_custom_out_col_keeps_original(self, spark):
        df = spark.createDataFrame(self.CASES[:1], "doc_id long, text string")
        out = textstats.redact_pii(df, out_col="clean", counts=False)
        r = out.collect()[0]
        assert "@" in r.text and "@" not in r.clean


class TestAssignSplits:
    WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_total_disjoint_and_deterministic(self, docs):
        out = sampling.assign_splits(docs, "doc_id", self.WEIGHTS, seed=5)
        rows = {r.doc_id: r.split for r in out.collect()}
        assert len(rows) == 300
        assert set(rows.values()) <= set(self.WEIGHTS)
        again = {r.doc_id: r.split for r in
                 sampling.assign_splits(docs, "doc_id", self.WEIGHTS,
                                        seed=5).collect()}
        assert rows == again

    def test_proportions_roughly_match(self, docs):
        out = sampling.assign_splits(docs, "doc_id", self.WEIGHTS, seed=5)
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n"))
                  .collect()}
        assert counts.get("train", 0) > 200          # ~240 expected
        assert 10 < counts.get("val", 0) + counts.get("test", 0) < 120

    def test_train_membership_equals_sample_by_hash(self, docs):
        # same key/seed: split=='train' at weight w IS the rate-w sample —
        # a row's split agrees with its staged-ablation sample membership
        train = {r.doc_id for r in
                 sampling.assign_splits(docs, "doc_id", self.WEIGHTS,
                                        seed=5)
                 .filter(F.col("split") == "train").collect()}
        sample = {r.doc_id for r in
                  sampling.sample_by_hash(docs, "doc_id", 0.8,
                                          seed=5).collect()}
        assert train == sample

    def test_entity_coherence(self, spark):
        rows = [Row(conv_id=f"c{i % 7}", turn_idx=i) for i in range(70)]
        out = sampling.assign_splits(spark.createDataFrame(rows),
                                     "conv_id", self.WEIGHTS)
        per_conv = (out.groupBy("conv_id")
                    .agg(F.countDistinct("split").alias("k")).collect())
        assert all(r.k == 1 for r in per_conv)

    def test_bad_weights_raise(self, docs):
        with pytest.raises(ValueError, match="sum to 1"):
            sampling.assign_splits(docs, "doc_id", {"a": 0.5, "b": 0.4})
        with pytest.raises(ValueError, match="non-empty"):
            sampling.assign_splits(docs, "doc_id", {})
        with pytest.raises(ValueError, match="non-negative"):
            sampling.assign_splits(docs, "doc_id", {"a": 1.5, "b": -0.5})
