"""End-to-end curation pipeline: quarantine -> stutter -> exact dedup ->
near-dup -> truncate -> bucketed write, with the per-stage audit."""

import datetime as dt

import pytest
from pyspark.sql import Row

from trafaret_spark.curation_pipeline import CurationConfig, run_curation


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _turns(conv, texts, start_role="user", stutter_at=None, ts_shift=0):
    rows = []
    for i, txt in enumerate(texts):
        role = (start_role if i == 0
                else ("assistant" if i % 2 == 1 else "user"))
        rows.append(Row(conv_id=conv, turn_idx=i, role=role, text=txt,
                        ts=_ts(i + ts_shift)))
        if stutter_at == i:
            rows.append(Row(conv_id=conv, turn_idx=i + 100, role=role,
                            text=txt, ts=_ts(i + ts_shift)))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    words = ["alpha beta gamma delta", "epsilon zeta eta theta",
             "iota kappa lambda mu", "nu xi omicron pi"]
    rows = []
    rows += _turns("a", words)                        # clean
    rows += _turns("a_copy", words)                   # exact dup of a
    rows += _turns("a_near", words[:-1]
                   + ["nu xi omicron EDITED"])        # near-dup of a
    rows += _turns("bad", words, start_role="tool")   # illegal opener
    # 'c' carries a retry echo (assistant turn repeated): stutter dedup
    # must repair it BEFORE the structural check — validate-first would
    # flag the echo as a bad_transition and quarantine the conversation
    rows += _turns("c", ["one two three four five six seven"] * 2,
                   stutter_at=1)
    return spark.createDataFrame(rows)


class TestRunCuration:
    def test_full_dag_audit_and_output(self, spark, corpus, tmp_path):
        cfg = CurationConfig(output_path=str(tmp_path / "out"),
                             quarantine_path=str(tmp_path / "quar"),
                             neardup_threshold=0.5, max_tokens=12,
                             n_buckets=4)
        audit = run_curation(spark, corpus, cfg)
        st = audit["stages"]
        assert st["input"]["conversations"] == 5
        # stutter repair removed c's echo turn but no conversation
        assert st["stutter"]["conversations"] == 5
        assert st["stutter"]["turns"] == st["input"]["turns"] - 1
        # structural ran on the REPAIRED corpus: 'bad' (illegal opener)
        # quarantined; 'c' (echo now gone) survives
        assert st["structural"]["conversations"] == 4
        assert st["exact_dedup"]["conversations"] == 3     # a_copy gone
        assert st["near_dedup"]["conversations"] == 2      # a_near gone
        # truncation drops turns, never conversations
        assert st["truncate"]["conversations"] == 2
        assert st["truncate"]["turns"] < st["near_dedup"]["turns"]

        out = spark.read.parquet(str(tmp_path / "out"))
        assert set(r.conv_id for r in
                   out.select("conv_id").distinct().collect()) == {"a", "c"}
        assert "bucket" in out.columns
        quar = spark.read.parquet(str(tmp_path / "quar"))
        assert set(r.conv_id for r in
                   quar.select("conv_id").distinct().collect()) == {"bad"}

    def test_surviving_rows_byte_identical(self, spark, corpus, tmp_path):
        cfg = CurationConfig(output_path=str(tmp_path / "out2"),
                             neardup_threshold=0.5, n_buckets=2)
        run_curation(spark, corpus, cfg)
        out = spark.read.parquet(str(tmp_path / "out2")).drop("bucket")
        got = sorted(map(tuple, out.collect()))
        # survivors = a and c minus c's stutter-echo row (turn_idx 101)
        want = sorted(map(tuple, corpus.filter(
            corpus.conv_id.isin("a", "c")
            & (corpus.turn_idx < 100)).collect()))
        assert got == want

    def test_stages_optional(self, spark, corpus, tmp_path):
        cfg = CurationConfig(output_path=str(tmp_path / "out3"),
                             neardup_threshold=None, max_tokens=None,
                             drop_invalid=False, n_buckets=2)
        audit = run_curation(spark, corpus, cfg)
        assert "structural" not in audit["stages"]
        assert "near_dedup" not in audit["stages"]
        assert "truncate" not in audit["stages"]
        # exact dedup still ran: a_copy collapsed, near-dup kept
        assert audit["final"]["conversations"] == 4


class TestIdempotence:
    def test_second_pass_removes_nothing(self, spark, corpus, tmp_path):
        # survivors of one full curation pass share no near-dup pairs (a
        # cross-survivor pair would have merged their components), so a
        # second identical pass must be the identity on the corpus
        cfg1 = CurationConfig(output_path=str(tmp_path / "p1"),
                              neardup_threshold=0.5, n_buckets=2)
        run_curation(spark, corpus, cfg1)
        once = spark.read.parquet(str(tmp_path / "p1")).drop("bucket")
        cfg2 = CurationConfig(output_path=str(tmp_path / "p2"),
                              neardup_threshold=0.5, n_buckets=2)
        audit2 = run_curation(spark, once, cfg2)
        twice = spark.read.parquet(str(tmp_path / "p2")).drop("bucket")
        assert sorted(map(tuple, once.collect())) == \
            sorted(map(tuple, twice.collect()))
        s2 = audit2["stages"]
        counts = ["turns", "conversations"]
        assert [s2["input"][k] for k in counts] == \
            [s2["near_dedup"][k] for k in counts] == \
            [audit2["final"][k] for k in counts]
        # default on_drop="warn" records the hot-bucket cap's drop counts
        # in the near-dup stage audit (r4 verdict #1) — zero here
        assert s2["near_dedup"]["dropped_buckets"] == 0
        assert s2["near_dedup"]["dropped_rows"] == 0
