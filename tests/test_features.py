"""Tier F parity: windowed features vs a single-node pandas oracle, plus the
adversarial zero-temporal-leakage checks (FIXTURES.md §4)."""

import numpy as np
import pandas as pd
import pytest

from trafaret_spark.datagen import transcripts
from trafaret_spark.operators.features import (
    Features, LeakageError, backfill, session_stats, sessionize,
)


@pytest.fixture(scope="module")
def table(spark):
    df = transcripts(spark, n_convs=25, hot_convs=1, hot_turns=800, seed=42)
    df = df.withColumn("text_len", df.text.substr(1, 10).isNotNull().cast("int"))
    from pyspark.sql import functions as F
    df = df.withColumn("text_len", F.length("text").cast("double"))
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return df, pdf


def sorted_pd(df):
    return (df.toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_lag_and_rolling_match_pandas(table):
    df, pdf = table
    feats = (Features(by="conv_id", order="turn_idx", ts="ts")
             .lag("text_len", 1)
             .lag("role", 2, name="role_lag2")
             .rolling("text_len", "avg", 3, name="len_avg3")
             .rolling("text_len", "sum", 5, name="len_sum5")
             .cum("text_len", "sum", name="len_cum"))
    got = sorted_pd(feats.apply(df))

    g = pdf.groupby("conv_id", sort=False)
    exp_lag = g["text_len"].shift(1)
    exp_role2 = g["role"].shift(2)
    exp_avg3 = g["text_len"].rolling(3, min_periods=1).mean().reset_index(drop=True)
    exp_sum5 = g["text_len"].rolling(5, min_periods=1).sum().reset_index(drop=True)
    exp_cum = g["text_len"].cumsum()

    assert np.allclose(got["text_len_lag1"].astype(float), exp_lag, equal_nan=True)
    assert (got["role_lag2"].fillna("∅") == exp_role2.fillna("∅")).all()
    assert np.allclose(got["len_avg3"].astype(float), exp_avg3)
    assert np.allclose(got["len_sum5"].astype(float), exp_sum5)
    assert np.allclose(got["len_cum"].astype(float), exp_cum)


def test_rolling_time_window(table):
    df, pdf = table
    got = sorted_pd(Features().rolling_time("text_len", "sum", 600,
                                            name="len_10m").apply(df))
    exp = (pdf.set_index("ts").groupby("conv_id", sort=False)["text_len"]
           .rolling("600s").sum().reset_index(drop=True))
    assert np.allclose(got["len_10m"].astype(float), exp)


def test_sessionize_matches_pandas(table):
    df, pdf = table
    got = sorted_pd(sessionize(df, gap_seconds=1800))
    g = pdf.groupby("conv_id", sort=False)["ts"]
    gap = g.diff().dt.total_seconds()
    exp = (gap > 1800).astype(int).groupby(pdf["conv_id"], sort=False).cumsum()
    assert (got["session_id"].astype(int) == exp).all()
    # session boundaries actually occur in the synthetic data
    assert got["session_id"].max() >= 1


def test_backfill_matches_pandas(table):
    df, pdf = table
    got = sorted_pd(backfill(df, ["tool"]))
    exp = pdf.groupby("conv_id", sort=False)["tool"].ffill()
    assert (got["tool_ffill"].fillna("∅") == exp.fillna("∅")).all()


def test_session_stats(table):
    df, pdf = table
    stats = session_stats(sessionize(df, gap_seconds=1800)).toPandas()
    assert (stats["n_turns"] >= 1).all()
    assert stats.groupby("conv_id")["n_turns"].sum().sum() == len(pdf)


def test_lead_rejected_in_point_in_time_mode(table):
    df, _ = table
    f = Features().lead("text_len", 1)
    with pytest.raises(LeakageError):
        f.apply(df)
    out = f.apply(df, point_in_time=False)
    assert "text_len_lead1" in out.columns


def test_prefix_invariance_zero_leakage(spark, table):
    """Recompute features on a time-truncated table → features for surviving
    rows are unchanged (no feature reads a future turn)."""
    df, pdf = table
    feats = (Features()
             .lag("text_len", 1).rolling("text_len", "avg", 3)
             .session_id(1800).backfill("tool").cum("text_len"))
    full = sorted_pd(feats.apply(df))

    cutoff = pdf["ts"].quantile(0.6)
    trunc = df.filter(df.ts <= str(cutoff))
    part = sorted_pd(feats.apply(trunc))

    merged = full.merge(part, on=["conv_id", "turn_idx"], suffixes=("", "_t"))
    assert len(merged) == len(part)
    for c in ["text_len_lag1", "text_len_avg3", "session_id",
              "tool_ffill", "text_len_cumsum"]:
        a, b = merged[c], merged[f"{c}_t"]
        if a.dtype.kind in "fi":
            assert np.allclose(a.astype(float), b.astype(float), equal_nan=True), c
        else:
            assert (a.fillna("∅") == b.fillna("∅")).all(), c


def test_stable_ordering_text_byte_equal(spark):
    """Byte-equal text under stable (conv_id, turn_idx) order across two
    independent computations with different partitioning (SURVEY.md E10)."""
    a = transcripts(spark, n_convs=12, seed=42, hot_convs=0).repartition(7)
    b = transcripts(spark, n_convs=12, seed=42, hot_convs=0).repartition(3)
    pa = a.orderBy("conv_id", "turn_idx").toPandas()
    pb = b.orderBy("conv_id", "turn_idx").toPandas()
    assert (pa["text"].values == pb["text"].values).all()
    assert (pa["ts"].values == pb["ts"].values).all()
