"""Tier F parity: asof_join vs pandas.merge_asof on deterministic synthetic
transcripts (FIXTURES.md §4)."""

import numpy as np
import pandas as pd
import pytest

from trafaret_spark.datagen import conv_events, transcripts
from trafaret_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def tables(spark):
    left = transcripts(spark, n_convs=30, hot_convs=1, hot_turns=500, seed=42)
    right = conv_events(spark, n_convs=30, seed=42)
    lpd = left.toPandas().sort_values(["ts", "conv_id"]).reset_index(drop=True)
    rpd = (right.toPandas().drop_duplicates(subset=["conv_id", "ts"])
           .sort_values(["ts", "conv_id"]).reset_index(drop=True))
    return left, right.dropDuplicates(["conv_id", "ts"]), lpd, rpd


def oracle(lpd, rpd, direction, tolerance=None, allow_exact=True):
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    return pd.merge_asof(lpd, rpd, on="ts", by="conv_id", direction=direction,
                         allow_exact_matches=allow_exact, **kw)


def compare(got_df, exp_pd):
    got = (got_df.toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    exp = exp_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.allclose(got["score"].astype(float), exp["score"].astype(float),
                       equal_nan=True)
    assert (got["state"].fillna("∅") == exp["state"].fillna("∅")).all()
    # per-turn text byte-equality under stable (conv_id, turn_idx) order
    assert (got["text"].values == exp["text"].values).all()


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_sort_strategy(tables, direction):
    left, right, lpd, rpd = tables
    got = asof_join(left, right, on="ts", by="conv_id", direction=direction)
    compare(got, oracle(lpd, rpd, direction))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance(tables, direction):
    left, right, lpd, rpd = tables
    got = asof_join(left, right, on="ts", by="conv_id",
                    direction=direction, tolerance=900)
    compare(got, oracle(lpd, rpd, direction, tolerance=900))


def test_asof_no_exact_matches(tables):
    left, right, lpd, rpd = tables
    got = asof_join(left, right, direction="backward", allow_exact_matches=False)
    compare(got, oracle(lpd, rpd, "backward", allow_exact=False))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_broadcast_strategy(tables, direction):
    left, right, lpd, rpd = tables
    got = asof_join(left, right, direction=direction, strategy="broadcast",
                    tolerance=1200)
    compare(got, oracle(lpd, rpd, direction, tolerance=1200))


def test_broadcast_duplicate_left_rows_preserved(spark):
    """Broadcast-path row identity is content-derived (retry-stable, r2
    verdict #5): fully-identical left rows must each appear in the output
    with the same match — collapsed for the pick, re-expanded after."""
    left = spark.createDataFrame(
        [("c", 1, "2026-01-01 10:00:00")] * 3 + [("c", 2, "2026-01-01 11:00:00")],
        "conv_id string, turn_idx int, ts string",
    ).selectExpr("conv_id", "turn_idx", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("c", "2026-01-01 09:30:00", 7.0), ("c", "2026-01-01 10:30:00", 9.0)],
        "conv_id string, ts string, score double",
    ).selectExpr("conv_id", "cast(ts as timestamp) ts", "score")
    got = asof_join(left, right, strategy="broadcast").toPandas() \
        .sort_values(["turn_idx"]).reset_index(drop=True)
    assert len(got) == 4
    assert list(got["turn_idx"]) == [1, 1, 1, 2]
    assert list(got["score"]) == [7.0, 7.0, 7.0, 9.0]


def test_exact_tie_is_included_backward(spark):
    left = spark.createDataFrame(
        [("c", 0, "2026-01-01 10:00:00")],
        "conv_id string, turn_idx int, ts string",
    ).selectExpr("conv_id", "turn_idx", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("c", "2026-01-01 10:00:00", 1.0)],
        "conv_id string, ts string, score double",
    ).selectExpr("conv_id", "cast(ts as timestamp) ts", "score")
    got = asof_join(left, right).collect()
    assert got[0]["score"] == 1.0
    got2 = asof_join(left, right, allow_exact_matches=False).collect()
    assert got2[0]["score"] is None


def test_no_cross_conversation_bleed(spark):
    left = spark.createDataFrame(
        [("a", 0, "2026-01-01 10:00:00"), ("b", 0, "2026-01-01 11:00:00")],
        "conv_id string, turn_idx int, ts string",
    ).selectExpr("conv_id", "turn_idx", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("a", "2026-01-01 09:00:00", 7.0)],
        "conv_id string, ts string, score double",
    ).selectExpr("conv_id", "cast(ts as timestamp) ts", "score")
    got = {r["conv_id"]: r["score"] for r in asof_join(left, right).collect()}
    assert got == {"a": 7.0, "b": None}
