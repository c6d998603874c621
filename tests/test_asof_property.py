"""Property-based as-of join parity: random tables vs pandas.merge_asof.

Hypothesis generates adversarial shapes the fixed fixtures may miss: empty
sides, all-ties, single-conversation, duplicate timestamps on both sides,
tolerance boundaries landing exactly on a gap.
"""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trafaret_spark.operators.asof import asof_join

BASE = dt.datetime(2026, 3, 1)


def make_strategy():
    # (conv, offset_seconds, value) rows; small key/ts domains force ties
    row = st.tuples(st.integers(0, 3), st.integers(0, 120), st.integers(0, 999))
    return st.tuples(st.lists(row, min_size=1, max_size=25),
                     st.lists(row, min_size=0, max_size=25),
                     st.sampled_from(["backward", "forward"]),
                     st.sampled_from([None, 30.0]),
                     st.booleans())


def to_pandas(rows, vcol):
    df = pd.DataFrame({
        "conv_id": pd.Series([f"c{c}" for c, _, _ in rows], dtype="string"),
        "ts": pd.Series([BASE + dt.timedelta(seconds=s) for _, s, _ in rows],
                        dtype="datetime64[ns]"),
        vcol: pd.Series([v for _, _, v in rows], dtype="int64"),
    })
    return df


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(make_strategy())
def test_asof_matches_pandas_merge_asof(spark, case):
    lrows, rrows, direction, tolerance, exact = case
    lpd = to_pandas(lrows, "lv").sort_values("ts").reset_index(drop=True)
    rpd = to_pandas(rrows, "rv").sort_values("ts").reset_index(drop=True)
    # pandas merge_asof needs a unique row id to compare row-by-row later
    lpd["rid"] = range(len(lpd))

    expect = pd.merge_asof(
        lpd, rpd, on="ts", by="conv_id", direction=direction,
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
        allow_exact_matches=exact)

    # among exact-ts right ties pandas picks the LAST row for backward and
    # the FIRST for forward; our window's pick among ties is tie-order
    # dependent. To keep the property exact, collapse right-side ts ties to
    # the row pandas would choose before feeding Spark.
    pick = "last" if direction == "backward" else "first"
    rpd_dedup = rpd.groupby(["conv_id", "ts"], as_index=False).agg(pick)

    ldf = spark.createDataFrame(lpd)
    rdf = spark.createDataFrame(rpd_dedup,
                                "conv_id string, ts timestamp, rv long")
    got = asof_join(ldf, rdf, on="ts", by="conv_id", direction=direction,
                    tolerance=tolerance, suffix="_r",
                    allow_exact_matches=exact).toPandas()
    got = got.sort_values("rid").reset_index(drop=True)
    expect = expect.sort_values("rid").reset_index(drop=True)

    assert len(got) == len(expect)
    for i in range(len(expect)):
        e, g = expect["rv"].iloc[i], got["rv_r"].iloc[i]
        assert (pd.isna(e) and pd.isna(g)) or e == g, \
            (i, e, g, direction, tolerance, exact)


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(make_strategy())
def test_tie_break_reproduces_pandas_exactly(spark, case):
    """With tie_break = input-order index, the engine matches merge_asof on
    DUPLICATED right timestamps too (no collapsing needed)."""
    lrows, rrows, direction, tolerance, exact = case
    lpd = to_pandas(lrows, "lv").sort_values("ts").reset_index(drop=True)
    rpd = to_pandas(rrows, "rv").sort_values("ts").reset_index(drop=True)
    lpd["rid"] = range(len(lpd))
    rpd["tb"] = range(len(rpd))  # merge_asof tie rule = input order

    expect = pd.merge_asof(
        lpd, rpd.drop(columns=["tb"]), on="ts", by="conv_id",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
        allow_exact_matches=exact)

    ldf = spark.createDataFrame(lpd)
    rdf = spark.createDataFrame(rpd, "conv_id string, ts timestamp, rv long, tb long")
    got = asof_join(ldf, rdf, on="ts", by="conv_id", direction=direction,
                    tolerance=tolerance, suffix="_r",
                    allow_exact_matches=exact, tie_break="tb").toPandas()
    got = got.sort_values("rid").reset_index(drop=True)
    expect = expect.sort_values("rid").reset_index(drop=True)
    for i in range(len(expect)):
        e, g = expect["rv"].iloc[i], got["rv_r"].iloc[i]
        assert (pd.isna(e) and pd.isna(g)) or e == g, \
            (i, e, g, direction, tolerance, exact)


@pytest.mark.usefixtures("spark")
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(make_strategy())
def test_nearest_matches_pandas_gap(spark, case):
    """direction='nearest' parity via the |gap| invariant: whatever row the
    tie rules pick, the matched distance must equal pandas' minimal
    distance, and null-ness must agree (robust to equidistant ties, where
    the picked ROW may legitimately differ)."""
    lrows, rrows, _direction, tolerance, _exact = case
    lpd = to_pandas(lrows, "lv").sort_values("ts").reset_index(drop=True)
    rpd = to_pandas(rrows, "rv").sort_values("ts").reset_index(drop=True)
    lpd["rid"] = range(len(lpd))
    rpd["rts"] = rpd["ts"]  # carry the matched right ts through the merge

    expect = pd.merge_asof(
        lpd, rpd, on="ts", by="conv_id", direction="nearest",
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None)

    ldf = spark.createDataFrame(lpd)
    rdf = spark.createDataFrame(rpd,
                                "conv_id string, ts timestamp, rv long, rts timestamp")
    got = asof_join(ldf, rdf, on="ts", by="conv_id", direction="nearest",
                    tolerance=tolerance, suffix="_r").toPandas()
    got = got.sort_values("rid").reset_index(drop=True)
    expect = expect.sort_values("rid").reset_index(drop=True)

    assert len(got) == len(expect)
    for i in range(len(expect)):
        e_rts, g_rts = expect["rts"].iloc[i], got["rts_r"].iloc[i]
        assert pd.isna(e_rts) == pd.isna(g_rts), (i, e_rts, g_rts, tolerance)
        if not pd.isna(e_rts):
            lts = expect["ts"].iloc[i]
            assert abs(lts - e_rts) == abs(lts - g_rts), \
                (i, lts, e_rts, g_rts, tolerance)
