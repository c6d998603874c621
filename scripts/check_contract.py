"""Simulate the driver's correctness gate: run every __spark_entry__ query
at sf0.01 and diff against its DuckDB oracle (row count, schema, values).

The driver runs a DEFAULT Spark 4 session — spark.sql.ansi.enabled=true —
while the library's own get_spark() pins ANSI off. Both modes must be green
(round 1 shipped 19 ANSI-only crashes because this gate only ran ANSI-off),
so the gate defaults to ANSI ON and `--ansi-off` selects the legacy mode.

Usage: python scripts/check_contract.py [--ansi-off] [query ...]
"""
from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402
from trafaret_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: "NULL" if pd.isna(v) else str(v))
        try:
            df[c] = df[c].astype("float64").round(9)
        except (ValueError, TypeError):
            pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    args = sys.argv[1:]
    ansi = "true"
    if "--ansi-off" in args:
        args.remove("--ansi-off")
        ansi = "false"
    only = set(args)
    spark = get_spark(cores=8, **{"spark.sql.ansi.enabled": ansi})
    print(f"== spark.sql.ansi.enabled = {spark.conf.get('spark.sql.ansi.enabled')}")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failed = []
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        timings[name] = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            if len(sdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {e}")
            failed.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        if len(a) != len(b):
            print(f"FAIL  {name}: rowcount spark={len(a)} duck={len(b)}")
            failed.append(name)
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failed.append(name)
            continue
        diff_cols = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                eq = ((av - bv).abs() < 1e-9) | (av.isna() & bv.isna())
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                diff_cols.append((c, bad, av[bad], bv[bad], int((~eq).sum())))
        if diff_cols:
            print(f"FAIL  {name}: value diffs {diff_cols[:3]}")
            failed.append(name)
        else:
            print(f"OK    {name}: {len(a)} rows  [{timings[name]:.2f}s]")
    if timings:
        worst = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
        print("\n== slowest spark-side queries:",
              ", ".join(f"{n}={t:.2f}s" for n, t in worst))
    print("\n==", "ALL OK" if not failed else f"FAILED: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
