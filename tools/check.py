#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle comparison.

Usage: python3 tools/check.py [sfDir] [outDir]

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each query's
parquet dump, runs the matching oracle SQL in DuckDB over the testdata
tables, and compares (rows sorted, columns sorted by name, exact + tolerant
float compare). Driver-side tooling only — not part of the shipped library.
"""
import json
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
# optional comma-separated allowlist: check only these queries (the fuzz
# harness dumps a subset; missing-dump reporting is restricted to match)
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
if ONLY is not None:
    oracle = {k: v for k, v in oracle.items() if k in ONLY}

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # unify ns/us units
        if str(df[c].dtype) in ("datetime64[us]", "datetime64[ns]"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) == "date32[day][pyarrow]":
            df[c] = pd.to_datetime(df[c])
        if df[c].dtype == object and len(df) and isinstance(
                df[c].dropna().iloc[0] if df[c].notna().any() else None,
                __import__("datetime").date):
            df[c] = pd.to_datetime(df[c])
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="last")
    return df

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        mine = pd.read_parquet(f"{OUT}/{name}")
        theirs = con.execute(sql).df()
        a, b = normalize(mine), normalize(theirs)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        exact = True
        maxdiff = 0.0
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                ae, be = a[c].fillna(-1e308), b[c].astype(float).fillna(-1e308)
                d = (ae - be).abs().max()
                maxdiff = max(maxdiff, d)
                if d != 0:
                    exact = False
            else:
                if not a[c].astype(str).equals(b[c].astype(str)):
                    exact = False
                    bad = (a[c].astype(str) != b[c].astype(str))
                    i = bad.idxmax()
                    print(f"  [{name}] col {c} first diff at row {i}: "
                          f"{a[c][i]!r} vs {b[c][i]!r}")
                    maxdiff = float("inf")
        if exact:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        elif maxdiff < 1e-9:
            print(f"pass~ {name} ({len(a)} rows, float maxdiff {maxdiff:.2e})")
            n_pass += 1
        else:
            print(f"FAIL {name}: maxdiff {maxdiff}")
            n_fail += 1
    except Exception as ex:
        print(f"ERROR {name}: {ex}")
        n_fail += 1

dumped = set(os.listdir(OUT)) if os.path.isdir(OUT) else set()
missing = sorted(k for k in oracle if k not in dumped)
if missing:
    print(f"\nMISSING dumps (oracle declared, no parquet): {missing}")
print(f"\n{n_pass} pass, {n_fail} fail / {len(oracle)} oracle queries")
sys.exit(1 if n_fail else 0)
