#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each <out_dir>/<name> parquet (Spark result), runs the matching SQL
from oracle_sql.json under DuckDB with views over <sf_dir>/*.parquet, then
compares: columns sorted by name, rows sorted by all columns, exact value
equality (with a tiny float report if exactness fails).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # unify null spellings (None vs NaN in object cols) before compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


fails = 0
for name, sql in sorted(oracle.items()):
    spath = os.path.join(outdir, name)
    if not os.path.exists(spath):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    try:
        sdf = pd.read_parquet(spath)
    except Exception as e:
        print(f"FAIL {name}: cannot read spark parquet: {e}")
        fails += 1
        continue
    try:
        ddf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails += 1
        continue
    s, d = norm(sdf), norm(ddf)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fails += 1
        continue
    ok = True
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        try:
            eq = pd.Series(a).astype(str).equals(pd.Series(b).astype(str))
        except Exception:
            eq = False
        if not eq:
            # numeric tolerance report
            try:
                fa = pd.to_numeric(s[c], errors="coerce").to_numpy(dtype=float)
                fb = pd.to_numeric(d[c], errors="coerce").to_numpy(dtype=float)
                diff = np.nanmax(np.abs(fa - fb))
                print(f"FAIL {name}: col {c} differs (max abs diff {diff:.3e}; "
                      f"spark[:3]={a[:3]} duck[:3]={b[:3]})")
            except Exception:
                print(f"FAIL {name}: col {c} differs (spark[:3]={a[:3]} duck[:3]={b[:3]})")
            ok = False
    if ok:
        print(f"PASS {name} ({len(s)} rows)")
    else:
        fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
