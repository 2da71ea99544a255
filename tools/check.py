#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfdir] [verify_out]

Loads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL in DuckDB over the same testdata tables, sorts columns by name
and rows by value, and diffs. Exact for ints/strings; doubles compared to
1e-9 relative (the driver hashes — we flag anything not bit-identical too).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))

def canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), na_position="first",
                          kind="mergesort").reset_index(drop=True)

n_pass = n_fail = n_noor = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    got = pq.ParquetDataset(files).read().to_pandas()
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(got)} rows")
        n_noor += 1
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"  [ORACLE-ERR] {name}: {e}")
        n_fail += 1
        continue
    g, e = canon(got), canon(exp)
    ok = True
    if list(g.columns) != list(e.columns):
        print(f"  [FAIL] {name}: columns spark={list(g.columns)} duck={list(e.columns)}")
        ok = False
    elif len(g) != len(e):
        print(f"  [FAIL] {name}: rows spark={len(g)} duck={len(e)}")
        ok = False
    else:
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                bad = ~((pd.isna(gv) & pd.isna(ev)) |
                        np.isclose(gv.astype(float), ev.astype(float),
                                   rtol=1e-9, atol=1e-12, equal_nan=True))
                exact = np.array_equal(gv, ev, equal_nan=True)
                if bad.any():
                    i = int(np.argmax(bad))
                    print(f"  [FAIL] {name}.{c}: row {i} spark={gv[i]!r} duck={ev[i]!r}")
                    ok = False
                elif not exact:
                    print(f"  [warn] {name}.{c}: doubles close but not bit-identical")
            else:
                gs = pd.Series(gv, dtype=object).where(pd.notna(pd.Series(gv)), "\x00NULL")
                es = pd.Series(ev, dtype=object).where(pd.notna(pd.Series(ev)), "\x00NULL")
                if not (gs.astype(str) == es.astype(str)).all():
                    bad = (gs.astype(str) != es.astype(str))
                    i = int(np.argmax(bad.values))
                    print(f"  [FAIL] {name}.{c}: row {i} spark={gv[i]!r} duck={ev[i]!r}")
                    ok = False
    if ok:
        print(f"  [ok] {name}: {len(g)} rows")
        n_pass += 1
    else:
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {n_noor} rows-only")
sys.exit(1 if n_fail else 0)
