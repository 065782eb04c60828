#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify output
against DuckDB oracles (sort columns by name, sort rows, compare values).
Usage: check.py [sf_dir] [out_dir]
"""
import duckdb, glob, json, math, os, sys
import numpy as np
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # dtype-faithful rendering (driver's hash is dtype-sensitive): a
    # float64 2427.0 and an int64 2427 must NOT collide, or a DuckDB
    # HUGEINT/DECIMAL widening passes locally and fails at the gate.
    def keyify(v):
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return str(v)
        if isinstance(v, (float, np.floating)):
            if math.isnan(v):
                return "NaN#f"
            return f"{float(v):.17g}#f"
        if isinstance(v, (int, np.integer)):
            return f"{int(v)}#i"
        return str(v)
    rows = sorted(tuple(keyify(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows

fails = 0
for name in sorted(oracle):
    d = f"{out_dir}/{name}"
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    gc, gr = norm(got)
    ec, er = norm(exp)
    if [c.lower() for c in gc] != [c.lower() for c in ec]:
        print(f"FAIL {name}: columns {gc} vs {ec}")
        fails += 1
    elif len(gr) != len(er):
        print(f"FAIL {name}: rows {len(gr)} vs {len(er)}")
        fails += 1
    elif gr != er:
        bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
        print(f"FAIL {name}: value mismatch at sorted row {bad}:\n  spark={gr[bad]}\n  duck ={er[bad]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(gr)} rows)")

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in oracle:
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(p)) for p in files) if files else 0
        print(f"{'ROWS' if n > 0 else 'FAIL'} {name} ({n} rows, no oracle)")
        if n == 0:
            fails += 1

sys.exit(1 if fails else 0)
