#!/usr/bin/env python3
"""Build an N-fold key-offset replica of a testdata scale factor for
stress runs (bench + oracle sweeps) at scales the driver does not ship.

Each copy's key columns shift by copy_index * 100M, so every copy is a
self-contained join universe: joins, asofs and aggregations produce
exactly N-fold results, and near-dup operators see N exact copies of
every document (duplicate-PAIR outputs therefore grow quadratically —
a property of this replica, not of the plans).

The r10 sf1-equivalent sweep built this way caught a real scale bug
(withRowIndex row loss under divergent AQE coalescing) that sf0.1 and
below could not reproduce.

Usage: make_stress.py [src_sf_dir] [dst_dir] [copies]
"""
import sys
import duckdb, os

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfstress"
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
K = 100_000_000

KEYCOLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for t, keys in KEYCOLS.items():
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
    sel = ", ".join(
        f"({c} + i * {K}) AS {c}" if c in keys else c for c in cols)
    con.execute(
        f"""COPY (SELECT {sel} FROM '{src}/{t}.parquet', range({n}) r(i))
            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
    cnt = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(t, cnt)
