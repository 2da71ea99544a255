#!/usr/bin/env python3
"""Build a synthetic Nx scale copy of a testdata dir for scaling-slope runs.

Usage: python3 tools/make_scaled.py <src_sf_dir> <dst_dir> [N=5]

Fact tables (events, orders, lineitem, documents, embeddings) are
replicated N times with OFFSET surrogate keys — copy i gets key + i*OFFSET
— so uniqueness properties survive (first-seen dedup, exact dedup, join
cardinalities stay honest). Foreign keys into DIMENSION tables are left
untouched and the dims are copied unscaled: dims don't grow with facts,
which is exactly the 100 TB shape (the broadcast side stays broadcast-able
while the fact side grows).

Caveat for interpretation (same as SCALING.md round 2): the replicated
corpus makes every doc an EXACT/near duplicate of its copies, so
dedup-family queries do genuinely more output work at Nx — their slope
reads as work growth, not overhead.

Schema/layout preservation: column order comes from DESCRIBE, only the key
columns are rewritten, and DuckDB COPY keeps parquet logical types (incl.
the round-6 TIMESTAMP(MICROS) NTZ events.ts).
"""
import os
import sys

import duckdb

src = sys.argv[1]
dst = sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
OFFSET = 10 ** 12

# table -> columns that get the per-copy offset
FACTS = {
    "events": {"event_id", "user_id"},
    "orders": {"o_orderkey"},
    "lineitem": {"l_orderkey"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

for t in DIMS:
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied unscaled")

for t, keys in FACTS.items():
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]
    parts = []
    for i in range(n):
        sel = ", ".join(
            f"{c} + {i * OFFSET} AS {c}" if c in keys and i > 0 else c
            for c in cols)
        parts.append(
            f"SELECT {sel} FROM read_parquet('{src}/{t}.parquet')")
    union = "\nUNION ALL\n".join(parts)
    con.execute(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    rows = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {rows} rows ({n}x, offset keys: {sorted(keys)})")
