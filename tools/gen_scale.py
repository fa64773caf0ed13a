#!/usr/bin/env python3
"""Synthesize a larger scale factor from the driver's sf0.1 parquet by
replicating fact tables K times with remapped keys (dims unchanged).

The driver testdata is read-only and tops out at sf0.1, where Spark's
~0.9 s/query session floor dominates the bench; a 10x replica
separates overhead from plan cost (VERDICT r2 item 8).  Replica i
offsets every id-like column by i*stride, so key cardinalities scale
with the data (per-user/per-order row counts stay constant — the
realistic growth mode) and joins keep their selectivity.

Usage: python3 tools/gen_scale.py [K] [out_dir]   (defaults 10, .bench_sf1)
Output dir is gitignored; never writes outside the repo.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"

# id-like columns to offset per table; replicated K times
FACTS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    # FK columns must shift with their dimension's PK (same replica
    # offset), or replicated part/supplier rows dangle and join fan-in
    # grows K-fold on the original key range
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}
DIMS = ["region", "nation"]
STRIDE = 1_000_000_000  # far above any sf0.1 key


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else
               Path(__file__).resolve().parent.parent / ".bench_sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t, keys in FACTS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.i * {STRIDE} AS {c}" if c in keys else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet' "
            f"CROSS JOIN (SELECT UNNEST(RANGE({k})) AS i) r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows (x{k})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
