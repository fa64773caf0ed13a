#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count, sorted column names, and an order-insensitive
value hash.  Exit 1 on any mismatch.

Usage: python3 tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

# the driver gate runs at sf0.01; override to time a query
# cross-engine at another scale (e.g. .bench_sf1 / .bench_sf10)
SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_DIR", "/root/testdata/sf0.01")


def canon_value(v) -> str:
    import datetime as dt
    import math

    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from dystonse_gtfs_importer_spark.session import get_spark
    from dystonse_gtfs_importer_spark.sources import testdata

    # nothing shadows the canonical views in a checker run
    testdata.MEMOIZE_VIEWS = True

    only = set(sys.argv[1:])
    spark = get_spark(app_name="check-correctness")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0

        if name not in oracles:
            print(f"  {name:24s} rows={len(s_rows):7d}  (rows-only, no oracle) "
                  f"[{spark_s:5.1f}s]")
            if len(s_rows) == 0:
                failures.append((name, "zero rows in rows-only check"))
            continue

        t0 = time.time()
        cur = con.execute(oracles[name])
        d_cols = [c[0] for c in cur.description]
        d_rows = cur.fetchall()
        duck_s = time.time() - t0

        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} != {sorted(d_cols)}")
        if not problems:
            hs, hd = frame_digest(s_cols, s_rows), frame_digest(d_cols, d_rows)
            if hs != hd:
                problems.append(f"value hash {hs} != {hd}")
                # show first differing rows for debugging
                ss = sorted("|".join(canon_value(v) for v in
                            (r[i] for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i])))
                            for r in s_rows)
                dd = sorted("|".join(canon_value(v) for v in
                            (r[i] for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i])))
                            for r in d_rows)
                for a, b in zip(ss, dd):
                    if a != b:
                        problems.append(f"  spark: {a[:160]}")
                        problems.append(f"  duck : {b[:160]}")
                        break
        status = "OK " if not problems else "FAIL"
        print(f"  {name:24s} rows={len(s_rows):7d}  {status} "
              f"[spark {spark_s:5.1f}s duck {duck_s:5.2f}s]")
        for p in problems:
            print(f"      {p}")
        if problems:
            failures.append((name, problems[0]))

    print()
    if failures:
        print(f"FAILED: {len(failures)} of {len(qs)} queries")
        for n, p in failures:
            print(f"  {n}: {p}")
        return 1
    print(f"all {len([n for n in qs if not only or n in only])} queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
