#!/usr/bin/env python3
"""Cross-engine dtype audit: run every ``queries()`` entry on Spark and
its ``oracle_sql()`` twin on DuckDB at sf0.001 and diff the PANDAS
dtypes of the two results column by column.

The driver's correctness gate canonicalizes through pandas, so a column
that is int64 on one engine and float64 on the other (DuckDB HUGEINT →
float64 is the classic) — or an array cell (unhashable ndarray) — can
hash-diverge or crash the gate even when every VALUE agrees.  The
lenient value-canon in check_correctness.py hides exactly this class;
this audit surfaces it.

Usage: python3 tools/audit_dtypes.py [name ...]   (exit 1 on findings)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_DIR", "/root/testdata/sf0.001")

# int-ish dtypes we treat as equivalent across engines
_INT = {"int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
        "uint64", "Int32", "Int64"}
_FLOAT = {"float32", "float64"}


def _kind(dtype, sample) -> str:
    s = str(dtype)
    if s in _INT:
        return "int"
    if s in _FLOAT:
        return "float"
    if s.startswith("datetime"):
        return "datetime"
    if s == "bool":
        return "bool"
    # object: distinguish scalar strings from array/list cells
    import datetime as dt

    import numpy as np

    if sample is not None and isinstance(sample, (list, tuple, np.ndarray)):
        return "ARRAY"
    # Spark DATE lands as object-of-datetime.date; the driver canon
    # isoformats both, so date vs datetime64 is not a divergence
    # (trip_resolution.day — driver-green since round 1)
    if sample is not None and isinstance(sample, (dt.date, dt.datetime)):
        return "datetime"
    return "obj"


def main() -> int:
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from dystonse_gtfs_importer_spark.session import get_spark
    from dystonse_gtfs_importer_spark.sources import testdata

    testdata.MEMOIZE_VIEWS = True
    only = set(sys.argv[1:])
    spark = get_spark(app_name="audit-dtypes")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    findings = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            odf = con.execute(sql).df()
        except Exception as e:  # audit tool: report, don't die
            findings.append((name, "ERROR", str(e).splitlines()[-1][:120]))
            continue
        scols = {c.lower(): c for c in sdf.columns}
        ocols = {c.lower(): c for c in odf.columns}
        if set(scols) != set(ocols):
            findings.append((name, "COLS",
                             f"spark={sorted(scols)} oracle={sorted(ocols)}"))
            continue
        for lc in sorted(scols):
            sc, oc = scols[lc], ocols[lc]
            ssamp = sdf[sc].iloc[0] if len(sdf) else None
            osamp = odf[oc].iloc[0] if len(odf) else None
            sk = _kind(sdf[sc].dtype, ssamp)
            ok = _kind(odf[oc].dtype, osamp)
            if sk == "ARRAY" or ok == "ARRAY":
                findings.append(
                    (name, lc, f"array cell (spark={sk} oracle={ok}) — "
                               "driver canonicalizer can't hash it"))
            elif sk != ok:
                findings.append(
                    (name, lc, f"spark {sdf[sc].dtype}({sk}) vs "
                               f"oracle {odf[oc].dtype}({ok})"))
    for f in findings:
        print("MISMATCH" if f[1] != "ERROR" else "ERROR", *f)
    n = len([f for f in findings])
    print(f"audited {len([k for k in qs if not only or k in only])} "
          f"queries, {n} findings")
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
