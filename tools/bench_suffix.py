#!/usr/bin/env python3
"""Suffix-index construction at scale: distributed prefix doubling
(Spark, operators/suffix.suffix_ranks) vs DuckDB sorting the
materialized suffix lists (the oracle derivation, whose memory is
O(total-suffix-bytes) = quadratic-ish in document length and only
viable on toy corpora).

Usage: python3 tools/bench_suffix.py [sf_dir ...]
  (default: sf0.001, sf0.01, sf0.1)
Prints one JSON object; SCALING.md stores the table.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ORACLE = """
    WITH ta AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), ' +'),
                           t -> t <> '') AS ta
        FROM read_parquet('{path}')
    ),
    pos AS (SELECT doc_id, unnest(range(len(ta))) AS i, ta FROM ta)
    SELECT COUNT(DISTINCT r) FROM (
        SELECT DENSE_RANK() OVER (ORDER BY ta[i+1:]) AS r FROM pos
    )
"""


def main() -> int:
    import duckdb

    from dystonse_gtfs_importer_spark.operators.suffix import suffix_ranks
    from dystonse_gtfs_importer_spark.session import (
        configure_for_oracle, get_spark,
    )

    dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                            "/root/testdata/sf0.01",
                            "/root/testdata/sf0.1"]
    spark = get_spark(app_name="bench-suffix")
    configure_for_oracle(spark)
    out: dict[str, dict] = {}
    for sf_dir in dirs:
        label = Path(sf_dir).name
        docs = spark.read.parquet(str(Path(sf_dir) / "documents.parquet"))
        r: dict = {"docs": docs.count()}
        t0 = time.time()
        sr = suffix_ranks(docs)
        r["suffixes"] = sr.count()
        r["ranks"] = sr.agg({"suffix_rank": "max"}).collect()[0][0]
        r["spark_s"] = round(time.time() - t0, 2)
        print(f"# {label}: spark {r}", file=sys.stderr)
        try:
            t0 = time.time()
            con = duckdb.connect()
            n = con.execute(ORACLE.format(
                path=str(Path(sf_dir) / "documents.parquet"))).fetchone()[0]
            r["duck_ranks"] = n
            r["duck_s"] = round(time.time() - t0, 2)
        except Exception as e:
            r["duck_err"] = str(e)[:200]
        print(f"# {label}: duck {r.get('duck_s')}s", file=sys.stderr)
        out[label] = r
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
