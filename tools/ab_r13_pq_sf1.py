#!/usr/bin/env python3
"""VERDICT r12 item 7: close the AQE-REUSE story at scale.  Times
``pq_recall`` at sf1 (the 10x replica, .bench_sf1) in ONE session,
interleaved:

  I = inline one-string form (the registry entry as shipped): the
      codebook CTE chain is textually re-expanded per leg and AQE
      runtime exchange reuse dedups the duplicated subtrees.
  M = materialized form: cv / subv / pcents / pcodes eagerly
      localCheckpointed as temp views once, both legs read the views.

Row equality is asserted (sorted full-row comparison) so the variant
is provably the same query.  Usage: python3 tools/ab_r13_pq_sf1.py
[reps] [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_sf1"


def main() -> int:
    from dystonse_gtfs_importer_spark.session import (configure_for_oracle,
                                                      get_spark)
    from dystonse_gtfs_importer_spark.sources import testdata
    from dystonse_gtfs_importer_spark.plans import oracle_queries as oq
    from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
    from dystonse_gtfs_importer_spark.functions import sql_shared as S

    testdata.MEMOIZE_VIEWS = True
    spark = get_spark(app_name="ab_r13_pq_sf1")
    configure_for_oracle(spark)
    oq.register_views(spark, SF_DIR)

    ctes = ANN._pq_ctes(S.SPARK)
    sql_inline = ANN.q_pq_recall(S.SPARK)
    n_legs = sql_inline.count(ctes)
    assert n_legs == 2, f"expected the CTE chain twice, found {n_legs}"

    stub = """cv AS (SELECT * FROM __cv),
        subv AS (SELECT * FROM __subv),
        pcents AS (SELECT * FROM __pcents),
        pcodes AS (SELECT * FROM __pcodes)"""
    sql_mat = sql_inline.replace(ctes, stub)

    def build_views() -> float:
        t0 = time.time()
        for name in ("cv", "subv", "pcents", "pcodes"):
            spark.sql(f"WITH {ctes} SELECT * FROM {name}") \
                .localCheckpoint(eager=True) \
                .createOrReplaceTempView(f"__{name}")
        return time.time() - t0

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # row equality (one-time): sorted full-row comparison
    prep = build_views()
    a = sorted(map(tuple, spark.sql(sql_inline).collect()))
    b = sorted(map(tuple, spark.sql(sql_mat).collect()))
    assert a == b, "materialized variant diverged"
    print(f"# rows equal ({len(a)} rows); first view build {prep:.3f}s")

    res: dict[str, list[float]] = {"inline": [], "mat_total": [],
                                   "mat_views": [], "mat_query": []}
    for _ in range(REPS):
        spark.sparkContext.setJobDescription("pq_recall inline")
        t0 = time.time()
        noop(spark.sql(sql_inline))
        res["inline"].append(time.time() - t0)

        spark.sparkContext.setJobDescription("pq_recall materialized")
        tv = build_views()          # honest: views rebuilt per rep
        t0 = time.time()
        noop(spark.sql(sql_mat))
        tq = time.time() - t0
        res["mat_views"].append(tv)
        res["mat_query"].append(tq)
        res["mat_total"].append(tv + tq)
        spark.sparkContext.setJobDescription(None)
    for k, v in res.items():
        print(f"{k:10s} median={statistics.median(v):.3f}  runs="
              + " ".join(f"{x:.3f}" for x in v))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
