#!/usr/bin/env python3
"""Per-query cost decomposition for ARBITRARY registry entries
(guide §1): like profile_headline.py but over any ``queries()`` name,
at any SF dir.  Times (a) DataFrame construction, (b) physical
planning, (c) execution drained through the noop sink, median of 3
after one untimed warmup, and dumps ``explain("formatted")`` to
plans/$SPARK_GRAFT_PLAN_DIR (default r13)/<name>_<tag>.txt.

Usage: python3 tools/profile_registry.py <tag> <name> [name ...]
       SPARK_GRAFT_SF_DIR=... to change scale (default sf0.01 — the
       driver's correctness scale, where the slow registry entries
       were spotted).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]

    from dystonse_gtfs_importer_spark.session import get_spark
    from dystonse_gtfs_importer_spark.sources import testdata

    testdata.MEMOIZE_VIEWS = True
    out_dir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13")
    out_dir.mkdir(parents=True, exist_ok=True)

    from __spark_entry__ import queries

    spark = get_spark(app_name="profile_registry")
    qs = queries()

    qs["pricing_summary"](spark, SF_DIR).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    print(f"{'query':28s} {'build':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'total':>7s}  plan shape")
    for name in names:
        if name not in qs:
            print(f"{name:28s} MISSING")
            continue
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        builds, plans, execs = [], [], []
        plan_txt = ""
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            t2 = time.time()
            spark.sparkContext.setJobDescription(f"{name} noop")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            t3 = time.time()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
        b, p, e = (sorted(x)[1] for x in (builds, plans, execs))
        n_exch = plan_txt.count("Exchange")
        n_py = (plan_txt.count("BatchEvalPython")
                + plan_txt.count("ArrowEvalPython")
                + plan_txt.count("MapInPandas")
                + plan_txt.count("MapInArrow")
                + plan_txt.count("FlatMapGroupsInPandas"))
        joins = [w for w in ("BroadcastHashJoin", "SortMergeJoin",
                             "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                             "CartesianProduct") if w in plan_txt]
        print(f"{name:28s} {b:7.3f} {p:7.3f} {e:7.3f} {b + p + e:7.3f}  "
              f"exch={n_exch} py={n_py} joins={','.join(joins) or '-'}",
              flush=True)
        (out_dir / f"{name}_{tag}.txt").write_text(plan_txt)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
