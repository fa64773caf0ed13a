#!/usr/bin/env python3
"""Isolate which r13 kmeans change moved the needle (guide §1.2):
loads operators/clustering.py from BOTH trees (r12 worktree + HEAD)
and times four variants interleaved in ONE session over the
kmeans_clusters workload (k=8, max_iter=12, sf0.01 embeddings):

  A = r12 loop (checkpoint + inertia agg) + r12 init (no persist)
  B = r13 loop (single collect)           + r13 init (persist)
  C = r13 loop                            + r12 init
  D = r12 loop                            + r13 init

Usage: python3 tools/ab_r13_kmeans.py [reps] [r12_tree]
"""

from __future__ import annotations

import importlib.util
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
R12_TREE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r13_before"
SF_DIR = "/root/testdata/sf0.01"


def load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    rel = "dystonse_gtfs_importer_spark/operators/clustering.py"
    m12a = load(f"{R12_TREE}/{rel}", "clu12a")
    m13b = load(f"/root/repo/{rel}", "clu13b")
    m13c = load(f"/root/repo/{rel}", "clu13c")
    m13c.kmeans_init = load(f"{R12_TREE}/{rel}", "clu12i").kmeans_init
    m12d = load(f"{R12_TREE}/{rel}", "clu12d")
    m12d.kmeans_init = load(f"/root/repo/{rel}", "clu13i").kmeans_init
    variants = {"A_old_loop_old_init": m12a, "B_new_loop_new_init": m13b,
                "C_new_loop_old_init": m13c, "D_old_loop_new_init": m12d}

    import pyspark.sql.functions as F

    from dystonse_gtfs_importer_spark.session import (configure_for_oracle,
                                                      get_spark)
    from dystonse_gtfs_importer_spark.plans import oracle_queries as oq
    from dystonse_gtfs_importer_spark.sources import testdata

    testdata.MEMOIZE_VIEWS = True
    spark = get_spark(app_name="ab_r13_kmeans")
    configure_for_oracle(spark)
    oq.register_views(spark, SF_DIR)
    emb = spark.table("embeddings").select(
        "vec_id", F.expr("transform(embedding, v -> CAST(v AS DOUBLE))")
        .alias("embedding"))

    def run(mod) -> tuple[float, float]:
        t0 = time.time()
        res = mod.kmeans(emb, k=8, max_iter=12, tol=1e-4)
        t1 = time.time()
        res["assignments"].write.format("noop").mode("overwrite").save()
        return t1 - t0, time.time() - t1

    for name, mod in variants.items():   # warmup: one untimed pass each
        run(mod)
    out: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(REPS):
        for name, mod in variants.items():
            spark.sparkContext.setJobDescription(name)
            b, e = run(mod)
            spark.sparkContext.setJobDescription(None)
            out[name].append(b + e)
    for name, ts in out.items():
        print(f"{name:22s} median={statistics.median(ts):.3f}  runs="
              + " ".join(f"{t:.3f}" for t in ts))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
