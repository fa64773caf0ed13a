#!/usr/bin/env python3
"""k-means scale bench: convergence wall-time at three corpus sizes
for both assignment paths (JVM HOF argmin vs Arrow/numpy matmul), so
SCALING.md's crossover advice is measured, not guessed.

Usage: python3 tools/bench_kmeans.py [k] — prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": str(Path(__file__).resolve().parent.parent / ".bench_sf1"),
    "sf10": str(Path(__file__).resolve().parent.parent / ".bench_sf10"),
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from dystonse_gtfs_importer_spark.operators.clustering import kmeans
    from dystonse_gtfs_importer_spark.session import (
        configure_for_oracle, get_spark,
    )

    spark = get_spark(app_name="bench-kmeans")
    configure_for_oracle(spark)
    out: dict = {"metric": "kmeans_bench", "k": k, "unit": "sec",
                 "scales": {}}
    for sf, d in DIRS.items():
        p = Path(d) / "embeddings.parquet"
        if not p.exists():
            continue
        emb = spark.read.parquet(str(p)).select(
            "vec_id", "embedding")
        n = emb.count()
        row: dict = {"n_vectors": n}
        for mode in ("join", "udf"):
            t0 = time.time()
            res = kmeans(emb, k=k, max_iter=12, tol=1e-4, assign=mode)
            row[mode] = {
                "total_s": round(time.time() - t0, 3),
                "iterations": res["iterations"],
                "final_inertia": round(res["history"][-1], 1),
            }
        row["parity"] = (row["join"]["final_inertia"]
                         == row["udf"]["final_inertia"])
        out["scales"][sf] = row
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
