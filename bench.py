#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query and total wall seconds.

Each query is executed once after a shared-session warmup; results are
drained with count()/collect-to-driver kept minimal (write-less sink:
``df.count()``-style full materialization via noop-equivalent).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "pricing_summary",
    "ecdf_curve",
    "stop_pair_counts",
    "asof_join",
    "latest_wins",
    "forward_fill",
    "time_slot_histogram",
    "rollup_ladder",
    "exact_dedup",
    "lang_id",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from __spark_entry__ import queries
    from dystonse_gtfs_importer_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = queries()

    # warmup: JVM + parquet footer reads, not counted
    qs["pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
