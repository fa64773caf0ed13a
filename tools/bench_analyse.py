#!/usr/bin/env python3
"""End-to-end `analyse compute-curves --all` scale bench — the
reference's core workload (SURVEY §3.2; specific_curves.rs:29-49) run
through the real CLI path against row-count replicas of the
GTFS-records fixture.

Replication shifts trip_start_date per copy (the realistic growth
mode used for the sf1/sf10 replicas: more observations per curve
group, group counts constant), so curve COUNTS stay comparable while
the fact volume scales.  Reports wall seconds, records/s, curve rows,
and curves/s per replica factor.

Usage: python3 tools/bench_analyse.py [factors...]   (default: 1 10 100)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    import pyspark.sql.functions as F

    from gtfs_fixtures import build_rt_events, build_schedule, write_gtfs_dir

    from dystonse_gtfs_importer_spark.cli import main as cli_main
    from dystonse_gtfs_importer_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="bench-analyse", shuffle_partitions=32)

    base = Path(tempfile.mkdtemp(prefix="bench_analyse_"))
    sched_dir = base / "schedules" / "gtfs-2024-01-01"
    sched_dir.mkdir(parents=True)
    write_gtfs_dir(build_schedule(), sched_dir)
    rt_dir = base / "rt"
    rt_dir.mkdir()
    from test_cli import _write_rt_files

    _write_rt_files(build_rt_events(build_schedule()), rt_dir)

    run = lambda lake, *argv: cli_main(
        ["-s", "vbn", "--dir", str(lake), *argv], spark=spark)
    assert run(base, "import", "-r", "batch") == 0
    rec1 = spark.read.parquet(str(base / "records"))
    n1 = rec1.count()

    results = {}
    for f in factors:
        lake = base if f == 1 else Path(
            tempfile.mkdtemp(prefix=f"bench_analyse_x{f}_"))
        if f > 1:
            shutil.copytree(base / "schedules", lake / "schedules")
            # date-shifted replicas: same routes/variants/slots, f×
            # the observations — group counts constant
            reps = rec1.crossJoin(
                spark.range(f).select(F.col("id").alias("__rep")))
            reps = (reps.withColumn(
                "trip_start_date",
                F.date_add(F.col("trip_start_date"),
                           (F.col("__rep") * 7).cast("int")))
                .drop("__rep"))
            reps.write.mode("overwrite").parquet(str(lake / "records"))
        n_rec = n1 * f
        t0 = time.time()
        assert run(lake, "analyse", "compute-curves", "--all") == 0
        wall = time.time() - t0
        stats = Path(lake) / "stats"
        curve_rows = sum(
            spark.read.parquet(str(p)).count()
            for p in stats.iterdir() if p.is_dir())
        results[f"x{f}"] = {
            "records": n_rec,
            "wall_s": round(wall, 2),
            "records_per_s": round(n_rec / wall),
            "curve_rows": curve_rows,
            "curves_per_s": round(curve_rows / wall, 1),
        }
        print(f"# x{f}: {results[f'x{f}']}", file=sys.stderr)
        if f > 1:
            shutil.rmtree(lake, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"metric": "analyse_compute_curves_all",
                      "unit": "sec", "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
