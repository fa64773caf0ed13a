"""Z-order layout: key correctness (locality) and the clustering
property that makes it matter — per-output-partition bounding boxes
tight in BOTH dimensions, which is what parquet min/max pruning
consumes."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def grid_df(spark):
    # full 32x32 grid, shuffled arrival order
    rows = [(x * 37 + y * 101, x, y) for x in range(32) for y in range(32)]
    return spark.createDataFrame(rows, "row_id long, xb long, yb long")


class TestZorderKey:
    def test_interleave_known_values(self, spark):
        from dystonse_gtfs_importer_spark.operators.layout import zorder_key

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (1, 1), (255, 255), (5, 3)],
            "x long, y long")
        got = [r.z for r in
               df.select(zorder_key(F.col("x"), F.col("y")).alias("z"))
               .collect()]
        # x bits land on even positions, y on odd: x=101b -> 1+16,
        # y=011b -> 2+8 => 27
        assert got == [0, 1, 2, 3, 65535, 27]

    def test_locality_beats_row_major(self, grid_df):
        from dystonse_gtfs_importer_spark.operators.layout import zorder_key

        # mean Chebyshev distance between (x,y) points adjacent in key
        # order: Morton keeps neighbors-in-key spatially close, a
        # row-major key does not (jumps a whole row width)
        def mean_gap(df, key):
            import math

            rows = sorted((r.k, r.xb, r.yb) for r in
                          df.select("xb", "yb", key.alias("k")).collect())
            gaps = [max(abs(a[1] - b[1]), abs(a[2] - b[2]))
                    for a, b in zip(rows, rows[1:])]
            return sum(gaps) / len(gaps)

        z = mean_gap(grid_df, zorder_key(F.col("xb"), F.col("yb")))
        rm = mean_gap(grid_df, (F.col("xb") * 32 + F.col("yb")))
        assert z < rm, (z, rm)


class TestZorderRepartition:
    def test_partitions_have_tight_bboxes(self, grid_df):
        from dystonse_gtfs_importer_spark.operators.layout import (
            zorder_repartition,
        )

        n_parts = 16
        zdf = zorder_repartition(grid_df, F.col("xb"), F.col("yb"), n_parts)
        assert zdf.count() == 1024  # nothing lost
        stats = (zdf.withColumn("pid", F.spark_partition_id())
                 .groupBy("pid")
                 .agg((F.max("xb") - F.min("xb")).alias("dx"),
                      (F.max("yb") - F.min("yb")).alias("dy"))
                 .collect())
        # 1024 cells over ~16 partitions = 64 cells each; a z-ordered
        # partition covers a ~sqrt(64)-sided region in BOTH dims (plus
        # curve-seam slack), while row-major layout spans a full 31-
        # wide stripe in y. Require both dims bounded well under 31.
        zx = max(r.dx for r in stats)
        zy = max(r.dy for r in stats)
        assert zx <= 16 and zy <= 16, (zx, zy)

    def test_range_partitioning_single_shuffle(self, grid_df):
        from dystonse_gtfs_importer_spark.operators.layout import (
            zorder_repartition,
        )

        plan = zorder_repartition(
            grid_df, F.col("xb"), F.col("yb"), 8
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange rangepartitioning") == 1, plan
        assert "Exchange hashpartitioning" not in plan, plan


class TestInterleaveExpr:
    def test_bijective_on_domain(self):
        import duckdb

        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.operators.layout import (
            _interleave_expr,
        )

        con = duckdb.connect()
        expr = _interleave_expr(S.DUCKDB, "x", "y")
        rows = con.execute(
            f"SELECT x, y, {expr} AS z FROM "
            "(SELECT unnest(range(64)) AS x), (SELECT unnest(range(64)) AS y)"
        ).fetchall()
        assert len(rows) == 64 * 64
        zs = {z for _, _, z in rows}
        assert len(zs) == 64 * 64          # injective
        assert min(zs) == 0 and max(zs) == 4095  # onto [0, 2^12)
