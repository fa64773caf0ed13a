"""Readers for the driver-generated synthetic parquet tables.

The driver writes INT64 TIMESTAMP(NANOS, isAdjustedToUTC=false) columns
which Spark refuses to map natively; with
``spark.sql.legacy.parquet.nanosAsLong=true`` they arrive as LongType
nanoseconds and are converted here with integer ``div`` (never via
double — int64 nanoseconds exceed double's 2^53 mantissa).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# timestamp-bearing columns per table (stored as ns since epoch)
TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


_REGISTERED: dict[str, str] = {}

# Memoization is OPT-IN (bench.py / tools/check_correctness.py set it):
# every oracle query calls register_views, and re-running 10
# ``spark.read.parquet`` footer reads + analyses per query is pure
# per-query floor.  It stays off by default because tests legitimately
# shadow these view names with synthetic frames, and a skipped
# re-register must never hand a query someone else's view.
MEMOIZE_VIEWS = False


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() pipelines.

    With :data:`MEMOIZE_VIEWS` on, the second call for the same
    (Spark application, sf_dir) is a no-op; switching ``sf_dir``
    within a session always re-registers.
    """
    app = spark.sparkContext.applicationId
    if MEMOIZE_VIEWS and _REGISTERED.get(app) == sf_dir:
        return
    for t, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
    _REGISTERED[app] = sf_dir
