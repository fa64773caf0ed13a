"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001 (smoke check).
``queries()`` / ``oracle_sql()`` — per-operator Spark implementations
with DuckDB oracle SQL, compared by the driver at sf0.01.

Implementations live in ``dystonse_gtfs_importer_spark.plans``;
this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-group weighted-ECDF delay curves (the
    reference's central make_curve UDAF, SURVEY §2 A3) computed over
    /root/testdata/sf0.001, exploded to (group, x, y) points."""
    from dystonse_gtfs_importer_spark.plans.analyse import ecdf_curve_points
    from dystonse_gtfs_importer_spark.session import configure_for_oracle
    from dystonse_gtfs_importer_spark.sources.testdata import load_table

    configure_for_oracle(spark)
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return ecdf_curve_points(events, group_cols=["event_type"], value_col="value")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dystonse_gtfs_importer_spark.plans import oracle_queries

    return oracle_queries.queries()


def oracle_sql() -> dict[str, str]:
    from dystonse_gtfs_importer_spark.plans import oracle_queries

    return oracle_queries.oracle_sql()
