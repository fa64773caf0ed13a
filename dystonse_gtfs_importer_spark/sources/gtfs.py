"""GTFS static schedule reader (S1).

The reference loads a GTFS zip/dir through ``gtfs_structures::Gtfs``
into an in-memory object graph (/root/reference/src/main.rs:399-404);
here each GTFS file is one DataFrame (trips + stop_times joined where
the reference nests them) read with explicit schemas — schema-on-read,
column-pruned, and broadcastable as dimension tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..schemas import GTFS_SCHEMAS


def gtfs_seconds(col: str) -> F.Column:
    """Parse GTFS H:MM:SS / HH:MM:SS (hours may exceed 24, e.g.
    '27:00:00') into seconds since service-day start
    (/root/reference/src/types/gtfs_time.rs:31-45)."""
    parts = F.split(F.col(col), ":")
    return (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    ).alias(col.replace("_time", "_secs"))


def read_gtfs(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Read a GTFS directory (one CSV per file) with explicit schemas.
    ``stop_times`` gains ``arrival_secs`` / ``departure_secs`` int
    columns; raw HH:MM:SS strings are retained."""
    out: dict[str, DataFrame] = {}
    for name, schema in GTFS_SCHEMAS.items():
        df = spark.read.csv(f"{path}/{name}.txt", header=True, schema=schema)
        out[name] = df
    st = out["stop_times"]
    out["stop_times"] = st.withColumn(
        "arrival_secs", gtfs_seconds("arrival_time")
    ).withColumn("departure_secs", gtfs_seconds("departure_time"))
    return out


def variant_stops(trips: DataFrame, stop_times: DataFrame) -> DataFrame:
    """Per (route_id, route_variant): the ordered stop list of one
    representative trip (deterministically the min trip_id), with
    0-based ``stop_index`` positions — the variant stop geometry the
    reference takes from its first matching trip
    (/root/reference/src/analyser/specific_curves.rs:122-127).

    Small dimension output (#variants × stops) — broadcast it.
    """
    rep = (
        trips.groupBy("route_id", "route_variant")
        .agg(F.min("trip_id").alias("trip_id"))
    )
    st = stop_times.select(
        "trip_id", "stop_sequence", "stop_id", "arrival_secs", "departure_secs")
    joined = rep.join(st, "trip_id")
    by_variant = Window.partitionBy("route_id", "route_variant")
    return (
        joined.withColumn(
            "stop_index",
            F.row_number().over(by_variant.orderBy("stop_sequence")) - F.lit(1))
        .withColumn("stop_count", F.count("*").over(by_variant))
        .drop("trip_id")
    )
