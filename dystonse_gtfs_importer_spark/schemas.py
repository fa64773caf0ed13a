"""Schemas for GTFS static files, flattened GTFS-RT events, and the
records/predictions tables (FIXTURES.md §1-4; column sets recovered
from the reference's INSERT/SELECT statements, e.g.
/root/reference/src/importer/per_schedule_importer.rs:424-451 and
/root/reference/src/importer/mod.rs:579-611)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, BooleanType, ByteType, DateType, DoubleType, FloatType,
    IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

CURVE_TYPE = ArrayType(StructType([
    StructField("x", FloatType()), StructField("y", FloatType()),
]))

AGENCY = StructType([
    StructField("agency_id", StringType()),
    StructField("agency_name", StringType()),
])

ROUTES = StructType([
    StructField("route_id", StringType(), False),
    StructField("agency_id", StringType()),
    StructField("route_short_name", StringType()),
    StructField("route_type", IntegerType()),
])

TRIPS = StructType([
    StructField("trip_id", StringType(), False),
    StructField("route_id", StringType(), False),
    StructField("service_id", StringType()),
    StructField("trip_headsign", StringType()),
    StructField("shape_id", StringType()),
    # non-standard extension carried by the reference's forked
    # gtfs-structures: groups trips sharing one stop sequence
    StructField("route_variant", LongType()),
])

# times kept as raw GTFS HH:MM:SS strings here; reader converts to
# seconds-since-service-day-start (may exceed 86400)
STOP_TIMES = StructType([
    StructField("trip_id", StringType(), False),
    StructField("stop_sequence", IntegerType(), False),
    StructField("stop_id", StringType(), False),
    StructField("arrival_time", StringType()),
    StructField("departure_time", StringType()),
])

STOPS = StructType([
    StructField("stop_id", StringType(), False),
    StructField("stop_name", StringType()),
    StructField("stop_lat", DoubleType()),
    StructField("stop_lon", DoubleType()),
])

CALENDAR = StructType([
    StructField("service_id", StringType(), False),
    StructField("monday", BooleanType()),
    StructField("tuesday", BooleanType()),
    StructField("wednesday", BooleanType()),
    StructField("thursday", BooleanType()),
    StructField("friday", BooleanType()),
    StructField("saturday", BooleanType()),
    StructField("sunday", BooleanType()),
    StructField("start_date", StringType()),
    StructField("end_date", StringType()),
])

CALENDAR_DATES = StructType([
    StructField("service_id", StringType(), False),
    StructField("date", StringType()),              # yyyyMMdd
    StructField("exception_type", IntegerType()),   # 1=added 2=removed
])

GTFS_SCHEMAS: dict[str, StructType] = {
    "agency": AGENCY,
    "routes": ROUTES,
    "trips": TRIPS,
    "stop_times": STOP_TIMES,
    "stops": STOPS,
    "calendar": CALENDAR,
    "calendar_dates": CALENDAR_DATES,
}

# files a feed may legitimately omit (a feed must carry at least one of
# calendar / calendar_dates; gtfs_structures models both as optional)
GTFS_OPTIONAL_FILES = {"calendar", "calendar_dates", "agency"}

# one row per stop_time_update event, flattened from FeedMessage
RT_EVENTS = StructType([
    StructField("feed_file", StringType()),
    StructField("header_timestamp", LongType()),
    StructField("trip_id", StringType()),
    StructField("route_id", StringType()),
    StructField("start_date", StringType()),   # yyyyMMdd
    StructField("start_time", StringType()),   # H:MM:SS, may be >= 24h
    StructField("stop_sequence", IntegerType()),
    StructField("stop_id", StringType()),
    StructField("arrival_delay", IntegerType()),
    StructField("departure_delay", IntegerType()),
])

RECORDS = StructType([
    StructField("source", StringType()),
    StructField("route_id", StringType()),
    StructField("route_variant", LongType()),
    StructField("trip_id", StringType()),
    StructField("trip_start_date", DateType()),
    StructField("trip_start_time", IntegerType()),   # seconds, may exceed 86400
    StructField("stop_sequence", IntegerType()),
    StructField("stop_id", StringType()),
    StructField("time_of_recording", TimestampType()),
    StructField("delay_arrival", IntegerType()),
    StructField("delay_departure", IntegerType()),
    StructField("schedule_file_name", StringType()),
])

RECORDS_PK = ("source", "route_id", "route_variant", "trip_id",
              "trip_start_date", "trip_start_time", "stop_sequence")

PREDICTIONS = StructType([
    StructField("source", StringType()),
    StructField("event_type", ByteType()),           # 1=arrival 2=departure
    StructField("stop_id", StringType()),
    StructField("prediction_min", TimestampType()),
    StructField("prediction_max", TimestampType()),
    StructField("route_id", StringType()),
    StructField("trip_id", StringType()),
    StructField("trip_start_date", DateType()),
    StructField("trip_start_time", IntegerType()),
    StructField("stop_sequence", IntegerType()),
    StructField("precision_type", ByteType()),       # 0-6 ladder
    StructField("origin_type", ByteType()),          # 0/1/2
    StructField("sample_size", IntegerType()),
    StructField("prediction_curve", CURVE_TYPE),
    StructField("schedule_file_name", StringType()),
])

PREDICTIONS_PK = ("source", "event_type", "stop_sequence", "route_id",
                  "trip_id", "trip_start_date", "trip_start_time")

# precision ladder (/root/reference/src/types/mod.rs:64-99)
PRECISION_SPECIFIC = 1
PRECISION_FALLBACK_SPECIFIC = 2
PRECISION_SEMI_SPECIFIC = 3
PRECISION_GENERAL = 4
PRECISION_FALLBACK_GENERAL = 5
PRECISION_SUPER_GENERAL = 6

ORIGIN_UNKNOWN, ORIGIN_REALTIME, ORIGIN_SCHEDULE = 0, 1, 2
EVENT_ARRIVAL, EVENT_DEPARTURE = 1, 2
