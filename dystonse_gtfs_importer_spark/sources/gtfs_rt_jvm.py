"""Optional JVM-native GTFS-RT decoder (S2 scale path).

The default S2 source (`gtfs_rt.read_gtfs_rt`) decodes FeedMessage
with a pure-Python wire-format parser inside ``mapInPandas`` — correct
and Arrow-batched, but Python-CPU-bound.  At 10^8 feed files the
decode belongs on the JVM: Spark 3.4+ ships ``from_protobuf`` (the
``spark-protobuf`` module), which decodes inside whole-stage codegen
from a compiled descriptor set.  The reference decodes the same
message with prost (per_schedule_importer.rs:96-149), i.e. natively —
this module is the Spark-native equivalent.

``spark-protobuf`` is an *optional* Spark module (its jar is not in
the default pyspark wheel, and is absent in this environment), so the
decoder registers behind a capability probe: ``jvm_protobuf_available``
checks for the JVM class and callers — or ``read_gtfs_rt_auto`` —
fall back to the Python wire decoder when it is missing.  The
descriptor set needed by ``from_protobuf`` is generated HERE, at
runtime, from the public gtfs-realtime.proto schema (field numbers in
gtfs_rt.py's module docstring): a ``FileDescriptorSet`` is itself a
protobuf message, so the fixture encoder's primitives write it
without protoc or any protobuf dependency.

Semantics parity with the Python decoder:

- files without a header timestamp are dropped (reference skips them);
- zip-wrapped dumps (C21) are NOT handled by the JVM leg —
  ``read_gtfs_rt_auto`` routes ``*.zip`` globs to the Python path;
- corrupt protobuf bytes yield a null struct under PERMISSIVE mode
  and are dropped, matching the Python decoder's skip-and-continue
  (reference moves bad files aside, importer/mod.rs:524-548).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .gtfs_rt import _len_field, _tag, _varint, _WT_VARINT, read_gtfs_rt

# descriptor.proto field numbers (public google/protobuf/descriptor.proto)
_FDS_FILE = 1                 # FileDescriptorSet.file
_FDP_NAME, _FDP_PACKAGE, _FDP_MESSAGE = 1, 2, 4   # FileDescriptorProto
_DP_NAME, _DP_FIELD = 1, 2                        # DescriptorProto
_F_NAME, _F_NUMBER, _F_LABEL, _F_TYPE, _F_TYPENAME = 1, 3, 4, 5, 6

# FieldDescriptorProto.Label / .Type enum values
_OPTIONAL, _REPEATED = 1, 3
_T_UINT64, _T_INT32, _T_STRING, _T_MESSAGE, _T_UINT32 = 4, 5, 9, 11, 13

#: message-name → [(field_name, number, label, type, type_name|None)]
#: — the subset of transit_realtime the pipeline consumes, with the
#: exact field numbers of the public gtfs-realtime.proto.  Everything
#: is optional/repeated (wire-compatible with the proto2 original;
#: required-ness adds nothing to decoding).
GTFS_RT_SCHEMA: dict[str, list[tuple]] = {
    "FeedHeader": [
        ("gtfs_realtime_version", 1, _OPTIONAL, _T_STRING, None),
        ("timestamp", 3, _OPTIONAL, _T_UINT64, None),
    ],
    "StopTimeEvent": [
        ("delay", 1, _OPTIONAL, _T_INT32, None),
    ],
    "StopTimeUpdate": [
        ("stop_sequence", 1, _OPTIONAL, _T_UINT32, None),
        ("arrival", 2, _OPTIONAL, _T_MESSAGE, ".transit_realtime.StopTimeEvent"),
        ("departure", 3, _OPTIONAL, _T_MESSAGE, ".transit_realtime.StopTimeEvent"),
        ("stop_id", 4, _OPTIONAL, _T_STRING, None),
    ],
    "TripDescriptor": [
        ("trip_id", 1, _OPTIONAL, _T_STRING, None),
        ("start_time", 2, _OPTIONAL, _T_STRING, None),
        ("start_date", 3, _OPTIONAL, _T_STRING, None),
        ("route_id", 5, _OPTIONAL, _T_STRING, None),
    ],
    "TripUpdate": [
        ("trip", 1, _OPTIONAL, _T_MESSAGE, ".transit_realtime.TripDescriptor"),
        ("stop_time_update", 2, _REPEATED, _T_MESSAGE,
         ".transit_realtime.StopTimeUpdate"),
    ],
    "FeedEntity": [
        ("id", 1, _OPTIONAL, _T_STRING, None),
        ("trip_update", 3, _OPTIONAL, _T_MESSAGE, ".transit_realtime.TripUpdate"),
    ],
    "FeedMessage": [
        ("header", 1, _OPTIONAL, _T_MESSAGE, ".transit_realtime.FeedHeader"),
        ("entity", 2, _REPEATED, _T_MESSAGE, ".transit_realtime.FeedEntity"),
    ],
}


def _field_descriptor(name: str, number: int, label: int, ftype: int,
                      type_name: str | None) -> bytes:
    body = _len_field(_F_NAME, name.encode())
    body += _tag(_F_NUMBER, _WT_VARINT) + _varint(number)
    body += _tag(_F_LABEL, _WT_VARINT) + _varint(label)
    body += _tag(_F_TYPE, _WT_VARINT) + _varint(ftype)
    if type_name is not None:
        body += _len_field(_F_TYPENAME, type_name.encode())
    return body


def descriptor_set_bytes() -> bytes:
    """Serialized ``FileDescriptorSet`` for the transit_realtime subset
    above — what ``from_protobuf(..., binaryDescriptorSet=)`` consumes."""
    fdp = _len_field(_FDP_NAME, b"gtfs-realtime-subset.proto")
    fdp += _len_field(_FDP_PACKAGE, b"transit_realtime")
    for msg_name, fields in GTFS_RT_SCHEMA.items():
        dp = _len_field(_DP_NAME, msg_name.encode())
        for spec in fields:
            dp += _len_field(_DP_FIELD, _field_descriptor(*spec))
        fdp += _len_field(_FDP_MESSAGE, dp)
    return _len_field(_FDS_FILE, fdp)


def jvm_protobuf_available(spark: SparkSession) -> bool:
    """True when the optional spark-protobuf module is on the JVM
    classpath (``--packages org.apache.spark:spark-protobuf_2.13:<ver>``
    on a real cluster; absent from the bare pyspark wheel)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst")
        return True
    except Exception:
        return False


def read_gtfs_rt_jvm(spark: SparkSession, path: str,
                     pattern: str = "*.pb") -> DataFrame:
    """Directory of raw .pb GTFS-RT dumps → RT_EVENTS rows, decoded
    entirely JVM-side (no Python in the ingest hot path).

    Plan shape: binaryFile scan → ``from_protobuf`` (codegen) → two
    generator explodes (entity, stop_time_update) → column projection.
    Column names/types match ``gtfs_rt.read_gtfs_rt`` exactly; the
    parity test in tests/test_gtfs_rt.py pins row-level agreement when
    the module is present.
    """
    from pyspark.sql.protobuf.functions import from_protobuf

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select("path", "content")
    )
    msg = binary.select(
        F.element_at(F.split("path", "/"), -1).alias("feed_file"),
        from_protobuf(
            "content", "transit_realtime.FeedMessage",
            binaryDescriptorSet=descriptor_set_bytes(),
            options={"mode": "PERMISSIVE"},
        ).alias("m"),
    )
    return (
        msg
        .where(F.col("m.header.timestamp").isNotNull())
        .select("feed_file",
                F.col("m.header.timestamp").alias("header_timestamp"),
                F.explode("m.entity").alias("e"))
        .where(F.col("e.trip_update.trip.trip_id").isNotNull())
        .select("feed_file", "header_timestamp",
                F.col("e.trip_update.trip.trip_id").alias("trip_id"),
                F.col("e.trip_update.trip.route_id").alias("route_id"),
                F.col("e.trip_update.trip.start_date").alias("start_date"),
                F.col("e.trip_update.trip.start_time").alias("start_time"),
                F.explode("e.trip_update.stop_time_update").alias("stu"))
        .select("feed_file",
                F.col("header_timestamp").cast("long"),
                "trip_id", "route_id", "start_date", "start_time",
                F.col("stu.stop_sequence").cast("int").alias("stop_sequence"),
                F.col("stu.stop_id").alias("stop_id"),
                F.col("stu.arrival.delay").cast("int")
                .alias("arrival_delay"),
                F.col("stu.departure.delay").cast("int")
                .alias("departure_delay"))
    )


def read_gtfs_rt_auto(spark: SparkSession, path: str,
                      pattern: str = "*.pb") -> DataFrame:
    """S2 with decoder selection: JVM ``from_protobuf`` when the
    spark-protobuf jar is present AND the glob is raw .pb (the JVM leg
    cannot unwrap C21 zip dumps); Python wire decoder otherwise."""
    if pattern.endswith(".pb") and jvm_protobuf_available(spark):
        return read_gtfs_rt_jvm(spark, path, pattern)
    return read_gtfs_rt(spark, path, pattern)
