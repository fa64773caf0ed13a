"""SparkSession factory and configuration helpers.

The reference engine's time semantics are Europe/Berlin local time
(chrono ``Local`` throughout, e.g. ``/root/reference/src/types/time_slots.rs:156``,
``/root/reference/src/types/gtfs_time.rs:53-56``), so GTFS-domain
pipelines run with that session timezone.  Oracle-comparison queries
over the driver's synthetic parquet (naive nanosecond timestamps)
run in UTC so Spark's instant semantics line up with DuckDB's naive
semantics (the host is UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

GTFS_TZ = "Europe/Berlin"

# Runtime-settable SQL confs applied to every session we touch,
# including driver-supplied ones.
_RUNTIME_CONF = {
    # driver testdata stores INT64 TIMESTAMP(NANOS) which Spark refuses
    # to read natively; read as long + convert with integer `div`.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for every pandas UDF / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # runtime re-planning: coalesce tiny shuffle partitions, split skew.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "dystonse-gtfs-importer-spark",
    master: str | None = None,
    tz: str = GTFS_TZ,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    ``shuffle_partitions`` defaults to the local core count; on a real
    cluster you'd size it to ~2-3× total executor cores and let AQE
    coalesce, which the confs below already enable.

    The *process* timezone is aligned with the session timezone:
    PySpark converts naive Python datetimes (literals, createDataFrame
    rows, collected values) through the host TZ, while SQL-built
    timestamps follow ``spark.sql.session.timeZone`` — misaligned
    zones silently shift every Python↔SQL timestamp comparison by the
    offset.  Keeping both equal makes naive datetimes mean the same
    wall-clock everywhere.
    """
    import time as _time

    os.environ["TZ"] = tz
    _time.tzset()
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", tz)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    configure(spark, tz=tz)
    return spark


def configure(spark: SparkSession, tz: str | None = None) -> SparkSession:
    """Apply runtime confs to an existing (possibly driver-supplied)
    session. Safe to call repeatedly."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — builder path covers it
    if tz is not None:
        spark.conf.set("spark.sql.session.timeZone", tz)
    return spark


def configure_for_oracle(spark: SparkSession) -> SparkSession:
    """Session setup for DuckDB-oracle comparison queries: UTC so
    hour()/date_trunc() on instants match DuckDB's naive timestamps."""
    return configure(spark, tz="UTC")


def enable_runtime_bloom_filters(
    spark: SparkSession,
    application_side_min_bytes: int = 0,
) -> SparkSession:
    """Turn Spark's runtime bloom-filter join pruning all the way on —
    the semi-join reduction that matters most at lake scale: for a
    shuffle join whose build side carries a selective filter, Spark
    injects ``might_contain(bloom(build keys))`` into the PROBE side's
    scan filter, so fact rows that cannot match are dropped before
    they are shuffled at all.

    The feature is on by default (`...runtime.bloomFilter.enabled`)
    but gated on the probe side scanning ≥ 10 GB
    (`applicationSideScanSizeThreshold`) — correct on a cluster, and
    exactly why local tests never see it fire.  This helper drops that
    gate (default 0) so plan tests can pin the injection, and
    documents the knob an operator would tune: raise
    ``creationSideThreshold`` if the dimension's filtered size
    estimate exceeds 10 MB yet is still worth a bloom build.
    """
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        str(application_side_min_bytes))
    return spark

