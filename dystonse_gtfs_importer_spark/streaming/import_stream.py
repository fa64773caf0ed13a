"""Structured-Streaming import (ST1-ST5).

The reference's ``import automatic`` polls a directory every 5 s,
processes new files with a rayon pool, and moves them to imported/ or
failed/ (/root/reference/src/importer/mod.rs:30,295-359).  That is
precisely Spark's file streaming source:

* ST1  micro-batch file ingestion → ``readStream.format("binaryFile")``
       with ``trigger(processingTime='5 seconds')`` (or availableNow
       for drain-the-backlog runs); ``cleanSource=archive`` replaces
       the imported/ move (S18).
* ST2  per-vehicle prediction-basis dedup with 12 h state TTL
       (importer/mod.rs:42, per_schedule_importer.rs:266-313)
       → ``applyInPandasWithState`` keyed by VehicleIdentifier.
* ST3  late data → latest-wins merge inside ``foreachBatch`` (W2).
* ST5  retention → ``cleanup_predictions`` filter, the Delta-DELETE
       equivalent on plain parquet.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import ORIGIN_SCHEDULE, RT_EVENTS
from ..sources.gtfs_rt import decode_partition

BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary")

VEHICLE_KEY = ["trip_id", "start_date", "start_time"]


def stream_rt_events(spark: SparkSession, rt_dir: str,
                     pattern: str = "*.pb",
                     archive_dir: str | None = None,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """ST1: streaming RT_EVENTS from a feed-dump directory."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", pattern)
    )
    if archive_dir is not None:
        reader = (reader.option("cleanSource", "archive")
                  .option("sourceArchiveDir", archive_dir))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    binary = reader.load(rt_dir).select("path", "content")
    return binary.mapInPandas(decode_partition, RT_EVENTS)


def dedup_prediction_basis(events: DataFrame,
                           ttl_hours: int = 12) -> DataFrame:
    """ST2: drop events whose PredictionBasis (stop_sequence,
    departure_delay) equals the vehicle's previously-seen basis; state
    expires after ``ttl_hours`` (MAX_ESTIMATED_TRIP_DURATION,
    importer/mod.rs:27)."""
    state_schema = "stop_sequence int, departure_delay int"

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState
              ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last = state.get if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["header_timestamp", "stop_sequence"])
            for row in pdf.itertuples(index=False):
                basis = (
                    int(row.stop_sequence)
                    if row.stop_sequence is not None and not pd.isna(row.stop_sequence)
                    else None,
                    int(row.departure_delay)
                    if row.departure_delay is not None and not pd.isna(row.departure_delay)
                    else None,
                )
                if basis != last:
                    out.append(row._asdict())
                    last = basis
        if last is not None:
            state.update(last)
            state.setTimeoutDuration(ttl_hours * 3600 * 1000)
        cols = [f.name for f in RT_EVENTS.fields]
        yield pd.DataFrame(out, columns=cols)

    return (
        events.groupBy(*VEHICLE_KEY)
        .applyInPandasWithState(
            dedup,
            outputStructType=RT_EVENTS,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_import_stream(
    spark: SparkSession,
    rt_dir: str,
    trips: DataFrame,
    stop_times: DataFrame,
    source: str,
    schedule_file_name: str,
    records_dir: str,
    checkpoint_dir: str,
    dedup_basis: bool = False,
    trigger: dict | None = None,
):
    """The full streaming import: files → decode → (optional ST2 dedup)
    → records ETL → latest-wins merge into a parquet records table.

    ``foreachBatch`` makes the merge transactional per micro-batch (the
    BatchedStatements + MySQL upsert of the reference); on a real
    cluster the sink would be a Delta MERGE — on plain parquet we
    rewrite via a staging directory.
    """
    import shutil
    from pathlib import Path

    from ..plans.import_etl import build_records, latest_wins_merge

    events = stream_rt_events(spark, rt_dir)
    if dedup_basis:
        events = dedup_prediction_basis(events)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        recs = build_records(batch_df, trips, stop_times,
                             source, schedule_file_name)
        existing = None
        if Path(records_dir).exists():
            existing = spark.read.parquet(records_dir)
        merged = latest_wins_merge(recs, existing=existing)
        staging = records_dir + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        if Path(records_dir).exists():
            shutil.rmtree(records_dir)
        Path(staging).rename(records_dir)

    writer = events.writeStream.foreachBatch(sink) \
        .option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def remove_outdated_predictions(predictions: DataFrame, source: str,
                                current_schedule: str,
                                window_end) -> DataFrame:
    """ST5/S15: drop SCHEDULE-origin predictions of this ``source``
    written from an OLDER schedule file whose trip STARTS before
    ``window_end`` — they were superseded by regeneration from the
    current schedule (delete_outdated_predictions,
    /root/reference/src/importer/scheduled_predictions_importer.rs:244-265:
    ``source = :source AND trip_start < :end AND schedule_file_name !=
    :current AND origin_type = Schedule``).  Realtime-origin rows and
    other sources are never touched."""
    trip_start = (
        F.unix_timestamp(F.to_timestamp("trip_start_date"))
        + F.col("trip_start_time"))
    outdated = (
        (F.col("source") == source)
        & (F.col("origin_type") == ORIGIN_SCHEDULE)
        & (F.col("schedule_file_name") != current_schedule)
        & (trip_start < F.unix_timestamp(F.lit(window_end)))
    )
    return predictions.where(~outdated)


def cleanup_predictions(predictions: DataFrame, now_ts,
                        max_age_hours: int = 12) -> DataFrame:
    """ST5/S14: retain only predictions whose trip started less than
    ``max_age_hours`` before ``now_ts`` (run_cleanup,
    importer/mod.rs:174-223) — the anti-filter rewrite of DELETE."""
    start_ts = (
        F.unix_timestamp(F.to_timestamp("trip_start_date"))
        + F.col("trip_start_time")
    )
    cutoff = F.unix_timestamp(F.lit(now_ts)) - max_age_hours * 3600
    return predictions.where(start_ts >= cutoff)
