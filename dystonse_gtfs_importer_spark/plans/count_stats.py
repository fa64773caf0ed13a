"""``analyse count`` (count.rs): time-bucketed record statistics and
the rt-file↔schedule as-of assignment (S3/S4/J3/J10/A1/A2/F1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

DELAY_SANITY = 36000  # F1 (count.rs:51)


def file_date(col: str = "feed_file") -> F.Column:
    """S4: the YYYY-MM-DD embedded in a feed filename
    (main.rs:101-121)."""
    return F.to_date(
        F.regexp_extract(F.col(col), r"(\d{4}-\d{2}-\d{2})", 1))


def file_timestamp(col: str = "feed_file") -> F.Column:
    """S4 count flavor: filename date+time `YYYY-MM-DDTHH-MM`
    (analyser/mod.rs:191-197)."""
    raw = F.regexp_extract(
        F.col(col), r"(\d{4}-\d{2}-\d{2}T\d{2}-\d{2})", 1)
    return F.to_timestamp(F.regexp_replace(raw, "T", " ")
                          .substr(F.lit(1), F.length(raw)),
                          "yyyy-MM-dd HH-mm")


def assign_schedule(rt_files: DataFrame, schedules: DataFrame) -> DataFrame:
    """J3: each rt file belongs to the NEWEST schedule dated at or
    before the rt file's date (importer/mod.rs:377-451); files older
    than every schedule are dropped (F15).

    ``rt_files``: (feed_file, file_date); ``schedules``:
    (schedule_file_name, schedule_date).  Schedules are few —
    broadcast; the as-of rule is a ranked join, no driver loop.
    """
    j = rt_files.join(
        F.broadcast(schedules),
        F.col("schedule_date") <= F.col("file_date"), "inner")
    w = (Window.partitionBy("feed_file")
         .orderBy(F.desc("schedule_date"), F.desc("schedule_file_name")))
    return (j.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def count_stats(records: DataFrame, bucket: str = "1 hour") -> DataFrame:
    """A1+A2+F1: per fixed-width time bucket over
    [min(time_of_recording), max(...)]: row count and average arrival
    delay of sane rows (count.rs:24-77)."""
    sane = records.where(
        F.col("delay_arrival").between(-DELAY_SANITY, DELAY_SANITY))
    return (
        sane.groupBy(F.window("time_of_recording", bucket).alias("w"))
        .agg(F.count("*").alias("n_records"),
             F.round(F.avg("delay_arrival"), 4).alias("avg_delay_arrival"))
        .select(F.col("w.start").alias("bucket_start"),
                F.col("w.end").alias("bucket_end"),
                "n_records", "avg_delay_arrival")
        .orderBy("bucket_start")
    )
