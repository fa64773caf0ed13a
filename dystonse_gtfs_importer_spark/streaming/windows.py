"""Event-time windowed aggregation with watermarks (ST7 streaming
form).

The reference buckets RT-file statistics by event time in batch SQL
(count.rs / the J10/A1 queries); the streaming twin is the classic
Structured-Streaming pattern: ``withWatermark`` bounds state for
late data, ``window()`` assigns event-time buckets, and the partial
aggregation happens map-side before the state-store shuffle — state
size is (windows × keys), independent of event volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_event_counts(events: DataFrame,
                          ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "1 hour",
                          watermark: str = "30 minutes") -> DataFrame:
    """Streaming A1/ST7: per (event-time window, key) count + sum.

    Works on both streaming and batch frames (batch ignores the
    watermark), so the same plan is testable against the batch oracle.
    Late rows beyond ``watermark`` are dropped by the state store; in
    append output mode a window only emits once the watermark passes
    its end — exactly the semantics the reference's "import whatever
    file arrives, newest wins" loop approximates by re-running.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"),
                   F.col(key_col))
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"),
                key_col, "n", "sum_value")
    )


def sessionized_event_stats(events: DataFrame,
                            ts_col: str = "ts",
                            key_col: str = "user_id",
                            gap: str = "30 minutes",
                            watermark: str = "30 minutes") -> DataFrame:
    """Streaming gap-based sessionization: ``session_window`` merges
    a key's events while consecutive gaps stay under ``gap``; the
    state store holds one open session per key (bounded by the
    watermark), and a session only emits once the watermark passes
    its close — the streaming twin of the batch
    ``q_sessionization`` oracle query (same LAG→cumsum semantics,
    verified equal in tests).  Works on batch frames too (watermark
    skipped), so one plan serves both engines of the comparison."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"),
                   F.col(key_col))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("value_sum"))
        .select(key_col,
                F.unix_timestamp("sw.start").alias("start_s"),
                F.unix_timestamp("sw.end").alias("end_s"),
                "n_events", "value_sum")
    )
