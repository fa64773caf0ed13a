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


DECAY_HALF_LIFE_DAYS = 7
_DECAY_OUT = ("key bigint, last_bucket bigint, "
              "decayed_value_e6 bigint, n_events bigint")


def _decay_fold(rows, sum_e6: int, bucket, n: int,
                half_life_days: int = DECAY_HALF_LIFE_DAYS):
    """Shared fold for the streaming operator and its batch twin:
    events arrive as (epoch_s, value) in event-time order; state is
    (decayed sum in 1e-6 units, current calendar bucket, count).

    Buckets are ABSOLUTE calendar half-life epochs
    (``epoch // 86400 // H``) so bucket deltas telescope exactly
    across batches — a relative-age bucketing would make the result
    depend on where the stream was cut.  Advancing k buckets shifts
    the accumulated sum right k places (truncating toward zero via
    sign decomposition — engine/platform-independent); late events
    (older buckets) decay their own contribution instead.  The fold
    is deterministic for a given event order; ties on the same epoch
    fold in (epoch, value) order, which both the twin and the stream
    reproduce."""
    def shr(x: int, k: int) -> int:
        k = min(k, 62)
        return -((-x) >> k) if x < 0 else x >> k

    for epoch, value in rows:
        b = (epoch // 86400) // half_life_days
        v6 = round(value * 1e6)
        if bucket is None:
            bucket = b
        if b > bucket:
            sum_e6 = shr(sum_e6, b - bucket)
            bucket = b
            sum_e6 += v6
        else:
            sum_e6 += shr(v6, bucket - b)
        n += 1
    return sum_e6, bucket, n


def decayed_counter_stream(events: DataFrame,
                           ts_col: str = "ts",
                           key_col: str = "user_id",
                           value_col: str = "value",
                           half_life_days: int = DECAY_HALF_LIFE_DAYS,
                           ttl_hours: int = 24 * 90) -> DataFrame:
    """Stateful recency-decayed counter per key — the streaming twin
    of the batch ``decayed_engagement`` family: each key carries a
    half-life-decayed engagement total that halves every
    ``half_life_days`` and grows with every event, the signal a
    trending/recency ranker reads ("who is active NOW") without ever
    re-scanning history.

    State per key is three scalars (sum_e6, bucket, n) — constant
    size however long the key lives — with a processing-time TTL to
    drop keys idle for ``ttl_hours``.  One updated row per key per
    batch.  Exact integer arithmetic throughout (see
    :func:`_decay_fold`): no EXP, no float accumulation, so a replay
    from a checkpoint reproduces byte-identical state.

    Batch equality: :func:`decayed_counter_batch` runs the identical
    fold groupwise; tests pin stream (availableNow) == batch,
    including late-data batches."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        sum_e6, bucket, n = (state.get if state.exists
                             else (0, None, 0))
        if bucket is not None and bucket < 0:
            bucket = None  # sentinel for "no events yet"
        frames = list(pdfs)
        df = (pd.concat(frames, ignore_index=True) if frames else None)
        if df is None or df.empty:
            return
        df = df.sort_values(["_epoch", value_col], kind="mergesort")
        sum_e6, bucket, n = _decay_fold(
            zip(df["_epoch"].astype("int64"), df[value_col]),
            int(sum_e6), bucket, int(n), half_life_days)
        state.update((int(sum_e6), int(bucket), int(n)))
        state.setTimeoutDuration(ttl_hours * 3600 * 1000)
        yield pd.DataFrame({"key": [key[0]],
                            "last_bucket": [int(bucket)],
                            "decayed_value_e6": [int(sum_e6)],
                            "n_events": [int(n)]})

    prepped = (events
               .where(F.col(value_col).isNotNull()
                      & F.col(ts_col).isNotNull())
               .withColumn("_epoch", F.unix_timestamp(F.col(ts_col)))
               .select(F.col(key_col), "_epoch", F.col(value_col)))
    return (prepped.groupBy(key_col)
            .applyInPandasWithState(
                fold,
                outputStructType=_DECAY_OUT,
                stateStructType=("sum_e6 bigint, bucket bigint, "
                                 "n bigint"),
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def decayed_counter_batch(events: DataFrame,
                          ts_col: str = "ts",
                          key_col: str = "user_id",
                          value_col: str = "value",
                          half_life_days: int = DECAY_HALF_LIFE_DAYS
                          ) -> DataFrame:
    """Batch twin of :func:`decayed_counter_stream`: the same ordered
    fold per key via ``applyInPandas`` — the ground truth the stream
    must equal after its final batch."""
    import pandas as pd

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_epoch", value_col], kind="mergesort")
        sum_e6, bucket, n = _decay_fold(
            zip(pdf["_epoch"].astype("int64"), pdf[value_col]),
            0, None, 0, half_life_days)
        return pd.DataFrame({"key": [pdf["_k"].iloc[0]],
                             "last_bucket": [int(bucket)],
                             "decayed_value_e6": [int(sum_e6)],
                             "n_events": [int(n)]})

    prepped = (events
               .where(F.col(value_col).isNotNull()
                      & F.col(ts_col).isNotNull())
               .withColumn("_epoch", F.unix_timestamp(F.col(ts_col)))
               .withColumn("_k", F.col(key_col))
               .select("_k", "_epoch", F.col(value_col)))
    return prepped.groupBy("_k").applyInPandas(fold_group, _DECAY_OUT)
