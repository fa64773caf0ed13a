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


def _shr(x: int, k: int) -> int:
    """Truncate-toward-zero right shift (sign decomposition, capped at
    62 so the shift stays defined) — the exact 2^-k half-life decay."""
    k = min(k, 62)
    return -((-x) >> k) if x < 0 else x >> k


def _fold_bucket_sums(rows, acc: dict, n: int,
                      half_life_days: int = DECAY_HALF_LIFE_DAYS):
    """Shared accumulation for the streaming operator and its batch
    twin: events arrive as (epoch_s, value); state is a map of
    calendar half-life bucket → exact integer sum of the bucket's
    1e-6-quantized values, plus the event count.

    Buckets are ABSOLUTE calendar half-life epochs
    (``epoch // 86400 // H``) so the state is a pure function of the
    event multiset — NOT of arrival order: per-bucket integer addition
    is commutative/associative, and the decay shift is applied only at
    read time (:func:`_decayed_total`).  A late event (older bucket)
    simply lands in its own bucket's sum, so stream == batch holds
    EXACTLY for arbitrary values and arbitrary micro-batch cuts — the
    progressive-shift fold this replaced lost up to 1 micro-unit per
    late event because shr(a+b, k) != shr(a, k) + shr(b, k)."""
    for epoch, value in rows:
        b = (epoch // 86400) // half_life_days
        acc[b] = acc.get(b, 0) + round(value * 1e6)
        n += 1
    return acc, n


def _prune_zero_buckets(acc: dict) -> dict:
    """Drop buckets whose read-time contribution is exactly zero:
    age > 62 half-lives from the newest bucket (the shift clamps at
    62) and ``_shr(sum, 62) == 0``.  Keeps per-key state bounded at
    ~63 buckets for any lifetime while leaving :func:`_decayed_total`
    unchanged on the pruned map (property-tested)."""
    if not acc:
        return acc
    last = max(acc)
    return {b: v for b, v in acc.items()
            if last - b <= 62 or _shr(v, 62) != 0}


def _decayed_total(acc: dict) -> tuple[int, int]:
    """(last_bucket, decayed sum): each bucket's exact sum decays by
    its whole-bucket age from the newest bucket — one truncating shift
    per bucket, applied to the final sums, so the result is
    order-independent.  Ages ≥ 62 clamp to a 62-place shift (zero for
    any |value·1e6| < 2^62)."""
    last = max(acc)
    return last, sum(_shr(v, last - b) for b, v in sorted(acc.items()))


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

    State per key is the per-bucket exact-sum map (one bigint pair per
    half-life bucket the key ever touched — ≤ 53/year at the 7-day
    default, and the TTL drops keys idle for ``ttl_hours``) plus the
    event count.  One updated row per key per batch.  Exact integer
    arithmetic throughout (see :func:`_fold_bucket_sums`): no EXP, no
    float accumulation, and the state is a pure function of the event
    multiset — a replay from a checkpoint OR any re-ordering of events
    across micro-batches (late data included) reproduces byte-identical
    output.

    Batch equality: :func:`decayed_counter_batch` runs the identical
    accumulation groupwise; tests pin stream (availableNow) == batch,
    including late-data batches and non-power-of-two values.

    State bound: before every ``state.update`` the fold drops buckets
    whose decayed contribution is exactly zero (age > 62 half-lives
    AND ``|sum| < 2**62`` — the read-time shift clamps at 62 places),
    so a long-lived key holds at most ~63 live buckets instead of one
    per half-life it was ever active in.  Output is unchanged except
    one pathological corner: a bucket whose |sum| reached ~2**62
    micro-units (|value| sum ≈ 4.6e12), then sat idle > 62 half-lives
    (> 1.2 years at the 7-day default), then received ANOTHER event,
    may lose a ±1 carry in the read-time truncating shift.

    .. versionchanged:: round 7
        STATE-SCHEMA BREAK: ``stateStructType`` changed from the
        round-6 ``(sum_e6 bigint, bucket bigint, n bigint)`` scalars
        to ``(buckets array<bigint>, sums array<bigint>, n bigint)``.
        The change is silent to the state store — a checkpoint written
        by the old layout will fail or MISREAD state on restart.
        Deploying across this boundary requires a FRESH
        ``checkpointLocation`` (replay the source); do not resume an
        old checkpoint."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            buckets, sums, n = state.get
            acc = dict(zip(buckets, sums))
        else:
            acc, n = {}, 0
        frames = list(pdfs)
        df = (pd.concat(frames, ignore_index=True) if frames else None)
        if df is None or df.empty:
            return
        acc, n = _fold_bucket_sums(
            zip(df["_epoch"].astype("int64"), df[value_col]),
            acc, int(n), half_life_days)
        acc = _prune_zero_buckets(acc)
        items = sorted(acc.items())
        state.update(([int(b) for b, _ in items],
                      [int(v) for _, v in items], int(n)))
        state.setTimeoutDuration(ttl_hours * 3600 * 1000)
        last, total = _decayed_total(acc)
        yield pd.DataFrame({"key": [key[0]],
                            "last_bucket": [int(last)],
                            "decayed_value_e6": [int(total)],
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
                stateStructType=("buckets array<bigint>, "
                                 "sums array<bigint>, n bigint"),
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def decayed_counter_batch(events: DataFrame,
                          ts_col: str = "ts",
                          key_col: str = "user_id",
                          value_col: str = "value",
                          half_life_days: int = DECAY_HALF_LIFE_DAYS
                          ) -> DataFrame:
    """Batch twin of :func:`decayed_counter_stream`: the same
    bucket-sum accumulation per key via ``applyInPandas`` — the ground
    truth the stream must equal after its final batch (exactly, for
    any values and any micro-batch cuts, because both sides compute a
    pure function of the event multiset)."""
    import pandas as pd

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc, n = _fold_bucket_sums(
            zip(pdf["_epoch"].astype("int64"), pdf[value_col]),
            {}, 0, half_life_days)
        last, total = _decayed_total(acc)
        return pd.DataFrame({"key": [pdf["_k"].iloc[0]],
                             "last_bucket": [int(last)],
                             "decayed_value_e6": [int(total)],
                             "n_events": [int(n)]})

    prepped = (events
               .where(F.col(value_col).isNotNull()
                      & F.col(ts_col).isNotNull())
               .withColumn("_epoch", F.unix_timestamp(F.col(ts_col)))
               .withColumn("_k", F.col(key_col))
               .select("_k", "_epoch", F.col(value_col)))
    return prepped.groupBy("_k").applyInPandas(fold_group, _DECAY_OUT)


def windowed_mixture_drift(docs: DataFrame,
                           targets: tuple[tuple[str, int], ...],
                           tol_e6: int = 20_000,
                           ts_col: str = "ts",
                           source_col: str = "source",
                           text_col: str = "text",
                           window: str = "1 hour",
                           watermark: str = "30 minutes") -> DataFrame:
    """Streaming mixture-drift monitor: per (event-time window,
    source), the achieved token share vs the prescribed target
    mixture with an out-of-tolerance flag — the live-feed twin of
    the batch ``q_mixture_drift`` audit, so a corpus ingest raises
    drift alarms per window instead of discovering a skewed mixture
    at training time.

    Same exact-integer semantics as the batch audit (e6 shares via
    floored division, targets normalized against their own sum);
    per-window totals come from a second grouped aggregation over
    the (window, source) partials — both state-store aggregations
    are (windows x sources)-sized, independent of event volume, and
    token counting is a map-only projection before the shuffle.
    Sources absent from the target table flag as pure excess; a
    targeted source missing from a window simply has no row there
    (a stream cannot emit rows for data that never arrived — run
    the batch audit over the landed corpus for shortfall checks).

    Works on both streaming and batch frames (batch ignores the
    watermark), so the stream==batch equality test runs one plan."""
    tw_tot = sum(w for _, w in targets) or 1
    tgt = F.create_map(*[x for s, w in targets
                         for x in (F.lit(s), F.lit(int(w)))])
    df = docs
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    sized = df.select(
        F.window(F.col(ts_col), window).alias("w"),
        F.col(source_col).alias("source"),
        F.expr(f"size(filter(split(lower({text_col}), ' +'), "
               f"t -> t <> ''))").cast("long").alias("n_tok"))
    per = (sized.groupBy("w", "source")
           .agg(F.sum("n_tok").alias("n_tok")))
    # second (windows x sources)-sized aggregation for window totals;
    # streaming-legal because it re-keys the SAME event-time window
    # column (no new shuffle key crosses the watermark)
    tot = per.groupBy("w").agg(F.sum("n_tok").alias("tot"))
    out = (per.join(tot, ["w"])
           .withColumn("_tw", F.coalesce(tgt[F.col("source")],
                                         F.lit(0)).cast("long"))
           .select(
               F.unix_timestamp("w.start").alias("window_start_s"),
               "source",
               F.col("n_tok").cast("long").alias("n_tok"),
               F.expr("n_tok * 1000000 DIV GREATEST(tot, 1)")
               .cast("long").alias("share_e6"),
               F.expr(f"_tw * 1000000 DIV {tw_tot}")
               .cast("long").alias("target_e6"))
           .withColumn("drift_e6",
                       (F.col("share_e6") - F.col("target_e6"))
                       .cast("long"))
           .withColumn("out_of_tol",
                       (F.abs(F.col("drift_e6")) > F.lit(tol_e6))
                       .cast("int")))
    return out
