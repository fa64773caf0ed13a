"""Generic temporal join operators Spark lacks natively.

The engine's pipelines use specialized instances of these shapes
(``plans/count_stats.assign_schedule`` is an as-of join,
``plans/monitor.predictions_for_stop`` an interval probe); this module
exposes the general operators a user of the engine reaches for
directly — pandas has ``merge_asof``, KDB has ``aj``/``wj``, Spark has
neither.

Scale shapes:

* ``asof_join`` — MAX_BY/MIN_BY aggregation per left row after an
  equi-join on the ``by`` keys: partial-aggregatable (map-side
  combine), no per-key sort, no window over the fact table.  The
  windowed ROW_NUMBER rewrite measures ~2× slower at sf0.1 (see
  plans/oracle_queries.q_asof_join, whose oracle keeps that form as
  the cross-check).
* ``interval_join`` — equi-join on coarse time BUCKETS (left events
  against every bucket its interval overlaps) with the exact range
  predicate as a residual: candidates scale with local temporal
  density instead of |left|×|right| per key group.  The same
  grid-prefilter idea as monitor.transfer_chances' spatial cells.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def asof_join(left: DataFrame, right: DataFrame,
              left_on: str, right_on: str,
              by: list[str] | None = None,
              direction: str = "backward",
              value_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_on <= left_on`` (backward) or smallest ``right_on >=
    left_on`` (forward) within the same ``by`` group.

    ``value_cols`` are the right columns carried over (default: all
    non-key columns), renamed with ``suffix``.  Left rows with no
    match keep NULLs — a left as-of join, like ``pandas.merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    by = by or []
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != right_on]

    cond = (F.col(f"__r.{right_on}") <= F.col(f"__l.{left_on}")
            if direction == "backward"
            else F.col(f"__r.{right_on}") >= F.col(f"__l.{left_on}"))
    pick = F.max_by if direction == "backward" else F.min_by

    # a unique id keeps duplicate left rows distinct through the
    # aggregation (ids are per-partition unique and never leave the
    # query, so their nondeterminism across retries is irrelevant)
    l = left.withColumn("__uid", F.monotonically_increasing_id()) \
        .alias("__l")
    r = right.alias("__r")
    on = [F.col(f"__l.{k}") == F.col(f"__r.{k}") for k in by] + [cond]
    joined = l.join(r, on, "left")

    # one aggregation per left row: max_by/min_by over the matched
    # candidates — partial-aggregated, no sort, no window
    ordered = F.struct(F.col(f"__r.{right_on}"),
                       *[F.col(f"__r.{c}") for c in value_cols])
    aggs = [F.first(F.col(f"__l.{c}")).alias(c) for c in left.columns] + [
        pick(F.col(f"__r.{c}"), ordered).alias(f"{c}{suffix}")
        for c in value_cols]
    return joined.groupBy("__l.__uid").agg(*aggs).drop("__uid")


def interval_join(events: DataFrame, intervals: DataFrame,
                  event_ts: str, start_col: str, end_col: str,
                  by: list[str] | None = None,
                  bucket_s: int = 3600,
                  how: str = "inner") -> DataFrame:
    """Join point events to every interval containing them
    (``start <= ts < end``), candidates prefiltered by a coarse time
    grid so no key group ever degenerates to a cross product.

    Intervals are exploded to one row per overlapped ``bucket_s``-wide
    bucket (bounded fan-out for bounded interval lengths); events map
    to exactly one bucket; the equi-join on (bucket [, by]) is followed
    by the exact containment residual.
    """
    by = by or []
    b = F.lit(bucket_s)

    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            (F.unix_timestamp(start_col) / b).cast("long"),
            # end is exclusive: a zero-length tail bucket is still
            # generated for safety; the residual filters exactly
            (F.unix_timestamp(end_col) / b).cast("long"))))
    ev = events.withColumn(
        "__bucket", (F.unix_timestamp(event_ts) / b).cast("long"))

    joined = ev.join(iv, ["__bucket", *by], how).where(
        (F.col(event_ts) >= F.col(start_col))
        & (F.col(event_ts) < F.col(end_col)))
    return joined.drop("__bucket")
