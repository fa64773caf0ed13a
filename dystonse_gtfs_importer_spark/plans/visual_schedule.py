"""Visual-schedule data pipeline (visual_schedule.rs) — the *data*
behind the schedule drawings (S19 plotting itself is presentation).

* A8  distinct route_ids / variants
* O6  variants sorted by stop count descending
* U2  greedy partition of variants into drawing groups: repeatedly
      take the longest unassigned variant, then absorb every variant
      whose stop list is a contiguous sub-window of it (forward or
      reversed, C20 ``is_sub_trip``, visual_schedule.rs:213-277)
* A13 per (service day, trip) ordered point series for drawing
* F13 ≥10 rows gate
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def is_sub_window(needle: list[str], hay: list[str]) -> bool:
    """C20: is ``needle`` a contiguous window of ``hay``, forward or
    reversed (visual_schedule.rs:271-277)?"""
    if len(needle) > len(hay):
        return False
    for cand in (needle, needle[::-1]):
        for i in range(len(hay) - len(cand) + 1):
            if hay[i:i + len(cand)] == cand:
                return True
    return False


def variant_draw_groups(vstops: DataFrame) -> list[dict]:
    """U2: the greedy variant partition.  Inherently sequential greedy
    over a *small* driver-side list (variants per route are dozens) —
    the one sanctioned ``collect()`` in this module; per-variant stop
    lists are bounded by route length."""
    per_variant = (
        vstops.groupBy("route_id", "route_variant")
        .agg(F.sort_array(F.collect_list(F.struct("stop_index", "stop_id")))
             .alias("stops"))
        .select("route_id", "route_variant",
                F.expr("transform(stops, s -> s.stop_id)").alias("stop_ids"))
        .collect()
    )
    pool = [{"route_id": r.route_id, "route_variant": r.route_variant,
             "stop_ids": list(r.stop_ids)} for r in per_variant]
    pool.sort(key=lambda v: (-len(v["stop_ids"]), v["route_id"],
                             v["route_variant"]))
    groups: list[dict] = []
    while pool:
        leader = pool.pop(0)
        members = [leader]
        rest = []
        for v in pool:
            if (v["route_id"] == leader["route_id"]
                    and is_sub_window(v["stop_ids"], leader["stop_ids"])):
                members.append(v)
            else:
                rest.append(v)
        pool = rest
        groups.append({
            "route_id": leader["route_id"],
            "leader_variant": leader["route_variant"],
            "variants": [m["route_variant"] for m in members],
            "stop_ids": leader["stop_ids"],
        })
    return groups


def stop_pair_curve_series(specific: DataFrame,
                           general: DataFrame) -> DataFrame:
    """S19: the plot-ready data series behind the stop-pair curve page
    (draw_curves_for_stop_pair,
    /root/reference/src/analyser/curve_visualisation.rs:381-463) —
    per (route, variant, stop pair, time slot): the general DEPARTURE
    curve at the start stop, the general ARRIVAL curve at the end
    stop, and every focus curve of the pair's curve set, each exploded
    to (x, y_pct) points exactly as the reference feeds gnuplot (y
    scaled ×100).  Rendering is a declared non-goal; this is the data.

    Map-only explodes plus two dimension joins — no aggregation
    shuffle at any scale.
    """
    pair_keys = ["route_id", "route_variant", "time_slot",
                 "start_stop_index", "end_stop_index"]

    def points(df: DataFrame, series, event_type, focus,
               extra_keys) -> DataFrame:
        return df.select(
            *extra_keys,
            series.alias("series"),
            event_type.cast("tinyint").alias("event_type"),
            focus.cast("double").alias("focus"),
            F.col("sample_size").cast("long").alias("sample_size"),
            F.explode("curve").alias("pt"),
        ).select(*extra_keys, "series", "event_type", "focus",
                 "sample_size",
                 F.col("pt.x").cast("double").alias("x"),
                 (F.col("pt.y") * 100.0).cast("double").alias("y_pct"))

    sets = points(specific, F.lit("curve_set"), F.col("event_type"),
                  F.col("focus"), pair_keys)

    pairs = specific.select(*pair_keys).distinct()
    gen = general.select("route_id", "route_variant", "event_type",
                         "time_slot", "stop_index", "curve", "sample_size")
    dep_start = points(
        pairs.join(gen, (gen.event_type == 2)
                   & (gen.stop_index == F.col("start_stop_index"))
                   & (gen.route_id == pairs.route_id)
                   & (gen.route_variant == pairs.route_variant)
                   & (gen.time_slot == pairs.time_slot))
        .drop(gen.route_id).drop(gen.route_variant).drop(gen.time_slot),
        F.lit("departure_at_start"), F.lit(2), F.lit(None), pair_keys)
    arr_end = points(
        pairs.join(gen, (gen.event_type == 1)
                   & (gen.stop_index == F.col("end_stop_index"))
                   & (gen.route_id == pairs.route_id)
                   & (gen.route_variant == pairs.route_variant)
                   & (gen.time_slot == pairs.time_slot))
        .drop(gen.route_id).drop(gen.route_variant).drop(gen.time_slot),
        F.lit("arrival_at_end"), F.lit(1), F.lit(None), pair_keys)

    return sets.unionByName(dep_start).unionByName(arr_end)


def schedule_page_series(records: DataFrame, trips: DataFrame,
                         stop_times: DataFrame, vstops: DataFrame,
                         include_planned: bool = True) -> DataFrame:
    """S19/A13: the drawable polylines behind one visual-schedule page —
    per (route, variant, service day, trip) the ordered
    (stop position, hour-of-day) points, plus (with
    ``include_planned``) the planned schedule line per trip with a
    NULL service day.

    Mirrors ``make_coordinate_from_item`` / ``make_trip_drawable``
    (/root/reference/src/analyser/visual_schedule.rs:548-600):
    realtime y = (scheduled departure + delay_arrival)/3600 h, rows
    with NULL delays or the provider artifact ``delay_arrival == 0``
    skipped; planned y = scheduled arrival/3600; times before 03:00
    wrap +24 h into the 5..27 plot range.  The reference's ±30 s
    random jitter is omitted (deterministic engine).

    Shape: two broadcast dimension joins onto the records stream, one
    groupBy per output polyline — no self-joins, no driver collect.
    ``stop_count`` rides along per variant so a renderer needs no
    second lookup.
    """
    wrap = lambda t: F.when(t < 3 * 3600, t + 86400).otherwise(t)  # noqa: E731
    v = F.broadcast(vstops.select(
        "route_id", "route_variant", "stop_id", "stop_index"))
    ncol = F.broadcast(
        vstops.groupBy("route_id", "route_variant")
        .agg((F.max("stop_index") + 1).alias("stop_count")))
    st_rt = F.broadcast(stop_times.select(
        "trip_id", "stop_sequence", "departure_secs"))
    st_pl = F.broadcast(stop_times.select(
        "trip_id", "stop_id", "arrival_secs"))

    rt = (records
          .where(F.col("delay_arrival").isNotNull()
                 & F.col("delay_departure").isNotNull()
                 & (F.col("delay_arrival") != 0))
          .join(st_rt, ["trip_id", "stop_sequence"])
          .join(v, ["route_id", "route_variant", "stop_id"])
          .withColumn("__t", wrap(F.col("departure_secs")
                                  + F.col("delay_arrival")))
          # one polyline per PHYSICAL run: trip_start_time and source
          # are part of RECORDS_PK (frequencies-style feeds reuse
          # trip_id within a day), so they join the grouping even
          # though the drawable output doesn't carry them
          .groupBy("route_id", "route_variant",
                   F.col("trip_start_date").alias("service_day"), "trip_id",
                   "trip_start_time", "source")
          .agg(F.sort_array(F.collect_list(F.struct(
              F.col("stop_index"),
              (F.col("__t") / 3600.0).alias("hour")))).alias("points"))
          .drop("trip_start_time", "source"))

    if include_planned:
        planned = (trips.select("trip_id", "route_id", "route_variant")
                   .join(st_pl, "trip_id")
                   .join(v, ["route_id", "route_variant", "stop_id"])
                   .where(F.col("arrival_secs").isNotNull())
                   .withColumn("__t", wrap(F.col("arrival_secs")))
                   .groupBy("route_id", "route_variant", "trip_id")
                   .agg(F.sort_array(F.collect_list(F.struct(
                       F.col("stop_index"),
                       (F.col("__t") / 3600.0).alias("hour"))))
                       .alias("points"))
                   .withColumn("service_day",
                               F.lit(None).cast("date"))
                   .select("route_id", "route_variant", "service_day",
                           "trip_id", "points"))
        rt = rt.unionByName(planned)
    return rt.join(ncol, ["route_id", "route_variant"])


def trip_point_series(records: DataFrame, vstops: DataFrame,
                      min_rows: int = 10) -> DataFrame:
    """A13: per (service day, trip) the ordered (stop position, delay)
    series used to draw one line of the visual schedule; variants with
    fewer than ``min_rows`` records are skipped (F13,
    visual_schedule.rs:168)."""
    v = F.broadcast(vstops.select(
        "route_id", "route_variant", "stop_id", "stop_index"))
    pts = records.join(v, ["route_id", "route_variant", "stop_id"])
    counted = pts.withColumn(
        "n_variant_rows",
        F.count("*").over(Window.partitionBy("route_id", "route_variant")))
    pts = counted.where(F.col("n_variant_rows") >= min_rows)
    return (
        pts.groupBy("route_id", "route_variant", "trip_start_date", "trip_id")
        .agg(F.sort_array(F.collect_list(F.struct(
            "stop_index", "delay_arrival", "delay_departure"))).alias("points"))
    )
