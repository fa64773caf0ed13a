"""ST4 scheduled-predictions tests: service-day expansion, window
selection, ladder integration, high-water-mark resume."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from gtfs_fixtures import build_rt_events, build_schedule, write_gtfs_dir


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    from dystonse_gtfs_importer_spark.plans.analyse_gtfs import (
        default_curves, general_delay_curves, prepare_dbitems,
        stop_pair_curve_sets,
    )
    from dystonse_gtfs_importer_spark.plans.import_etl import (
        build_records, latest_wins_merge,
    )
    from dystonse_gtfs_importer_spark.schemas import RT_EVENTS
    from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs, variant_stops

    d = tmp_path_factory.mktemp("gtfs_sched")
    write_gtfs_dir(build_schedule(), d)
    sched = read_gtfs(spark, str(d))
    for k in sched:
        sched[k] = sched[k].cache()
    rt = spark.createDataFrame(build_rt_events(build_schedule()), RT_EVENTS)
    records = latest_wins_merge(build_records(
        rt, sched["trips"], sched["stop_times"], "test", "sched"))
    vstops = variant_stops(sched["trips"], sched["stop_times"]).cache()
    items = prepare_dbitems(records, vstops).cache()
    tables = {
        "general": general_delay_curves(items).cache(),
        "specific": stop_pair_curve_sets(items).cache(),
        "default": default_curves(items, sched["routes"]).cache(),
    }
    return {"sched": sched, "vstops": vstops, "tables": tables}


class TestServiceDates:
    def test_weekday_service_excludes_weekend(self, spark, world):
        from dystonse_gtfs_importer_spark.plans.scheduled import service_dates

        got = service_dates(spark, world["sched"]["calendar"],
                            dt.date(2024, 1, 1), dt.date(2024, 1, 7)).collect()
        days = sorted(str(r.service_date) for r in got)
        # WD service: Mon-Fri only
        assert days == ["2024-01-01", "2024-01-02", "2024-01-03",
                        "2024-01-04", "2024-01-05"]


class TestScheduledPredictions:
    def test_window_and_origin(self, spark, world):
        from dystonse_gtfs_importer_spark.plans.scheduled import (
            scheduled_predictions,
        )
        from dystonse_gtfs_importer_spark.schemas import ORIGIN_SCHEDULE

        now = dt.datetime(2024, 1, 1, 7, 0)
        preds = scheduled_predictions(
            spark, world["sched"], world["vstops"], world["tables"], now,
        ).cache()
        n = preds.count()
        assert n > 0
        first = preds.first()
        assert first.origin_type == ORIGIN_SCHEDULE
        assert first.prediction_curve is not None
        assert first.prediction_min <= first.prediction_max
        # trips all start Mon 08:00-12:00 (+ the 25:00 night trips) —
        # within now + 7d12h
        starts = preds.select("trip_start_date").distinct().collect()
        assert {str(r.trip_start_date) for r in starts} <= {
            "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
            "2024-01-05", "2024-01-08"}
        # both event types present
        ets = {r.event_type for r in preds.select("event_type").distinct().collect()}
        assert ets == {1, 2}

    def test_event_times_use_trips_own_schedule(self, spark, world):
        """Every trip of a variant must anchor predictions at ITS OWN
        scheduled seconds, not the variant representative's (the
        reference iterates trip.stop_times): two fixture trips of
        variant 1 start exactly 10×6 min apart, so their seq-1
        departure predictions shift by exactly 3600 s."""
        from dystonse_gtfs_importer_spark.plans.scheduled import (
            scheduled_predictions,
        )

        now = dt.datetime(2024, 1, 1, 7, 0)
        preds = scheduled_predictions(
            spark, world["sched"], world["vstops"], world["tables"], now,
        ).where((F.col("trip_start_date") == dt.date(2024, 1, 1))
                & (F.col("event_type") == 2)
                & (F.col("stop_sequence") == 1))
        rows = {r.trip_id: r for r in preds.where(
            F.col("trip_id").isin("TR1v1n0", "TR1v1n10")).collect()}
        assert set(rows) == {"TR1v1n0", "TR1v1n10"}
        a, b = rows["TR1v1n0"], rows["TR1v1n10"]
        assert b.trip_start_time - a.trip_start_time == 3600
        # same variant + same time slot ⇒ same curve ⇒ the anchor
        # shift is exactly the schedule shift
        assert (b.prediction_min - a.prediction_min
                ).total_seconds() == 3600.0

    def test_resume_point_skips_written(self, spark, world):
        from dystonse_gtfs_importer_spark.plans.scheduled import (
            resume_point, scheduled_predictions,
        )

        now = dt.datetime(2024, 1, 1, 7, 0)
        first_batch = scheduled_predictions(
            spark, world["sched"], world["vstops"], world["tables"], now,
        ).cache()
        hwm = resume_point(first_batch)
        assert hwm is not None
        second = scheduled_predictions(
            spark, world["sched"], world["vstops"], world["tables"], now,
            existing_predictions=first_batch,
        )
        # everything at-or-before the high-water mark is excluded
        start_ts = (F.to_timestamp("trip_start_date")
                    + F.col("trip_start_time") * F.expr("INTERVAL 1 SECOND"))
        overlap = second.where(start_ts < F.lit(hwm)).count()
        assert overlap == 0
