"""Monitor query-layer tests: departure board filters (F8-F11, W3),
interval-overlap reads (S8/S9), spatial extended stops (J6), and the
walk/convolve/transfer probability chain (C13-C15)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyspark.sql.functions as F
import pytest

from dystonse_gtfs_importer_spark.schemas import (
    ORIGIN_REALTIME, ORIGIN_SCHEDULE, PREDICTIONS,
)

BASE = dt.datetime(2024, 1, 1, 8, 0, 0)


def _curve(center_s: float, spread_s: float = 60.0):
    xs = np.linspace(center_s - spread_s, center_s + spread_s, 5)
    ys = [0.0, 0.25, 0.5, 0.75, 1.0]
    return [{"x": float(x), "y": float(y)} for x, y in zip(xs, ys)]


def _pred(trip, stop, seq, event_type, sched_offset_s, origin,
          route="R1", start_time=8 * 3600, spread=60.0):
    curve = _curve(0.0, spread)
    t = BASE + dt.timedelta(seconds=sched_offset_s)
    return {
        "source": "test", "event_type": event_type, "stop_id": stop,
        "prediction_min": t - dt.timedelta(seconds=spread),
        "prediction_max": t + dt.timedelta(seconds=spread),
        "route_id": route, "trip_id": trip,
        "trip_start_date": dt.date(2024, 1, 1),
        "trip_start_time": start_time, "stop_sequence": seq,
        "precision_type": 3, "origin_type": origin, "sample_size": 50,
        "prediction_curve": curve, "schedule_file_name": "sched",
    }


@pytest.fixture(scope="module")
def predictions(spark):
    rows = [
        # trip A: departures at two stops + final stop (must be dropped)
        _pred("A", "S1", 1, 2, 300, ORIGIN_REALTIME),
        _pred("A", "S2", 2, 2, 600, ORIGIN_REALTIME),
        _pred("A", "S3", 3, 2, 900, ORIGIN_REALTIME),
        # trip B: schedule-origin with a realtime twin (same route+start)
        _pred("B", "S1", 1, 2, 1200, ORIGIN_SCHEDULE, route="R2",
              start_time=9 * 3600),
        _pred("B_rt", "S1", 1, 2, 1230, ORIGIN_REALTIME, route="R2",
              start_time=9 * 3600),
        _pred("B_rt", "S9", 2, 2, 1800, ORIGIN_REALTIME, route="R2",
              start_time=9 * 3600),
        # trip C: schedule-origin, no twin → stays
        _pred("C", "S1", 1, 2, 2400, ORIGIN_SCHEDULE, route="R3",
              start_time=10 * 3600),
        _pred("C", "S9", 2, 2, 3000, ORIGIN_SCHEDULE, route="R3",
              start_time=10 * 3600),
        # trip D: far outside window (dropped by F8)
        _pred("D", "S1", 1, 2, 30000, ORIGIN_REALTIME),
        _pred("D", "S9", 2, 2, 32000, ORIGIN_REALTIME),
    ]
    return spark.createDataFrame(rows, PREDICTIONS).cache()


class TestDepartureBoard:
    def test_filters_compose(self, spark, predictions):
        from dystonse_gtfs_importer_spark.plans.monitor import (
            departure_board, predictions_for_stop,
        )

        window = (BASE, BASE + dt.timedelta(hours=1))
        at_stop = predictions_for_stop(
            predictions, ["S1", "S2", "S3"], *window)
        board = departure_board(at_stop, *window,
                                all_predictions=predictions).collect()
        trips = [r.trip_id for r in board]
        assert "D" not in trips            # F8 outside window
        assert "B" not in trips            # F9 schedule with rt twin
        assert "C" in trips                # schedule without twin stays
        # F10: trip A's final stop S3 dropped, S1/S2 stay
        a_stops = [r.stop_id for r in board if r.trip_id == "A"]
        assert a_stops == ["S1", "S2"]
        # W3: sorted by median time
        t50s = [r.t50 for r in board]
        assert t50s == sorted(t50s)

    def test_heat_strip_column(self, spark, predictions):
        """S19/C22 on the board: with_heat_strip adds a decodable
        PNG data URL whose strip spans the board window."""
        import base64

        from dystonse_gtfs_importer_spark.operators.media_codecs import (
            decode_png,
        )
        from dystonse_gtfs_importer_spark.plans.monitor import (
            departure_board, predictions_for_stop,
        )

        window = (BASE, BASE + dt.timedelta(hours=1))
        at_stop = predictions_for_stop(
            predictions, ["S1", "S2", "S3"], *window)
        board = departure_board(at_stop, *window,
                                all_predictions=predictions,
                                with_heat_strip=True).collect()
        urls = [r.strip_data_url for r in board]
        assert urls and all(u and u.startswith("data:image/png;base64,")
                            for u in urls)
        img = decode_png(base64.b64decode(urls[0].split(",", 1)[1]))
        assert img.shape == (4, 120, 3)

    def test_predictions_for_trip(self, predictions):
        from dystonse_gtfs_importer_spark.plans.monitor import (
            predictions_for_trip,
        )

        got = predictions_for_trip(
            predictions, "A", dt.date(2024, 1, 1), 8 * 3600, 2).collect()
        assert sorted(r.stop_sequence for r in got) == [2, 3]


class TestExtendedStops:
    def test_radius_join(self, spark):
        from dystonse_gtfs_importer_spark.plans.monitor import extended_stops

        stops = spark.createDataFrame([
            ("S1", "Hauptbahnhof", 53.0830, 8.8130),
            ("S2", "Hauptbahnhof", 53.0832, 8.8135),   # same name
            ("S3", "Nearby", 53.0835, 8.8140),          # ~80 m away
            ("S4", "Far", 53.2000, 9.0000),             # km away
        ], "stop_id string, stop_name string, stop_lat double, stop_lon double")
        ext = extended_stops(stops, "Hauptbahnhof")
        ids = {r.stop_id for r in ext.collect()}
        assert ids == {"S1", "S2", "S3"}


class TestTransferChain:
    def test_probability_orders_with_slack(self, spark, predictions):
        from dystonse_gtfs_importer_spark.plans.monitor import transfer_chances

        stops = spark.createDataFrame([
            ("S1", "Main", 53.0830, 8.8130),
            ("S9", "Main2", 53.0833, 8.8134),  # ~45 m from S1
        ], "stop_id string, stop_name string, stop_lat double, stop_lon double")

        arrivals = spark.createDataFrame(
            [_pred("ARR", "S1", 5, 1, 1100, ORIGIN_REALTIME)], PREDICTIONS)
        # two departures from S9: tight (60s after arrival) vs
        # comfortable (10 min after)
        deps = spark.createDataFrame([
            _pred("B_rt", "S9", 2, 2, 1160, ORIGIN_REALTIME),
            _pred("C", "S9", 2, 2, 1700, ORIGIN_SCHEDULE),
        ], PREDICTIONS)

        out = transfer_chances(arrivals, deps, stops,
                               min_probability=0.0).collect()
        p = {r.departure_trip: r.p_transfer for r in out}
        assert set(p) == {"B_rt", "C"}
        assert 0.0 <= p["B_rt"] <= 1.0 and 0.0 <= p["C"] <= 1.0
        # more slack → strictly better chance
        assert p["C"] > p["B_rt"]
        # 45 m walk is nearly instant relative to 10 min slack
        assert p["C"] > 0.9

    def test_min_probability_filter(self, spark, predictions):
        from dystonse_gtfs_importer_spark.plans.monitor import transfer_chances

        stops = spark.createDataFrame([
            ("S1", "Main", 53.0830, 8.8130),
            ("S9", "Main2", 53.0833, 8.8134),
        ], "stop_id string, stop_name string, stop_lat double, stop_lon double")
        arrivals = spark.createDataFrame(
            [_pred("ARR", "S1", 5, 1, 1700, ORIGIN_REALTIME)], PREDICTIONS)
        # departure 9 min BEFORE the arrival → chance ~0 → filtered (F11)
        deps = spark.createDataFrame(
            [_pred("GONE", "S9", 2, 2, 1160, ORIGIN_REALTIME)], PREDICTIONS)
        out = transfer_chances(arrivals, deps, stops).collect()
        assert out == []


class TestAutocomplete:
    def test_terms_all_match(self, spark):
        from dystonse_gtfs_importer_spark.plans.monitor import autocomplete_stops

        stops = spark.createDataFrame(
            [(f"S{i}", n) for i, n in enumerate(
                ["Bremen Hauptbahnhof", "Bremen Hemelingen",
                 "Hamburg Hauptbahnhof", "Bremen Neustadt"])],
            "stop_id string, stop_name string")
        got = [r.stop_name for r in
               autocomplete_stops(stops, "bremen haupt").collect()]
        assert got == ["Bremen Hauptbahnhof"]
