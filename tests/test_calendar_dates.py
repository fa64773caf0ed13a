"""calendar_dates service exceptions + route_variant derivation for
vanilla GTFS feeds (no non-standard columns, arbitrary column order) —
the two gaps every real feed hits (reference honors both via its
forked gtfs_structures; scheduled_predictions_importer.rs:115-116)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
import pytest

from gtfs_fixtures import build_schedule, write_gtfs_dir


@pytest.fixture(scope="module")
def gtfs_dir_with_exceptions(tmp_path_factory):
    d = tmp_path_factory.mktemp("gtfs_cd")
    sched = build_schedule()
    # remove New Year's Monday from WD; add Saturday Jan 6; plus an
    # exceptions-only service (no calendar.txt row at all)
    sched["calendar_dates"] = pd.DataFrame([
        {"service_id": "WD", "date": "20240101", "exception_type": 2},
        {"service_id": "WD", "date": "20240106", "exception_type": 1},
        {"service_id": "XONLY", "date": "20240103", "exception_type": 1},
    ])
    write_gtfs_dir(sched, d)
    return str(d)


class TestServiceExceptions:
    def test_add_and_remove(self, spark, gtfs_dir_with_exceptions):
        from dystonse_gtfs_importer_spark.plans.scheduled import service_dates
        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs

        sched = read_gtfs(spark, gtfs_dir_with_exceptions)
        got = service_dates(spark, sched["calendar"],
                            dt.date(2024, 1, 1), dt.date(2024, 1, 7),
                            sched["calendar_dates"]).collect()
        by_sid = {}
        for r in got:
            by_sid.setdefault(r.service_id, set()).add(str(r.service_date))
        # holiday Monday removed, Saturday added
        assert by_sid["WD"] == {"2024-01-02", "2024-01-03", "2024-01-04",
                                "2024-01-05", "2024-01-06"}
        # exceptions-only service appears on its added date
        assert by_sid["XONLY"] == {"2024-01-03"}

    def test_exceptions_outside_window_ignored(self, spark,
                                               gtfs_dir_with_exceptions):
        from dystonse_gtfs_importer_spark.plans.scheduled import service_dates
        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs

        sched = read_gtfs(spark, gtfs_dir_with_exceptions)
        got = service_dates(spark, sched["calendar"],
                            dt.date(2024, 1, 2), dt.date(2024, 1, 5),
                            sched["calendar_dates"]).collect()
        days = {str(r.service_date) for r in got}
        assert days == {"2024-01-02", "2024-01-03", "2024-01-04",
                        "2024-01-05"}

    def test_no_calendar_dates_file_means_no_exceptions(self, spark,
                                                        tmp_path):
        from dystonse_gtfs_importer_spark.plans.scheduled import service_dates
        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs

        d = tmp_path / "g"
        d.mkdir()
        write_gtfs_dir(build_schedule(), d)
        sched = read_gtfs(spark, str(d))
        assert sched["calendar_dates"].count() == 0
        got = service_dates(spark, sched["calendar"],
                            dt.date(2024, 1, 1), dt.date(2024, 1, 7),
                            sched["calendar_dates"]).collect()
        assert {str(r.service_date) for r in got} == {
            "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
            "2024-01-05"}

    def test_scheduled_trip_starts_honor_exceptions(
            self, spark, gtfs_dir_with_exceptions):
        from dystonse_gtfs_importer_spark.plans.scheduled import (
            scheduled_trip_starts,
        )
        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs

        sched = read_gtfs(spark, gtfs_dir_with_exceptions)
        # window spans the removed Monday and the added Saturday
        starts = scheduled_trip_starts(
            spark, sched["trips"], sched["stop_times"], sched["calendar"],
            dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 7, 0, 0),
            sched["calendar_dates"]).select("trip_start_date").distinct()
        days = {str(r.trip_start_date) for r in starts.collect()}
        assert "2024-01-01" not in days      # removed holiday
        assert "2024-01-06" in days          # added Saturday


class TestVanillaFeed:
    @pytest.fixture(scope="class")
    def vanilla_dir(self, tmp_path_factory):
        """build_schedule minus all non-standard columns, with trips
        columns in a scrambled (but valid) GTFS order."""
        d = tmp_path_factory.mktemp("gtfs_vanilla")
        sched = build_schedule()
        trips = sched["trips"].drop(columns=["route_variant"])
        sched["trips"] = trips[
            ["service_id", "trip_id", "trip_headsign", "route_id",
             "shape_id"]]
        write_gtfs_dir(sched, d)
        return str(d)

    def test_route_variant_derived(self, spark, vanilla_dir):
        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs

        trips = read_gtfs(spark, vanilla_dir)["trips"]
        rows = trips.select("trip_id", "route_variant").collect()
        assert all(r.route_variant is not None for r in rows)
        # fixture trip ids encode the true variant: trips named
        # T<route>v<variant>n* share a stop sequence iff same variant
        derived = {}
        for r in rows:
            true_variant = r.trip_id.split("v")[1].split("n")[0]
            derived.setdefault(true_variant, set()).add(r.route_variant)
        for variant, hashes in derived.items():
            assert len(hashes) == 1, (variant, hashes)
        # distinct true variants → distinct hashes
        all_hashes = [next(iter(h)) for h in derived.values()]
        assert len(set(all_hashes)) == len(all_hashes)

    def test_vanilla_flows_through_variant_stops(self, spark, vanilla_dir):
        from dystonse_gtfs_importer_spark.sources.gtfs import (
            read_gtfs, variant_stops,
        )

        sched = read_gtfs(spark, vanilla_dir)
        vs = variant_stops(sched["trips"], sched["stop_times"])
        n_variants = vs.select("route_id", "route_variant").distinct().count()
        assert n_variants == 6               # 3 routes x 2 variants
        counts = vs.groupBy("route_id", "route_variant").count().collect()
        assert all(r["count"] == 8 for r in counts)

    def test_zip_feed_reads_like_directory(self, spark, vanilla_dir,
                                           tmp_path):
        """S1: a .zip feed (the reference's input format) must load
        identically to the extracted directory."""
        import os
        import zipfile

        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs

        zpath = str(tmp_path / "feed.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            for f in os.listdir(vanilla_dir):
                z.write(os.path.join(vanilla_dir, f), f)
        a = read_gtfs(spark, zpath)
        b = read_gtfs(spark, vanilla_dir)
        assert a["trips"].count() == b["trips"].count()
        assert (a["stop_times"].select("trip_id", "stop_sequence",
                                       "arrival_secs")
                .exceptAll(b["stop_times"].select(
                    "trip_id", "stop_sequence", "arrival_secs"))
                .count() == 0)

    def test_header_order_independent(self, spark, vanilla_dir, tmp_path):
        """Same feed with trips columns in standard order must produce
        identical variants (name-based mapping, not positional)."""
        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs

        d = tmp_path / "g2"
        d.mkdir()
        sched = build_schedule()
        sched["trips"] = sched["trips"].drop(columns=["route_variant"])
        write_gtfs_dir(sched, d)
        a = read_gtfs(spark, vanilla_dir)["trips"].select(
            "trip_id", "route_variant")
        b = read_gtfs(spark, str(d))["trips"].select(
            "trip_id", "route_variant")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
