"""S19 SVG/PNG sink tests: parse the SVG back with ElementTree,
round-trip the PNGs through the stdlib decoder, and run the
distributed page renderer end-to-end."""
from __future__ import annotations

import datetime as dt
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from dystonse_gtfs_importer_spark import rendering as rd
from dystonse_gtfs_importer_spark.operators.media_codecs import decode_png

SVG_NS = "{http://www.w3.org/2000/svg}"


def _ramp(lo=-60.0, hi=300.0, n=8):
    xs = np.linspace(lo, hi, n)
    ys = np.linspace(0.0, 100.0, n)
    return list(zip(xs.tolist(), ys.tolist()))


class TestCurvePageSvg:
    def test_wellformed_and_counts(self):
        svg = rd.curve_page_svg(
            "S1->S2", [(0.0, _ramp()), (60.0, _ramp(-30, 330))],
            general_departure=_ramp(), general_arrival=_ramp(),
            sample_size=42)
        root = ET.fromstring(svg)
        assert root.tag == f"{SVG_NS}svg"
        polys = root.findall(f"{SVG_NS}polyline")
        # 2 focus curves + 2 general curves
        assert len(polys) == 4
        # gnuplot styles: dotted general departure, dashed arrival
        dashes = [p.get("stroke-dasharray") for p in polys]
        assert dashes.count("2,4") == 1 and dashes.count("8,4") == 1
        legend = [t.text for t in root.findall(f"{SVG_NS}text")
                  if t.get("class") == "legend"]
        assert legend[0] == "Sekunden (Anzahl Fahrten)"
        assert "Abfahrt am Start" in legend
        assert "Ankunft am Ende" in legend
        assert "0 s (42)" in legend and "60 s (42)" in legend

    def test_coordinates_in_viewport(self):
        svg = rd.curve_page_svg("t", [(None, _ramp(-150, 450))])
        root = ET.fromstring(svg)
        for poly in root.findall(f"{SVG_NS}polyline"):
            for pair in poly.get("points").split():
                x, y = map(float, pair.split(","))
                assert 0 <= x <= 1024 and 0 <= y <= 768

    def test_fixed_x_range_pins_scale(self):
        # x=-150 maps to the left plot edge, x=450 to the right edge
        assert rd._sx(-150.0) == pytest.approx(64)
        assert rd._sx(450.0) == pytest.approx(1024 - 16)
        assert rd._sy(0.0) == pytest.approx(768 - 48)
        assert rd._sy(100.0) == pytest.approx(40)


class TestVisualSchedulePng:
    def test_roundtrip_and_weekday_colors(self):
        stop_count = 5
        mon = dt.date(2026, 8, 10)   # Monday
        sun = dt.date(2026, 8, 9)    # Sunday
        series = [
            {"date": mon, "points": [(i, 8.0 + i) for i in range(stop_count)]},
            {"date": sun, "points": [(i, 20.0 + i * 0.5)
                                     for i in range(stop_count)]},
            {"date": None, "points": [(i, 14.0 + i)
                                      for i in range(stop_count)]},
        ]
        png = rd.visual_schedule_png(series, stop_count, height=256)
        img = decode_png(png)
        assert img.shape == (256, stop_count * 30 + 40, 3)
        flat = img.reshape(-1, 3)
        # white background dominates
        assert (flat == 255).all(axis=1).mean() > 0.5
        # weekday green: more green than red somewhere
        assert (flat[:, 1].astype(int) - flat[:, 0].astype(int) > 20).any()
        # sunday red: more red than green somewhere
        assert (flat[:, 0].astype(int) - flat[:, 1].astype(int) > 20).any()

    def test_alpha_blending_not_opaque(self):
        series = [{"date": dt.date(2026, 8, 10),
                   "points": [(0, 6.0), (2, 26.0)]}]
        img = decode_png(rd.visual_schedule_png(series, 3, height=128))
        colored = img[(img != 255).any(axis=2)]
        # 0.3 alpha over white: channel floor is 0.7*255 ≈ 178, never 0
        assert colored.size and colored.min() >= 170


class TestHeatStripPng:
    def test_colormap_endpoints(self):
        strip = np.array([0.0, 0.5, 1.0])
        img = decode_png(rd.heat_strip_png(strip, height=2))
        assert img.shape == (2, 3, 3)
        assert tuple(img[0, 0]) == rd.plasma(0.0)
        assert tuple(img[0, 2]) == rd.plasma(1.0)
        assert tuple(img[0, 1]) == rd.plasma(0.5)

    def test_data_url(self):
        url = rd.heat_strip_data_url(np.linspace(0, 1, 120))
        assert url.startswith("data:image/png;base64,")
        import base64
        img = decode_png(base64.b64decode(url.split(",", 1)[1]))
        assert img.shape == (1, 120, 3)

    def test_zero_strip_safe(self):
        img = decode_png(rd.heat_strip_png(np.zeros(4)))
        assert (img == np.array(rd.plasma(0.0))).all()


class TestDistributedRender:
    def test_render_curve_pages(self, spark):
        rows = []
        for slot in (0, 1):
            for series, et, focus in (
                    ("curve_set", 1, 0.0), ("curve_set", 1, 120.0),
                    ("departure_at_start", 2, None),
                    ("arrival_at_end", 1, None)):
                for x, y in _ramp():
                    rows.append(("r1", 0, slot, 1, 4, series, et, focus,
                                 25, float(x), float(y)))
        df = spark.createDataFrame(
            rows, "route_id string, route_variant int, time_slot int, "
                  "start_stop_index int, end_stop_index int, series string, "
                  "event_type tinyint, focus double, sample_size long, "
                  "x double, y_pct double")
        out = rd.render_curve_pages(df).collect()
        assert len(out) == 2           # one page per slot
        for r in out:
            root = ET.fromstring(r.svg)
            assert len(root.findall(f"{SVG_NS}polyline")) == 4
            assert r.route_id == "r1"


# ---------------------------------------------------------------------------
# property tests (no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


class TestRenderingProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.floats(min_value=0.0, max_value=1.0),
                    min_size=1, max_size=240))
    def test_heat_strip_png_width_matches_strip(self, strip):
        img = decode_png(rd.heat_strip_png(np.array(strip), height=3))
        assert img.shape == (3, len(strip), 3)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.tuples(st.floats(min_value=-3000, max_value=3000),
                              st.floats(min_value=0, max_value=100)),
                    min_size=2, max_size=60),
           st.integers(min_value=1, max_value=5))
    def test_svg_always_wellformed_and_clipped(self, pts, n_curves):
        pts = sorted(set(pts))
        if len(pts) < 2:
            return
        svg = rd.curve_page_svg(
            "t", [(float(i * 30), pts) for i in range(n_curves)],
            general_departure=pts, sample_size=7)
        root = ET.fromstring(svg)
        assert len(root.findall(f"{SVG_NS}polyline")) == n_curves + 1
        for poly in root.findall(f"{SVG_NS}polyline"):
            for pair in poly.get("points").split():
                x, y = map(float, pair.split(","))
                # x may exceed the plot frame for out-of-range data but
                # must stay finite; y is bounded by the y_pct domain
                assert np.isfinite(x) and np.isfinite(y)


class TestSchedulePages:
    def test_series_and_distributed_png(self, spark, tmp_path):
        from gtfs_fixtures import build_rt_events, build_schedule, write_gtfs_dir

        from dystonse_gtfs_importer_spark.plans.import_etl import (
            build_records, latest_wins_merge,
        )
        from dystonse_gtfs_importer_spark.plans.visual_schedule import (
            schedule_page_series,
        )
        from dystonse_gtfs_importer_spark.schemas import RT_EVENTS
        from dystonse_gtfs_importer_spark.sources.gtfs import (
            read_gtfs, variant_stops,
        )

        d = tmp_path / "g"
        d.mkdir()
        write_gtfs_dir(build_schedule(), d)
        sched = read_gtfs(spark, str(d))
        rt = spark.createDataFrame(
            build_rt_events(build_schedule()), RT_EVENTS)
        records = latest_wins_merge(build_records(
            rt, sched["trips"], sched["stop_times"], "test", "sched"))
        vstops = variant_stops(sched["trips"], sched["stop_times"])
        series = schedule_page_series(
            records, sched["trips"], sched["stop_times"], vstops)
        rows = series.collect()
        assert rows, "no polylines produced"
        planned = [r for r in rows if r.service_day is None]
        assert planned, "planned schedule lines missing"
        for r in rows:
            idxs = [p.stop_index for p in r.points]
            assert idxs == sorted(idxs)
            for p in r.points:
                assert 3.0 <= p.hour <= 27.0
        pages = rd.render_schedule_pages(series, height=128).collect()
        variants = {(r.route_id, r.route_variant) for r in rows}
        assert len(pages) == len(variants)
        for page in pages:
            img = decode_png(bytes(page.png))
            assert img.shape[0] == 128
            assert (img != 255).any(), "page rendered blank"
