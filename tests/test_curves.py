"""Unit tests pinning the NumPy curve library's semantics against the
reference's behavior (curve_utils.rs / time_curve.rs / journey_data.rs),
including its documented quirks."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dystonse_gtfs_importer_spark import curves as cv


class TestGetWeight:
    def test_no_focus_inside_bounds(self):
        assert cv.get_weight(5.0, None, 0.0, 10.0) == 1.0

    def test_outside_bounds_is_zero(self):
        assert cv.get_weight(-1.0, None, 0.0, 10.0) == 0.0
        assert cv.get_weight(11.0, 3.0, 0.0, 10.0) == 0.0

    def test_triangular(self):
        # focus=10, bounds [0, 20]: weight ramps 0→1→0
        assert cv.get_weight(10.0, 10.0, 0.0, 20.0) == 1.0
        assert cv.get_weight(5.0, 10.0, 0.0, 20.0) == pytest.approx(0.5)
        assert cv.get_weight(15.0, 10.0, 0.0, 20.0) == pytest.approx(0.5)
        assert cv.get_weight(0.0, 10.0, 0.0, 20.0) == 0.0
        # focus at min bound: division guarded, weight at focus is 1
        assert cv.get_weight(0.0, 0.0, 0.0, 20.0) == 1.0


class TestMakeCurve:
    def test_simple_ecdf(self):
        made = cv.make_curve([10.0, 20.0, 30.0, 40.0])
        assert made is not None
        c, total = made
        assert total == 4.0
        np.testing.assert_allclose(c.xs, [10, 20, 30, 40])
        # cumulative 1/4, 2/4, 3/4 then forced endpoints 0 and 1
        np.testing.assert_allclose(c.ys, [0.0, 0.5, 0.75, 1.0])

    def test_duplicate_collapse_keeps_first_cumulative(self):
        # values [1,2,2,3]: point at x=2 carries cum weight of the FIRST 2
        made = cv.make_curve([1.0, 2.0, 2.0, 3.0])
        c, total = made
        np.testing.assert_allclose(c.xs, [1, 2, 3])
        np.testing.assert_allclose(c.ys, [0.0, 2.0 / 4.0, 1.0])

    def test_leading_zero_sentinel_quirk(self):
        # reference inits last_x=0.0, so a smallest value of exactly 0.0
        # emits no point of its own
        made = cv.make_curve([0.0, 5.0, 9.0])
        c, _ = made
        np.testing.assert_allclose(c.xs, [5, 9])
        np.testing.assert_allclose(c.ys, [0.0, 1.0])

    def test_fewer_than_two_points_rejected(self):
        assert cv.make_curve([7.0, 7.0, 7.0]) is None
        assert cv.make_curve([]) is None

    def test_focused_weighting(self):
        vals = [0.0, 10.0, 20.0, 30.0, 40.0]
        c, total = cv.make_curve(vals, focus=20.0)
        # weights: 0 (at min), .5, 1, .5, 0 (at max) → total 2
        assert total == pytest.approx(2.0)
        # x=10 cum=0.5 → y=0.25 ; x=20 cum=1.5 → 0.75 ; endpoints forced
        np.testing.assert_allclose(c.xs, [10, 20, 30, 40])
        np.testing.assert_allclose(c.ys, [0.0, 0.75, 1.0, 1.0])

    def test_monotone_and_bounded(self):
        rng = np.random.default_rng(42)
        vals = rng.normal(60, 120, size=500).round()
        c, _ = cv.make_curve(vals)
        assert np.all(np.diff(c.xs) > 0)
        assert np.all(np.diff(c.ys) >= 0)
        assert c.ys[0] == 0.0 and c.ys[-1] == 1.0


class TestInterp:
    def setup_method(self):
        self.c = cv.Curve([0.0, 10.0, 20.0], [0.0, 0.25, 1.0])

    def test_y_at_x_clamps(self):
        assert cv.y_at_x(self.c, -5) == 0.0
        assert cv.y_at_x(self.c, 25) == 1.0
        assert cv.y_at_x(self.c, 5) == pytest.approx(0.125)
        assert cv.y_at_x(self.c, 15) == pytest.approx(0.625)

    def test_x_at_y(self):
        assert cv.x_at_y(self.c, 0.0) == 0.0
        assert cv.x_at_y(self.c, 1.0) == 20.0
        assert cv.x_at_y(self.c, 0.25) == pytest.approx(10.0)
        assert cv.x_at_y(self.c, 0.625) == pytest.approx(15.0)

    def test_percentiles(self):
        ps = cv.percentiles(self.c)
        assert ps[0.5] == pytest.approx(cv.x_at_y(self.c, 0.5))
        assert set(ps) == {0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99}


class TestSimplify:
    def test_collinear_points_dropped(self):
        c = cv.Curve([0, 5, 10, 20], [0.0, 0.25, 0.5, 1.0])
        s = cv.simplify(c, 0.01)
        np.testing.assert_allclose(s.xs, [0, 20])
        np.testing.assert_allclose(s.ys, [0.0, 1.0])

    def test_significant_point_kept(self):
        c = cv.Curve([0, 10, 20], [0.0, 0.9, 1.0])
        s = cv.simplify(c, 0.01)
        assert len(s) == 3

    def test_endpoints_always_kept(self):
        c = cv.Curve([0, 1, 2, 3], [0.0, 0.001, 0.999, 1.0])
        s = cv.simplify(c, 0.05)
        assert s.xs[0] == 0 and s.xs[-1] == 3
        assert s.ys[0] == 0.0 and s.ys[-1] == 1.0

    def test_error_bound_respected(self):
        rng = np.random.default_rng(7)
        vals = rng.normal(0, 100, 400)
        c, _ = cv.make_curve(vals)
        for eps in (0.01, 0.001, 0.05):
            s = cv.simplify(c, eps)
            err = np.abs(np.interp(c.xs, s.xs, s.ys) - c.ys)
            # corridor simplify bounds global deviation by eps
            assert err.max() <= eps + 1e-12


class TestAverage:
    def test_average_of_identical_is_identity(self):
        c = cv.Curve([0, 10, 20], [0.0, 0.3, 1.0])
        a = cv.average_curves([c, c, c])
        np.testing.assert_allclose(np.interp(c.xs, a.xs, a.ys), c.ys)

    def test_average_midpoint(self):
        c1 = cv.Curve([0.0, 10.0], [0.0, 1.0])
        c2 = cv.Curve([0.0, 20.0], [0.0, 1.0])
        a = cv.average_curves([c1, c2])
        # at x=10: mean(1.0, 0.5) = 0.75
        assert cv.y_at_x(a, 10.0) == pytest.approx(0.75)


class TestRecurseMarkers:
    def test_no_subdivision_when_range_too_small(self):
        c, _ = cv.make_curve(np.arange(0.0, 30.0, 1.0) + 1)  # span 29s < 2*20s
        markers: list[float] = []
        cv.recurse_markers(c, c.min_x, c.max_x, 29.0, markers)
        assert markers == []

    def test_subdivides_large_dense_range(self):
        vals = np.linspace(1, 600, 300)
        c, _ = cv.make_curve(vals)
        markers: list[float] = []
        cv.recurse_markers(c, c.min_x, c.max_x, float(len(vals)), markers)
        assert len(markers) >= 1
        assert markers == sorted(markers)
        full = [c.min_x] + markers + [c.max_x]
        assert all(b - a >= 20.0 - 1e-6 for a, b in zip(full, full[1:]))


class TestStopPairCurveSet:
    def test_basic_curve_set(self):
        rng = np.random.default_rng(1)
        start = rng.normal(120, 100, 400)
        end = start + rng.normal(30, 50, 400)
        res = cv.stop_pair_curve_set(np.column_stack([start, end]))
        assert res is not None
        assert len(res["curves"]) >= 1
        assert res["sample_size"] > 0
        for focus, curve in res["curves"]:
            assert curve.ys[0] == 0.0 and curve.ys[-1] == 1.0
            assert curve.max_x >= curve.min_x + 13.0

    def test_degenerate_pairs_rejected(self):
        pairs = np.array([[5.0, 7.0]] * 30)  # all identical → <2 pts
        assert cv.stop_pair_curve_set(pairs) is None


class TestConvolveAndTransfer:
    def test_convolution_shifts_mean(self):
        arr = cv.make_curve(np.linspace(0, 240, 100))[0]
        dur = cv.walk_time_curve(100.0)
        conv = cv.convolve_duration(arr, dur)
        assert conv.ys[0] == 0.0 and conv.ys[-1] == 1.0
        assert np.all(np.diff(conv.ys) >= 0)
        m_arr = cv.x_at_y(arr, 0.5)
        m_dur = cv.x_at_y(dur, 0.5)
        m_conv = cv.x_at_y(conv, 0.5)
        # median of sum ≈ sum of medians for roughly symmetric inputs;
        # the coarse step grid allows up to ~1 step of slack
        assert abs(m_conv - (m_arr + m_dur)) < 60

    def test_transfer_probability_bounds(self):
        arr = cv.make_curve(np.linspace(0, 60, 50))[0]
        dep = cv.make_curve(np.linspace(300, 360, 50))[0]
        # departure long after arrival → certain transfer
        p = cv.transfer_probability(arr, 1000, dep, 1000)
        assert p == pytest.approx(1.0, abs=0.02)
        # departure long before arrival → certain miss
        p2 = cv.transfer_probability(arr, 1000 + 3600, dep, 1000)
        assert p2 == pytest.approx(0.0, abs=0.02)

    def test_transfer_probability_midway(self):
        arr = cv.make_curve(np.linspace(0, 120, 100))[0]
        dep = cv.make_curve(np.linspace(0, 120, 100))[0]
        p = cv.transfer_probability(arr, 0, dep, 0)
        assert 0.3 < p < 0.7


class TestWalkTime:
    def test_short_distance_fixed_curve(self):
        c = cv.walk_time_curve(5.0)
        np.testing.assert_allclose(c.xs, [-12.0, 12.0])

    def test_durations_scale_with_distance(self):
        for d in (20.0, 300.0, 500.0, 1000.0):
            c = cv.walk_time_curve(d)
            assert c.min_x >= d / 3.5 + 10 - 1e-3
            assert c.ys[0] == 0.0 and c.ys[-1] == 1.0
        m300 = cv.x_at_y(cv.walk_time_curve(300.0), 0.5)
        m600 = cv.x_at_y(cv.walk_time_curve(600.0), 0.5)
        assert m600 > m300

    def test_distance_factor_formula(self):
        # at 500 m the detour factor bottoms out at 1.4
        c = cv.walk_time_curve(500.0)
        assert c.max_x == pytest.approx(500 * 1.4 / 0.8 + 45, rel=0.02)


class TestCurveSetInterpolate:
    def setup_method(self):
        self.cs = [
            (0.0, cv.Curve([0.0, 10.0], [0.0, 1.0])),
            (100.0, cv.Curve([100.0, 110.0], [0.0, 1.0])),
        ]

    def test_clamping(self):
        assert cv.curve_set_interpolate(self.cs, -5.0).min_x == 0.0
        assert cv.curve_set_interpolate(self.cs, 500.0).min_x == 100.0

    def test_midpoint_blend(self):
        c = cv.curve_set_interpolate(self.cs, 50.0)
        # halfway blend: y at x=10 is mean(1.0, 0.0) = 0.5
        assert cv.y_at_x(c, 10.0) == pytest.approx(0.5)


class TestCompactCodec:
    def test_roundtrip(self):
        c, _ = cv.make_curve(np.random.default_rng(3).normal(0, 300, 200))
        blob = cv.serialize_compact(c)
        assert len(blob) <= 120
        back = cv.deserialize_compact(blob)
        assert back.min_x == pytest.approx(c.min_x, abs=0.1)
        assert back.max_x == pytest.approx(c.max_x, abs=0.1)
        grid = np.linspace(c.min_x, c.max_x, 50)
        err = np.abs(np.interp(grid, back.xs, back.ys) - np.interp(grid, c.xs, c.ys))
        assert err.max() < 0.08  # quantization + simplify tolerance

    def test_large_curve_fits_cap(self):
        c, _ = cv.make_curve(np.linspace(0, 10000, 5000))
        blob = cv.serialize_compact(c, 120)
        assert len(blob) <= 120


class TestJvmInterpExprs:
    def test_expr_matches_udf_and_numpy(self, spark):
        """C7 JVM twins: the higher-order-function expressions must
        reproduce the pandas UDFs (and NumPy) on random curves,
        including plateaus, exact ties, and out-of-range queries."""
        import pyspark.sql.functions as F

        from dystonse_gtfs_importer_spark.functions.curve_udfs import (
            curve_x_at_y, curve_x_at_y_expr, curve_y_at_x,
            curve_y_at_x_expr,
        )

        rng = np.random.default_rng(7)
        rows = []
        for i in range(200):
            n = int(rng.integers(2, 12))
            xs = np.sort(rng.choice(np.arange(-300, 300, 12), size=n,
                                    replace=False)).astype(float)
            ys = np.sort(rng.random(n))
            ys[0], ys[-1] = 0.0, 1.0
            if n > 3 and rng.random() < 0.5:
                ys[2] = ys[1]        # interior plateau
            if n > 3 and rng.random() < 0.3:
                ys[1] = 0.0          # LEADING duplicate (ties at q=0
                #                      must hit the run's right edge)
            rows.append((i, [(float(a), float(b))
                             for a, b in zip(xs, ys)],
                         float(rng.choice([0.0, 1.0,
                                           rng.uniform(-0.2, 1.2)])),
                         float(rng.uniform(-350, 350))))
        df = spark.createDataFrame(
            rows, "id long, curve array<struct<x:float,y:float>>, "
                  "q double, qx double")
        out = df.select(
            curve_x_at_y(F.col("curve"), F.col("q")).alias("ux"),
            curve_x_at_y_expr("curve", F.col("q")).alias("ex"),
            curve_y_at_x(F.col("curve"), F.col("qx")).alias("uy"),
            curve_y_at_x_expr("curve", F.col("qx")).alias("ey"),
        ).collect()
        for r in out:
            assert r.ux == pytest.approx(r.ex, abs=1e-6)
            assert r.uy == pytest.approx(r.ey, abs=1e-6)

    def test_null_and_short_curthan_two(self, spark):
        import pyspark.sql.functions as F

        from dystonse_gtfs_importer_spark.functions.curve_udfs import (
            curve_x_at_y_expr,
        )

        df = spark.createDataFrame(
            [(1, None), (2, [(0.0, 0.0)])],
            "id long, curve array<struct<x:float,y:float>>")
        out = df.select(
            curve_x_at_y_expr("curve", F.lit(0.5)).alias("v")).collect()
        assert [r.v for r in out] == [None, None]

    def test_null_query_yields_null_under_ansi(self, spark):
        import pyspark.sql.functions as F

        from dystonse_gtfs_importer_spark.functions.curve_udfs import (
            curve_x_at_y_expr, curve_y_at_x_expr,
        )

        df = spark.createDataFrame(
            [(1, [(0.0, 0.0), (10.0, 1.0)], None)],
            "id long, curve array<struct<x:float,y:float>>, q double")
        out = df.select(
            curve_x_at_y_expr("curve", F.col("q")).alias("a"),
            curve_y_at_x_expr("curve", F.col("q")).alias("b")).collect()
        assert out[0].a is None and out[0].b is None
