"""S19 heat-strip data series tests."""
import numpy as np
from dystonse_gtfs_importer_spark import curves as cv


class TestHeatStrip:
    def test_mass_sums_to_curve_span(self):
        c, _ = cv.make_curve(np.linspace(0, 600, 200))
        strip = cv.heat_strip(c, ref_s=1000.0,
                              window_start_s=1000.0, window_end_s=1600.0)
        assert strip.shape == (120,)
        assert np.all(strip >= 0)
        assert strip.sum() == 1.0  # full curve inside window

    def test_partial_window(self):
        c, _ = cv.make_curve(np.linspace(0, 600, 200))
        left = cv.heat_strip(c, 1000.0, 1000.0, 1300.0)
        right = cv.heat_strip(c, 1000.0, 1300.0, 1600.0)
        assert 0 < left.sum() < 1
        assert left.sum() + right.sum() == 1.0

    def test_outside_window_empty(self):
        c, _ = cv.make_curve(np.linspace(0, 600, 200))
        strip = cv.heat_strip(c, 1000.0, 5000.0, 6000.0)
        assert strip.sum() == 0.0
