"""S19 SVG / PNG sinks — pure-stdlib renderers for the three
presentation outputs the reference produces:

* :func:`curve_page_svg` — the gnuplot stop-pair curve page
  (draw_curves_for_stop_pair,
  /root/reference/src/analyser/curve_visualisation.rs:381-463):
  1024x768 SVG, x fixed to [-150, 450] s, y 0-100 %, dotted grid,
  x ticks every 60 s, y ticks every 10 %, dotted general departure
  line (#129245), dashed general arrival line (#08421F), focus curves
  on a PLASMA color ramp (``colorous::PLASMA.eval_rational(i, n+2)``),
  legend bottom-right titled "Sekunden (Anzahl Fahrten)".
* :func:`visual_schedule_png` — the plotters BitMapBackend schedule
  (/root/reference/src/analyser/visual_schedule.rs:425-546): white
  canvas ``stop_count*30+40`` px wide, trips drawn as alpha-0.3
  polylines over x = stop position in [-1, stop_count-1] and
  y = hour-of-day in [5, 27], colored green on weekdays, olive on
  Saturday, red on Sunday (LinSrgba at visual_schedule.rs:468-470).
* :func:`heat_strip_png` / :func:`heat_strip_data_url` — the
  monitor's per-departure probability strip
  (generate_png_data_url, /root/reference/src/monitor/mod.rs:1214-1262)
  rendered from the :func:`curves.heat_strip` density row.

Scale note: a page/strip is a bounded object (hundreds of points), so
rendering is a per-group map with no aggregation state —
:func:`render_curve_pages` runs it inside ``applyInPandas`` so a
100 TB history renders its millions of pages across the cluster; the
driver never holds more than the output rows it asked for.  The
string/byte builders themselves are deliberately dependency-free
(``encode_png`` is the stdlib zlib encoder from
:mod:`operators.media_codecs`).
"""

from __future__ import annotations

import base64

import numpy as np

from .operators.media_codecs import encode_png

__all__ = [
    "plasma",
    "curve_page_svg",
    "visual_schedule_png",
    "heat_strip_png",
    "heat_strip_data_url",
    "render_curve_pages",
]

# matplotlib/colorous PLASMA anchor points (t, r, g, b) — linear
# interpolation between anchors is visually indistinguishable from the
# full 256-entry table for ramp use.
_PLASMA = np.array([
    (0.00, 13, 8, 135),
    (0.25, 126, 3, 168),
    (0.50, 204, 71, 120),
    (0.75, 248, 149, 64),
    (1.00, 240, 249, 33),
], dtype=np.float64)


def plasma(t: float) -> tuple[int, int, int]:
    """PLASMA color ramp at ``t`` in [0, 1] → (r, g, b)."""
    t = min(max(float(t), 0.0), 1.0)
    r = np.interp(t, _PLASMA[:, 0], _PLASMA[:, 1])
    g = np.interp(t, _PLASMA[:, 0], _PLASMA[:, 2])
    b = np.interp(t, _PLASMA[:, 0], _PLASMA[:, 3])
    return int(round(r)), int(round(g)), int(round(b))


def _hex(rgb: tuple[int, int, int]) -> str:
    return "#%02x%02x%02x" % rgb


# ---------------------------------------------------------------------------
# SVG curve page (curve_visualisation.rs:381-463)
# ---------------------------------------------------------------------------

_SVG_W, _SVG_H = 1024, 768
_MARGIN = {"left": 64, "right": 16, "top": 40, "bottom": 48}
_X_MIN, _X_MAX = -150.0, 450.0          # axes.set_x_range(Fix(-150), Fix(450))
_Y_MIN, _Y_MAX = 0.0, 100.0             # percent


def _sx(x: float) -> float:
    w = _SVG_W - _MARGIN["left"] - _MARGIN["right"]
    return _MARGIN["left"] + (x - _X_MIN) / (_X_MAX - _X_MIN) * w


def _sy(y: float) -> float:
    h = _SVG_H - _MARGIN["top"] - _MARGIN["bottom"]
    return _SVG_H - _MARGIN["bottom"] - (y - _Y_MIN) / (_Y_MAX - _Y_MIN) * h


def _polyline(xs, ys, color: str, width: float, dash: str | None,
              markers: bool) -> list[str]:
    pts = " ".join(f"{_sx(x):.1f},{_sy(y):.1f}" for x, y in zip(xs, ys))
    dash_attr = f' stroke-dasharray="{dash}"' if dash else ""
    out = [f'<polyline fill="none" stroke="{color}" '
           f'stroke-width="{width}"{dash_attr} points="{pts}"/>']
    if markers:   # gnuplot lines_points: small point at each vertex
        out += [f'<circle cx="{_sx(x):.1f}" cy="{_sy(y):.1f}" r="1.8" '
                f'fill="{color}"/>' for x, y in zip(xs, ys)]
    return out


def curve_page_svg(title: str,
                   focus_curves: list[tuple[float | None, list[tuple[float, float]]]],
                   general_departure: list[tuple[float, float]] | None = None,
                   general_arrival: list[tuple[float, float]] | None = None,
                   sample_size: int = 0) -> str:
    """One stop-pair curve page as an SVG string.

    ``focus_curves`` holds (focus_seconds_or_None, [(x, y_pct), ...])
    in the curve-set order; general curves are pre-scaled (x, y_pct)
    series — exactly the rows :func:`plans.visual_schedule.
    stop_pair_curve_series` emits.  Mirrors the gnuplot page: grid,
    fixed ranges, styles and the legend block.
    """
    from xml.sax.saxutils import escape

    title = escape(title)
    e = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{_SVG_W}" '
         f'height="{_SVG_H}" viewBox="0 0 {_SVG_W} {_SVG_H}">',
         f'<rect width="{_SVG_W}" height="{_SVG_H}" fill="white"/>',
         f'<title>{title}</title>',
         f'<text x="{_SVG_W / 2:.0f}" y="24" text-anchor="middle" '
         f'font-family="sans-serif" font-size="16">{title}</text>']
    # dotted grid: x every 60 s, y every 10 % (set_x_ticks Fix(60) /
    # set_y_ticks Fix(10), grid Dot #AAAAAA)
    x = int(np.ceil(_X_MIN / 60.0)) * 60
    while x <= _X_MAX:
        e.append(f'<line x1="{_sx(x):.1f}" y1="{_sy(_Y_MIN):.1f}" '
                 f'x2="{_sx(x):.1f}" y2="{_sy(_Y_MAX):.1f}" '
                 f'stroke="#AAAAAA" stroke-dasharray="1,3"/>')
        e.append(f'<text x="{_sx(x):.1f}" y="{_SVG_H - _MARGIN["bottom"] + 18}" '
                 f'text-anchor="middle" font-family="sans-serif" '
                 f'font-size="12">{x}</text>')
        x += 60
    y = 0
    while y <= 100:
        e.append(f'<line x1="{_sx(_X_MIN):.1f}" y1="{_sy(y):.1f}" '
                 f'x2="{_sx(_X_MAX):.1f}" y2="{_sy(y):.1f}" '
                 f'stroke="#AAAAAA" stroke-dasharray="1,3"/>')
        e.append(f'<text x="{_MARGIN["left"] - 8}" y="{_sy(y) + 4:.1f}" '
                 f'text-anchor="end" font-family="sans-serif" '
                 f'font-size="12">{y} %</text>')
        y += 10
    # axes frame
    e.append(f'<rect x="{_MARGIN["left"]}" y="{_MARGIN["top"]}" '
             f'width="{_SVG_W - _MARGIN["left"] - _MARGIN["right"]}" '
             f'height="{_SVG_H - _MARGIN["top"] - _MARGIN["bottom"]}" '
             f'fill="none" stroke="black"/>')

    legend = ["Sekunden (Anzahl Fahrten)"]
    if general_departure:
        xs, ys = zip(*general_departure)
        e += _polyline(xs, ys, "#129245", 3.0, "2,4", True)
        legend.append("Abfahrt am Start")
    if general_arrival:
        xs, ys = zip(*general_arrival)
        e += _polyline(xs, ys, "#08421F", 3.0, "8,4", True)
        legend.append("Ankunft am Ende")
    legend.append("Nach Anfangsverspätung:")  # the invisible legend spacer
    n = len(focus_curves)
    for i, (focus, pts) in enumerate(focus_curves):
        color = _hex(plasma(i / (n + 1)))  # eval_rational(i, n + 2)
        xs, ys = zip(*pts)
        e += _polyline(xs, ys, color, 1.5, None, True)
        label = "alle Daten" if focus is None else f"{focus:.0f} s"
        legend.append(f"{label} ({sample_size})")
    # legend bottom-right (Graph(0.97), Graph(0.03), AlignRight/Bottom)
    ly = _sy(_Y_MIN) - 10 - 16 * len(legend)
    for i, text in enumerate(legend):
        e.append(f'<text x="{_sx(_X_MAX) - 10:.1f}" y="{ly + 16 * i:.1f}" '
                 f'text-anchor="end" font-family="sans-serif" '
                 f'font-size="12" class="legend">{escape(text)}</text>')
    e.append("</svg>")
    return "\n".join(e)


# ---------------------------------------------------------------------------
# PNG visual schedule (visual_schedule.rs:425-546)
# ---------------------------------------------------------------------------

# LinSrgba::new(r, g, b, 0.3) at visual_schedule.rs:468-470
_WEEKDAY_RGBA = (0, 128, 0, 0.3)
_SATURDAY_RGBA = (128, 128, 0, 0.3)
_SUNDAY_RGBA = (128, 0, 0, 0.3)
_SCHEDULE_RGBA = (0, 0, 0, 0.9)


def _blend_line(img: np.ndarray, x0: float, y0: float, x1: float,
                y1: float, rgba: tuple[int, int, int, float],
                width: int = 2) -> None:
    """Alpha-composite a ``width``-px line segment into ``img``."""
    h, w = img.shape[:2]
    r, g, b, a = rgba
    steps = max(int(max(abs(x1 - x0), abs(y1 - y0))) + 1, 2)
    xs = np.round(np.linspace(x0, x1, steps)).astype(np.int64)
    ys = np.round(np.linspace(y0, y1, steps)).astype(np.int64)
    pix = set()
    for d in range(width):
        pix.update(zip(xs + d % 2, ys + d // 2))
    for px, py in pix:
        if 0 <= px < w and 0 <= py < h:
            img[py, px] = (1 - a) * img[py, px] + a * np.array([r, g, b])


def visual_schedule_png(trip_series: list[dict], stop_count: int,
                        height: int = 1024) -> bytes:
    """The visual schedule raster.  ``trip_series`` rows carry
    ``date`` (datetime.date or None for planned schedule) and
    ``points`` = [(stop_position, hour_of_day), ...] with hour in the
    reference's 5..27 noon-anchored range.  Height defaults to 1024
    (the reference uses 4096; linear in height, kept small for tests).
    """
    width = stop_count * 30 + 40
    img = np.full((height, width, 3), 255.0)
    mx, my = 20, 20   # margins (reference: 20 + label areas)
    px_w, px_h = width - 2 * mx, height - 2 * my

    def to_px(pos: float, hour: float) -> tuple[float, float]:
        x = mx + (pos - (-1.0)) / (stop_count - 1 - (-1.0)) * px_w
        y = my + (hour - 5.0) / (27.0 - 5.0) * px_h
        return x, y

    for row in trip_series:
        date = row.get("date")
        if date is None:
            rgba = _SCHEDULE_RGBA
        elif date.weekday() == 5:
            rgba = _SATURDAY_RGBA
        elif date.weekday() == 6:
            rgba = _SUNDAY_RGBA
        else:
            rgba = _WEEKDAY_RGBA
        pts = [to_px(p, hr) for p, hr in row["points"]]
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            _blend_line(img, x0, y0, x1, y1, rgba)
    return encode_png(np.clip(np.round(img), 0, 255).astype(np.uint8))


# ---------------------------------------------------------------------------
# heat-strip PNG + data URL (monitor/mod.rs:1214-1262)
# ---------------------------------------------------------------------------

def heat_strip_png(strip: np.ndarray, height: int = 1) -> bytes:
    """Density strip (probability mass per pixel column, from
    :func:`curves.heat_strip`) → an RGB PNG ``height`` px tall, PLASMA
    colormap normalized to the strip's max bin (the reference maps
    density to pixel alpha; a colormap strip carries the same series)."""
    strip = np.asarray(strip, dtype=np.float64)
    peak = strip.max() if strip.size and strip.max() > 0 else 1.0
    cols = np.array([plasma(v / peak) for v in strip], dtype=np.uint8)
    return encode_png(np.tile(cols[None, :, :], (height, 1, 1)))


def heat_strip_data_url(strip: np.ndarray, height: int = 1) -> str:
    """C22: the ``data:image/png;base64,`` URL the monitor embeds
    (generate_png_data_url, monitor/mod.rs:1260-1261)."""
    b64 = base64.b64encode(heat_strip_png(strip, height)).decode("ascii")
    return "data:image/png;base64," + b64


# ---------------------------------------------------------------------------
# distributed page renderer
# ---------------------------------------------------------------------------

def render_curve_pages(series_df):
    """Render every stop-pair page of a
    :func:`plans.visual_schedule.stop_pair_curve_series` DataFrame to
    SVG, one row per (route, variant, pair, slot) page — an
    ``applyInPandas`` per-group map, so page rendering parallelizes
    across executors and no page ever crosses the driver.
    """
    import pandas as pd

    keys = ["route_id", "route_variant", "time_slot",
            "start_stop_index", "end_stop_index"]

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        k = pdf.iloc[0]
        title = (f"{k.route_id}/{k.route_variant} "
                 f"{int(k.start_stop_index)}->{int(k.end_stop_index)} "
                 f"slot {int(k.time_slot)}")
        def series_pts(name: str):
            s = pdf[pdf.series == name].sort_values("x")
            return [(float(r.x), float(r.y_pct)) for r in s.itertuples()]

        gen_dep = series_pts("departure_at_start")
        gen_arr = series_pts("arrival_at_end")
        sets = pdf[pdf.series == "curve_set"]
        sample = int(sets.sample_size.max()) if len(sets) else 0
        curves = []
        for focus, grp in sorted(
                sets.groupby("focus", dropna=False),
                key=lambda kv: (np.isnan(kv[0]), kv[0])):
            pts = [(r.x, r.y_pct) for r in
                   grp.sort_values("x").itertuples()]
            curves.append((None if np.isnan(focus) else float(focus), pts))
        svg = curve_page_svg(title, curves, gen_dep or None,
                             gen_arr or None, sample)
        return pd.DataFrame([{**{c: k[c] for c in keys}, "svg": svg}])

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(series_df.select(*keys).schema.fields)
                        + [StructField("svg", StringType())])
    return (series_df.groupBy(*keys)
            .applyInPandas(render, schema=schema))


def render_schedule_pages(page_series_df, height: int = 1024):
    """Render every (route, variant) visual-schedule page of a
    :func:`plans.visual_schedule.schedule_page_series` DataFrame to
    PNG — the distributed twin of the reference's per-group
    BitMapBackend loop (visual_schedule.rs:425-546), one
    ``applyInPandas`` group per page, PNG bytes as a ``binary``
    column; no page crosses the driver.
    """
    import pandas as pd

    keys = ["route_id", "route_variant"]

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        k = pdf.iloc[0]
        series = [{"date": None if pd.isna(r.service_day) else r.service_day,
                   "points": [(p["stop_index"], p["hour"])
                              for p in r.points]}
                  for r in pdf.itertuples()]
        png = visual_schedule_png(series, int(k.stop_count), height=height)
        return pd.DataFrame([{"route_id": k.route_id,
                              "route_variant": k.route_variant,
                              "png": png}])

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(page_series_df.select(*keys).schema.fields)
                        + [StructField("png", BinaryType())])
    return (page_series_df.groupBy(*keys)
            .applyInPandas(render, schema=schema))
