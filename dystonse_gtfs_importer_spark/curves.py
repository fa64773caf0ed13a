"""Pure-NumPy probability-curve library.

Replaces the external ``dystonse-curves`` crate used by the reference.
A *curve* is a monotone piecewise-linear empirical CDF represented as
two float arrays (xs strictly increasing, ys nondecreasing with
ys[0] == 0.0 and ys[-1] == 1.0).  At DataFrame boundaries a curve is an
``array<struct<x:float,y:float>>`` column.

Semantics are re-derived from the reference call sites and pinned by
tests (the crate itself is out of scope):

- ``make_curve`` / ``get_weight``: /root/reference/src/analyser/curve_utils.rs:44-94
- ``recurse`` marker subdivision:  /root/reference/src/analyser/curve_utils.rs:10-42
- convolution ``add_duration_curve``: /root/reference/src/monitor/time_curve.rs:34-77
- ``transfer_probability``: /root/reference/src/monitor/time_curve.rs:18-32
- ``walk_time_curve``: /root/reference/src/monitor/journey_data.rs:557-594
- stop-pair curve sets: /root/reference/src/analyser/specific_curves.rs:371-426
- ``simplify(eps)`` / ``average`` / ``x_at_y`` live in the external
  crate; our pinned definitions: see each docstring.

Everything here is deliberately NumPy-only (no Spark imports) so the
same code runs inside Arrow-batched pandas UDFs and in unit tests.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "Curve",
    "make_curve",
    "make_curve_counted",
    "get_weight",
    "y_at_x",
    "x_at_y",
    "simplify",
    "average_curves",
    "recurse_markers",
    "stop_pair_curve_set",
    "convolve_duration",
    "transfer_probability",
    "walk_time_curve",
    "curve_set_interpolate",
    "percentiles",
    "heat_strip",
    "serialize_compact",
    "deserialize_compact",
]


class Curve:
    """Monotone piecewise-linear CDF.

    Invariants (checked in ``__init__`` when ``validate=True``):
    xs strictly increasing; ys nondecreasing; ys[0] == 0.0; ys[-1] == 1.0.
    """

    __slots__ = ("xs", "ys")

    def __init__(self, xs, ys, validate: bool = True):
        self.xs = np.asarray(xs, dtype=np.float64)
        self.ys = np.asarray(ys, dtype=np.float64)
        if validate:
            if self.xs.ndim != 1 or self.xs.shape != self.ys.shape:
                raise ValueError("xs/ys must be 1-D arrays of equal length")
            if len(self.xs) < 2:
                raise ValueError("curve needs >= 2 points")
            if not np.all(np.diff(self.xs) > 0):
                raise ValueError("xs must be strictly increasing")
            if not np.all(np.diff(self.ys) >= -1e-12):
                raise ValueError("ys must be nondecreasing")

    # -- basic accessors -------------------------------------------------
    @property
    def min_x(self) -> float:
        return float(self.xs[0])

    @property
    def max_x(self) -> float:
        return float(self.xs[-1])

    def __len__(self) -> int:
        return len(self.xs)

    def __repr__(self) -> str:  # pragma: no cover
        pts = ", ".join(f"({x:g},{y:g})" for x, y in zip(self.xs, self.ys))
        return f"Curve[{pts}]"

    def points(self) -> list[dict]:
        """Rows for an array<struct<x:float,y:float>> column."""
        return [
            {"x": float(np.float32(x)), "y": float(np.float32(y))}
            for x, y in zip(self.xs, self.ys)
        ]

    @staticmethod
    def from_points(points) -> "Curve":
        """Build from [{'x':..,'y':..}, ...] / list of pairs / ndarray."""
        if isinstance(points, np.ndarray) and points.ndim == 2:
            return Curve(points[:, 0], points[:, 1], validate=False)
        xs, ys = [], []
        for p in points:
            if isinstance(p, dict):
                xs.append(p["x"])
                ys.append(p["y"])
            else:  # Row / tuple
                xs.append(p[0])
                ys.append(p[1])
        return Curve(xs, ys, validate=False)


# -- interpolation -------------------------------------------------------

def y_at_x(curve: Curve, x) -> np.ndarray | float:
    """Piecewise-linear CDF evaluation; clamps to 0 below min_x and to
    1 above max_x (reference relies on this, e.g.
    /root/reference/src/monitor/time_curve.rs:59-61)."""
    return np.interp(x, curve.xs, curve.ys)


def x_at_y(curve: Curve, y) -> np.ndarray | float:
    """Inverse CDF.  On plateaus (duplicate y) NumPy's interp picks the
    right edge of a run when interpolating an exact tie; this pinned
    behavior is deterministic and monotone, which is all downstream
    code (percentiles, recurse bounds) requires."""
    return np.interp(y, curve.ys, curve.xs)


def percentiles(curve: Curve, ps=(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)):
    """C11: delay at the standard probability levels
    (/root/reference/src/types/prediction_result.rs:40-47)."""
    return {p: float(x_at_y(curve, p)) for p in ps}


# -- construction --------------------------------------------------------

def get_weight(delay, focus, min_delay: float, max_delay: float):
    """Triangular kernel: weight 1.0 at ``focus`` falling linearly to 0
    at min_delay/max_delay; 1.0 everywhere when focus is None; 0 outside
    the bounds.  Vectorized mirror of
    /root/reference/src/analyser/curve_utils.rs:44-63."""
    d = np.asarray(delay, dtype=np.float64)
    inside = (d >= min_delay) & (d <= max_delay)
    if focus is None:
        w = np.where(inside, 1.0, 0.0)
    else:
        lo_span = focus - min_delay
        hi_span = max_delay - focus
        below = np.divide(d - min_delay, lo_span, out=np.ones_like(d), where=lo_span != 0)
        above = 1.0 - np.divide(d - focus, hi_span, out=np.zeros_like(d), where=hi_span != 0)
        w = np.where(d == focus, 1.0, np.where(d < focus, below, above))
        w = np.where(inside, w, 0.0)
    return w


def make_curve(values, focus: float | None = None) -> tuple[Curve, float] | None:
    """The central UDAF kernel: weighted ECDF over ``values``.

    Faithful mirror of /root/reference/src/analyser/curve_utils.rs:65-94
    including its quirks, pinned by tests:

    * duplicate x keeps the cumulative weight as of the *first*
      occurrence (later duplicates add weight but emit no point);
    * the dedup sentinel starts at x=0.0, so a smallest value of
      exactly 0.0 emits no point of its own;
    * first/last y forced to exactly 0.0 / 1.0;
    * returns None when fewer than 2 points survive (caller skips).

    Returns (curve, sum_of_weights).
    """
    v = np.sort(np.asarray(values, dtype=np.float64))
    if v.size == 0:
        return None
    min_d, max_d = float(v[0]), float(v[-1])
    w = get_weight(v, focus, min_d, max_d)
    total = float(w.sum())
    if total <= 0:
        return None
    cum = np.cumsum(w)
    # emit a point at the first occurrence of each distinct x, except a
    # leading x == 0.0 (the reference's last_x sentinel starts at 0.0)
    first_occ = np.empty(v.size, dtype=bool)
    first_occ[0] = v[0] != 0.0
    first_occ[1:] = v[1:] != v[:-1]
    xs = v[first_occ]
    ys = cum[first_occ] / total
    if xs.size < 2:
        return None
    # cum/total can exceed 1.0 by an ulp for focused weights; clamp so
    # forcing the final point to exactly 1.0 cannot create a decrease
    ys = np.clip(ys, 0.0, 1.0)
    ys[0] = 0.0
    ys[-1] = 1.0
    return Curve(xs, ys, validate=False), total


def make_curve_counted(values, counts, focus: float | None = None
                       ) -> tuple[Curve, float] | None:
    """``make_curve`` over pre-aggregated (value, count) pairs —
    identical semantics, computed from multiplicities.

    This is the map-side-combine form: weights depend only on the
    value, so the cumulative weight at a value's first occurrence is
    Σ w(v)·cnt(v) for v < x, plus one w(x).  Upstream can shuffle one
    row per *distinct* value instead of one per observation (for 12 s
    rounded delays bounded by ±3000 s that is ≤ 500 rows per group
    regardless of record volume).
    """
    v = np.asarray(values, dtype=np.float64)
    c = np.asarray(counts, dtype=np.float64)
    if v.size == 0:
        return None
    order = np.argsort(v)
    v, c = v[order], c[order]
    min_d, max_d = float(v[0]), float(v[-1])
    w = get_weight(v, focus, min_d, max_d)
    total = float((w * c).sum())
    if total <= 0:
        return None
    cum_before = np.concatenate([[0.0], np.cumsum(w * c)[:-1]])
    cum_first = cum_before + w
    keep = v != 0.0 if v[0] == 0.0 else np.ones(v.size, dtype=bool)
    xs = v[keep]
    ys = cum_first[keep] / total
    if xs.size < 2:
        return None
    ys = np.clip(ys, 0.0, 1.0)
    ys[0] = 0.0
    ys[-1] = 1.0
    return Curve(xs, ys, validate=False), total


def simplify(curve: Curve, eps: float) -> Curve:
    """Drop interior points whose y deviates by <= eps from the linear
    interpolation of their kept neighbors.

    The crate's implementation is external; this is our pinned
    re-derivation: greedy forward corridor — from each kept anchor,
    extend the candidate segment as far as every skipped interior point
    stays within eps (vertically) of the anchor→candidate chord.  This
    bounds the deviation of the simplified curve from the original by
    eps everywhere.  Deterministic, preserves endpoints and
    monotonicity.
    """
    xs, ys = curve.xs, curve.ys
    n = len(xs)
    if n <= 2:
        return curve
    kept = [0]
    anchor = 0
    while anchor < n - 1:
        best = anchor + 1
        for e in range(anchor + 2, n):
            x0, y0 = xs[anchor], ys[anchor]
            chord = y0 + (xs[anchor + 1:e] - x0) * (ys[e] - y0) / (xs[e] - x0)
            if np.abs(chord - ys[anchor + 1:e]).max() <= eps:
                best = e
            else:
                break
        kept.append(best)
        anchor = best
    idx = np.asarray(kept)
    return Curve(xs[idx], ys[idx], validate=False)


def average_curves(curves: list[Curve]) -> Curve:
    """Pointwise mean of N curves on the union of their x grids, with
    endpoints re-forced to 0/1 (pinned semantics for the crate's
    ``IrregularDynamicCurve::average``, used at
    /root/reference/src/types/curve_data.rs:21-42)."""
    if not curves:
        raise ValueError("average of zero curves")
    grid = np.unique(np.concatenate([c.xs for c in curves]))
    ys = np.mean([np.interp(grid, c.xs, c.ys) for c in curves], axis=0)
    ys[0] = 0.0
    ys[-1] = 1.0
    return Curve(grid, ys, validate=False)


# -- marker subdivision + stop-pair curve sets ---------------------------

def recurse_markers(initial_curve: Curve, lower: float, upper: float, count: float,
                    markers: list[float]) -> None:
    """Adaptive binary subdivision of the initial-delay axis: a new
    marker must be >= 20 s from both neighbors and have >= 20 data
    points on each side (mirror of
    /root/reference/src/analyser/curve_utils.rs:10-42)."""
    min_x_by_delay = lower + 20.0
    max_x_by_delay = upper - 20.0
    lower_y = float(y_at_x(initial_curve, lower))
    upper_y = float(y_at_x(initial_curve, upper))
    min_x_by_count = float(x_at_y(initial_curve, lower_y + 20.0 / count))
    max_x_by_count = float(x_at_y(initial_curve, upper_y - 20.0 / count))
    min_x = max(min_x_by_delay, min_x_by_count)
    max_x = min(max_x_by_delay, max_x_by_count)
    if min_x <= max_x:
        mid_x = (min_x + max_x) / 2.0
        recurse_markers(initial_curve, lower, mid_x, count, markers)
        markers.append(mid_x)
        recurse_markers(initial_curve, mid_x, upper, count, markers)


def stop_pair_curve_set(pairs: np.ndarray) -> dict | None:
    """Build the CurveSet for one (start stop, end stop) group.

    ``pairs``: (n, 2) array of (delay_at_start, delay_at_end).
    Mirrors /root/reference/src/analyser/specific_curves.rs:371-426:
    sort by start delay; markers via recurse; per (lower, mid, upper)
    marker window build a curve of end delays focused at mid; simplify
    at 0.001; discard curves with x-span < 13 s; returns None when no
    curve survives.

    Returns {"curves": [(focus, Curve)], "sample_size": int}.
    """
    pairs = np.asarray(pairs, dtype=np.float64)
    order = np.argsort(pairs[:, 0], kind="stable")
    pairs = pairs[order]
    count = len(pairs)
    made = make_curve(pairs[:, 0], None)
    if made is None:
        return None
    initial_curve, _ = made
    markers: list[float] = [initial_curve.min_x, initial_curve.min_x]
    recurse_markers(initial_curve, initial_curve.min_x, initial_curve.max_x,
                    float(count), markers)
    markers.extend([initial_curve.max_x, initial_curve.max_x])

    sample_size = 0
    out: list[tuple[float, Curve]] = []
    for lower, mid, upper in zip(markers, markers[1:], markers[2:]):
        # index window: share of points below the lower/upper markers
        min_index = int(count * float(y_at_x(initial_curve, lower)))
        max_index = int(count * float(y_at_x(initial_curve, upper)))
        sl = pairs[min_index:max_index, 1]
        sample_size += len(sl)
        if len(sl) > 1:
            made = make_curve(sl, float(mid))
            if made is None:
                continue
            curve, _ = made
            curve = simplify(curve, 0.001)
            if curve.max_x < curve.min_x + 13.0:
                continue
            out.append((float(mid), curve))
    if not out:
        return None
    # reference: average samples per curve (integer division)
    return {"curves": out, "sample_size": sample_size // len(out)}


# -- probability arithmetic (monitor layer) ------------------------------

def convolve_duration(arrival: Curve, duration: Curve) -> Curve:
    """Discrete convolution of an arrival-time CDF with a duration CDF
    (both in relative seconds), yielding the CDF of arrival+duration.

    Faithful mirror of /root/reference/src/monitor/time_curve.rs:34-77
    including its integer step arithmetic (trunc-toward-zero division),
    the early break once the cumulative sum exceeds 1, and the final
    simplify(0.05).
    """
    min_n = math.floor(float(x_at_y(arrival, 0.01)) + float(x_at_y(duration, 0.01)))
    max_n = math.ceil(float(x_at_y(arrival, 0.99)) + float(x_at_y(duration, 0.99)))
    span = max_n - min_n
    # Rust: i32::max(12, (max_n - min_n) / 200 * 2) — trunc division
    step = max(12, int(span / 200) * 2)
    half = step // 2
    min_n -= step
    max_n += step
    min_k = int(duration.min_x) - step
    max_k = int(math.ceil(duration.max_x)) + step

    ks = np.arange(min_k, max_k, step, dtype=np.float64)
    dur_mass = np.interp(ks + half, duration.xs, duration.ys) - np.interp(
        ks - half, duration.xs, duration.ys)

    xs: list[float] = []
    ys: list[float] = []
    total = 0.0
    for n in range(min_n, max_n, step):
        arr_mass = np.interp(n - ks + half, arrival.xs, arrival.ys) - np.interp(
            n - ks - half, arrival.xs, arrival.ys)
        total += float(np.maximum(0.0, arr_mass * dur_mass).sum())
        if not xs:
            xs.append(float(n - step))
            ys.append(0.0)
        if total > 1.0:
            break
        xs.append(float(n))
        ys.append(total)
    xs.append(float(max_n + step))
    ys.append(1.0)
    # points may be non-monotone in pathological float cases; clamp
    ys_arr = np.minimum(np.maximum.accumulate(np.asarray(ys)), 1.0)
    curve = Curve(np.asarray(xs), ys_arr, validate=False)
    return simplify(curve, 0.05)


def transfer_probability(arrival: Curve, arrival_ref_s: int,
                         departure: Curve, departure_ref_s: int) -> float:
    """P(catching a departure given an arrival-time distribution):
    1 − Σ over 100 arrival percentiles of P(departure already gone).

    Mirror of /root/reference/src/monitor/time_curve.rs:18-32, keeping
    the reference's whole-second truncation of the typed x↔y hops
    (chrono Duration::seconds casts f32→i64, trunc toward zero)."""
    ps = np.arange(0, 100, dtype=np.float64) / 100.0
    rel_arrivals = np.trunc(np.interp(ps, arrival.ys, arrival.xs))
    abs_arrivals = arrival_ref_s + rel_arrivals
    rel_for_dep = np.trunc(abs_arrivals - departure_ref_s)
    miss = np.interp(rel_for_dep, departure.xs, departure.ys)
    return float(1.0 - miss.sum() / 100.0)


def walk_time_curve(distance_meters: float) -> Curve:
    """Synthetic walk-duration CDF for a transfer of ``distance_meters``
    (air-line); mirror of
    /root/reference/src/monitor/journey_data.rs:557-594."""
    if distance_meters < 20.0:
        return Curve([-12.0, 12.0], [0.0, 1.0], validate=False)
    max_distance_factor = 1.4 + max(0.0, min(0.4, (500.0 - distance_meters) / 500.0 * 0.4))
    min_duration = distance_meters * 1.0 / 3.5 + 10.0
    max_duration = distance_meters * max_distance_factor / 0.8 + 45.0
    p = np.arange(0, 101, 5, dtype=np.float64)
    duration = min_duration + (max_duration - min_duration) * p / 100.0
    scaled_x = math.pi + math.pi * p / 100.0
    c = np.cos(scaled_x)
    y = (np.sqrt(np.abs(c)) * np.sign(c) + 1.0) / 2.0
    y[0] = 0.0
    y[-1] = 1.0
    return simplify(Curve(duration, y, validate=False), 0.01)



def heat_strip(curve, ref_s: float, window_start_s: float,
               window_end_s: float, n: int = 120) -> "np.ndarray":
    """S19 data series: the 120-pixel probability-density strip behind
    the monitor's PNG data URLs (generate_png_data_url,
    /root/reference/src/monitor/mod.rs:1214-1262) — probability mass
    per pixel column across [window_start, window_end), where the
    curve's x axis is relative seconds around ``ref_s``.  Rendering is
    presentation; this returns the data row."""
    edges = np.linspace(window_start_s, window_end_s, n + 1) - ref_s
    ys = np.interp(edges, curve.xs, curve.ys)
    return np.diff(ys)


def curve_set_interpolate(curve_set: list[tuple[float, Curve]], x: float) -> Curve:
    """``curve_at_x_with_continuation``: pick/blend member curves of a
    CurveSet by the query initial delay ``x`` (pinned semantics for the
    crate call at /root/reference/src/predictor/mod.rs:324): clamp to
    the first/last member outside the focus range, otherwise linearly
    blend the two neighbors on the union of their x grids."""
    if not curve_set:
        raise ValueError("empty curve set")
    cs = sorted(curve_set, key=lambda fc: fc[0])
    if x <= cs[0][0]:
        return cs[0][1]
    if x >= cs[-1][0]:
        return cs[-1][1]
    for (f0, c0), (f1, c1) in zip(cs, cs[1:]):
        if f0 <= x <= f1:
            t = 0.0 if f1 == f0 else (x - f0) / (f1 - f0)
            grid = np.unique(np.concatenate([c0.xs, c1.xs]))
            ys = (1.0 - t) * np.interp(grid, c0.xs, c0.ys) + t * np.interp(grid, c1.xs, c1.ys)
            ys[0] = 0.0
            ys[-1] = 1.0
            return Curve(grid, ys, validate=False)
    raise AssertionError("unreachable")


# -- compact codec (C10 parity) ------------------------------------------

def serialize_compact(curve: Curve, max_bytes: int = 120) -> bytes:
    """Compact binary codec for curves, capped at ``max_bytes`` — parity
    for the crate's ``serialize_compact_limited(120)``
    (/root/reference/src/importer/per_schedule_importer.rs:362).  Our
    format (the reference's is opaque): header f32 min_x, f32 max_x,
    u8 n, then n × (u16 x-fraction, u8 y-fraction).  If the curve does
    not fit it is simplified with growing eps until it does.
    """
    import struct

    eps = 0.0
    c = curve
    while True:
        n = len(c)
        size = 9 + 3 * n
        if size <= max_bytes and n <= 255:
            break
        eps = 0.005 if eps == 0.0 else eps * 2
        c = simplify(curve, eps)
    lo, hi = c.min_x, c.max_x
    span = hi - lo or 1.0
    out = [struct.pack("<ffB", np.float32(lo), np.float32(hi), len(c))]
    for x, y in zip(c.xs, c.ys):
        out.append(struct.pack("<HB", int(round((x - lo) / span * 65535)),
                               int(round(y * 255))))
    return b"".join(out)


def deserialize_compact(blob: bytes) -> Curve:
    import struct

    lo, hi, n = struct.unpack_from("<ffB", blob, 0)
    span = (hi - lo) or 1.0
    xs, ys = [], []
    off = 9
    for _ in range(n):
        xq, yq = struct.unpack_from("<HB", blob, off)
        off += 3
        xs.append(lo + xq / 65535 * span)
        ys.append(yq / 255)
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    # quantization may perturb monotonicity at the ulp level
    xs, idx = np.unique(xs, return_index=True)
    ys = np.maximum.accumulate(ys[idx])
    ys[0], ys[-1] = 0.0, 1.0
    return Curve(xs, ys, validate=False)
