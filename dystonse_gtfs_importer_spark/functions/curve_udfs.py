"""Arrow-batched pandas UDFs over curve columns
(array<struct<x:float,y:float>>) — the DataFrame-facing surface of the
NumPy curve library (§2.10 UDF family)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType

from .. import curves as cv
from ..schemas import CURVE_TYPE


def _c(points) -> cv.Curve | None:
    if points is None or len(points) < 2:
        return None
    return cv.Curve.from_points(points)


@pandas_udf(DoubleType())
def curve_y_at_x(curve: pd.Series, x: pd.Series) -> pd.Series:
    """C7: CDF evaluation."""
    return pd.Series([
        float(cv.y_at_x(c, xv)) if (c := _c(p)) is not None else None
        for p, xv in zip(curve, x)])


@pandas_udf(DoubleType())
def curve_x_at_y(curve: pd.Series, y: pd.Series) -> pd.Series:
    """C7: inverse CDF (percentile extraction)."""
    return pd.Series([
        float(cv.x_at_y(c, yv)) if (c := _c(p)) is not None else None
        for p, yv in zip(curve, y)])


@pandas_udf(CURVE_TYPE)
def curve_simplify(curve: pd.Series, eps: pd.Series) -> pd.Series:
    """A4: ε-simplification."""
    return pd.Series([
        cv.simplify(c, float(e)).points() if (c := _c(p)) is not None else None
        for p, e in zip(curve, eps)])


@pandas_udf(CURVE_TYPE)
def walk_time_curve(distance_m: pd.Series) -> pd.Series:
    """C13: synthetic walk-duration CDF per transfer distance."""
    return pd.Series([
        cv.walk_time_curve(float(d)).points() if d is not None else None
        for d in distance_m])


@pandas_udf(CURVE_TYPE)
def convolve_with(curve: pd.Series, duration_curve: pd.Series) -> pd.Series:
    """C14: arrival ⊛ duration convolution (add_duration_curve)."""
    out = []
    for p, q in zip(curve, duration_curve):
        a, b = _c(p), _c(q)
        out.append(cv.convolve_duration(a, b).points()
                   if a is not None and b is not None else None)
    return pd.Series(out)


@pandas_udf(DoubleType())
def transfer_probability(arr_curve: pd.Series, arr_ref_s: pd.Series,
                         dep_curve: pd.Series, dep_ref_s: pd.Series
                         ) -> pd.Series:
    """C15: P(transfer reached) from two typed curves."""
    out = []
    for ap, ar, dp, dr in zip(arr_curve, arr_ref_s, dep_curve, dep_ref_s):
        a, d = _c(ap), _c(dp)
        out.append(
            cv.transfer_probability(a, int(ar), d, int(dr))
            if a is not None and d is not None
            and ar is not None and dr is not None else None)
    return pd.Series(out)


@pandas_udf(BinaryType())
def curve_serialize_compact(curve: pd.Series) -> pd.Series:
    """C10: ≤120-byte compact codec (JDBC/blob parity)."""
    return pd.Series([
        cv.serialize_compact(c) if (c := _c(p)) is not None else None
        for p in curve])
