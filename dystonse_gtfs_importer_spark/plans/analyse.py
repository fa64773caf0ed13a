"""The analyse pipeline: distributed curve building.

Re-expresses the reference's ``analyse compute-curves`` driver loops
(/root/reference/src/analyser/specific_curves.rs,
/root/reference/src/analyser/default_curves.rs) as single Spark jobs:
no per-route driver loops — one shuffle per grouping, curve math in
Arrow-batched ``applyInPandas`` kernels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, DoubleType, FloatType, LongType, StructField, StructType,
)

from .. import curves as cv

CURVE_TYPE = ArrayType(StructType([
    StructField("x", FloatType()), StructField("y", FloatType()),
]))


def ecdf_curve_points(df: DataFrame, group_cols: list[str], value_col: str,
                      min_samples: int = 2, focus: float | None = None,
                      y_round: int | None = None) -> DataFrame:
    """A3 ``make_curve`` per group, exploded to one row per curve
    point: (group..., x double, y double, sample_size long).

    With ``focus`` set, values are triangular-kernel weighted (C6).
    Exploded-point form keeps the result SQL-expressible (cumulative
    weight / total over distinct values), which is what the DuckDB
    oracle checks; ``y_round`` rounds y so cross-engine summation-order
    drift of fractional weights stays out of the value hash.  The
    array-typed variant for storage is :func:`curve_table`.
    """
    # Prune BEFORE the groupBy shuffle: the kernel reads only the keys
    # and the value column, so everything else (at scale, most of the
    # table width) must not travel through the Exchange into
    # FlatMapGroupsInPandas.
    df = df.select(*group_cols, value_col)
    fields = [df.schema[c] for c in group_cols]
    out_schema = StructType(fields + [
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("sample_size", LongType()),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].dropna().to_numpy(dtype="float64")
        made = cv.make_curve(vals, focus) if len(vals) >= min_samples else None
        if made is None:
            return pd.DataFrame({f.name: pd.Series(dtype="object")
                                 for f in out_schema.fields})
        curve, _total = made
        n = len(curve)
        out = {c: [pdf[c].iloc[0]] * n for c in group_cols}
        out["x"] = curve.xs
        ys = curve.ys
        if y_round is not None:
            import numpy as np

            ys = np.round(ys, y_round)
        out["y"] = ys
        out["sample_size"] = [len(vals)] * n
        return pd.DataFrame(out)

    return df.groupBy(*group_cols).applyInPandas(build, out_schema)


def ecdf_curve_points_counted(df: DataFrame, group_cols: list[str],
                              value_col: str, min_samples: int = 2,
                              focus: float | None = None,
                              y_round: int | None = None) -> DataFrame:
    """Scale form of :func:`ecdf_curve_points`: pre-aggregate to one
    row per distinct (group, value) with a JVM-side count (partial agg
    below the Exchange = map-side combine), then run the kernel over
    multiplicities via ``make_curve_counted``.

    Shuffle volume into the pandas kernel becomes the number of
    *distinct* values per group instead of the number of observations
    — for 12 s-rounded delays bounded by ±3000 s that is ≤ 500 rows
    per group regardless of record volume.  Bit-exact vs the per-row
    form for unfocused weights (integer counts); focused weights can
    drift by an ulp in summation order, so pair with ``y_round``.
    """
    import pyspark.sql.functions as F

    counted = (df.select(*group_cols, value_col)
               .where(F.col(value_col).isNotNull())
               .groupBy(*group_cols, value_col)
               .agg(F.count("*").alias("cnt")))
    fields = [counted.schema[c] for c in group_cols]
    out_schema = StructType(fields + [
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("sample_size", LongType()),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({f.name: pd.Series(dtype="object")
                              for f in out_schema.fields})
        n = int(pdf["cnt"].sum())
        if n < min_samples:
            return empty
        made = cv.make_curve_counted(
            pdf[value_col].to_numpy("float64"),
            pdf["cnt"].to_numpy("float64"), focus)
        if made is None:
            return empty
        curve, _total = made
        k = len(curve)
        out = {c: [pdf[c].iloc[0]] * k for c in group_cols}
        out["x"] = curve.xs
        ys = curve.ys
        if y_round is not None:
            import numpy as np

            ys = np.round(ys, y_round)
        out["y"] = ys
        out["sample_size"] = [n] * k
        return pd.DataFrame(out)

    return counted.groupBy(*group_cols).applyInPandas(build, out_schema)


def curve_table(df: DataFrame, group_cols: list[str], value_col: str,
                min_samples: int = 20, simplify_eps: float | None = 0.01,
                focus_col: str | None = None) -> DataFrame:
    """A3+A4: one curve *row* per group with an array<struct<x,y>>
    column — the storage form for general_delay / default_curves
    tables (min-sample gate F13 applied inside the kernel)."""
    keep = list(group_cols) + [value_col] + ([focus_col] if focus_col else [])
    df = df.select(*keep)  # shuffle only what the kernel reads
    fields = [df.schema[c] for c in group_cols]
    out_schema = StructType(fields + [
        StructField("curve", CURVE_TYPE),
        StructField("sample_size", LongType()),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].dropna().to_numpy(dtype="float64")
        if len(vals) < min_samples:
            return pd.DataFrame({f.name: pd.Series(dtype="object")
                                 for f in out_schema.fields})
        focus = float(pdf[focus_col].iloc[0]) if focus_col else None
        made = cv.make_curve(vals, focus)
        if made is None:
            return pd.DataFrame({f.name: pd.Series(dtype="object")
                                 for f in out_schema.fields})
        curve, _ = made
        if simplify_eps is not None:
            curve = cv.simplify(curve, simplify_eps)
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row["curve"] = curve.points()
        row["sample_size"] = len(vals)
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(build, out_schema)
