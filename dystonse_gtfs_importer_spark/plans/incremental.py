"""Incremental analyse: merge new records into stored curve bases
instead of recomputing statistics from all history.

The reference's analyser re-reads every record on each run
(``/root/reference/src/analyser/specific_curves.rs:61-118``).  That is
O(history) per run — untenable when the records table is the 100 TB
part.  But all three curve tables reduce over *mergeable sufficient
statistics* (the ``(group keys, delay, cnt)`` bases produced by
``analyse_gtfs.general_delay_counted`` / ``stop_pair_counted`` /
``default_leaf_counted``): count vectors add associatively and
commutatively, and every curve is a pure function of its merged basis.
So:

    basis(all records) == merge(basis(slice1), basis(slice2), ...)

and an incremental run costs O(delta records + basis size).  The basis
is tiny relative to records: 12 s rounding bounds distinct delays at
501 per group (delays strictly within ±3000 s).

Contract: deltas must be DISJOINT, APPEND-ONLY, and VEHICLE-COMPLETE —
every record of a trip instance arrives in ONE delta.  The pair basis
joins start/end observations *within* a vehicle, so splitting a trip
across deltas would lose its cross-delta pairs (the general/default
bases are per-record and only need disjointness).  In production the
natural delta is a CLOSED SERVICE DAY of the records table — its
``(source, trip_start_date)`` partitions are final once the
latest-wins upserts for that day stop, which also makes late-data
rewrites a non-issue.  If history is rewritten later anyway, rebuild
the affected day's basis from scratch; merging a re-slice would double
count.

The equality ``incremental(slice1; slice2) == batch(all)`` is pinned
exactly (curve bytes included) in tests/test_incremental.py.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .analyse_gtfs import (
    default_curves_from_counted,
    default_leaf_counted,
    general_curves_from_counted,
    general_delay_counted,
    stop_pair_counted,
    stop_pair_curves_from_counted,
)

_BASES = {
    "general": (general_delay_counted, general_curves_from_counted),
    "specific": (stop_pair_counted, stop_pair_curves_from_counted),
    "default": (default_leaf_counted, default_curves_from_counted),
}


def merge_counted(old: DataFrame | None, new: DataFrame) -> DataFrame:
    """Sum count vectors over the full key set (every column except
    ``cnt``).  One partial-aggregated shuffle; associative, so any
    slicing of history converges to the same basis."""
    merged = new if old is None else old.unionByName(new)
    keys = [c for c in merged.columns if c != "cnt"]
    return merged.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def _basis_dir(stats_dir: str, name: str) -> Path:
    return Path(stats_dir) / "basis" / name


def incremental_analyse(
    spark: SparkSession,
    stats_dir: str,
    delta_items: DataFrame,
    routes: DataFrame,
) -> dict[str, DataFrame]:
    """Fold one append-only delta (``prepare_dbitems`` output for the
    NEW records only) into the stored bases, then re-derive all three
    curve tables from the merged bases.

    Returns the refreshed curve tables (not yet written; pair with
    ``sources.store.write_curve_tables``)."""
    tables: dict[str, DataFrame] = {}
    for name, (counted_fn, curves_fn) in _BASES.items():
        new = (counted_fn(delta_items, routes) if name == "default"
               else counted_fn(delta_items))
        bdir = _basis_dir(stats_dir, name)
        old = spark.read.parquet(str(bdir)) if bdir.exists() else None
        merged = merge_counted(old, new).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(str(bdir))
        tables[name] = curves_fn(merged)
    return tables
