"""Z-order (Morton-curve) data layout for multi-dimension scan
pruning.

Bucketing (`sources/store.py`) co-locates equi-join keys and
compaction (`compact_partitions`) fixes file sizes; the remaining
layout tool a 100 TB lake needs is MULTI-dimensional clustering: a
table filtered sometimes by user and sometimes by time serves both
predicates well only if rows that are close in (user, time) space
land in the same files, so parquet row-group min/max stats prune
either dimension.  The Morton key interleaves the bit patterns of the
bucketized dimensions; range-partitioning + sorting by it gives every
output file a bounded hyper-rectangle footprint (the classic
Delta/Iceberg ``OPTIMIZE ZORDER BY`` layout, built here from plain
repartitionByRange + sortWithinPartitions).

The key computation is pure bit arithmetic (shifts, masks, OR) —
whole-stage-codegen'd JVM expressions, also rendered for DuckDB so
the driver hash-verifies the exact key of every row
(``q_zorder_keys``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from ..functions import sql_shared as S

ZBITS = 8  # bits per dimension -> 2^16 cells for two dimensions


def _interleave_expr(d: S.Dialect, x: str, y: str,
                     bits: int = ZBITS) -> str:
    """Morton key of two bucket ids: x occupies even bit positions, y
    odd ones.  Inputs are masked into [0, 2^bits) here — same contract
    as the Column twin :func:`zorder_key` — so unbucketed callers get
    identical keys on both paths instead of silent high-bit drops."""
    mask = (1 << bits) - 1
    xm, ym = f"({x} & {mask})", f"({y} & {mask})"
    terms = []
    for b in range(bits):
        terms.append(f"({d.shr(xm, b)} & 1) * {1 << (2 * b)}")
        terms.append(f"({d.shr(ym, b)} & 1) * {1 << (2 * b + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton key column from two BIGINT bucket columns (values are
    masked into [0, 2^bits))."""
    mask = (1 << bits) - 1
    acc = F.lit(0).cast("long")
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    for b in range(bits):
        acc = acc + F.shiftright(xm, b).bitwiseAND(F.lit(1)) * (1 << (2 * b))
        acc = acc + F.shiftright(ym, b).bitwiseAND(F.lit(1)) * (1 << (2 * b + 1))
    return acc


def zorder_repartition(df: DataFrame, x: Column, y: Column,
                       n_partitions: int, bits: int = ZBITS) -> DataFrame:
    """Cluster ``df`` along the Morton curve of two bucket columns:
    range-partition on the key (contiguous curve segments per output
    partition — one shuffle), then sort within partitions so parquet
    row groups inherit tight min/max bounds on BOTH source columns."""
    keyed = df.withColumn("__zkey", zorder_key(x, y, bits))
    return (keyed
            .repartitionByRange(n_partitions, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey"))


def q_zorder_keys(d: S.Dialect, bits: int = ZBITS) -> str:
    """(event_id, xb, yb, zkey) over events: user-id bucket × hour-of-
    epoch bucket interleaved — the driver hash-verifies every Morton
    key cross-engine.  Map-only; at scale this is the projection that
    feeds the range-partitioner."""
    xb = f"(user_id % {1 << bits})"
    # whole-second epoch (identical cross-engine) -> hour bucket
    if d.name == "spark":
        hours = "(unix_timestamp(ts) div 3600)"
    else:
        hours = "(epoch_us(ts) // 1000000 // 3600)"
    yb = f"({hours} % {1 << bits})"
    return f"""
        WITH b AS (
            SELECT event_id,
                   CAST({xb} AS BIGINT) AS xb,
                   CAST({yb} AS BIGINT) AS yb
            FROM events
        )
        SELECT event_id, xb, yb,
               CAST({_interleave_expr(d, 'xb', 'yb', bits)} AS BIGINT)
                   AS zkey
        FROM b
    """
