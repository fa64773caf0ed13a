"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles
most runtime skew; these operators are the explicit tool for the
cases AQE can't re-plan — hot-key aggregations with expensive per-row
state and broadcast-ineligible joins against a skewed build side.

Both are semantics-preserving rewrites:

* ``salted_aggregate``: groupBy(keys) → groupBy(keys, salt) partial →
  groupBy(keys) final.  Works for any algebraic aggregate (given as
  (partial, final) column pairs).
* ``salted_join``: replicate the small side ``salt`` times (one copy
  per salt value), salt the big side deterministically, join on
  (keys + salt) — each hot key's rows spread over ``salt`` tasks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "__salt"


def with_salt(df: DataFrame, n: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n): hash of ``cols`` (or all columns)
    — reproducible across retries, unlike rand()."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*basis), F.lit(n)).cast("int"))


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, tuple[Column, Column]],
                     salt: int = 16) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then keys.

    ``aggs``: output name → (partial aggregate over raw rows, final
    aggregate over the partial column of the same name).  Example::

        salted_aggregate(df, ["k"], {
            "n": (F.count("*"), F.sum("n")),
            "total": (F.sum("v"), F.sum("total")),
        })
    """
    salted = with_salt(df, salt)
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[p.alias(name) for name, (p, _f) in aggs.items()])
    return partial.groupBy(*keys).agg(
        *[f.alias(name) for name, (_p, f) in aggs.items()])


def salted_join(big: DataFrame, small: DataFrame, keys: list[str],
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the big side's hot keys spread across ``salt``
    partitions; the small side is replicated ``salt`` times (cost:
    |small| × salt rows shuffled — only use when small ≪ big but too
    big or too skewed to broadcast).

    Only inner/left-flavored joins are supported: replicating the
    small side ``salt`` times would surface each UNMATCHED small-side
    row as ``salt`` null-extended duplicates under right/full outer."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join does not support how={how!r}; the replicated "
            "small side breaks right/full outer semantics")
    big_s = with_salt(big, salt)
    replicas = small.crossJoin(
        F.broadcast(big.sparkSession.range(salt)
                    .select(F.col("id").cast("int").alias(SALT_COL))))
    out = big_s.join(replicas, keys + [SALT_COL], how)
    return out.drop(SALT_COL)
