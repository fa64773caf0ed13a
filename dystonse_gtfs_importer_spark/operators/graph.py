"""Distributed connected components — the clustering step of
near-duplicate removal.

Pair generators (MinHash/LSH, SimHash, winnowing) emit EDGES; an LLM
training pipeline needs CLUSTERS (one canonical survivor per group of
transitively-connected near-duplicates).  This module supplies the
missing step as the alternating large-star / small-star algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) — the published scale answer:

* every round is two shuffles (a groupBy-min and an equi-join), all
  expressed as DataFrame ops so Catalyst/AQE handle partitioning;
* rounds converge in O(log n) even on pathological path graphs, where
  naive min-label propagation needs O(diameter) rounds;
* per-round ``localCheckpoint`` truncates the growing lineage, which
  otherwise makes iterative DataFrame algorithms re-execute history.

The convergence test costs one count + one subtract per round; the
result is deterministic regardless of how many rounds ran, so the
DuckDB recursive-CTE oracle (plans/oracle_queries.py::dedup_clusters)
hash-matches it cross-engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set as (u, v) with u > v, no self-loops."""
    return (e.where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"))
            .distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u, connect every LARGER neighbor to the minimum
    of u's neighborhood (including u itself)."""
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (und.groupBy("u")
         .agg(F.least(F.min("v"), F.first("u")).alias("m")))
    return (und.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u, connect u and all its SMALLER neighbors to the
    minimum of that down-neighborhood."""
    dn = _canonical(e)  # (u, v) with v < u
    m = dn.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
    return (dn.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct())


def connected_components(edges: DataFrame, src: str = "u", dst: str = "v",
                         nodes: DataFrame | None = None,
                         max_iter: int = 50) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``edges`` is an undirected edge list (either orientation, dups
    fine).  ``nodes``, when given, is a one-column DataFrame of ALL
    node ids — isolated nodes then appear labeled with themselves.

    Returns (node, component).
    """
    e = _canonical(
        edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v")))
    e = e.localCheckpoint(eager=True)
    n_prev = e.count()
    for _ in range(max_iter):
        new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        n_new = new.count()
        # the subtract is the expensive check — only run it once the
        # cheap cardinality test stops ruling convergence out
        if n_new == n_prev and new.subtract(e).count() == 0:
            e = new
            break
        e, n_prev = new, n_new
    else:
        raise RuntimeError(f"connected_components: no convergence "
                           f"in {max_iter} rounds")

    # Converged state is a star per component: non-root → root edges.
    # a root's own min-neighbor is larger than itself — clamp with least
    members = (e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u").agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("node"),
                F.least(F.col("u"), F.col("mn")).alias("component")))
    if nodes is None:
        return members
    all_nodes = nodes.select(
        F.col(nodes.columns[0]).cast("long").alias("node")).distinct()
    return (all_nodes.join(members, "node", "left")
            .select("node",
                    F.coalesce("component", "node").alias("component")))


def dedup_cluster_survivors(docs: DataFrame, pairs: DataFrame,
                            id_col: str = "doc_id",
                            a_col: str = "doc_a", b_col: str = "doc_b",
                            ) -> DataFrame:
    """Apply-side of near-dup clustering: keep one row per component
    (the minimum id — deterministic survivor), drop the rest."""
    cc = connected_components(pairs, a_col, b_col,
                              nodes=docs.select(id_col))
    return (docs.join(cc, docs[id_col] == cc["node"])
            .where(F.col("node") == F.col("component"))
            .drop("node", "component"))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 10, damping_pct: int = 85,
             scale: int = 10 ** 12) -> DataFrame:
    """Deterministic fixed-point PageRank: ranks live as integer
    ``scale``-units and every step — share split, damping, teleport —
    is integer multiply/add/DIV, so the result is BIT-IDENTICAL across
    engines, partition counts, and task retries.  The textbook float
    formulation cannot promise that: its cross-partition SUM order is
    nondeterministic and float addition is not associative.  The price
    is bounded quantization: each truncating DIV loses < 1 unit, so
    per-iteration mass drift is < (N + 2) units out of ``scale`` —
    relative error ~ N/scale, vanishing at the default 10^12 for any
    graph that fits a cluster.

    Semantics per iteration (damping d = damping_pct/100):

        share(u)  = rank(u) DIV out_deg(u)             (out_deg > 0)
        dangling  = Σ rank(u) over out_deg(u) = 0
        rank'(v)  = (100-d)·scale DIV (100·N)
                  + d·(Σ_{u→v} share(u) + dangling DIV N) DIV 100

    Scale shape: per iteration ONE edge-keyed equi-join (rank joins
    edges on src — broadcastable when the rank table is small, AQE
    decides) and ONE dst-keyed aggregation; the dangling mass is a
    single-row aggregate collected to the driver (a scalar, like the
    k-means centroid collect).  ``localCheckpoint`` per iteration
    truncates lineage exactly as ``connected_components`` does.

    Returns (node, rank_fp) — rank_fp in ``scale``-units.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), "
                         f"got {damping_pct}")
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("d"))
    nodes = (e.select(F.col("s").alias("node"))
             .unionByName(e.select(F.col("d").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    base = (100 - damping_pct) * scale // (100 * n)
    r = nodes.withColumn("rank_fp", F.lit(scale // n).cast("long"))
    for _ in range(n_iter):
        rd = r.join(deg, r["node"] == deg["s"], "left")
        dangling = (rd.where(F.col("deg").isNull())
                    .agg(F.coalesce(F.sum("rank_fp"), F.lit(0)))
                    .collect()[0][0])
        # integer share: rank_fp DIV deg (both non-negative)
        shares = (rd.where(F.col("deg").isNotNull())
                  .select(F.col("s"), F.expr("rank_fp DIV deg").alias("sh")))
        inflow = (e.join(shares, "s")
                  .groupBy("d").agg(F.sum("sh").alias("m")))
        r = (nodes.join(inflow, nodes["node"] == inflow["d"], "left")
             .select("node",
                     (F.lit(base)
                      + F.expr(f"{damping_pct} * (coalesce(m, 0) "
                               f"+ {dangling // n}) DIV 100"))
                     .cast("long").alias("rank_fp"))
             .localCheckpoint(eager=True))
    return r
