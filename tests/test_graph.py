"""Connected components (operators/graph.py).

The alternating large-star/small-star algorithm must label every node
with its component minimum on adversarial shapes: long paths (the
worst case for naive label propagation), stars, disjoint mixes, and
isolated nodes.  The driver-side cross-check against the DuckDB
recursive-CTE oracle (dedup_clusters) covers the real-corpus case.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from dystonse_gtfs_importer_spark.operators.graph import (
    connected_components,
    dedup_cluster_survivors,
)


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges or [(0, 0)], "u long, v long")
    if not edges:
        e = e.limit(0)
    n = (spark.createDataFrame([(x,) for x in nodes], "node long")
         if nodes is not None else None)
    out = connected_components(e, nodes=n)
    return {r.node: r.component for r in out.collect()}


def test_path_graph_collapses_to_min(spark):
    # path 1-2-3-...-9: diameter 8, but O(log n) rounds suffice
    edges = [(i, i + 1) for i in range(1, 9)]
    assert _cc(spark, edges) == {i: 1 for i in range(1, 10)}


def test_two_components_and_reversed_edges(spark):
    edges = [(5, 3), (3, 7), (20, 10), (10, 30), (30, 20)]
    got = _cc(spark, edges)
    assert got == {3: 3, 5: 3, 7: 3, 10: 10, 20: 10, 30: 10}


def test_isolated_nodes_label_themselves(spark):
    got = _cc(spark, [(1, 2)], nodes=[1, 2, 99])
    assert got == {1: 1, 2: 1, 99: 99}


def test_duplicate_and_self_edges_ignored(spark):
    got = _cc(spark, [(4, 4), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_survivors_keep_min_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 4)], "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in
                  dedup_cluster_survivors(docs, pairs).collect())
    # clusters {0,3,5} -> 0, {1,4} -> 1, singletons 2
    assert kept == [0, 1, 2]


def test_edge_orientation_invariance(spark):
    fwd = _cc(spark, [(1, 2), (2, 3), (3, 4), (8, 9)])
    rev = _cc(spark, [(2, 1), (3, 2), (4, 3), (9, 8)])
    assert fwd == rev == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_random_graphs_match_union_find(spark):
    """Property check: 20 seeded random graphs vs a driver-side
    union-find reference."""
    import random

    def uf_components(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        return {x: find(x) for x in range(n_nodes)}

    rng = random.Random(7)
    for trial in range(20):
        n = rng.randint(2, 40)
        m = rng.randint(0, n * 2)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        want = uf_components(n, edges)
        got = _cc(spark, edges, nodes=list(range(n)))
        assert got == want, f"trial {trial}: n={n} edges={edges}"
