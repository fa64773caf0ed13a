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


class TestPagerank:
    """Fixed-point PageRank (operators/graph.py::pagerank) against a
    Python reference of the same integer spec, plus invariants."""

    @staticmethod
    def _reference(edges, n_iter, scale=10 ** 12, damping_pct=85):
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        n = len(nodes)
        deg = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        r = {x: scale // n for x in nodes}
        base = (100 - damping_pct) * scale // (100 * n)
        for _ in range(n_iter):
            dangling = sum(r[x] for x in nodes if x not in deg)
            inflow = {x: 0 for x in nodes}
            for u, v in edges:
                inflow[v] += r[u] // deg[u]
            r = {x: base + damping_pct * (inflow[x] + dangling // n) // 100
                 for x in nodes}
        return r

    def test_matches_python_reference(self, spark):
        from dystonse_gtfs_importer_spark.operators.graph import pagerank

        # star + chain + sink: node 4 is dangling, 0 is a hub
        edges = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 4),
                 (1, 4), (5, 0)]
        df = spark.createDataFrame(edges, "src long, dst long")
        for n_iter in (1, 2, 5):
            got = {r.node: r.rank_fp
                   for r in pagerank(df, n_iter=n_iter).collect()}
            assert got == self._reference(edges, n_iter), n_iter

    def test_randomized_against_reference(self, spark):
        import random

        from dystonse_gtfs_importer_spark.operators.graph import pagerank

        rng = random.Random(11)
        edges = list({(rng.randrange(30), rng.randrange(30))
                      for _ in range(120)})
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.rank_fp for r in pagerank(df, n_iter=4).collect()}
        assert got == self._reference(edges, 4)

    def test_mass_approximately_conserved(self, spark):
        """Total rank mass stays within the documented quantization
        drift (< (N + 2) units per iteration) of the scale."""
        from dystonse_gtfs_importer_spark.operators.graph import pagerank

        edges = [(i, (i + 1) % 20) for i in range(20)] + [(3, 7), (9, 2)]
        df = spark.createDataFrame(edges, "src long, dst long")
        n_iter, n = 6, 22
        out = pagerank(df, n_iter=n_iter)
        total = out.agg({"rank_fp": "sum"}).collect()[0][0]
        assert 10 ** 12 - n_iter * (n + 2) * 50 <= total <= 10 ** 12

    def test_determinism_across_partitionings(self, spark):
        from dystonse_gtfs_importer_spark.operators.graph import pagerank

        edges = [(i % 13, (i * 7) % 13) for i in range(60) if i % 13 != (i * 7) % 13]
        a = spark.createDataFrame(edges, "src long, dst long")
        b = a.repartition(17)
        ra = sorted(map(tuple, pagerank(a, n_iter=3).collect()))
        rb = sorted(map(tuple, pagerank(b, n_iter=3).collect()))
        assert ra == rb

    def test_bad_damping_rejected(self, spark):
        from dystonse_gtfs_importer_spark.operators.graph import pagerank

        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        import pytest as _pt
        with _pt.raises(ValueError, match="damping_pct"):
            pagerank(df, damping_pct=100)

    def test_no_window_no_cartesian_in_plan(self, spark):
        """One iteration = one edge equi-join + one dst aggregate:
        no Window operator, no cartesian anywhere."""
        from dystonse_gtfs_importer_spark.operators.graph import pagerank

        edges = [(i, (i + 3) % 11) for i in range(11)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = pagerank(df, n_iter=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        assert "CartesianProduct" not in plan, plan
