"""Distributed k-means tests (operators/clustering.py): numpy
reference parity of the Lloyd loop, join/udf assignment-path
equivalence, k-means|| init quality, empty-cell handling, determinism,
and the map-only assignment plan shape."""

from __future__ import annotations

import numpy as np
import pytest


def _blobs(n_per: int = 40, dim: int = 8):
    """Three well-separated deterministic blobs."""
    rows = []
    for b, off in enumerate((0.0, 10.0, -10.0)):
        for i in range(n_per):
            v = [off + (((b * 1009 + i * 31 + d * 7) % 1000) / 1000.0
                        - 0.5) for d in range(dim)]
            rows.append((b * n_per + i, v))
    return rows


@pytest.fixture(scope="module")
def blobs(spark):
    return spark.createDataFrame(
        _blobs(), "vec_id: bigint, embedding: array<double>").cache()


def _ref_kmeans(rows, k, iters):
    """Single-process reference: lowest-id seeds, L2 argmin with
    lowest-cell tie-break, mean update, empty cells keep centers."""
    ids = sorted(r[0] for r in rows)
    by_id = dict(rows)
    x = np.array([by_id[i] for i in ids], dtype=np.float64)
    cents = x[:k].copy()
    assign = None
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return dict(zip(ids, assign.tolist())), cents


class TestLloyd:
    def test_numpy_parity_lowest_id(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import kmeans

        res = kmeans(blobs, k=3, max_iter=5, tol=0.0, init="lowest-id")
        got = {r.pid: r.cell for r in res["assignments"].collect()}
        want, _ = _ref_kmeans(_blobs(), 3, iters=5)
        assert got == want

    def test_blob_purity_and_monotone_inertia(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import kmeans

        res = kmeans(blobs, k=3, max_iter=10, tol=1e-6)
        a = res["assignments"].collect()
        per_blob = {}
        for r in a:
            per_blob.setdefault(r.pid // 40, set()).add(r.cell)
        assert all(len(s) == 1 for s in per_blob.values())
        assert len(set().union(*per_blob.values())) == 3
        h = res["history"]
        assert all(h[i] >= h[i + 1] - 1e-9 for i in range(len(h) - 1))
        assert res["iterations"] <= 10

    def test_join_udf_assignment_parity(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import kmeans

        a1 = {r.pid: r.cell for r in kmeans(
            blobs, k=3, max_iter=6, tol=0.0)["assignments"].collect()}
        a2 = {r.pid: r.cell for r in kmeans(
            blobs, k=3, max_iter=6, tol=0.0,
            assign="udf")["assignments"].collect()}
        assert a1 == a2

    def test_determinism(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import kmeans

        r1 = kmeans(blobs, k=3, max_iter=8, tol=1e-6)
        r2 = kmeans(blobs, k=3, max_iter=8, tol=1e-6)
        assert r1["history"] == r2["history"]
        a1 = sorted((r.pid, r.cell)
                    for r in r1["assignments"].collect())
        a2 = sorted((r.pid, r.cell)
                    for r in r2["assignments"].collect())
        assert a1 == a2

    def test_empty_cells_keep_centers(self, spark):
        from dystonse_gtfs_importer_spark.operators.clustering import kmeans

        # 12 points on just 2 distinct sites, k=4 → ≥2 cells go empty
        rows = [(i, [float(i % 2) * 20.0] * 4) for i in range(12)]
        df = spark.createDataFrame(
            rows, "vec_id: bigint, embedding: array<double>")
        res = kmeans(df, k=4, max_iter=5, tol=0.0, init="lowest-id")
        cent = res["centers"].collect()
        assert len(cent) == 4                      # no cell lost
        assert sum(r.n for r in cent) == 12
        assert res["history"][-1] == pytest.approx(0.0, abs=1e-12)

    def test_convergence_stops_early(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import kmeans

        res = kmeans(blobs, k=3, max_iter=50, tol=1e-4)
        assert res["iterations"] < 50
        assert res["history"][-1] <= res["history"][0]


class TestInit:
    def test_kmeanspp_reduction_deterministic(self):
        from dystonse_gtfs_importer_spark.operators.clustering import (
            _greedy_weighted_kmeanspp,
        )

        cands = [{"pid": i, "vec": [float(i), 0.0], "w": 10 - i}
                 for i in range(6)]
        got = _greedy_weighted_kmeanspp(cands, 3)
        # heaviest first (id 0), then the weighted-farthest
        assert got[0] == [0.0, 0.0]
        assert got == _greedy_weighted_kmeanspp(cands, 3)
        assert len(got) == 3

    def test_parallel_init_beats_or_matches_naive(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import kmeans

        par = kmeans(blobs, k=3, max_iter=10, tol=1e-6)
        naive = kmeans(blobs, k=3, max_iter=10, tol=1e-6,
                       init="lowest-id")
        # k-means|| must not land in a worse basin on separated blobs
        assert par["history"][-1] <= naive["history"][-1] * 1.01


class TestPlanShape:
    def test_assignment_is_map_only_jvm(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import (
            _points, kmeans_init, lloyd_assign,
        )

        pts = _points(blobs, "vec_id", "embedding")
        centers = kmeans_init(pts, 3, init="lowest-id")
        plan = lloyd_assign(pts, centers) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "ArrowEvalPython" not in plan       # JVM argmin
        assert "BroadcastNestedLoopJoin" in plan   # 1-row centers pack


class TestMiniBatch:
    def test_matches_full_batch_on_separated_blobs(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import (
            kmeans, kmeans_minibatch,
        )

        full = kmeans(blobs, k=3, max_iter=10, tol=1e-6)
        mb = kmeans_minibatch(blobs, k=3, batch_frac=0.5, max_iter=15,
                              tol=1e-4)
        af = {r.pid: r.cell for r in full["assignments"].collect()}
        am = {r.pid: r.cell for r in mb["assignments"].collect()}
        # cluster LABELS may differ; the partition must be identical
        relabel = {}
        for pid, c in am.items():
            relabel.setdefault(c, af[pid])
        assert all(af[pid] == relabel[c] for pid, c in am.items())
        # near-identical final inertia
        assert mb["centers"].agg(
            {"inertia": "sum"}).first()[0] == pytest.approx(
            full["history"][-1], rel=0.05)

    def test_movement_decreases_and_stops(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import (
            kmeans_minibatch,
        )

        mb = kmeans_minibatch(blobs, k=3, batch_frac=0.5, max_iter=25,
                              tol=1e-4)
        assert mb["iterations"] < 25          # converged on movement
        assert mb["history"][-1] < 1e-4

    def test_deterministic(self, spark, blobs):
        from dystonse_gtfs_importer_spark.operators.clustering import (
            kmeans_minibatch,
        )

        a = kmeans_minibatch(blobs, k=3, batch_frac=0.4, max_iter=8)
        b = kmeans_minibatch(blobs, k=3, batch_frac=0.4, max_iter=8)
        assert a["history"] == b["history"]
