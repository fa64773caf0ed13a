"""Similarity-search operator tests: exact brute force as ground
truth, LSH and IVF approximations measured by recall against it."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def embeddings(spark, sf_smoke):
    from dystonse_gtfs_importer_spark.sources.testdata import load_table

    return load_table(spark, sf_smoke, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.where(F.col("vec_id") % 25 == 0).cache()


@pytest.fixture(scope="module")
def exact(embeddings, queries):
    from dystonse_gtfs_importer_spark.operators.similarity import cosine_topk

    return cosine_topk(embeddings, queries, k=10).cache()


class TestExact:
    def test_shape_and_bounds(self, exact, queries):
        rows = exact.collect()
        n_q = queries.count()
        assert len(rows) == n_q * 10
        assert all(-1.0 <= r.cosine <= 1.0 for r in rows)
        # ranks are 1..10 per query, ordered by cosine desc
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r.rk)
            assert [r.rk for r in rs] == list(range(1, 11))
            cos = [r.cosine for r in rs]
            assert cos == sorted(cos, reverse=True)

    def test_no_self_match(self, exact):
        assert exact.where(F.col("query_id") == F.col("cand_id")).count() == 0


def _recall(approx_rows, exact_rows, k=10):
    ex = {}
    for r in exact_rows:
        ex.setdefault(r.query_id, set()).add(r.cand_id)
    ap = {}
    for r in approx_rows:
        ap.setdefault(r.query_id, set()).add(r.cand_id)
    hits = total = 0
    for q, s in ex.items():
        total += len(s)
        hits += len(s & ap.get(q, set()))
    return hits / total


class TestLSH:
    def test_recall_beats_random(self, embeddings, queries, exact):
        from dystonse_gtfs_importer_spark.operators.similarity import lsh_topk

        # these embeddings are near-orthogonal (true top-10 cosine
        # ≈ 0.29, θ ≈ 73°) — the hardest LSH regime — so short
        # sketches + many tables; measured recall ≈ 0.55
        approx = lsh_topk(embeddings, queries, k=10,
                          n_planes=5, n_tables=10).collect()
        rec = _recall(approx, exact.collect())
        # random 10-of-500 ≈ 2% recall; LSH must do far better
        assert rec > 0.35, f"LSH recall {rec:.2f} too low"

    def test_deterministic(self, embeddings, queries):
        from dystonse_gtfs_importer_spark.operators.similarity import lsh_topk

        a = sorted(map(tuple, lsh_topk(embeddings, queries, k=5,
                                       n_planes=8, n_tables=2).collect()))
        b = sorted(map(tuple, lsh_topk(embeddings, queries, k=5,
                                       n_planes=8, n_tables=2).collect()))
        assert a == b


class TestIVF:
    def test_recall_beats_random(self, embeddings, queries, exact):
        from dystonse_gtfs_importer_spark.operators.similarity import ivf_topk

        approx = ivf_topk(embeddings, queries, k=10,
                          n_cells=8, nprobe=4).collect()
        rec = _recall(approx, exact.collect())
        assert rec > 0.5, f"IVF recall {rec:.2f} too low"


class TestCosineNearDup:
    def test_lsh_path_subset_of_exact_with_recall(self, embeddings):
        from dystonse_gtfs_importer_spark.operators.similarity import (
            cosine_near_dup,
        )

        # synthetic random embeddings: pair cosines top out near 0.5,
        # so 0.35 plays the role of "near duplicate" here; with planes
        # few enough for that angle (collision prob per table
        # (1-θ/π)^planes), recall stays high
        thresh = 0.35
        exact_pairs = {(r.vec_a, r.vec_b) for r in
                       cosine_near_dup(embeddings, thresh,
                                       exact=True).collect()}
        assert exact_pairs, "threshold too high for fixture data"
        lsh_pairs = {(r.vec_a, r.vec_b) for r in
                     cosine_near_dup(embeddings, thresh,
                                     n_planes=3, n_tables=6).collect()}
        # every LSH pair passes the exact threshold (no false positives)
        assert lsh_pairs <= exact_pairs
        # high-cosine pairs collide with high probability
        recall = len(lsh_pairs) / len(exact_pairs)
        assert recall >= 0.5, (recall, len(exact_pairs))

    def test_exact_is_symmetric_free(self, embeddings):
        from dystonse_gtfs_importer_spark.operators.similarity import (
            cosine_near_dup,
        )

        out = cosine_near_dup(embeddings, 0.35, exact=True).collect()
        assert all(r.vec_a < r.vec_b for r in out)


class TestSemDedupKeep:
    def test_identical_vectors_keep_lowest_id(self, spark):
        from dystonse_gtfs_importer_spark.functions import ann_sql as A
        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.session import configure_for_oracle

        configure_for_oracle(spark)
        dup = [1.0] * A.DIM
        rows = [(10, dup, 0), (20, dup, 0), (30, dup, 0)]
        # basis vectors: pairwise cosine 0 -> never near-duplicates,
        # whatever buckets they land in
        for i in range(5):
            v = [0.0] * A.DIM
            v[i] = 1.0
            rows.append((100 + i, v, 1))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        ).createOrReplaceTempView("embeddings")
        got = {r.vec_id: r for r in
               spark.sql(A.q_semdedup_keep(S.SPARK)).collect()}
        assert len(got) == 8
        # identical trio: only the lowest id survives
        assert got[10].kept == 1 and got[10].n_near == 2
        assert got[20].kept == 0 and got[30].kept == 0
        # orthogonal vectors all survive with no near neighbors
        for i in range(5):
            assert got[100 + i].kept == 1 and got[100 + i].n_near == 0


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        from dystonse_gtfs_importer_spark.operators.multimodal import (
            MEDIA_SCHEMA, extract_features, media_dedup,
        )

        rows = [
            (1, "image", b"imagebytes-1", "image/png", 64, 64, None),
            (2, "image", b"imagebytes-1", "image/png", 64, 64, None),  # dup
            (3, "audio", b"audiobytes-2", "audio/wav", None, None, 2000),
            (4, "image", None, "image/png", 8, 8, None),               # corrupt
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        feats = extract_features(media, dim=16).cache()
        got = {r.media_id: r for r in feats.collect()}
        assert set(got) == {1, 2, 3}          # corrupt row dropped
        assert len(got[1].feature) == 16
        assert got[1].feature == got[2].feature       # content-determined
        assert got[1].feature != got[3].feature
        dd = media_dedup(feats).collect()
        by_hash = {r.content_hash: r for r in dd}
        assert any(r.n_copies == 2 and r.canonical_media == 1 for r in dd)

    def test_frame_sampling_fanout(self, spark):
        from dystonse_gtfs_importer_spark.operators.multimodal import (
            MEDIA_SCHEMA, sample_frames,
        )

        media = spark.createDataFrame(
            [(1, "video", b"vid", "video/mp4", None, None, 3500),
             (2, "image", b"img", "image/png", 4, 4, None)],
            MEDIA_SCHEMA)
        frames = sample_frames(media, every_ms=1000).collect()
        # video 3500ms → offsets 0,1000,2000,3000; image contributes none
        assert sorted(r.frame_ms for r in frames) == [0, 1000, 2000, 3000]


class TestCosineNearDupLshPlanes:
    """SQL-template n_planes widening (the 100 TB occupancy knob):
    wider sketches must stay engine-agreeing, emit no false positives,
    and never lose an identical-vector pair (cos 1 collides in every
    table at any width)."""

    def test_wide_sketch_parity_and_exact_dup_recall(self, spark):
        import duckdb
        import pandas as pd

        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.session import (
            configure_for_oracle,
        )

        rng_rows = []
        for i in range(120):
            base = i // 2  # consecutive ids share an identical vector
            # full DIM=64 vectors: the widened sketch renders explicit
            # emb[j] terms (strict ANSI indexing — short vectors fail
            # loudly instead of the HOF form's silent NULL-dot)
            vec = [(((base * 1000003 + j) * 2654435761) % 2001 - 1000)
                   / 1000.0 for j in range(64)]
            rng_rows.append((i, vec, base % 5))
        pdf = pd.DataFrame(rng_rows,
                           columns=["vec_id", "embedding", "label"])
        configure_for_oracle(spark)
        spark.createDataFrame(pdf).createOrReplaceTempView("embeddings")
        con = duckdb.connect()
        con.register("embeddings", pdf)

        q = ANN.q_cosine_near_dup_lsh(S.SPARK, n_planes=12)
        s_rows = sorted((r.vec_a, r.vec_b) for r in spark.sql(q).collect())
        d_rows = sorted((a, b) for a, b, _ in con.execute(
            ANN.q_cosine_near_dup_lsh(S.DUCKDB, n_planes=12)).fetchall())
        assert s_rows == d_rows
        # all 60 identical-vector pairs survive the widest sketch
        expected = [(2 * g, 2 * g + 1) for g in range(60)]
        assert set(expected) <= set(s_rows)
        # wider sketch is a candidate SUBSET of the default sketch
        narrow = sorted((r.vec_a, r.vec_b) for r in spark.sql(
            ANN.q_cosine_near_dup_lsh(S.SPARK)).collect())
        assert set(s_rows) <= set(narrow)


class TestEmbeddingCompression:
    """Round-5 embedding-compression tier: int8 quantized ranking must
    approximate the float ranking (recall floor), and the seeded
    random projection must behave as a distance pre-filter — planted
    near-pairs land far below the background distance distribution,
    and both engines agree bitwise (the oracle property)."""

    def test_quantized_topk_recall_vs_float(self, spark):
        import numpy as np

        from tests.conftest import SF_CORRECT

        from dystonse_gtfs_importer_spark.functions import ann_sql as A
        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.session import (
            configure_for_oracle,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        # the sf0.01 corpus (the driver's correctness SF): recall
        # measured 0.93 there; the sf0.001 smoke corpus is more
        # adversarial (near-orthogonal ties) and sits at 0.67
        configure_for_oracle(spark)
        register_views(spark, SF_CORRECT)
        rows = spark.sql(
            "SELECT vec_id, CAST(embedding AS array<double>) AS e "
            "FROM embeddings ORDER BY vec_id").collect()
        ids = np.array([r.vec_id for r in rows])
        M = np.array([r.e for r in rows])

        got: dict[int, set] = {}
        for r in spark.sql(A.q_ann_quantized_topk(S.SPARK)).collect():
            got.setdefault(r.query_id, set()).add(r.cand_id)

        recall = []
        for qi in np.where(ids % A.QUERY_STRIDE == 0)[0]:
            dots = M @ M[qi]
            dots[qi] = -np.inf
            exact3 = set(ids[np.argsort(-dots)[:3]].tolist())
            mine = got.get(int(ids[qi]), set())
            recall.append(len(mine & exact3) / 3)
        # measured 0.93 on the sf0.01 corpus; int8 at dim 64 must not
        # fall below 0.8 — a drop means the quantizer broke
        assert np.mean(recall) >= 0.8

    def test_random_projection_prefilter_and_parity(self, spark):
        import duckdb
        import numpy as np
        import pandas as pd

        from dystonse_gtfs_importer_spark.functions import ann_sql as A
        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.session import (
            configure_for_oracle,
        )

        rows = []
        rng_vals = lambda s: [(((s * 1000003 + j) * 2654435761) % 2001
                               - 1000) / 1000.0 for j in range(64)]
        for g in range(60):
            base = rng_vals(g)
            rows.append((2 * g, base, 0))
            # odd member: tiny perturbation on one dimension — a
            # genuine near-pair the projection must keep near
            near = list(base)
            near[g % 64] += 0.01
            rows.append((2 * g + 1, near, 0))
        pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
        configure_for_oracle(spark)
        spark.createDataFrame(pdf).createOrReplaceTempView("embeddings")
        con = duckdb.connect()
        con.register("embeddings", pdf)

        s_rows = sorted(tuple(r) for r in
                        spark.sql(A.q_random_projection(S.SPARK)).collect())
        d_rows = sorted(tuple(r) for r in
                        con.execute(A.q_random_projection(S.DUCKDB))
                        .fetchall())
        assert s_rows == d_rows  # bitwise engine parity (oracle prop)

        P = np.array([r[1:] for r in s_rows])
        pair_d = np.linalg.norm(P[0::2] - P[1::2], axis=1)
        bg = np.linalg.norm(P[rng_ij(60, 0)] - P[rng_ij(60, 1)], axis=1)
        # planted near-pairs must sit far below the background cloud:
        # the pre-filter property that makes an 8-dim cut usable
        assert pair_d.max() < np.percentile(bg, 25)


def rng_ij(n: int, which: int):
    """Deterministic cross-group index pattern for background pairs:
    (2g, 2((g+7) % n) + 1) — never a planted pair."""
    import numpy as np

    g = np.arange(n)
    return 2 * g if which == 0 else 2 * ((g + 7) % n) + 1
