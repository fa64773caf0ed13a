"""Single-process reference twins (plans/ref_single.py) that back the
literal-VALUES oracles of the two iterative registry entries: the
XXH64 scalar hash must match Spark bit-for-bit, and the BPE / k-means
recomputations must equal the live distributed implementations."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestXxhash64Twin:
    def test_matches_spark_bit_for_bit(self, spark):
        from dystonse_gtfs_importer_spark.plans.ref_single import (
            hash01,
            xxh64_int,
            xxh64_long,
        )

        pids = [0, 1, 42, -7, 2**40 + 17, -(2**35), 123456789012345]
        df = spark.createDataFrame([(p,) for p in pids], "pid: bigint")
        for salt in (0x5EED, 0x5EED + 2, 31 * 0x5EED + 5):
            got = df.select(
                "pid",
                F.xxhash64("pid", F.lit(salt)).alias("h"),
                (F.pmod(F.xxhash64("pid", F.lit(salt)), F.lit(1 << 40))
                 / float(1 << 40)).alias("u")).collect()
            for r in got:
                h = xxh64_int(salt, xxh64_long(r.pid, 42))
                signed = h - (1 << 64) if h >= (1 << 63) else h
                assert signed == r.h
                assert hash01(r.pid, salt) == r.u


class TestIterativeOracleTwins:
    """The literal oracles are fixture-bound to sf0.01 (driver gate,
    exercised by tools/check_correctness.py); these tests pin the same
    twin functions against the live Spark pipelines at smoke scale, so
    a semantic drift in either side fails fast."""

    def test_bpe_histogram_twin(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _bpe_histogram_spark,
        )
        from dystonse_gtfs_importer_spark.plans.ref_single import (
            ref_bpe_token_histogram,
        )

        got = sorted((r.token, r.cnt) for r in
                     _bpe_histogram_spark(spark, sf_smoke).collect())
        assert got == ref_bpe_token_histogram(sf_smoke)
        assert len(got) > 10

    def test_kmeans_clusters_twin(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _kmeans_clusters_spark,
        )
        from dystonse_gtfs_importer_spark.plans.ref_single import (
            ref_kmeans_clusters,
        )

        got = sorted(
            (r.cell, r.n_points, r.min_id, r.max_id, r.cent_fp)
            for r in _kmeans_clusters_spark(spark, sf_smoke).collect())
        assert got == ref_kmeans_clusters(sf_smoke)
        assert sum(r[1] for r in got) > 0

    def test_oracle_sql_renders_values_table(self):
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _bpe_histogram_oracle,
            _kmeans_clusters_oracle,
        )

        import duckdb

        bpe = duckdb.sql(_bpe_histogram_oracle()).fetchall()
        km = duckdb.sql(_kmeans_clusters_oracle()).fetchall()
        assert len(bpe) > 10 and all(c >= 1 for _, c in bpe)
        assert len(km) >= 1 and all(len(r) == 5 for r in km)


class TestGreedyKmeansppTwins:
    """ADVICE r7: the literal oracle's greedy weighted k-means++ must
    be an INDEPENDENT derivation. This pins that the two independent
    implementations agree on randomized weighted candidate sets - a
    divergence would mean one of them broke, and the driver hash gate
    would catch it on the fixture; this catches it everywhere else."""

    def test_twins_agree_on_random_candidates(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from dystonse_gtfs_importer_spark.operators.clustering import (
            _greedy_weighted_kmeanspp,
        )
        from dystonse_gtfs_importer_spark.plans.ref_single import (
            _ref_greedy_weighted_kmeanspp,
        )

        vec = st.lists(
            st.floats(min_value=-8, max_value=8, allow_nan=False,
                      allow_infinity=False, width=32),
            min_size=3, max_size=3)

        @given(st.lists(st.tuples(vec, st.integers(1, 50)),
                        min_size=1, max_size=20),
               st.integers(min_value=1, max_value=8))
        @settings(max_examples=300, deadline=None)
        def check(cands, k):
            vecs = [c[0] for c in cands]
            ws = [c[1] for c in cands]
            live = _greedy_weighted_kmeanspp(
                [{"pid": i, "vec": vecs[i], "w": ws[i]}
                 for i in range(len(cands))], k)
            ref = _ref_greedy_weighted_kmeanspp(vecs, ws, k)
            assert live == ref

        check()
