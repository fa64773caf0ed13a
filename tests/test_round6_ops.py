"""Semantic tests for the round-6 operators on PLANTED data.

The oracle gate proves Spark and DuckDB compute the SAME thing; these
tests prove it's the RIGHT thing: known inputs with hand-derivable
answers (a dominant principal direction, a document containing
another, an event exactly one half-life old, ...).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_importer_spark.functions import (
    dedup_sql as D,
    sampling_sql as SAMP,
    sketch_sql as SK,
    sql_shared as S,
)


@pytest.fixture(autouse=True)
def _utc(spark):
    from dystonse_gtfs_importer_spark.session import configure_for_oracle

    configure_for_oracle(spark)


def _docs(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.createOrReplaceTempView("documents")
    return df


class TestWeightedSampleTopk:
    def test_weight_monotonicity(self, spark):
        """100 heavy docs (w=10001) among 900 light docs (w=2):
        heavies must be drawn far above their uniform share in the
        top-400 — and the draw is deterministic for the seed."""
        rows = [(i, "x", "en", "s", 10000 if i < 100 else 1)
                for i in range(1000)]
        _docs(spark, rows)
        out = spark.sql(SAMP.q_weighted_sample_topk(S.SPARK)).collect()
        assert len(out) == 400
        heavy = sum(1 for r in out if r.doc_id < 100)
        # uniform draw would include ~40 heavies; A-ES with 5000x the
        # weight must take essentially all 100
        assert heavy >= 95, heavy

    def test_key_is_integer_and_sorted(self, spark):
        _docs(spark, [(i, "x", "en", "s", 10) for i in range(50)])
        out = spark.sql(SAMP.q_weighted_sample_topk(S.SPARK)).collect()
        keys = [r.key_e12 for r in out]
        assert keys == sorted(keys, reverse=True)
        assert all(isinstance(k, int) for k in keys)


class TestSkewProfile:
    def test_hand_computed_profile(self, spark):
        """One hot key with 8 rows + 2 singletons: top1 = 8/10,
        HHI = (64+1+1)/100, salt = ceil(8*3/10) = 3."""
        rows = ([(i, "2024-01-01 00:00:00", 7, "a", 1.0, None)
                 for i in range(8)]
                + [(8, "2024-01-01 00:00:00", 1, "a", 1.0, None),
                   (9, "2024-01-01 00:00:00", 2, "a", 1.0, None)])
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, "
                  "event_type string, value double, props string")
        df = df.withColumn("ts", F.to_timestamp("ts"))
        df.createOrReplaceTempView("events")
        out = spark.sql(SK.q_skew_profile(S.SPARK)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n_keys, r.rows_total, r.max_key_rows) == (3, 10, 8)
        assert r.top1_share_e4 == 8000
        assert r.hhi_e8 == 66_000_000
        assert r.salt_buckets == 3


class TestDecayedEngagement:
    def test_exact_half_life(self, spark):
        """Two events of value 2.0: one at the anchor (full weight),
        one exactly 7 days older (one half-life -> halved):
        decayed = 2e6 + 1e6."""
        rows = [(1, "2024-01-08 00:00:00", 1, "a", 2.0, None),
                (2, "2024-01-01 00:00:00", 1, "a", 2.0, None)]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, "
                  "event_type string, value double, props string")
        df.withColumn("ts", F.to_timestamp("ts")) \
            .createOrReplaceTempView("events")
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_decayed_engagement,
        )

        r = spark.sql(q_decayed_engagement(S.SPARK)).collect()[0]
        assert r.raw_value_e6 == 4_000_000
        assert r.decayed_value_e6 == 3_000_000

    def test_negative_values_decay_symmetrically(self, spark):
        rows = [(1, "2024-01-08 00:00:00", 1, "a", -2.0, None),
                (2, "2024-01-01 00:00:00", 1, "a", -2.0, None)]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, "
                  "event_type string, value double, props string")
        df.withColumn("ts", F.to_timestamp("ts")) \
            .createOrReplaceTempView("events")
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_decayed_engagement,
        )

        r = spark.sql(q_decayed_engagement(S.SPARK)).collect()[0]
        assert r.decayed_value_e6 == -3_000_000


class TestContainmentPairs:
    def test_contained_document_detected(self, spark):
        """Doc 2 = doc 1's text plus a long unrelated tail: doc 1's
        fingerprints are (almost) all inside doc 2 -> containment
        (1 in 2) high; the reverse direction must score lower."""
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep green forest tonight")
        tail = (" meanwhile completely different words describe an "
                "unrelated topic about economics and metallurgy and "
                "seventeen ancient shipwrecks near the rocky coast")
        _docs(spark, [(1, base, "en", "s", len(base)),
                      (2, base + tail, "en", "s", len(base + tail)),
                      (3, "totally disjoint text about zebras " * 3,
                       "en", "s", 100)])
        out = {(r.contained, r.container): r
               for r in spark.sql(D.q_containment_pairs(S.SPARK))
               .collect()}
        assert (1, 2) in out
        r12 = out[(1, 2)]
        assert r12.containment_e3 >= 900, r12
        # the container is NOT contained in the contained doc at the
        # same strength (its tail fingerprints are unmatched)
        r21 = out.get((2, 1))
        assert r21 is None or r21.containment_e3 < r12.containment_e3
        # disjoint doc pairs never appear
        assert not any(3 in k for k in out)


class TestCurriculumSchedule:
    def test_positions_are_band_monotone_permutation(self, spark,
                                                     sf_smoke):
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _curriculum_spark,
        )

        out = _curriculum_spark(spark, sf_smoke).collect()
        pos = sorted(r.position for r in out)
        assert pos == list(range(len(out)))
        # band-major order: every doc in a better (lower) band sits
        # before every doc in a worse band
        by_band = {}
        for r in out:
            by_band.setdefault(r.band, []).append(r.position)
        bands = sorted(by_band)
        for a, b in zip(bands, bands[1:]):
            assert max(by_band[a]) < min(by_band[b])


class TestPcaPowerIter:
    def test_recovers_planted_direction(self, spark):
        """Embeddings = s * e_7 + small deterministic noise: the
        leading component must put its dominant weight on dim 7 with
        a positive eigenvalue."""
        import math

        rows = []
        for i in range(200):
            s = 1.0 if i % 2 == 0 else -1.0
            vec = [0.01 * math.sin(i * 13 + j) for j in range(64)]
            vec[7] += s * 0.9
            rows.append((i, vec, i % 3))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int") \
            .createOrReplaceTempView("embeddings")
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN

        out = {r.dim: r for r in
               spark.sql(ANN.q_pca_power_iter(S.SPARK)).collect()}
        assert len(out) == 64
        lead = max(out.values(), key=lambda r: abs(r.v_e6))
        assert lead.dim == 7
        assert abs(lead.v_e6) > 900_000  # ~unit component on dim 7
        assert out[0].lambda_micro > 0


class TestKmvSourceOverlap:
    def test_half_overlapping_sources(self, spark):
        """Sources A and B share half their (distinct-prefix) docs:
        exact Jaccard = shared / (2*unique + shared); the KMV
        estimate must sit within a few points of it (here the sketch
        is EXACT because both universes fit inside k)."""
        rows = []
        did = 0
        for i in range(60):  # shared prefix universe
            for src in ("A", "B"):
                rows.append((did, f"shared text number {i} " + "w " * 6,
                             "en", src, 40))
                did += 1
        for i in range(60):  # unique to A / unique to B
            rows.append((did, f"only a doc {i} " + "q " * 6,
                         "en", "A", 40))
            did += 1
            rows.append((did, f"only b doc {i} " + "z " * 6,
                         "en", "B", 40))
            did += 1
        _docs(spark, rows)
        out = spark.sql(SK.q_kmv_source_overlap(S.SPARK)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.source_a, r.source_b) == ("A", "B")
        # 60 shared + 60 + 60 unique fingerprints -> J = 60/180
        assert r.jaccard_exact_e4 == 3333
        assert r.abs_err_e4 <= 400, r

    def test_estimate_form_matches_combined_form(self, spark, sf_smoke):
        """The production estimate-only form must emit estimate
        columns byte-identical to the verified combined form — same
        sketch CTE chain, just without the exact-truth pair join."""
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        est = spark.sql(SK.q_kmv_overlap_estimate(S.SPARK)).collect()
        full = spark.sql(SK.q_kmv_source_overlap(S.SPARK)).collect()
        lean = [(r.source_a, r.source_b, r.k_used, r.n_both_k,
                 r.jaccard_kmv_e4) for r in est]
        ref = [(r.source_a, r.source_b, r.k_used, r.n_both_k,
                r.jaccard_kmv_e4) for r in full]
        assert lean == ref and lean

    def test_estimate_form_has_no_exact_branch(self, spark, sf_smoke):
        """The estimate form must not pay the exact-truth cost: the
        full fingerprint universe appears once (sketch build), never
        a second time for a universe-wide pair join."""
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        est = spark.sql(SK.q_kmv_overlap_estimate(S.SPARK))
        full = spark.sql(SK.q_kmv_source_overlap(S.SPARK))
        n_est = str(est._jdf.queryExecution().optimizedPlan()).count(
            "Relation")
        n_full = str(full._jdf.queryExecution().optimizedPlan()).count(
            "Relation")
        assert n_est < n_full, (n_est, n_full)


class TestPerplexityTiers:
    def test_tiers_balanced_and_ordered(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _perplexity_tiers_spark,
        )

        out = _perplexity_tiers_spark(spark, sf_smoke).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r)
        for lang, rs in by_lang.items():
            sizes = [sum(1 for r in rs if r.tier == t) for t in (1, 2, 3)]
            assert max(sizes) - min(sizes) <= 1, (lang, sizes)
            scored = [r for r in rs if r.avg_logp is not None]
            t1 = [r.avg_logp for r in scored if r.tier == 1]
            t3 = [r.avg_logp for r in scored if r.tier == 3]
            if t1 and t3:
                assert min(t1) >= max(t3), lang


class TestMadOutliers:
    def test_planted_outliers_resist_masking(self, spark):
        """16 values at ~10 (tight), four spikes at 1000: median/MAD
        flags exactly the four spikes — while the spikes inflate the
        plain stddev to ~396 so a 3-sigma z-score flags NOTHING (the
        masking failure MAD exists to avoid)."""
        import statistics

        vals = [10.0 + 0.01 * i for i in range(16)] + [1000.0] * 4
        rows = [(i, "2024-01-01 00:00:00", 1, "a", v, None)
                for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, "
                  "event_type string, value double, props string")
        df.withColumn("ts", F.to_timestamp("ts")) \
            .createOrReplaceTempView("events")
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_mad_outliers,
        )

        r = spark.sql(q_mad_outliers(S.SPARK)).collect()[0]
        assert r.n == 20
        assert r.n_outliers == 4
        # interpolated median of the 10th/11th values: 10.095
        assert r.med_e6_x2 == 20_190_000
        # the z-score detector would be blind here
        mu = statistics.mean(vals)
        sd = statistics.pstdev(vals)
        assert not any(abs(v - mu) > 3 * sd for v in vals)


class TestWeightedStratifiedSample:
    def test_quota_and_weight_bias_per_stratum(self, spark):
        """Two strata, each 200 docs with 20 heavies: exactly 50 drawn
        per stratum, heavies overrepresented in both."""
        rows = []
        did = 0
        for lang in ("en", "de"):
            for i in range(200):
                rows.append((did, "x", lang, "s",
                             20000 if i < 20 else 1))
                did += 1
        _docs(spark, rows)
        out = spark.sql(
            SAMP.q_weighted_stratified_sample(S.SPARK)).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r)
        assert set(by_lang) == {"en", "de"}
        for lang, rs in by_lang.items():
            assert len(rs) == 50
            heavy = sum(1 for r in rs if r.n_chars == 20000)
            # uniform would draw 20*(50/200) = 5 heavies in
            # expectation; 20000x weights must pull in ~all 20
            assert heavy >= 18, (lang, heavy)
            assert sorted(r.draw_rank for r in rs) == list(range(1, 51))
