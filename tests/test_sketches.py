"""Sketch queries (functions/sketch_sql.py): HyperLogLog distinct.

The driver hash-matches Spark vs DuckDB; these tests add a THIRD
independent derivation — a plain-Python HLL over hashlib.md5 — so the
relational register build is pinned against a reference that shares
no SQL with either engine, plus the estimator's error guarantee.
"""

from __future__ import annotations

import hashlib
import math

from dystonse_gtfs_importer_spark.functions import sketch_sql as SK
from dystonse_gtfs_importer_spark.functions import sql_shared as S
from dystonse_gtfs_importer_spark.sources.testdata import (
    load_table,
    register_views,
)


def _py_regs(values, seed="hll1", m=256, rho_max=49):
    regs = [0] * m
    for v in values:
        hx = hashlib.md5(f"{seed}#{v}".encode()).hexdigest()
        bucket = int(hx[:2], 16)
        w = int(hx[2:14], 16)
        rho = rho_max - w.bit_length() if w else rho_max
        regs[bucket] = max(regs[bucket], rho)
    return regs


def _py_estimate(regs, m=256, rho_max=49):
    alpha = 0.7213 / (1 + 1.079 / 256.0)
    t = sum(1 << (rho_max - r) for r in regs)
    e_raw = alpha * m * m * float(1 << rho_max) / t
    v_zero = regs.count(0)
    if e_raw <= 2.5 * m and v_zero > 0:
        return m * math.log(m / v_zero)
    return e_raw


def _py_hll(values):
    return _py_estimate(_py_regs(values))


class TestHll:
    def test_matches_python_reference(self, spark, sf_smoke):
        register_views(spark, sf_smoke)
        got = {r.event_type: (r.n_exact, r.hll_est)
               for r in spark.sql(SK.q_hll_distinct(S.SPARK)).collect()}

        ev = load_table(spark, sf_smoke, "events") \
            .select("event_type", "user_id").collect()
        by_type: dict[str, list] = {}
        for r in ev:
            by_type.setdefault(r.event_type, []).append(r.user_id)

        assert set(got) == set(by_type)
        for et, users in by_type.items():
            n_exact, hll_est = got[et]
            assert n_exact == len(set(users))
            assert hll_est == round(_py_hll(users), 2), et

    def test_error_within_bound(self, spark, sf_smoke):
        # standard error for m=256 is 1.04/sqrt(256) = 6.5 %; assert
        # a generous 3-sigma envelope so the test never flakes
        register_views(spark, sf_smoke)
        for r in spark.sql(SK.q_hll_distinct(S.SPARK)).collect():
            assert abs(r.rel_err_pct) < 19.5, r

    def test_registers_merge_by_max(self, spark, sf_smoke):
        """Shard-merge associativity: the sketch of a union equals the
        register-wise MAX of per-shard sketches (what makes HLL safe
        to compute per-partition and combine at 100 TB)."""
        register_views(spark, sf_smoke)
        ev = load_table(spark, sf_smoke, "events") \
            .select("user_id").limit(400).collect()
        users = [r.user_id for r in ev]
        whole = _py_regs(users)
        a, b = _py_regs(users[:137]), _py_regs(users[137:])
        merged = [max(x, y) for x, y in zip(a, b)]
        assert merged == whole
        assert _py_estimate(merged) == _py_estimate(whole)


class TestHistogramQuantiles:
    def test_error_bounded_by_bin_width(self, spark, sf_smoke):
        register_views(spark, sf_smoke)
        rows = spark.sql(SK.q_histogram_quantiles(S.SPARK)).collect()
        assert len(rows) == len(SK.HIST_QUANTILES)
        for r in rows:
            # estimate and true quantile share the covering bin, so
            # the error can never exceed one bin width
            assert r.abs_err_micros <= SK.HIST_BIN_WIDTH * 1e6, r
        by_q = sorted((r.pct, r.est_micros) for r in rows)
        ests = [e for _, e in by_q]
        assert ests == sorted(ests), "estimates not monotone in q"


class TestBloomMembership:
    def test_no_false_negatives_and_some_false_positives(self, spark):
        import pandas as pd

        from dystonse_gtfs_importer_spark.session import configure_for_oracle

        configure_for_oracle(spark)
        # base source 'a': 400 tokens; source 'b': 30 shared + 300
        # disjoint probes -> the 1920-bit filter at ~50 % fill must
        # flag every shared token and (deterministically, seeded MD5)
        # trips on some disjoint ones
        base_toks = [f"base{i}" for i in range(400)]
        shared = base_toks[:30]
        probe_only = [f"probe{i}" for i in range(300)]
        rows = [(0, " ".join(base_toks), "a"),
                (1, " ".join(shared + probe_only), "b")]
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
        spark.createDataFrame(pdf).createOrReplaceTempView("documents")
        out = {r.source: r for r in
               spark.sql(SK.q_bloom_membership(S.SPARK)).collect()}
        b = out["b"]
        assert b.n_probed == 330 and b.n_truly_shared == 30
        # bloom guarantee: every truly shared token is flagged
        assert b.n_flagged - b.n_false_pos == b.n_truly_shared
        # at this fill ratio the deterministic hashes do collide
        assert 0 < b.n_false_pos < 300


class TestTemperatureSample:
    def test_low_resource_languages_upweighted(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
        )

        register_views(spark, sf_smoke)
        rows = spark.sql(SAMP.q_temperature_sample(S.SPARK)).collect()
        per = {}
        for r in rows:
            per.setdefault(r.lang, [r.n_l, 0])
            per[r.lang][1] += 1
        assert sum(k for _, k in per.values()) <= SAMP.TEMP_TARGET
        # every language's kept count equals its quota (k_l <= n_l here)
        for lang, (n_l, kept) in per.items():
            k_l = next(r.k_l for r in rows if r.lang == lang)
            assert kept == min(k_l, n_l), lang
        # α=0.5 property: keep RATE decreases with corpus share
        rates = sorted(((n, kept / n) for n, kept in per.values()),
                       reverse=True)
        assert all(r1 <= r2 + 1e-9
                   for (_, r1), (_, r2) in zip(rates, rates[1:]))

    def test_deterministic_across_runs(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
        )

        register_views(spark, sf_smoke)
        a = sorted(r.doc_id for r in
                   spark.sql(SAMP.q_temperature_sample(S.SPARK)).collect())
        b = sorted(r.doc_id for r in
                   spark.sql(SAMP.q_temperature_sample(S.SPARK)).collect())
        assert a == b and a
