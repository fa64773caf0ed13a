"""Property-based tests (hypothesis) for the round-7 primitives whose
correctness arguments are algebraic: the decayed counter's bucket-sum
state must be a pure function of the event multiset, truncating shifts
must compose, and the excision tail's interval union must match a
reference union on arbitrary interval sets."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dystonse_gtfs_importer_spark.streaming.windows import (
    _decayed_total,
    _fold_bucket_sums,
    _shr,
)

_EVENT = st.tuples(
    st.integers(min_value=-10**9, max_value=4 * 10**9),   # epoch_s
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False))


class TestDecayAlgebra:
    @given(st.lists(_EVENT, min_size=1, max_size=30),
           st.randoms(use_true_random=False))
    @settings(max_examples=200, deadline=None)
    def test_state_is_multiset_function(self, events, rng):
        """Any permutation, cut into any micro-batches, gives the
        byte-identical (last_bucket, decayed, n) result."""
        def run(seq, cuts):
            acc, n = {}, 0
            start = 0
            for cut in [*cuts, len(seq)]:
                batch = seq[start:cut]
                start = cut
                # round-trip state through the sorted-array form the
                # operator stores
                items = sorted(acc.items())
                acc = dict(items)
                acc, n = _fold_bucket_sums(batch, acc, n)
            return _decayed_total(acc) + (n,)

        base = run(list(events), [])
        for _ in range(3):
            seq = list(events)
            rng.shuffle(seq)
            k = rng.randint(0, len(seq))
            cuts = sorted(rng.randint(0, len(seq)) for _ in range(k % 4))
            assert run(seq, cuts) == base

    @given(st.integers(min_value=-2**62, max_value=2**62),
           st.integers(min_value=0, max_value=70),
           st.integers(min_value=0, max_value=70))
    @settings(max_examples=300, deadline=None)
    def test_shr_composes(self, x, a, b):
        """Truncating-toward-zero shifts compose below the 62 cap —
        the identity that makes read-time single-shift decay equal a
        progressive shift of a SINGLE value (sums still don't
        distribute, which is why state keeps per-bucket sums)."""
        if a + b <= 62:
            assert _shr(_shr(x, a), b) == _shr(x, a + b)
        # the cap keeps shifts defined either way
        assert _shr(x, a) == -((-x) >> min(a, 62)) if x < 0 \
            else _shr(x, a) == x >> min(a, 62)

    @given(st.lists(_EVENT, min_size=1, max_size=25))
    @settings(max_examples=200, deadline=None)
    def test_decay_bounds(self, events):
        """The decayed total never exceeds the undecayed sum of
        positive contributions (and mirrors for negative)."""
        acc, n = _fold_bucket_sums(list(events), {}, 0)
        _, total = _decayed_total(acc)
        pos = sum(max(0, v) for v in acc.values())
        neg = sum(min(0, v) for v in acc.values())
        assert neg <= total <= pos
        assert n == len(events)

    @given(st.dictionaries(st.integers(-10**6, 10**6),
                           st.integers(-2**70, 2**70),
                           min_size=1, max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_prune_preserves_decayed_total(self, acc):
        """Dropping zero-contribution buckets (age > 62 AND shifted
        sum == 0) changes neither the decayed total nor last_bucket,
        and bounds live state: every surviving bucket is either
        within 62 half-lives of the newest or still contributes."""
        from dystonse_gtfs_importer_spark.streaming.windows import (
            _prune_zero_buckets,
        )

        pruned = _prune_zero_buckets(dict(acc))
        assert pruned  # newest bucket always survives (age 0)
        assert _decayed_total(pruned) == _decayed_total(acc)
        last = max(acc)
        for b, v in pruned.items():
            assert last - b <= 62 or _shr(v, 62) != 0


def _ref_union(intervals):
    """Reference interval union (sorted sweep)."""
    regions = []
    for st_, en in sorted(intervals):
        if regions and st_ <= regions[-1][1]:
            regions[-1][1] = max(regions[-1][1], en)
        else:
            regions.append([st_, en])
    return [(a, b) for a, b in regions]


class TestIntervalUnionReference:
    """The SQL tail's running-max union is exercised through Spark in
    test_round7_ops; here the same semantics are pinned against a
    reference sweep on randomized inputs via a pure-Python twin of the
    window logic."""

    @given(st.lists(st.tuples(st.integers(0, 60), st.integers(1, 20)),
                    min_size=1, max_size=25))
    @settings(max_examples=300, deadline=None)
    def test_running_max_union_matches_sweep(self, raw):
        intervals = [(s, s + ln) for s, ln in raw]
        # twin of the marked/grp/regions CTE chain: sort by (st, en),
        # new region when st > running max(en) of PRECEDING rows
        ordered = sorted(intervals)
        regions, max_en = [], None
        for s, e in ordered:
            if max_en is None or s > max_en:
                regions.append([s, e])
            else:
                regions[-1][1] = max(regions[-1][1], e)
            max_en = max(max_en, e) if max_en is not None else e
        got = [(a, b) for a, b in regions]
        assert got == _ref_union(intervals)
        # n_removed accounting: each token counted once
        covered = set()
        for s, e in intervals:
            covered.update(range(s, e))
        assert sum(b - a for a, b in got) == len(covered)


class TestNfdPackerAlgebra:
    """Round-8 packer: the pure per-band walk must satisfy the packing
    invariants on ARBITRARY length multisets (the oracle pins one
    fixture; these pin the algorithm)."""

    @given(st.lists(st.integers(min_value=1, max_value=300),
                    min_size=1, max_size=60),
           st.integers(min_value=4, max_value=64))
    @settings(max_examples=300, deadline=None)
    def test_walk_invariants(self, lengths, ctx):
        import pandas as pd

        from dystonse_gtfs_importer_spark.operators.packing import (
            _nfd_walk,
        )

        pdf = pd.DataFrame({
            "doc_id": range(len(lengths)),
            "band": [0] * len(lengths),
            "n_tokens": lengths,
        })
        out = _nfd_walk(pdf, ctx)
        rows = list(out.itertuples(index=False))
        # every doc packed exactly once, tokens conserved
        assert sorted(r.doc_id for r in rows) == sorted(range(len(lengths)))
        assert sum(r.n_tokens for r in rows) == sum(lengths)
        # per-sequence occupancy: reconstruct token intervals in the
        # flat (seq * ctx + offset) address space; they must be
        # disjoint, within bounds, and start_off < ctx
        intervals = []
        for r in rows:
            assert 0 <= r.start_off < ctx
            # only split docs span; split only if longer than ctx
            assert r.n_seqs_spanned == (r.start_off + r.n_tokens - 1) // ctx + 1
            if r.n_seqs_spanned > 1:
                assert r.start_off == 0 and r.n_tokens > ctx
            a = r.start_seq * ctx + r.start_off
            intervals.append((a, a + r.n_tokens))
        intervals.sort()
        for (a1, b1), (a2, b2) in zip(intervals, intervals[1:]):
            assert b1 <= a2, "overlapping placements"
        # never worse than one-doc-per-sequence (the planner baseline)
        n_seqs = max(r.start_seq + r.n_seqs_spanned for r in rows)
        naive = sum((n + ctx - 1) // ctx for n in lengths)
        assert n_seqs <= naive
