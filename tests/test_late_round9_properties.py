"""Property tests for the late-round-9 walk operators (pure-pandas
walks — no Spark session per example, so hypothesis can afford real
case counts): the bounded-FFD packer never produces more sequences
than NFD, and the dynamic batcher's caps/coverage/numbering hold for
arbitrary size mixes."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dystonse_gtfs_importer_spark.operators.packing import (
    _batch_walk,
    _ffd_walk,
    _nfd_walk,
)


def _pdf(lens):
    return pd.DataFrame({"doc_id": range(len(lens)),
                         "band": [0] * len(lens),
                         "n_tokens": lens})


def _n_seqs(df) -> int:
    return int((df["start_seq"] + df["n_seqs_spanned"]).max())


@settings(max_examples=150, deadline=None)
@given(st.integers(4, 64).flatmap(
    lambda ctx: st.tuples(
        st.just(ctx),
        st.lists(st.integers(1, ctx * 2), min_size=1, max_size=40),
        st.sampled_from([1, 2, 4, 16]))))
def test_ffd_never_more_sequences_than_nfd(case):
    ctx, lens, max_open = case
    nfd = _nfd_walk(_pdf(lens), ctx)
    ffd = _ffd_walk(_pdf(lens), ctx, max_open)
    assert _n_seqs(ffd) <= _n_seqs(nfd)
    # token conservation: both walks assign every token exactly once
    assert int(nfd["n_tokens"].sum()) == sum(lens)
    assert int(ffd["n_tokens"].sum()) == sum(lens)
    # placements stay inside their spans
    for df in (nfd, ffd):
        over = df[df["start_off"] + df["n_tokens"]
                  > df["n_seqs_spanned"] * ctx]
        assert over.empty


@settings(max_examples=150, deadline=None)
@given(st.integers(4, 200).flatmap(
    lambda mt: st.tuples(
        st.just(mt),
        st.lists(st.integers(1, mt * 2), min_size=1, max_size=40),
        st.integers(1, 8))))
def test_batch_walk_caps_and_coverage(case):
    max_tokens, lens, max_seqs = case
    out = _batch_walk(_pdf(lens), max_tokens, max_seqs)
    # every doc assigned exactly once
    assert sorted(out["doc_id"]) == list(range(len(lens)))
    # batches contiguous from 0
    assert sorted(out["batch"].unique()) == \
        list(range(int(out["batch"].max()) + 1))
    for _, grp in out.groupby("batch"):
        # row cap always; padded-cost cap for every multi-row batch
        assert len(grp) <= max_seqs
        if len(grp) > 1:
            assert len(grp) * int(grp["n_tokens"].max()) <= max_tokens
        # slots contiguous in walk order (len DESC, id ASC)
        ordered = grp.sort_values(["n_tokens", "doc_id"],
                                  ascending=[False, True])
        assert list(ordered["pos"]) == list(range(len(grp)))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(1, 50), min_size=1, max_size=30),
       st.randoms(use_true_random=False))
def test_walks_input_order_invariant(lens, rnd):
    """The walks sort internally: shuffling input row order cannot
    change any placement."""
    base = _pdf(lens)
    shuffled = base.sample(frac=1.0, random_state=rnd.randint(0, 9999))
    for walk in (lambda p: _nfd_walk(p, 16),
                 lambda p: _ffd_walk(p, 16, 4),
                 lambda p: _batch_walk(p, 64, 4)):
        a = walk(base.copy()).sort_values("doc_id").reset_index(drop=True)
        b = (walk(shuffled.copy()).sort_values("doc_id")
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
