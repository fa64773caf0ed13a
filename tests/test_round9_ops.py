"""Semantic tests for the round-9 operators on PLANTED data: the FFD
packer must beat (never trail) NFD on padding while staying
deterministic and partition-invariant under its bounded open-bin
list."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dystonse_gtfs_importer_spark.operators.packing import (
    pack_sequences,
    pack_sequences_ffd,
    packed_band_stats,
)


@pytest.fixture(autouse=True)
def _utc(spark):
    from dystonse_gtfs_importer_spark.session import configure_for_oracle

    configure_for_oracle(spark)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def _word_doc(doc_id, n_tokens):
    return (doc_id, " ".join(["w"] * n_tokens), "en", "s", n_tokens * 2)


class TestSequencePackFFD:
    def test_planted_ffd_recovers_nfd_waste(self, spark):
        """ctx=10, one band, lengths 9,8,7,3,2,1: NFD closes the
        9-bin when 8 misses and the 8-bin when 7 misses, wasting the
        1- and 2-slots; FFD back-fills them.  Exact layout pinned."""
        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 7, 3, 2, 1])])
        ffd = {r["doc_id"]: (r["start_seq"], r["start_off"],
                             r["n_seqs_spanned"])
               for r in pack_sequences_ffd(docs, ctx=10,
                                           band_docs=100).collect()}
        # walk order: 9(id5), 8(id4), 7(id3... wait ids map by length
        # _word_doc(i, n): id 0 has 1 token ... id 5 has 9? no:
        # enumerate([9,8,7,3,2,1]) -> id0:9 id1:8 id2:7 id3:3 id4:2
        # id5:1.  Decreasing walk: id0(9) id1(8) id2(7) id3(3)
        # id4(2) id5(1).
        # FFD: s0=9; s1=8; s2=7; 3 -> fits s2(7+3=10); 2 -> s1
        # (8+2=10); 1 -> s0 (9+1=10).  Zero padding.
        assert ffd == {0: (0, 0, 1), 1: (1, 0, 1), 2: (2, 0, 1),
                       3: (2, 7, 1), 4: (1, 8, 1), 5: (0, 9, 1)}
        # NFD on the same mix wastes: 9 | 8 | 7+3 | 2+1
        nfd = pack_sequences(docs, ctx=10, band_docs=100)
        nfd_seqs = max(r["start_seq"] + r["n_seqs_spanned"]
                       for r in nfd.collect())
        assert nfd_seqs == 4
        ffd_seqs = max(s + n for s, _, n in ffd.values())
        assert ffd_seqs == 3

    def test_bounded_open_bins_close_fullest(self, spark):
        """max_open=2: opening a third bin closes the FULLEST open
        bin (first on ties), so a later small doc can no longer
        back-fill it — the bounded-list rule, pinned exactly."""
        # ctx=10, walk: 9, 8, 6, 2, 1
        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 6, 2, 1])])
        got = {r["doc_id"]: (r["start_seq"], r["start_off"])
               for r in pack_sequences_ffd(
                   docs, ctx=10, band_docs=100, max_open=2).collect()}
        # s0=9; s1=8; 6 -> opens s2, list [9,8,6] > 2 -> close the 9
        # (fullest); 2 -> first fit among open [8,6] -> s1 (8+2);
        # 1 -> open [10?,..] s1 now 10: fits s2 (6+1).
        assert got == {0: (0, 0), 1: (1, 0), 2: (2, 0),
                       3: (1, 8), 4: (2, 6)}

    def test_oversize_chains_and_remainder_stays_open(self, spark):
        """An oversize doc chains dedicated sequences; its remainder
        chunk stays open and takes later docs first-fit."""
        docs = _docs(spark, [_word_doc(0, 23), _word_doc(1, 7),
                             _word_doc(2, 3)])
        got = {r["doc_id"]: (r["start_seq"], r["start_off"],
                             r["n_seqs_spanned"])
               for r in pack_sequences_ffd(docs, ctx=10,
                                           band_docs=100).collect()}
        # 23 -> seqs 0-2, remainder 3 open on seq 2; 7 -> fits seq 2
        # (3+7=10); 3 -> new seq 3
        assert got == {0: (0, 0, 3), 1: (2, 3, 1), 2: (3, 0, 1)}

    def test_ffd_never_worse_than_nfd_on_fixture(self, spark):
        """Padding(FFD) <= padding(NFD) per band on the driver
        fixture, with identical token conservation and both walks
        partition-invariant."""
        ctx = 64
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        nfd = packed_band_stats(
            pack_sequences(docs, ctx=ctx), ctx=ctx).collect()
        ffd = packed_band_stats(
            pack_sequences_ffd(docs, ctx=ctx), ctx=ctx).collect()
        n = {r["band"]: r for r in nfd}
        f = {r["band"]: r for r in ffd}
        assert set(n) == set(f) and n
        total_saved = 0
        for band in n:
            assert f[band]["total_tokens"] == n[band]["total_tokens"]
            assert f[band]["padding_tokens"] <= n[band]["padding_tokens"]
            total_saved += (n[band]["padding_tokens"]
                            - f[band]["padding_tokens"])
        assert total_saved > 0  # the fixture has FFD-recoverable slack

    def test_partition_invariance(self, spark):
        docs = _docs(spark, [_word_doc(i, 1 + (i * 13) % 29)
                             for i in range(60)])
        a = sorted(map(tuple, pack_sequences_ffd(
            docs.repartition(7), ctx=16, band_docs=8).collect()))
        b = sorted(map(tuple, pack_sequences_ffd(
            docs.repartition(1), ctx=16, band_docs=8).collect()))
        assert a == b
