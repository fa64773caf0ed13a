"""Semantic tests for the round-7 operators on PLANTED data: the
ExactSubstr cut must excise exactly the planted duplicated passage
from every non-owner document and nothing else."""

from __future__ import annotations

import hashlib

import pytest

from dystonse_gtfs_importer_spark.functions import (
    dedup_sql as D,
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


def _run_cut(spark, cap=None):
    from dystonse_gtfs_importer_spark.operators.suffix import suffix_ranks
    from dystonse_gtfs_importer_spark.plans.oracle_queries import (
        _suffix_profile_spark_ctes,
    )

    suffix_ranks(spark.table("documents"),
                 prefix_cap=cap).createOrReplaceTempView("sr")
    return spark.sql(f"""
        WITH {_suffix_profile_spark_ctes(cap=cap)},
        {D.exactsubstr_cut_tail(S.SPARK)}
    """)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


PASSAGE = ("alpha beta gamma delta epsilon zeta eta theta iota "
           "kappa lam mu")  # 12 tokens, >= the 8-token threshold


class TestExactSubstrCut:
    def test_planted_duplicated_passage(self, spark):
        """Doc 1 and doc 5 share an exact 12-token passage; doc 1
        (lowest doc_id) owns it and keeps everything, doc 5 loses
        exactly those 12 tokens; unrelated docs are unaffected."""
        rows = [
            (1, f"intro one two three {PASSAGE} outro four", "en", "A", 1),
            (5, f"prefix tokens here {PASSAGE} suffix bits", "en", "B", 1),
            (9, "wholly unrelated text with enough words to exist",
             "en", "C", 1),
        ]
        _docs(spark, rows)
        out = {r.doc_id: r for r in _run_cut(spark).collect()}
        # only the non-owner document is affected
        assert set(out) == {5}
        r = out[5]
        assert r.n_tok == 17            # 3 prefix + 12 passage + 2 suffix
        assert r.n_removed == 12
        assert r.n_regions == 1
        assert r.kept_fp == _md5("prefix tokens here suffix bits")

    def test_overlapping_cuts_merge(self, spark):
        """Two duplicated passages overlapping in the victim doc merge
        into ONE region and each token is counted once."""
        # doc 30 contains A-passage then B-passage sharing 4 tokens:
        # a1..a8 o1 o2 o3 o4 + b5..b12 where owner docs hold each
        a = "a1 a2 a3 a4 a5 a6 a7 a8 o1 o2 o3 o4"
        b = "o1 o2 o3 o4 b5 b6 b7 b8 b9 b10 b11 b12"
        victim = ("lead " + a + " b5 b6 b7 b8 b9 b10 b11 b12 tail")
        rows = [
            (10, "pad words " + a + " more pad", "en", "A", 1),
            (20, b + " closing words", "en", "B", 1),
            (30, victim, "en", "C", 1),
        ]
        _docs(spark, rows)
        out = {r.doc_id: r for r in _run_cut(spark).collect()}
        assert 30 in out
        r = out[30]
        # tokens 1..20 (a-block + b-tail) are covered, merged: 1 region
        assert r.n_regions == 1
        assert r.n_removed == 20
        assert r.kept_fp == _md5("lead tail")

    def test_within_document_repeats_kept(self, spark):
        """A passage repeated only INSIDE one document is self-owned
        — the cut removes cross-document contamination, not internal
        structure."""
        p = "r1 r2 r3 r4 r5 r6 r7 r8"
        rows = [
            (1, f"{p} middle words {p}", "en", "A", 1),
            (2, "totally different content with many words here",
             "en", "B", 1),
        ]
        _docs(spark, rows)
        out = _run_cut(spark).collect()
        assert out == []                # nothing crosses documents

    def test_fully_cut_document(self, spark):
        """A document that IS the duplicated passage loses everything:
        n_removed == n_tok and kept_fp is MD5('')."""
        rows = [
            (1, f"leading context {PASSAGE} trailing context",
             "en", "A", 1),
            (7, PASSAGE, "en", "B", 1),
        ]
        _docs(spark, rows)
        out = {r.doc_id: r for r in _run_cut(spark).collect()}
        assert set(out) == {7}
        r = out[7]
        assert r.n_tok == 12 and r.n_removed == 12 and r.n_regions == 1
        assert r.kept_fp == _md5("")

    def test_matches_duckdb_oracle_on_planted_rows(self, spark):
        """Cross-engine: the full chain (profile from prefix doubling
        vs direct suffix sort, then the shared tail) agrees row-for-row
        on the planted fixture."""
        import duckdb

        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _EXACTSUBSTR_CUT_ORACLE,
        )

        rows = [
            (1, f"intro one two three {PASSAGE} outro four", "en", "A", 1),
            (5, f"prefix tokens here {PASSAGE} suffix bits", "en", "B", 1),
            (9, "wholly unrelated text with enough words to exist",
             "en", "C", 1),
        ]
        _docs(spark, rows)
        got = sorted(
            (r.doc_id, r.n_tok, r.n_removed, r.n_regions, r.kept_fp)
            for r in _run_cut(spark).collect())
        con = duckdb.connect()
        con.execute("""
            CREATE VIEW documents AS SELECT * FROM (VALUES
            {}) AS t(doc_id, text, lang, source, n_chars)
        """.format(",".join(
            f"({d}, '{t}', '{lg}', '{s}', {n})"
            for d, t, lg, s, n in rows)))
        want = sorted(tuple(r) for r in
                      con.execute(_EXACTSUBSTR_CUT_ORACLE).fetchall())
        assert got == want and got


class TestExactSubstrCutCapped:
    """The cap-truncated form (O(L·cap) slice mass) must produce the
    IDENTICAL cut: interior positions of a long span are themselves
    flagged, so capped intervals union to the true region."""

    def test_long_passage_beyond_cap_fully_excised(self, spark):
        """A 40-token duplicated passage, cap 16: the victim still
        loses all 40 tokens — the union of capped intervals covers
        the whole region even though no single rep_len exceeds 16."""
        passage = " ".join(f"p{i}" for i in range(40))
        rows = [
            (1, f"owner head {passage} owner tail", "en", "A", 1),
            (6, f"victim head words {passage} victim tail words",
             "en", "B", 1),
        ]
        _docs(spark, rows)
        out = {r.doc_id: r for r in _run_cut(spark, cap=16).collect()}
        assert set(out) == {6}
        r = out[6]
        assert r.n_removed == 40 and r.n_regions == 1
        assert r.kept_fp == _md5("victim head words victim tail words")

    def test_capped_equals_uncapped(self, spark):
        """Row-for-row equality of the capped and uncapped operators
        on a fixture mixing short spans, a long (> cap) span, an
        internal-only repeat, and a fully-duplicated doc."""
        passage = " ".join(f"q{i}" for i in range(30))
        short = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
        rows = [
            (1, f"alpha {passage} beta", "en", "A", 1),
            (2, f"gamma delta {passage} epsilon", "en", "B", 1),
            (3, f"{short} filler words here", "en", "C", 1),
            (4, f"other filler {short}", "en", "D", 1),
            (5, "r1 r2 r3 r4 r5 r6 r7 r8 mid r1 r2 r3 r4 r5 r6 r7 r8",
             "en", "E", 1),
            (7, short, "en", "F", 1),
        ]
        _docs(spark, rows)
        full = sorted(tuple(r) for r in _run_cut(spark).collect())
        capped = sorted(tuple(r) for r in
                        _run_cut(spark, cap=16).collect())
        assert capped == full and capped

    def test_capped_rank_rounds_bounded(self, spark):
        """prefix_cap stops the doubling: with cap 16 the covered
        prefix never exceeds 16 tokens, so ranks of two suffixes that
        agree on their first 16 tokens collide by design."""
        from dystonse_gtfs_importer_spark.operators.suffix import (
            suffix_ranks,
        )

        long_common = " ".join(f"c{i}" for i in range(16))
        rows = [(1, f"{long_common} endone", "en", "A", 1),
                (2, f"{long_common} endtwo", "en", "B", 1)]
        df = _docs(spark, rows)
        r = suffix_ranks(df, prefix_cap=16)
        at0 = {row.doc_id: row.suffix_rank
               for row in r.where("pos = 0").collect()}
        assert at0[1] == at0[2]          # capped: 16-token tie
        r_full = suffix_ranks(df)
        at0f = {row.doc_id: row.suffix_rank
                for row in r_full.where("pos = 0").collect()}
        assert at0f[1] != at0f[2]        # uncapped: discriminated

    def test_cap_must_be_power_of_two(self, spark):
        import pytest as _pytest

        from dystonse_gtfs_importer_spark.operators.suffix import (
            suffix_ranks,
        )

        with _pytest.raises(ValueError):
            suffix_ranks(spark.table("documents"), prefix_cap=24)


class TestLcpFromLevels:
    """The rank-ladder binary-decomposition LCP (zero suffix
    materialization) must equal brute-force token LCPs."""

    def test_hand_pairs(self, spark):
        from dystonse_gtfs_importer_spark.operators.suffix import (
            lcp_from_levels,
            suffix_rank_levels,
        )

        rows = [
            (1, "a b c d e f g h", "en", "A", 1),
            (2, "a b c d x y z", "en", "B", 1),
            (3, "a b c d e f g h", "en", "C", 1),   # exact copy of 1
            (4, "q r s", "en", "D", 1),
        ]
        df = _docs(spark, rows)
        levels, _ = suffix_rank_levels(df)
        pairs = spark.createDataFrame(
            [(1, 0, 2, 0),   # share "a b c d"      -> 4
             (1, 0, 3, 0),   # identical suffixes   -> 8 (min len)
             (1, 4, 3, 4),   # identical tails      -> 4
             (1, 0, 4, 0),   # nothing shared       -> 0
             (2, 4, 1, 0)],  # "x y z" vs "a b ..." -> 0
            "da long, pa int, db long, pb int")
        got = {(r.da, r.pa, r.db, r.pb): r.lcp
               for r in lcp_from_levels(pairs, levels).collect()}
        assert got == {(1, 0, 2, 0): 4, (1, 0, 3, 0): 8,
                       (1, 4, 3, 4): 4, (1, 0, 4, 0): 0,
                       (2, 4, 1, 0): 0}

    def test_brute_force_parity_randomized(self, spark):
        """Every suffix pair of a small planted corpus: decomposition
        LCP == pure-Python token LCP."""
        from dystonse_gtfs_importer_spark.operators.suffix import (
            lcp_from_levels,
            suffix_rank_levels,
        )

        texts = {1: "p q r p q r p q", 2: "r p q r", 3: "p q x p q r"}
        rows = [(d, t, "en", "S", 1) for d, t in texts.items()]
        df = _docs(spark, rows)
        levels, _ = suffix_rank_levels(df)
        toks = {d: t.split() for d, t in texts.items()}
        want, pair_rows = {}, []
        for da, ta in toks.items():
            for db, tb in toks.items():
                for pa in range(len(ta)):
                    for pb in range(len(tb)):
                        if (da, pa) >= (db, pb):
                            continue
                        sa, sb = ta[pa:], tb[pb:]
                        n = 0
                        while (n < len(sa) and n < len(sb)
                               and sa[n] == sb[n]):
                            n += 1
                        want[(da, pa, db, pb)] = n
                        pair_rows.append((da, pa, db, pb))
        pairs = spark.createDataFrame(
            pair_rows, "da long, pa int, db long, pb int")
        got = {(r.da, r.pa, r.db, r.pb): r.lcp
               for r in lcp_from_levels(pairs, levels).collect()}
        assert got == want


class TestRepeatedSpanProfileScalable:
    def test_matches_materialized_form(self, spark, sf_smoke):
        """Three derivations of the profile must agree; here the
        ladder-decomposition form vs the materialized-slice form on
        the smoke corpus (the DuckDB direct sort is the third leg,
        hash-checked by the driver as repeated_spans_scalable)."""
        from dystonse_gtfs_importer_spark.operators.suffix import (
            repeated_span_profile,
        )
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _repeated_spans_spark,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        a = sorted(map(tuple, repeated_span_profile(
            spark.table("documents")).collect()))
        b = sorted(map(tuple,
                       _repeated_spans_spark(spark, sf_smoke).collect()))
        assert a == b and a


class TestExactSubstrExcise:
    def test_pipeline_stage_rewrites_text(self, spark):
        """The excision stage must rewrite the victim's text, leave
        the owner and unrelated docs byte-identical, and account the
        cut in n_spans_cut / n_tokens_cut."""
        from dystonse_gtfs_importer_spark.operators.dedup import (
            exactsubstr_excise,
        )

        rows = [
            (1, f"intro one two three {PASSAGE} outro four", "en", "A", 1),
            (5, f"prefix tokens here {PASSAGE} suffix bits", "en", "B", 1),
            (9, "wholly unrelated text with enough words to exist",
             "en", "C", 1),
        ]
        df = _docs(spark, rows)
        out = {r.doc_id: r for r in exactsubstr_excise(df).collect()}
        assert out[5].text == "prefix tokens here suffix bits"
        assert out[5].n_spans_cut == 1 and out[5].n_tokens_cut == 12
        assert out[1].text == rows[0][1] and out[1].n_spans_cut == 0
        assert out[9].text == rows[2][1] and out[9].n_spans_cut == 0

    def test_clean_corpus_integration(self, spark):
        """clean_corpus(exactsubstr_min_len=8): the victim survives
        doc-level dedup (it is NOT a near-dup of the owner) but loses
        the contaminating passage, and its n_tokens reflects the
        post-cut text."""
        from dystonse_gtfs_importer_spark.plans.corpus import clean_corpus

        filler_v = " ".join(f"v{i}" for i in range(12))
        filler_o = " ".join(f"o{i}" for i in range(12))
        rows = [
            (1, f"{filler_o} {PASSAGE}", "en", "A", 1),
            (5, f"{filler_v} {PASSAGE}", "en", "B", 1),
        ]
        df = _docs(spark, rows)
        out = {r.doc_id: r for r in clean_corpus(
            df, min_quality=0.0, min_tokens=1,
            exactsubstr_min_len=8).collect()}
        assert set(out) == {1, 5}
        assert out[1].text == rows[0][1]          # owner intact
        assert out[5].text == filler_v            # passage excised
        assert out[5].n_tokens == 12              # post-cut count
        assert out[5].n_tokens_cut == 12 and out[5].n_spans_cut == 1


class TestPackingEfficiency:
    def test_hand_values(self, spark):
        """Two docs under context 512 (7 and 600 tokens): 600 splits
        into 2 sequences, padding = 3*512 - 607."""
        from dystonse_gtfs_importer_spark.functions import (
            decontam_sql as DC,
        )

        rows = [
            (1, " ".join(f"a{i}" for i in range(7)), "en", "S", 1),
            (2, " ".join(f"b{i}" for i in range(600)), "en", "S", 1),
        ]
        _docs(spark, rows)
        out = {r.context_len: r for r in spark.sql(
            DC.q_packing_efficiency(S.SPARK, contexts=(512,))
        ).collect()}
        r = out[512]
        assert r.n_docs == 2 and r.total_tokens == 607
        assert r.n_seqs == 3                 # 1 + ceil(600/512)=2
        assert r.padding_tokens == 3 * 512 - 607
        assert r.oversize_docs == 1
        assert r.padding_share_e4 == round(
            1e4 * (3 * 512 - 607) / (3 * 512))

    def test_larger_context_fewer_sequences(self, spark):
        from dystonse_gtfs_importer_spark.functions import (
            decontam_sql as DC,
        )

        rows = [(i, " ".join(f"t{i}x{j}" for j in range(100 + i)),
                 "en", "S", 1) for i in range(10)]
        _docs(spark, rows)
        out = {r.context_len: r for r in spark.sql(
            DC.q_packing_efficiency(S.SPARK)).collect()}
        assert out[512].n_seqs >= out[2048].n_seqs >= out[8192].n_seqs
        assert out[8192].n_seqs == 10        # nothing splits
        assert out[512].oversize_docs == 0

    def test_empty_documents_source(self, spark):
        """A source of all-empty documents produces zero sequences and
        a DEFINED zero padding share (no division-by-zero NULL/inf
        divergence between engines)."""
        from dystonse_gtfs_importer_spark.functions import (
            decontam_sql as DC,
        )

        rows = [(1, "", "en", "E", 0), (2, "   ", "en", "E", 0),
                (3, "one real doc here", "en", "R", 1)]
        _docs(spark, rows)
        out = {(r.context_len, r.source): r for r in spark.sql(
            DC.q_packing_efficiency(S.SPARK, contexts=(512,))
        ).collect()}
        e = out[(512, "E")]
        assert e.n_seqs == 0 and e.padding_tokens == 0
        assert e.padding_share_e4 == 0 and e.total_tokens == 0
        assert out[(512, "R")].n_seqs == 1


class TestNgramNovelty:
    def test_planted_shared_passage(self, spark):
        """A doc sharing an 8-gram with another doc loses exactly the
        shingles that overlap the shared passage; a fully-unique doc
        scores 10000; within-document repeats stay novel."""
        from dystonse_gtfs_importer_spark.functions import dedup_sql as D

        p8 = "s1 s2 s3 s4 s5 s6 s7 s8"
        rows = [
            (1, f"{p8} u1 u2 u3", "en", "A", 1),       # 4 shingles
            (2, f"w1 w2 w3 {p8}", "en", "B", 1),       # 4 shingles
            (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9", "en", "C", 1),
            (4, f"r1 r2 r3 r4 r5 r6 r7 r8 {'r1 r2 r3 r4 r5 r6 r7 r8'}",
             "en", "D", 1),                            # self-repeat
            (5, "too short", "en", "E", 1),            # < 8 tokens
        ]
        _docs(spark, rows)
        out = {r.doc_id: r for r in spark.sql(
            D.q_ngram_novelty(S.SPARK)).collect()}
        assert 5 not in out                            # no shingles
        # docs 1/2: only the exact shared 8-gram is non-novel
        assert out[1].n_shingles == 4 and out[1].n_novel == 3
        assert out[2].n_shingles == 4 and out[2].n_novel == 3
        assert out[1].novelty_e4 == 7500
        assert out[3].novelty_e4 == 10000
        # within-document repeat: df counts DISTINCT docs -> novel
        assert out[4].novelty_e4 == 10000


class TestExciseCasePreserved:
    def test_untouched_spans_keep_original_case(self, spark):
        """Matching is case-insensitive (dedup identity) but excision
        reads from the case-preserving token array: the victim's kept
        tokens retain their original casing even though the passage
        matched in lowercase."""
        from dystonse_gtfs_importer_spark.operators.dedup import (
            exactsubstr_excise,
        )

        upper_passage = PASSAGE.upper()
        rows = [
            (1, f"owner head words {PASSAGE} owner tail", "en", "A", 1),
            (5, f"Victim HEAD here {upper_passage} Tail BITS",
             "en", "B", 1),
        ]
        df = _docs(spark, rows)
        out = {r.doc_id: r for r in exactsubstr_excise(df).collect()}
        # the UPPERCASE passage matched the lowercase owner passage
        assert out[5].n_tokens_cut == 12
        assert out[5].text == "Victim HEAD here Tail BITS"
        assert out[1].text == rows[0][1]
