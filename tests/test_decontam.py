"""Decontamination + shard-packing: dialect parity of the new array
helpers, semantic checks of the contamination flag on hand-built
corpora, and the packing invariants (contiguity, budget bound)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dystonse_gtfs_importer_spark.functions import decontam_sql as DC
from dystonse_gtfs_importer_spark.functions import sql_shared as S


def _run_both(spark, pdf: pd.DataFrame, template) -> tuple[list, list]:
    """Render the template for both engines over the same `documents`
    table and return (spark_rows, duck_rows) sorted identically."""
    from dystonse_gtfs_importer_spark.session import configure_for_oracle

    configure_for_oracle(spark)
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    s_rows = sorted(tuple(r) for r in spark.sql(template(S.SPARK)).collect())
    con = duckdb.connect()
    con.register("documents", pdf)
    d_rows = sorted(tuple(r) for r in con.execute(template(S.DUCKDB)).fetchall())
    return s_rows, d_rows


class TestArrayHelpers:
    def test_arr_len_and_slice_join_parity(self, spark):
        from dystonse_gtfs_importer_spark.session import configure_for_oracle

        configure_for_oracle(spark)
        texts = ["", "one", "a b", "a b c d e f", "  padded   spaces  x"]
        pdf = pd.DataFrame({"text": texts})
        for idx0, n in [(0, 1), (0, 3), (1, 2), (2, 5)]:
            got_s = [tuple(r) for r in spark.createDataFrame(pdf).selectExpr(
                S.SPARK.arr_slice_join(S.SPARK.token_array('text'), str(idx0), n),
                S.SPARK.arr_len(S.SPARK.token_array('text'))).collect()]
            con = duckdb.connect()
            con.register("t", pdf)
            got_d = [tuple(r) for r in con.execute(
                f"SELECT {S.DUCKDB.arr_slice_join(S.DUCKDB.token_array('text'), str(idx0), n)}, "
                f"{S.DUCKDB.arr_len(S.DUCKDB.token_array('text'))} FROM t").fetchall()]
            assert got_s == got_d, (idx0, n)


def _mk_docs(rows) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=["doc_id", "text", "source"])


class TestDecontaminate:
    def test_flags_copied_ngrams_only(self, spark):
        eval_text = "the quick brown fox jumps over the lazy dog today"
        rows = [
            (0, eval_text, "s"),                       # eval (id % 50 == 0)
            (1, "quick brown fox jumps over the lazy dog it said", "s"),
            (2, "completely different words about spark query planning here", "s"),
            (3, "the quick brown fox jumps elsewhere entirely now friend", "s"),
        ]
        s_rows, d_rows = _run_both(spark, _mk_docs(rows), DC.q_decontaminate)
        assert s_rows == d_rows
        by_id = {r[0]: r for r in s_rows}
        assert set(by_id) == {1, 2, 3}          # eval doc excluded
        # doc 1 shares >= MIN_HITS word-5-grams with the eval doc
        assert by_id[1][2] == 1 and by_id[1][1] >= DC.MIN_HITS
        # doc 2 shares nothing
        assert by_id[2] == (2, 0, 0)
        # doc 3 shares exactly one 5-gram ("the quick brown fox jumps")
        assert by_id[3][1] == 1 and by_id[3][2] == 0

    def test_short_docs_produce_no_grams(self, spark):
        rows = [(0, "tiny", "s"), (1, "also tiny", "s"),
                (2, "one two three four", "s")]  # 4 tokens < n=5
        s_rows, d_rows = _run_both(spark, _mk_docs(rows), DC.q_decontaminate)
        assert s_rows == d_rows
        assert s_rows == [(1, 0, 0), (2, 0, 0)]


class TestBoilerplateScrub:
    def test_spans_removed_tokens_kept_in_order(self, spark):
        boiler = "please subscribe now"
        rows = [(i, f"unique{i} {boiler} tail{i} word{i}", "s")
                for i in range(DC.BP_MIN_DOCS)]
        rows += [
            (90, boiler, "s"),                    # fully boilerplate -> ''
            (91, "two tokens", "s"),              # < n, untouched
            (92, "subscribe now maybe later ok", "s"),  # no full 3-gram hit
        ]
        s_rows, d_rows = _run_both(spark, _mk_docs(rows),
                                   DC.q_boilerplate_scrub)
        assert s_rows == d_rows
        by_id = {r[0]: r for r in s_rows}
        assert len(by_id) == len(rows)
        for i in range(DC.BP_MIN_DOCS):
            assert by_id[i] == (i, 6, 3, f"unique{i} tail{i} word{i}")
        assert by_id[90] == (90, 3, 3, "")
        assert by_id[91] == (91, 2, 0, "two tokens")
        assert by_id[92] == (92, 5, 0, "subscribe now maybe later ok")

    def test_overlapping_spans_union_coverage(self, spark):
        # "a b c d" where both "a b c" and "b c d" are frequent:
        # coverage is the union, not double-removal
        rows = [(i, f"x{i} a b c d y{i}", "s")
                for i in range(DC.BP_MIN_DOCS)]
        s_rows, d_rows = _run_both(spark, _mk_docs(rows),
                                   DC.q_boilerplate_scrub)
        assert s_rows == d_rows
        for i, r in sorted((r[0], r) for r in s_rows):
            assert r == (i, 6, 4, f"x{i} y{i}")


class TestShardPacking:
    @pytest.fixture(scope="class")
    def packed(self, spark):
        rows = [
            (i, " ".join(["tok"] * n), src)
            for i, (n, src) in enumerate(
                [(400, "a"), (700, "a"), (900, "a"), (100, "a"), (2500, "a"),
                 (50, "b"), (30, "b"), (999, "b")])
        ]
        s_rows, d_rows = _run_both(spark, _mk_docs(rows),
                                   DC.q_token_shard_packing)
        assert s_rows == d_rows
        return s_rows  # (doc_id, source, n_tokens, cum_tokens, shard_id)

    def test_contiguous_and_monotone(self, packed):
        for src in ("a", "b"):
            sub = [r for r in packed if r[1] == src]
            shards = [r[4] for r in sorted(sub)]
            assert shards == sorted(shards)     # nondecreasing in doc_id
            assert shards[0] == 0               # first doc starts shard 0

    def test_shard_is_offset_bucket(self, packed):
        budget = DC.SHARD_TOKEN_BUDGET
        for _, _, n_tok, cum, shard in packed:
            assert shard == (cum - n_tok) // budget

    def test_oversized_doc_gets_own_bucket(self, packed):
        # doc 4 (2500 tokens) starts at offset 2100 -> shard 2; the
        # budget bound holds per starting offset, not per doc size
        by_id = {r[0]: r for r in packed}
        assert by_id[4][4] == 2


class TestSpanDedup:
    """q_span_dedup pinned semantics: a span duplicated ACROSS
    documents survives only in the lowest-doc_id owner; a span
    repeated only WITHIN one document is never dropped; short tail
    spans count their true token length."""

    def test_semantics_and_engine_parity(self, spark):
        import duckdb
        import pandas as pd

        from dystonse_gtfs_importer_spark.functions import dedup_sql as D
        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.session import (
            configure_for_oracle,
        )

        span10 = "a b c d e f g h i j"
        docs = pd.DataFrame(
            [(1, span10 + " k l", "en", "s"),        # owner + 2-token tail
             (2, span10, "en", "s"),                 # cross-doc dup: dropped
             (3, "x y z", "en", "s"),                # unique short doc
             (4, span10 + " " + span10, "en", "s"),  # dup twice: both dropped
             (5, "p q r s t u v w x y p q r s t u v w x y", "en", "s")],
            columns=["doc_id", "text", "lang", "source"])
        configure_for_oracle(spark)
        spark.createDataFrame(docs).createOrReplaceTempView("documents")
        con = duckdb.connect()
        con.register("documents", docs)

        got = {r.doc_id: r for r in
               spark.sql(D.q_span_dedup(S.SPARK)).collect()}
        ref = sorted(map(tuple, con.execute(
            D.q_span_dedup(S.DUCKDB)).fetchall()))
        assert sorted(tuple(r) for r in got.values()) == ref

        assert (got[1].n_spans, got[1].n_dropped_spans,
                got[1].kept_tokens) == (2, 0, 12)
        assert (got[2].n_spans, got[2].n_dropped_spans,
                got[2].kept_tokens) == (1, 1, 0)
        assert (got[3].n_spans, got[3].n_dropped_spans,
                got[3].kept_tokens) == (1, 0, 3)
        assert (got[4].n_spans, got[4].n_dropped_spans,
                got[4].kept_tokens) == (2, 2, 0)
        # within-document repeat only: keeper keeps everything
        assert (got[5].n_spans, got[5].n_dropped_spans,
                got[5].kept_tokens) == (2, 0, 20)
