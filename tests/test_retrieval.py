"""DSIR importance weights + BM25 retrieval: semantics on a
handcrafted corpus (target-like documents must out-weigh
background-like ones; docs hitting more/rarer query terms must
out-rank), and partition-count determinism — the integer fixed-point
construction promises BIT-identical results under any shuffle
parallelism, so we run the same query under different
``spark.sql.shuffle.partitions`` and demand equality."""

from __future__ import annotations

import pytest

from dystonse_gtfs_importer_spark.functions import (
    sampling_sql as SAMP,
    sql_shared as S,
)


@pytest.fixture()
def tiny_docs(spark):
    # target (en) docs speak "alpha beta"; background (de) docs speak
    # "gamma delta"; doc 4 is an en-looking doc filed under de, doc 5
    # a de-looking doc filed under en, doc 6 is empty.
    rows = [
        (0, "alpha beta alpha beta alpha", "en", "web", 27),
        (1, "alpha beta beta alpha", "en", "web", 21),
        (2, "gamma delta gamma delta gamma", "de", "web", 29),
        (3, "gamma delta delta gamma", "de", "web", 23),
        (4, "alpha beta alpha", "de", "web", 16),
        (5, "gamma delta gamma", "en", "web", 17),
        (6, "", "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: bigint, text: string, lang: string, "
              "source: string, n_chars: bigint")
    df.createOrReplaceTempView("documents")
    yield df
    spark.catalog.dropTempView("documents")


def _rows(spark, sql):
    return sorted(map(tuple, spark.sql(sql).collect()))


class TestDsirWeights:
    def test_target_like_docs_outweigh_background_like(self, spark,
                                                       tiny_docs):
        out = {r.doc_id: r for r in
               spark.sql(SAMP.q_dsir_weights(S.SPARK)).collect()}
        assert len(out) == 7
        # per-token average so length doesn't dominate the comparison
        avg = {i: out[i].dsir_weight_e4 / out[i].n_tok
               for i in range(6)}
        # en-vocabulary docs score above de-vocabulary docs REGARDLESS
        # of their lang label — the weight reads the text, the label
        # only defines the training split of the ratio table
        for en_like in (0, 1, 4):
            for de_like in (2, 3, 5):
                assert avg[en_like] > avg[de_like], (avg, en_like, de_like)
        # the empty doc keeps weight 0 via the LEFT JOIN
        assert out[6].dsir_weight_e4 == 0 and out[6].n_tok == 0

    def test_spark_form_matches_oracle_form_rendered_on_spark(
            self, spark, tiny_docs):
        a = _rows(spark, SAMP.q_dsir_weights(S.SPARK))
        b = _rows(spark, SAMP.q_dsir_weights_oracle(S.SPARK))
        assert a == b

    def test_partition_count_invariance(self, spark, tiny_docs):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = _rows(spark, SAMP.q_dsir_weights(S.SPARK))
            spark.conf.set("spark.sql.shuffle.partitions", "29")
            b = _rows(spark, SAMP.q_dsir_weights(S.SPARK))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b


@pytest.fixture()
def bm25_docs(spark):
    # BM25_TERMS = (merge, batch, scan); doc 0 hits all three, doc 1
    # hits two, doc 2 repeats one term in a long doc (tf saturation),
    # doc 3 hits none, doc 4 is a short single-hit doc.
    rows = [
        (0, "merge batch scan pipeline", "en", "web", 25),
        (1, "merge batch merge other tokens here", "en", "web", 35),
        (2, "scan " * 20 + "filler " * 40, "en", "web", 380),
        (3, "nothing relevant at all", "en", "web", 23),
        (4, "merge", "en", "web", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: bigint, text: string, lang: string, "
              "source: string, n_chars: bigint")
    df.createOrReplaceTempView("documents")
    yield df
    spark.catalog.dropTempView("documents")


class TestBm25TopK:
    def test_ranking_semantics(self, spark, bm25_docs):
        out = spark.sql(SAMP.q_bm25_topk(S.SPARK)).collect()
        ids = [r.doc_id for r in out]
        # the no-hit doc never appears
        assert 3 not in ids
        # the all-terms doc outranks every other
        assert ids[0] == 0
        by_id = {r.doc_id: r for r in out}
        assert by_id[0].n_terms_hit == 3
        assert by_id[1].n_terms_hit == 2
        # scores are positive (positive-idf BM25) and ordered
        scores = [r.bm25_e4 for r in out]
        assert scores == sorted(scores, reverse=True)
        assert scores[-1] > 0

    def test_tf_saturation_beats_nothing_but_not_coverage(
            self, spark, bm25_docs):
        # 20 repeats of one term must not outrank hitting all three
        # terms once — the k1 saturation property
        out = {r.doc_id: r.bm25_e4
               for r in spark.sql(SAMP.q_bm25_topk(S.SPARK)).collect()}
        assert out[0] > out[2]

    def test_partition_count_invariance(self, spark, bm25_docs):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "2")
            a = _rows(spark, SAMP.q_bm25_topk(S.SPARK))
            spark.conf.set("spark.sql.shuffle.partitions", "31")
            b = _rows(spark, SAMP.q_bm25_topk(S.SPARK))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert a == b
