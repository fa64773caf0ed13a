"""Corpus-cleaning pipeline tests on the driver documents table plus
injected exact/near duplicates."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    from dystonse_gtfs_importer_spark.sources.testdata import load_table

    base = load_table(spark, sf_smoke, "documents") \
        .select("doc_id", "text", "source")
    # inject exact duplicates (ids 10000+) and a near-duplicate
    first = base.orderBy("doc_id").limit(3).collect()
    extra = [(10000 + i, r.text, "dup") for i, r in enumerate(first)]
    near = first[0].text.replace(" ", "  ", 1) + " tail"
    extra.append((10999, near, "dup"))
    extra_df = spark.createDataFrame(extra, "doc_id long, text string, source string")
    return base.unionByName(extra_df).cache()


class TestDedupApply:
    def test_exact_dupes_dropped_min_id_kept(self, docs):
        from dystonse_gtfs_importer_spark.operators.dedup import (
            dedup_keep_canonical,
        )

        out = dedup_keep_canonical(docs).cache()
        # the three injected exact copies are gone, originals remain
        assert out.where(F.col("doc_id").isin([10000, 10001, 10002])).count() == 0
        assert out.where(F.col("doc_id").isin([0, 1, 2])).count() == 3


class TestWinnowing:
    def test_shift_robust_fingerprints(self, spark):
        """Winnowing (rolling k-gram min-hash) is position-independent:
        a shifted copy shares most fingerprints, unrelated text none."""
        from dystonse_gtfs_importer_spark.operators.dedup import (
            winnow_fingerprints, winnow_near_pairs,
        )

        base = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.createDataFrame([
            (1, base),
            (2, "PREFIX padding words here " + base),   # shifted copy
            (3, "completely different content about spark physical plans"),
        ], "doc_id long, text string")

        fps = {r.doc_id: r.n_fingerprints
               for r in winnow_fingerprints(docs).collect()}
        assert all(fps[d] > 0 for d in (1, 2, 3))

        pairs = {(r.doc_a, r.doc_b): r.n_shared
                 for r in winnow_near_pairs(docs, min_shared=3).collect()}
        assert (1, 2) in pairs
        # the shifted copy shares most of the shorter doc's sketch
        assert pairs[(1, 2)] >= fps[1] * 0.6
        assert (1, 3) not in pairs and (2, 3) not in pairs


class TestExtraDedupTiers:
    def test_winnow_and_embedding_tiers(self, spark):
        """clean_corpus optional tiers: shift-robust winnowing catches
        a boilerplate-wrapped copy; embedding cosine catches a
        semantic dup sharing no surface text. Min-id canonical wins."""
        from dystonse_gtfs_importer_spark.plans.corpus import clean_corpus

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the quiet green hills tonight")
        docs = spark.createDataFrame([
            (1, base),
            (2, "HEADER boilerplate wrapper text " + base),   # winnow dup
            (3, "an entirely different sentence about query planning"),
        ], "doc_id long, text string")

        def vec(one_at):
            v = [0.0] * 64
            v[one_at] = 1.0
            return v

        emb = spark.createDataFrame(
            [(1, vec(0)), (2, vec(1)), (3, vec(0))],   # 3 ≈ 1 semantically
            "vec_id long, embedding array<float>")

        out = clean_corpus(docs, min_quality=0.0, min_tokens=1,
                           near_dup_threshold=1.01,   # disable minhash tier
                           winnow_min_shared=3,
                           embeddings=emb, embedding_threshold=0.9)
        survivors = {r.doc_id for r in out.collect()}
        assert survivors == {1}

    def test_tiers_off_by_default(self, spark):
        from dystonse_gtfs_importer_spark.plans.corpus import clean_corpus

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta"),
             (2, "totally unrelated words forming another doc here")],
            "doc_id long, text string")
        out = clean_corpus(docs, min_quality=0.0, min_tokens=1)
        assert {r.doc_id for r in out.collect()} == {1, 2}


class TestCleanCorpus:
    def test_pipeline_and_report(self, spark, docs):
        from dystonse_gtfs_importer_spark.plans.corpus import (
            clean_corpus, corpus_report,
        )

        cleaned = clean_corpus(docs, min_quality=0.1, min_tokens=3,
                               near_dup_threshold=0.9).cache()
        rep = corpus_report(docs, cleaned)
        assert rep["surviving_docs"] < rep["input_docs"]
        assert rep["removed"] >= 3            # at least the exact dupes
        assert 0.0 <= rep["avg_quality"] <= 1.0
        assert rep["total_tokens"] > 0
        cols = set(cleaned.columns)
        assert {"lang_pred", "quality", "n_tokens"} <= cols
        # survivors all meet the gates
        assert cleaned.where(F.col("quality") < 0.1).count() == 0
        assert cleaned.where(F.col("n_tokens") < 3).count() == 0

    def test_lang_filter(self, docs):
        from dystonse_gtfs_importer_spark.plans.corpus import clean_corpus

        only = clean_corpus(docs, lang="en", min_quality=0.0, min_tokens=0)
        langs = {r.lang_pred for r in only.select("lang_pred").distinct().collect()}
        assert langs <= {"en"}


class TestDsirWeightOperator:
    def test_parity_with_sql_rendering(self, spark, sf_smoke):
        """The DataFrame form must agree bit-for-bit with the
        driver-verified SQL rendering (same corpus, same target)."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.plans.corpus import dsir_weight
        from dystonse_gtfs_importer_spark.sources.testdata import load_table

        full = load_table(spark, sf_smoke, "documents")
        full.createOrReplaceTempView("documents")
        try:
            sql_rows = sorted(
                (r.doc_id, r.dsir_weight_e4)
                for r in spark.sql(SAMP.q_dsir_weights(S.SPARK)).collect())
        finally:
            spark.catalog.dropTempView("documents")
        df_rows = sorted(
            (r.doc_id, r.dsir_weight_e4)
            for r in dsir_weight(full, F.col("lang") == "en")
            .select("doc_id", "dsir_weight_e4").collect())
        assert sql_rows == df_rows

    def test_ratio_table_broadcasts_in_plan(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.plans.corpus import dsir_weight
        from dystonse_gtfs_importer_spark.sources.testdata import load_table

        full = load_table(spark, sf_smoke, "documents")
        plan = dsir_weight(full, F.col("lang") == "en") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestPrepareTrainingSet:
    def test_end_to_end_invariants(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.plans.corpus import (
            prepare_training_set,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import load_table

        full = load_table(spark, sf_smoke, "documents")
        out = prepare_training_set(full, token_budget=500).cache()
        rows = out.collect()
        assert rows, "selection produced an empty training set"
        # annotation + selection columns all present
        for c in ("lang_pred", "quality", "n_tokens",
                  "dsir_weight_e4", "split", "kept"):
            assert c in out.columns, out.columns
        # eval splits are never budget-trimmed
        assert all(r.kept == 1 for r in rows if r.split != "train")
        # the train budget holds per source
        by_src: dict = {}
        for r in rows:
            if r.split == "train" and r.kept == 1:
                by_src[r.source] = by_src.get(r.source, 0) + r.n_tokens
        assert all(v <= 500 for v in by_src.values()), by_src
        # within a source, every kept train doc out-weighs (or ties at
        # the id tie-break) every dropped one — best-DSIR-first
        for src in by_src:
            kept_min = min((r.dsir_weight_e4 for r in rows
                            if r.split == "train" and r.kept == 1
                            and r.source == src), default=None)
            dropped_max = max((r.dsir_weight_e4 for r in rows
                               if r.split == "train" and r.kept == 0
                               and r.source == src), default=None)
            if kept_min is not None and dropped_max is not None:
                assert kept_min >= dropped_max - 0, (src, kept_min,
                                                     dropped_max)

    def test_no_budget_keeps_everything(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.plans.corpus import (
            prepare_training_set,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import load_table

        full = load_table(spark, sf_smoke, "documents")
        out = prepare_training_set(full)
        assert out.where(F.col("kept") != 1).count() == 0

    def test_selection_report(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.plans.corpus import (
            prepare_training_set,
            selection_report,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import load_table

        full = load_table(spark, sf_smoke, "documents")
        out = prepare_training_set(full, token_budget=500)
        rep = selection_report(out)
        assert set(rep) <= {"train", "valid", "test"} and "train" in rep
        for split, r in rep.items():
            assert r["docs_kept"] <= r["docs"]
            if split != "train":
                assert r["docs_kept"] == r["docs"]
            if r["dsir_weight_e4_range"] is not None:
                lo, hi = r["dsir_weight_e4_range"]
                assert lo <= hi


class TestSourceKlOperator:
    def test_parity_with_sql_rendering(self, spark, sf_smoke):
        """The single-tokenize DataFrame form must agree bit-for-bit
        with the SQL semantic spec on the same corpus."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.plans.corpus import source_kl
        from dystonse_gtfs_importer_spark.sources.testdata import load_table

        full = load_table(spark, sf_smoke, "documents")
        full.createOrReplaceTempView("documents")
        try:
            sql_rows = sorted(map(tuple, spark.sql(
                SAMP.q_source_kl_divergence(S.SPARK)).collect()))
        finally:
            spark.catalog.dropTempView("documents")
        df_rows = sorted(map(tuple, source_kl(full).collect()))
        assert sql_rows == df_rows
        # a KL of exactly 0 for every source would mean the statistic
        # is degenerate on this corpus — require real signal
        assert any(r[3] > 0 for r in df_rows)

    def test_single_tokenize_and_broadcast_totals(self, spark, sf_smoke):
        """The corpus must be tokenized once (the persisted count
        table feeds every totals branch) and the group/grand totals
        must broadcast — never a re-scan per CTE consumer."""
        from dystonse_gtfs_importer_spark.plans.corpus import source_kl
        from dystonse_gtfs_importer_spark.sources.testdata import load_table

        spark.catalog.clearCache()
        full = load_table(spark, sf_smoke, "documents")
        try:
            out = source_kl(full)
            plan = out._jdf.queryExecution().executedPlan().toString()
            # all four count-table consumers (group totals, token
            # totals, grand total, log-ratio cells) read the CACHE —
            # the tokenize runs once at first materialization.  (The
            # tokenize expression still appears once per scan because
            # each InMemoryTableScan reprints the cached plan.)
            assert plan.count("InMemoryTableScan") == 4, plan
            assert "BroadcastHashJoin" in plan, plan
            assert "CartesianProduct" not in plan, plan
            # the only nested-loop site is the 1-row grand-total
            assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
        finally:
            spark.catalog.clearCache()
