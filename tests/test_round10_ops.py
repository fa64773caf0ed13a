"""Semantic tests for the round-10 operators on PLANTED data.

lang_id_v2 (VERDICT r9 #3): the v1 confusion matrix honestly showed
the 4-marker heuristic collapsing to 'en' on text matching no marker;
the v2 stopword-table scorer must be measurably DIAGONAL on a planted
multilingual fixture, send no-evidence text to 'und' (not 'en'), and
send majority-non-ASCII text to 'other'.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dystonse_gtfs_importer_spark.functions import sampling_sql as SAMP
from dystonse_gtfs_importer_spark.functions import sql_shared as S


@pytest.fixture(autouse=True)
def _utc(spark):
    from dystonse_gtfs_importer_spark.session import configure_for_oracle

    configure_for_oracle(spark)


MULTILINGUAL = [
    # real function-word-bearing sentences, 3 per language
    (1, "the cat sat on the mat and looked out of the window", "en"),
    (2, "this is the house that jack built with his own hands", "en"),
    (3, "we have not seen the results from the latest survey", "en"),
    (10, "der hund lief durch die stadt und das wetter war nicht gut",
     "de"),
    (11, "ein mann mit einem hut stand auf dem platz vor der kirche",
     "de"),
    (12, "sie hat sich auch die berichte des jahres angesehen", "de"),
    (20, "le chat dort dans la maison et les enfants jouent sur la "
         "place", "fr"),
    (21, "une femme marche dans les rues avec son fils pour acheter "
         "du pain", "fr"),
    (22, "ce nest pas la question qui compte le plus pour nous", "fr"),
    (30, "el perro corre por la calle y los ninos juegan con la "
         "pelota", "es"),
    (31, "una mujer camina por el parque con sus hijos para ver las "
         "flores", "es"),
    (32, "pero este libro del autor se lee como una historia del "
         "siglo", "es"),
    # no stopword of ANY language: v1 collapses these to 'en'
    (40, "zorblax quuxifies plimbo vrattle snorfle grimpt", "und"),
    (41, "kpop stan xylophone quartz vibes zigzag", "und"),
    # majority-non-ASCII (wrong script for a whitespace tokenizer)
    (50, "这是一个中文文档的例子 没有空格分词 完全是汉字", "zh"),
]


def _view(spark, rows, name="documents_l10"):
    df = spark.createDataFrame(
        [(i, t, lang, "s") for i, t, lang in rows],
        "doc_id long, text string, lang string, source string")
    df.createOrReplaceTempView(name)
    return name


class TestPqTopkPacked:
    """ann_pq_topk_packed: the production array-form ADC must return
    row-for-row what the exploded derivation returns, and its scoring
    join must be a broadcast nested loop with NO per-subspace row
    explosion (the whole point of packing)."""

    def test_packed_equals_exploded(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.functions import (
            ann_sql as ANN,
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        packed = spark.sql(ANN.q_ann_pq_topk_packed(S.SPARK))
        exploded = spark.sql(ANN.q_ann_pq_topk(S.SPARK))
        key = ["query_id", "cand_id", "adist_e6", "rk"]
        assert (sorted(map(tuple, packed.select(*key).collect()))
                == sorted(map(tuple, exploded.select(*key).collect())))

    def test_packed_plan_no_subspace_explosion(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.functions import (
            ann_sql as ANN,
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        df = spark.sql(ANN.q_ann_pq_topk_packed(S.SPARK))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # LUT side broadcasts into a nested-loop join...
        assert "BroadcastNestedLoopJoin" in plan, plan
        # ...and nothing aggregates per (query, cand, sub): the ADC
        # sum is the in-expression fold, so between the scoring join
        # and the top-k window there is no HashAggregate
        join_at = plan.index("BroadcastNestedLoopJoin")
        assert "HashAggregate" not in plan[:join_at], plan[:join_at]


class TestMapOnlyAnnotateEquivalence:
    """annotate_batch(exact_dedup=False) + combined_drop_set must
    publish the SAME survivor set as the shuffled min_by form: exact
    duplicates share every band, so the sweep's fingerprint-bucket
    chains subsume min-id-wins.  (The sink keeps the shuffled form —
    measured faster because the exchange fans the single file
    partition across cores — but the map-only semantics stay pinned.)
    """

    def test_survivors_equal(self, spark):
        import pyspark.sql.functions as F2

        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            annotate_batch,
            band_cols,
            combined_drop_set,
        )

        rows = [
            (1, "alpha beta gamma delta", "en", "s"),
            (2, "alpha  BETA gamma delta ", "en", "s"),   # exact dup of 1
            (3, "alpha beta gamma delta", "en", "s"),     # exact dup of 1
            (4, "totally different words entirely here", "en", "s"),
            (5, "alpha beta gamma epsilon", "en", "s"),   # near dup of 1
            (6, "", "en", "s"),                           # token-less
            (7, "   ", "en", "s"),                        # dup of 6
        ]
        batch = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        survivors = {}
        for flag in (True, False):
            based = annotate_batch(batch, near_dup=True,
                                   exact_dedup=flag)
            dropped = combined_drop_set(based, None)
            final = based.join(F2.broadcast(dropped), ["doc_id"],
                               "left_anti")
            survivors[flag] = sorted(
                r.doc_id for r in final.select("doc_id").collect())
        assert survivors[True] == survivors[False]
        # the planted semantics fired: dups of 1 and of 6 dropped
        assert survivors[True] == [1, 4, 5, 6] or \
            survivors[True] == [1, 4, 6]  # 5 drops iff it shares a band
        # and the published set is band-disjoint either way
        based = annotate_batch(batch, near_dup=True, exact_dedup=False)
        dropped = combined_drop_set(based, None)
        final = based.join(F2.broadcast(dropped), ["doc_id"],
                           "left_anti")
        bands = []
        for r in final.select(*band_cols()).collect():
            bands.extend((i, v) for i, v in enumerate(r)
                         if v is not None)
        assert len(bands) == len(set(bands))


class TestEmbeddingDecontamination:
    """Planted semantic leakage: corpus vec 1 is an exact copy of
    eval vec 100 (cosine 1.0 — flagged), corpus vec 2 is a scaled
    copy of eval vec 200 (cosine 1.0 — flagged; cosine is
    scale-invariant), corpus vec 3 is orthogonal-ish noise (not
    flagged).  Ids follow the % 100 eval convention."""

    def test_planted_leakage(self, spark):
        from dystonse_gtfs_importer_spark.functions import (
            ann_sql as ANN,
            sql_shared as S,
        )

        dim = ANN.DIM

        def v(seed, scale=1.0):
            return [float(((seed * 31 + j * 7) % 13) - 6) * scale
                    for j in range(dim)]

        rows = [
            (100, v(1), "e"), (200, v(2), "e"),   # eval (ids % 100 = 0)
            (1, v(1), "c"),                        # exact copy of 100
            (2, v(2), 2.5), (3, v(9), "c"),
        ]
        rows[3] = (2, v(2, 2.5), "c")              # scaled copy of 200
        df = spark.createDataFrame(
            [(i, e, lab) for i, e, lab in rows],
            "vec_id long, embedding array<float>, label string")
        df.createOrReplaceTempView("embeddings")
        try:
            got = {r.vec_id: r for r in spark.sql(
                ANN.q_embedding_decontamination(S.SPARK)).collect()}
        finally:
            spark.catalog.dropTempView("embeddings")
        assert set(got) == {1, 2}
        assert got[1].first_eval_id == 100 and got[1].max_cosine == 1.0
        assert got[2].first_eval_id == 200 and got[2].max_cosine == 1.0


class TestBpeMergesIter2:
    """Hand-computable BPE induction: corpus 3x'aaab' + 1x'ab'.
    Round 1 pairs: (a,a) 2 per 'aaab' x3 = 6; (a,b) 3+1 = 4 -> merge
    (a,a).  Greedy-left application: 'a a a b' -> 'aa a b' (the third
    'a' must NOT merge — left-to-right non-overlap).  Round 2 pairs:
    (aa,a) x3 = 3; (a,b) x3 + x1 = 4 -> merge (a,b)."""

    def test_planted_merges(self, spark):
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(1, "aaab aaab aaab ab", "en", "s")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        df.createOrReplaceTempView("documents_bpe")
        try:
            got = sorted(map(tuple, spark.sql(
                SAMP.q_bpe_merges_iter2(
                    S.SPARK, doc_table="documents_bpe")).collect()))
        finally:
            spark.catalog.dropTempView("documents_bpe")
        assert got == [(1, "a", "a", "aa", 6), (2, "a", "b", "ab", 4)]

    def test_no_cross_symbol_false_match(self, spark):
        """After merge 1 creates multi-char symbols, the round-2
        needle must not match INSIDE a symbol: corpus where (l, lo)
        would false-match 'al  lo' if boundaries leaked.  'hello
        hello hal': round 1 top pair is (l,l)... construct directly:
        words 'allo' x3 and 'llo' x3: round 1 pairs (l,l) 3+3=6,
        (l,o) 6, (a,l) 3 -> tie (l,l) vs (l,o) both 6 breaks to
        (l,l) (a ASC then b ASC: 'l','l' < 'l','o').  Apply: 'allo'
        -> [a, ll, o]; 'llo' -> [ll, o].  Round 2: (a,ll) 3,
        (ll,o) 6 -> merge (ll, o)."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(1, "allo allo allo llo llo llo", "en", "s")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        df.createOrReplaceTempView("documents_bpe2")
        try:
            got = sorted(map(tuple, spark.sql(
                SAMP.q_bpe_merges_iter2(
                    S.SPARK, doc_table="documents_bpe2")).collect()))
        finally:
            spark.catalog.dropTempView("documents_bpe2")
        assert got == [(1, "l", "l", "ll", 6), (2, "ll", "o", "llo", 6)]


def _ref_bpe_merges(words: list[str]):
    """Independent pure-Python BPE reference (greedy-left apply,
    count-desc then pair-asc tiebreak) — NOT derived from the SQL."""
    from collections import Counter

    vocab = Counter(words)

    def pairs_of(symlists):
        c: Counter = Counter()
        for syms, f in symlists:
            for a, b in zip(syms, syms[1:]):
                c[(a, b)] += f
        return c

    def apply(syms, pair):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    syms = [(list(w), f) for w, f in vocab.items()]
    res = []
    for it in (1, 2):
        c = pairs_of(syms)
        if not c:
            break
        (a, b), cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        res.append((it, a, b, a + b, cnt))
        syms = [(apply(s, (a, b)), f) for s, f in syms]
    return res


def _ref_lang_id_v2(text: str) -> str:
    """Independent pure-Python reimplementation of the v2 scorer."""
    import re

    from dystonse_gtfs_importer_spark.functions.sampling_sql import (
        LANG_STOPWORDS,
    )

    n_c = len(text)
    n_non_ascii = sum(1 for ch in text if not (" " <= ch <= "~"))
    if n_non_ascii * 2 > n_c:
        return "other"
    toks = [t for t in re.split(" +", text.lower()) if t != ""]
    best = None
    for lang, prio, words in LANG_STOPWORDS:
        hits = sum(1 for t in toks if t in words)
        distinct = len({t for t in toks if t in words})
        if hits:
            code = hits * 1024 + distinct * 16 + (7 - prio)
            if best is None or code > best[0]:
                best = (code, lang)
    return best[1] if best else "und"


class TestRound10PythonReferences:
    """Randomized cross-checks of the two new scoring/iterative ops
    against INDEPENDENT pure-Python references (the derivation-
    independence doctrine for iterative-family members): seeded
    deterministic corpora, no shared code with the SQL templates."""

    def test_bpe_merges_vs_python_reference(self, spark):
        import random

        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rng = random.Random(1041)
        for trial in range(4):
            words = ["".join(rng.choice("abcd")
                             for _ in range(rng.randint(1, 6)))
                     for _ in range(rng.randint(20, 60))]
            expected = _ref_bpe_merges(words)
            df = spark.createDataFrame(
                [(1, " ".join(words), "en", "s")],
                "doc_id long, text string, lang string, source string")
            view = f"documents_bref{trial}"
            df.createOrReplaceTempView(view)
            try:
                got = sorted(map(tuple, spark.sql(
                    SAMP.q_bpe_merges_iter2(
                        S.SPARK, doc_table=view)).collect()))
            finally:
                spark.catalog.dropTempView(view)
            assert got == expected, (trial, words, got, expected)

    def test_lang_id_v2_vs_python_reference(self, spark):
        import random

        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        pool = (["the", "and", "der", "und", "le", "les", "el", "los",
                 "que", "des", "zz", "qqq", "brr"]
                + ["w%d" % i for i in range(8)])
        rng = random.Random(77)
        rows = []
        for i in range(40):
            text = " ".join(rng.choice(pool)
                            for _ in range(rng.randint(0, 12)))
            rows.append((i, text))
        rows.append((100, "这是 一个 中文 文档"))
        expected = {i: _ref_lang_id_v2(t) for i, t in rows}
        df = spark.createDataFrame(
            [(i, t, "x", "s") for i, t in rows],
            "doc_id long, text string, lang string, source string")
        df.createOrReplaceTempView("documents_lref")
        try:
            got = {r.doc_id: r.lang_pred for r in spark.sql(
                SAMP.q_lang_id_v2(
                    S.SPARK, doc_table="documents_lref")).collect()}
        finally:
            spark.catalog.dropTempView("documents_lref")
        assert got == expected


class TestQualityWeightedMixture:
    """The round-10 composition: the calibration global-median gate x
    the capped water-filling solver.  Planted corpus: a 'clean'
    source (long, alphabetic, stopword-rich docs) and a 'noisy' one
    (short digit-noise docs scoring below the global median)."""

    def _docs(self, spark):
        # 12 clean vs 8 noisy: the global p50 (10th smallest of 20)
        # lands INSIDE the clean scores, so every noisy doc sits
        # strictly below the cutpoint
        clean = [(i, "clean",
                  ("the quick brown fox and the lazy dog walked to "
                   "a river in the morning of it all ") * 3, "en")
                 for i in range(12)]
        noisy = [(100 + i, "noisy", f"%%%% 12{i}34 @@ !!", "en")
                 for i in range(8)]
        return spark.createDataFrame(
            clean + noisy,
            "doc_id long, source string, text string, lang string")

    def test_composed_solver_downweights_noisy(self, spark):
        import uuid

        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        docs = self._docs(spark)
        view = f"__qwm_{uuid.uuid4().hex[:8]}"
        docs.createOrReplaceTempView(view)
        try:
            comp = {r.source: r.asDict() for r in spark.sql(
                SAMP.q_quality_weighted_mixture(
                    S.SPARK, budget=400, doc_table=view)).collect()}
            plain = {r.source: r.asDict() for r in spark.sql(
                SAMP.q_mixture_weights(
                    S.SPARK, budget=400, doc_table=view)).collect()}
        finally:
            spark.catalog.dropTempView(view)
        # every noisy doc scores below the global median, so the
        # noisy source has ZERO eligible mass: no row in the
        # composed solve at all, full budget to clean
        assert "noisy" not in comp and "clean" in comp
        assert "noisy" in plain       # the plain solve still feeds it
        assert comp["clean"]["alloc_tok"] >= plain["clean"]["alloc_tok"]

    def test_apply_quality_weighted_draws_only_eligible(self, spark):
        from dystonse_gtfs_importer_spark.plans.corpus import (
            apply_mixture,
            prepare_shards,
        )

        docs = self._docs(spark)
        out = apply_mixture(docs, budget=400, epoch_cap_e6=1_000_000,
                            id_stride=10**6, quality_weighted=True)
        rows = out.collect()
        assert rows, "composition produced an empty resample"
        assert {r.source for r in rows} == {"clean"}
        # ...and the composed pipeline runs through the sharder e2e
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            acct = prepare_shards(out, td, shard_tokens=200,
                                  seed="qw1", batch_id=1)
        assert acct["total_docs"] == len(rows) and acct["committed"]


class TestQualityWeightedMixtureInvariants:
    """Solver invariants on randomized seeded corpora: every alloc
    respects its cap, the total never exceeds the budget, a capped
    source gets exactly its cap, and eligible mass never exceeds the
    source's total tokens (the calibration gate only shrinks)."""

    def test_invariants_random_corpora(self, spark):
        import random
        import uuid

        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rng = random.Random(2041)
        words = ["the", "zz9", "und", "der", "chart", "%%%", "17",
                 "walk", "river", "q"]
        for trial in range(3):
            rows = []
            for i in range(rng.randint(25, 60)):
                src = f"s{i % rng.randint(2, 5)}"
                text = " ".join(rng.choice(words)
                                for _ in range(rng.randint(0, 30)))
                rows.append((i, src, text, "en"))
            docs = spark.createDataFrame(
                rows, "doc_id long, source string, text string, "
                      "lang string")
            view = f"__qwmi_{uuid.uuid4().hex[:8]}"
            docs.createOrReplaceTempView(view)
            budget = rng.randint(50, 800)
            cap = rng.choice([400_000, 1_000_000, 1_400_000])
            try:
                out = spark.sql(SAMP.q_quality_weighted_mixture(
                    S.SPARK, budget=budget, epoch_cap_e6=cap,
                    doc_table=view)).collect()
                toks = {r.source: r.n for r in spark.sql(
                    f"SELECT source, CAST(SUM(size(filter(split("
                    f"lower(text), ' +'), t -> t <> ''))) AS BIGINT)"
                    f" AS n FROM {view} GROUP BY source").collect()}
            finally:
                spark.catalog.dropTempView(view)
            assert sum(r.alloc_tok for r in out) <= budget, trial
            for r in out:
                cap_tok = cap * r.n_tok // 1_000_000
                assert r.alloc_tok <= cap_tok, (trial, r)
                if r.capped == 1:
                    assert r.alloc_tok == cap_tok, (trial, r)
                # eligible mass never exceeds the source total
                assert r.n_tok <= toks[r.source], (trial, r)


class TestJvmSweepEqualsPandasSweep:
    """combined_drop_set_jvm (the kept-but-unused all-JVM twin; the
    SINK runs the pandas combined_drop_set, measured faster) must
    produce the SAME drop set on chain-heavy batches with and
    without a store: chains (A~B, B~C, A!~C), exact-dup families,
    store pre-drops, and token-less docs."""

    def _batch(self, spark):
        rows = [
            (1, "quick brown fox jumps over the0 lazy dog near "
                "river bank bank0", "en", "s"),
            (2, "quick brown wolf0 jumps over the0 lazy cat0 near "
                "river bank bank0", "en", "s"),        # ~1
            (3, "slow0 brown wolf0 jumps under0 the0 lazy cat0 near "
                "river shore0 bank0", "en", "s"),      # ~2, !~1
            (4, "alpha beta gamma delta epsilon zeta", "en", "s"),
            (5, "alpha beta gamma delta epsilon ETA", "en", "s"),  # ~4
            (6, "", "en", "s"),                         # token-less
            (7, "completely different words about spark catalyst "
                "tungsten engine", "en", "s"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")

    def test_equal_with_and_without_store(self, spark):
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            annotate_batch,
            band_cols,
            combined_drop_set,
            combined_drop_set_jvm,
        )

        batch = self._batch(spark)
        based = annotate_batch(batch, near_dup=True).cache()
        try:
            stores = [None]
            # a store containing doc 7's identity (pre-drops it and,
            # transitively, nothing else) and doc 1's bands (chain
            # head pre-dropped: 2 then collides with the store too,
            # 3 chains on 2)
            for keep_id in (7, 1):
                stores.append(
                    based.where(F.col("doc_id") == keep_id)
                    .select("fingerprint", *band_cols()))
            for store in stores:
                py = sorted(r.doc_id for r in
                            combined_drop_set(based, store).collect())
                jvm = sorted(r.doc_id for r in
                             combined_drop_set_jvm(based,
                                                   store).collect())
                assert py == jvm, (store is None, py, jvm)
        finally:
            based.unpersist()

    def test_equal_on_random_batches(self, spark):
        import random

        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            annotate_batch,
            combined_drop_set,
            combined_drop_set_jvm,
        )

        rng = random.Random(3141)
        vocab = [f"t{i}" for i in range(30)]
        rows = []
        for i in range(60):
            base = rng.sample(vocab, rng.randint(3, 8))
            rows.append((i, " ".join(base), "en", "s"))
        batch = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        based = annotate_batch(batch, near_dup=True).cache()
        try:
            py = sorted(r.doc_id for r in
                        combined_drop_set(based, None).collect())
            jvm = sorted(r.doc_id for r in
                         combined_drop_set_jvm(based, None).collect())
            assert py == jvm and py, (py, jvm)
        finally:
            based.unpersist()


class TestThresholdSweepGuard:
    """The exact PPJoin sweep rung must refuse a too-large corpus and
    auto-downgrade to the banded rung (VERDICT r9 #5) — the grids
    differ (exact 7000..9000 by 500; banded 5000..8750 by 1250), so
    which rung ran is visible in the t_e4 column."""

    def _docs(self, spark, n=30):
        return spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon tok{i} tok{i + 1} "
                 f"zeta eta theta", "en", "s", 60) for i in range(n)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long")

    def test_exact_honored_under_limit(self, spark):
        from dystonse_gtfs_importer_spark.operators.dedup import (
            dedup_threshold_sweep,
        )

        docs = self._docs(spark)
        out = dedup_threshold_sweep(docs, exact=True,
                                    max_exact_docs=1000)
        assert ({r.t_e4 for r in out.select("t_e4").collect()}
                == {7000, 7500, 8000, 8500, 9000})

    def test_downgrades_over_limit(self, spark):
        from dystonse_gtfs_importer_spark.operators.dedup import (
            dedup_threshold_sweep,
        )

        docs = self._docs(spark)
        out = dedup_threshold_sweep(docs, exact=True, max_exact_docs=10)
        assert ({r.t_e4 for r in out.select("t_e4").collect()}
                == {5000, 6250, 7500, 8750})

    def test_default_is_banded(self, spark):
        from dystonse_gtfs_importer_spark.operators.dedup import (
            dedup_threshold_sweep,
        )

        out = dedup_threshold_sweep(self._docs(spark))
        assert ({r.t_e4 for r in out.select("t_e4").collect()}
                == {5000, 6250, 7500, 8750})


class TestLangIdV2:
    def test_diagonal_on_planted_multilingual(self, spark):
        view = _view(spark, MULTILINGUAL)
        try:
            got = {r.doc_id: r.lang_pred for r in spark.sql(
                SAMP.q_lang_id_v2(S.SPARK, doc_table=view)).collect()}
        finally:
            spark.catalog.dropTempView(view)
        expected = {1: "en", 2: "en", 3: "en",
                    10: "de", 11: "de", 12: "de",
                    20: "fr", 21: "fr", 22: "fr",
                    30: "es", 31: "es", 32: "es",
                    40: "und", 41: "und",
                    50: "other"}
        assert got == expected

    def test_confusion_v2_diagonal_where_v1_collapses(self, spark):
        """Per-language recall 1.0 on en/de/fr/es, and — the actual
        prescription — NOTHING non-English predicted 'en'.  The v1
        matrix on the same fixture shows the collapse."""
        view = _view(spark, MULTILINGUAL)
        try:
            v2 = spark.sql(SAMP.q_lang_id_confusion_v2(
                S.SPARK, doc_table=view)).collect()
            v1 = spark.sql(SAMP.q_lang_id_confusion(
                S.SPARK, doc_table=view)).collect()
        finally:
            spark.catalog.dropTempView(view)
        recall = {r.actual: r.cell_share for r in v2
                  if r.actual == r.predicted}
        for lang in ("en", "de", "fr", "es"):
            assert recall.get(lang) == 1.0, (lang, v2)
        # nothing non-English lands on 'en'
        assert not [r for r in v2
                    if r.predicted == "en" and r.actual != "en"]
        # the planted 'und' rows collapse to 'en' under v1 (the
        # measured defect that motivated v2) but not under v2
        v1_und = {r.predicted for r in v1 if r.actual == "und"}
        v2_und = {r.predicted for r in v2 if r.actual == "und"}
        assert v1_und == {"en"}
        assert v2_und == {"und"}

    def test_tiebreak_and_ambiguous_words(self, spark):
        """'que' is in both fr and es lists; a doc of ONLY shared
        words ties on hits and distinct and must break to the
        earlier LANG_MARKERS language (fr, prio 2 < es prio 3) —
        the pinned v1 convention."""
        rows = [(1, "que que que", "fr")]
        view = _view(spark, rows)
        try:
            got = spark.sql(SAMP.q_lang_id_v2(
                S.SPARK, doc_table=view)).collect()
        finally:
            spark.catalog.dropTempView(view)
        assert got[0].lang_pred == "fr"

    def test_empty_and_null_text(self, spark):
        rows = [(1, "", "en"), (2, "   ", "en")]
        view = _view(spark, rows)
        try:
            got = {r.doc_id: r.lang_pred for r in spark.sql(
                SAMP.q_lang_id_v2(S.SPARK, doc_table=view)).collect()}
        finally:
            spark.catalog.dropTempView(view)
        assert got == {1: "und", 2: "und"}
