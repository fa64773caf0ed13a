"""Distributed prefix-doubling suffix ranking (operators/suffix.py)
against direct Python suffix sorts, plus the scalable dense-rank
helper's invariants."""

from __future__ import annotations

import pytest


def _ref_ranks(texts: dict):
    toks = {d: [t for t in s.lower().split(" ") if t] for d, s in texts.items()}
    sufs = {(d, i): tuple(t[i:]) for d, t in toks.items()
            for i in range(len(t))}
    order = sorted(set(sufs.values()))
    rank = {s: i + 1 for i, s in enumerate(order)}
    return {k: rank[v] for k, v in sufs.items()}


class TestDenseRankScalable:
    def test_matches_window_dense_rank(self, spark):
        from pyspark.sql import Window
        import pyspark.sql.functions as F

        from dystonse_gtfs_importer_spark.operators.suffix import (
            dense_rank_scalable,
        )

        df = spark.createDataFrame(
            [(x % 7, (x * 13) % 5) for x in range(200)], "a int, b int")
        got = dense_rank_scalable(df, ["a", "b"], out="dr")
        w = Window.orderBy("a", "b")
        ref = df.withColumn("dr", F.dense_rank().over(w))
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, ref.collect()))

    def test_independent_of_partition_count(self, spark):
        from dystonse_gtfs_importer_spark.operators.suffix import (
            dense_rank_scalable,
        )

        df = spark.createDataFrame(
            [(x * 37 % 101,) for x in range(300)], "a int")
        a = dense_rank_scalable(df, ["a"], num_partitions=3)
        b = dense_rank_scalable(df.repartition(23), ["a"],
                                num_partitions=11)
        assert sorted(map(tuple, a.collect())) \
            == sorted(map(tuple, b.collect()))

    def test_no_single_partition_window(self, spark):
        """The whole point: no empty-partition-key Window in the plan
        (Spark logs/serializes those through ONE task)."""
        from dystonse_gtfs_importer_spark.operators.suffix import (
            dense_rank_scalable,
        )

        df = spark.createDataFrame([(x,) for x in range(50)], "a int")
        plan = dense_rank_scalable(df, ["a"])._jdf.queryExecution() \
            .executedPlan().toString()
        # every Window operator must carry a partition spec
        for line in plan.splitlines():
            if "Window [" in line:
                assert "windowspecdefinition(__pid" in line.replace(" ", "") \
                    or "__pid" in line, line


class TestSuffixRanks:
    def test_matches_python_reference(self, spark):
        from dystonse_gtfs_importer_spark.operators.suffix import (
            suffix_ranks,
        )

        texts = {1: "a b a b c", 2: "b a b c", 3: "c a", 4: "a"}
        docs = spark.createDataFrame(list(texts.items()),
                                     "doc_id long, text string")
        got = {(r.doc_id, r.pos): r.suffix_rank
               for r in suffix_ranks(docs).collect()}
        assert got == _ref_ranks(texts)

    def test_identical_suffixes_share_rank(self, spark):
        """Equal suffixes across documents — the repeated spans exact-
        substring dedup hunts — must share one dense rank."""
        from dystonse_gtfs_importer_spark.operators.suffix import (
            suffix_ranks,
        )

        texts = {1: "x y z", 2: "w x y z", 3: "x y z"}
        docs = spark.createDataFrame(list(texts.items()),
                                     "doc_id long, text string")
        rows = suffix_ranks(docs).collect()
        by_key = {(r.doc_id, r.pos): r.suffix_rank for r in rows}
        # suffix "x y z" occurs at (1,0), (2,1), (3,0)
        assert by_key[(1, 0)] == by_key[(2, 1)] == by_key[(3, 0)]
        # and "y z" at (1,1), (2,2), (3,1)
        assert by_key[(1, 1)] == by_key[(2, 2)] == by_key[(3, 1)]
        assert got_equal_ref(rows, texts)

    def test_randomized_against_reference(self, spark):
        import random

        from dystonse_gtfs_importer_spark.operators.suffix import (
            suffix_ranks,
        )

        rng = random.Random(5)
        vocab = ["a", "b", "c", "d"]
        texts = {d: " ".join(rng.choice(vocab)
                             for _ in range(rng.randrange(1, 25)))
                 for d in range(12)}
        docs = spark.createDataFrame(list(texts.items()),
                                     "doc_id long, text string")
        got = {(r.doc_id, r.pos): r.suffix_rank
               for r in suffix_ranks(docs).collect()}
        assert got == _ref_ranks(texts)


def got_equal_ref(rows, texts):
    got = {(r.doc_id, r.pos): r.suffix_rank for r in rows}
    return got == _ref_ranks(texts)


class TestEquidepthScaleForm:
    def test_closed_form_matches_ntile(self, spark):
        """The remainder rule (first n%k buckets get ceil(n/k)) must
        reproduce Spark's own NTILE for awkward n."""
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from dystonse_gtfs_importer_spark.operators.suffix import (
            dense_rank_scalable,
        )

        for n in (16, 17, 31, 100, 97):
            df = spark.createDataFrame(
                [((x * 37) % n, x) for x in range(n)], "v int, id int")
            k = 16
            ranked = dense_rank_scalable(df, ["v", "id"], out="rn")
            big, n_big = -(-n // k), n % k
            cut = big * n_big
            small = n // k
            bucket = F.when(
                F.col("rn") <= cut, (F.col("rn") - 1) / big
            ).otherwise(n_big + (F.col("rn") - cut - 1)
                        / F.lit(max(small, 1)))
            got = ranked.withColumn(
                "b", F.floor(bucket).cast("int") + 1)
            ref = df.withColumn(
                "b", F.ntile(k).over(Window.orderBy("v", "id")))
            g = {(r.v, r.id): r.b for r in got.collect()}
            r_ = {(r.v, r.id): r.b for r in ref.collect()}
            assert g == r_, n


class TestSuffixRanksScaleRegression:
    def test_sf01_matches_python_suffix_sort(self, spark):
        """Regression for the unsound 'no new classes this round'
        termination shortcut: on the sf0.1 corpus refinement pauses
        for a round and resumes, so the shortcut under-split 527
        classes (caught by tools/bench_suffix.py's rank-count probe
        against DuckDB).  Full-corpus parity with a direct Python
        suffix sort pins the provable termination rule."""
        from dystonse_gtfs_importer_spark.operators.suffix import (
            suffix_ranks,
        )

        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        texts = {r.doc_id: r.text for r in
                 docs.select("doc_id", "text").collect()}
        got = {(r.doc_id, r.pos): r.suffix_rank
               for r in suffix_ranks(docs).collect()}
        assert got == _ref_ranks(texts)


class TestSpanProfileInternals:
    """Round-12 optimization pins: the O(L) first-mismatch LCP
    expression and the class-grain representative-slice profile must
    reproduce the brute-force forms exactly (the rewrites changed the
    Spark plan shape, not the result — these tests fail if a future
    edit breaks that)."""

    def test_lcp_expression_matches_bruteforce(self, spark):
        """The transform+array_position LCP equals a Python token-wise
        LCP on randomized pairs, including the equal-arrays and
        NULL-neighbor edges."""
        import random

        import pyspark.sql.functions as F

        rng = random.Random(0xC0FFEE)
        vocab = ["a", "b", "ab", "ba", "aa"]
        rows = []
        for i in range(300):
            a = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
            if rng.random() < 0.3:          # force long shared prefixes
                b = list(a[:rng.randint(1, len(a))]) \
                    + [rng.choice(vocab) for _ in range(rng.randint(0, 4))]
            else:
                b = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
            if rng.random() < 0.1:
                b = list(a)                 # identical arrays
            rows.append((i, a, None if rng.random() < 0.1 else b))

        def ref_lcp(a, b):
            if b is None:
                return None
            n = 0
            for x, y in zip(a, b):
                if x != y:
                    break
                n += 1
            return n

        df = spark.createDataFrame(
            rows, "i int, a array<string>, b array<string>")
        # the PRODUCTION expression (ADVICE r12 #1: no stale copy)
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _lcp_sql,
        )

        lcp = _lcp_sql("a", "b")
        got = {r.i: r.l for r in
               df.select("i", F.expr(lcp).alias("l")).collect()}
        want = {i: ref_lcp(a, b) for i, a, b in rows}
        assert got == want

    def test_class_grain_profile_matches_position_grain(self, spark):
        """The class-grain representative-slice profile CTEs emit the
        same rows as the retired position-grain form on a corpus with
        heavy cross- and within-document repeats."""
        from dystonse_gtfs_importer_spark.operators.suffix import (
            suffix_ranks,
        )
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _suffix_profile_spark_ctes,
        )

        texts = [
            (0, "x y z p q r s t u v w k"),
            (1, "a b c d e f g h x y z p q r s t"),
            (2, "a b c d e f g h m m m m a b c d e f g h"),
            (3, "m m m m m m m m m m"),
            (4, "q r s t u v w k a b c d e f g h"),
        ]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        docs.createOrReplaceTempView("documents")
        suffix_ranks(docs).createOrReplaceTempView("sr")

        new_sql = f"""WITH {_suffix_profile_spark_ctes(min_len=4)}
            SELECT doc_id, pos, rep_len FROM prof"""
        old_sql = """WITH
            ta AS (SELECT doc_id,
                          filter(split(lower(text), ' +'), t -> t <> '') AS ta
                   FROM documents),
            sfx AS (SELECT sr.doc_id, sr.pos, sr.suffix_rank AS r,
                           slice(ta.ta, sr.pos + 1, size(ta.ta) - sr.pos) AS s
                    FROM sr JOIN ta ON ta.doc_id = sr.doc_id),
            cls AS (SELECT r, COUNT(*) AS class_n FROM sfx GROUP BY r),
            reps AS (SELECT r, MIN(s) AS s FROM sfx GROUP BY r),
            adj AS (SELECT a.r, GREATEST(
                        COALESCE(size(filter(sequence(1,
                            least(size(a.s), size(p.s))),
                            i -> slice(a.s, 1, i) = slice(p.s, 1, i))), 0),
                        COALESCE(size(filter(sequence(1,
                            least(size(a.s), size(n.s))),
                            i -> slice(a.s, 1, i) = slice(n.s, 1, i))), 0))
                        AS adj_lcp
                    FROM reps a
                    LEFT JOIN reps p ON p.r = a.r - 1
                    LEFT JOIN reps n ON n.r = a.r + 1),
            prof AS (SELECT doc_id, pos, rep_len FROM (
                SELECT sfx.doc_id, sfx.pos,
                       CAST(GREATEST(adj.adj_lcp,
                            CASE WHEN cls.class_n >= 2 THEN size(sfx.s)
                                 ELSE 0 END) AS INT) AS rep_len
                FROM sfx JOIN adj ON adj.r = sfx.r
                JOIN cls ON cls.r = sfx.r) WHERE rep_len >= 4)
            SELECT doc_id, pos, rep_len FROM prof"""
        got = sorted(map(tuple, spark.sql(new_sql).collect()))
        ref = sorted(map(tuple, spark.sql(old_sql).collect()))
        assert got == ref and len(got) > 0
        spark.catalog.dropTempView("documents")
        spark.catalog.dropTempView("sr")
