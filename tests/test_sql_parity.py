"""Cross-engine parity: every expression in functions.sql_shared must
produce identical values in Spark and DuckDB over an adversarial grid.
This is what makes the DuckDB oracle a valid referee for the engine."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from dystonse_gtfs_importer_spark.functions import sql_shared as S


def eval_both(spark, pdf: pd.DataFrame, spark_expr: str, duck_expr: str):
    from dystonse_gtfs_importer_spark.session import configure_for_oracle

    configure_for_oracle(spark)
    sdf = spark.createDataFrame(pdf)
    got_spark = [r[0] for r in sdf.selectExpr(f"{spark_expr} AS v").collect()]
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [r[0] for r in con.execute(f"SELECT {duck_expr} AS v FROM t").fetchall()]
    return got_spark, got_duck


@pytest.fixture(scope="module")
def ts_grid() -> pd.DataFrame:
    # one timestamp for every (weekday, hour): 2024-01-01 is a Monday
    rows = [
        dt.datetime(2024, 1, 1 + d, h, 30, 0)
        for d in range(7)
        for h in range(24)
    ]
    return pd.DataFrame({"ts": pd.Series(rows, dtype="datetime64[us]")})


class TestTimeSlot:
    def test_all_weekday_hour_combos(self, spark, ts_grid):
        a, b = eval_both(
            spark, ts_grid,
            S.time_slot_id("ts", S.SPARK),
            S.time_slot_id("ts", S.DUCKDB),
        )
        assert a == b
        # spot-check the reference's semantics directly
        lookup = dict(zip(ts_grid["ts"], a))
        assert lookup[dt.datetime(2024, 1, 1, 5, 30)] == 1    # Mon 05:30
        assert lookup[dt.datetime(2024, 1, 1, 2, 30)] == 10   # Mon night
        assert lookup[dt.datetime(2024, 1, 5, 2, 30)] == 11   # Fri night
        assert lookup[dt.datetime(2024, 1, 6, 12, 30)] == 8   # Sat day
        assert lookup[dt.datetime(2024, 1, 7, 21, 30)] == 10  # Sun 21:30
        assert lookup[dt.datetime(2024, 1, 5, 21, 30)] == 11  # Fri 21:30
        # every ts classified 1-11 (DEFAULT unreachable)
        assert set(a) <= set(range(1, 12))

    def test_all_eleven_slots_hit(self, spark, ts_grid):
        a, _ = eval_both(spark, ts_grid,
                         S.time_slot_id("ts", S.SPARK),
                         S.time_slot_id("ts", S.DUCKDB))
        assert set(a) == set(range(1, 12))


class TestRoundTo12:
    def test_trunc_toward_zero(self, spark):
        pdf = pd.DataFrame({"d": [-25, -24, -13, -12, -1, 0, 1, 11, 12, 13, 25, 3000, -3000, 7]})
        a, b = eval_both(spark, pdf,
                         S.round_to_12s("d", S.SPARK),
                         S.round_to_12s("d", S.DUCKDB))
        assert a == b
        expect = [int(x / 12) * 12 for x in pdf["d"]]  # python int() truncs
        assert a == expect
        assert dict(zip(pdf["d"], a))[-13] == -12  # not floor (-24)


class TestRouteSection:
    def test_grid(self, spark):
        rows = [(i, n) for n in (1, 2, 5, 9, 14, 15, 16, 30, 60) for i in range(n)]
        pdf = pd.DataFrame(rows, columns=["idx", "cnt"])
        a, b = eval_both(spark, pdf,
                         S.route_section("idx", "cnt", S.SPARK),
                         S.route_section("idx", "cnt", S.DUCKDB))
        assert a == b
        lookup = dict(zip(zip(pdf["idx"], pdf["cnt"]), a))
        # stop_count=30 → section_size=5: idx 0-4 beginning, 25-29 end
        assert lookup[(0, 30)] == "beginning"
        assert lookup[(4, 30)] == "beginning"
        assert lookup[(5, 30)] == "middle"
        assert lookup[(24, 30)] == "middle"
        assert lookup[(25, 30)] == "end"
        # stop_count=9 → size=3
        assert lookup[(2, 9)] == "beginning"
        assert lookup[(3, 9)] == "middle"
        assert lookup[(6, 9)] == "end"
        # tiny trips: size=0 → everything middle
        assert lookup[(0, 2)] == "middle"


class TestHaversine:
    def test_close_values(self, spark):
        pdf = pd.DataFrame({
            "lat1": [53.08, 53.08, 0.0, 52.5],
            "lon1": [8.80, 8.80, 0.0, 13.4],
            "lat2": [53.081, 53.08, 0.0, 48.1],
            "lon2": [8.80, 8.803, 0.001, 11.6],
        })
        expr_s = f"ROUND({S.haversine_m('lat1','lon1','lat2','lon2')}, 6)"
        a, b = eval_both(spark, pdf, expr_s, expr_s)
        assert a == pytest.approx(b, abs=1e-6)
        assert a[0] == pytest.approx(111.2, rel=0.01)   # ~111 m per mdeg lat
        assert a[2] == pytest.approx(111.2, rel=0.01)


class TestGtfsNoonDatetime:
    def test_seconds_past_midnight_and_27h(self, spark):
        pdf = pd.DataFrame({
            "d": pd.Series([dt.date(2024, 3, 30)] * 4, dtype="object"),
            "s": [0, 43200, 86400, 97200],  # 00:00, 12:00, 24:00, 27:00
        })
        pdf["d"] = pd.to_datetime(pdf["d"])
        # compare as session-TZ strings: collected datetime objects pass
        # through the *process* TZ, which tests must not depend on
        expr = f"CAST({S.gtfs_noon_datetime('d', 's')} AS STRING)"
        a, b = eval_both(spark, pdf, expr, expr)
        assert a == b
        assert a[0] == "2024-03-30 00:00:00"
        assert a[2] == "2024-03-31 00:00:00"   # 24:00 → next day
        assert a[3] == "2024-03-31 03:00:00"   # 27:00 → 03:00 next day


TEXTS = [
    "the quick brown fox and the lazy dog of doom",
    "der hund und die katze und das haus",
    "le chat et la maison et les arbres",
    "el gato y los perros que para nada",
    "",
    "   ",
    "single",
    "a a a a a",
    "Mixed THE Case And Of Der Die text",
    "punctuation, everywhere! yes; really? (ok)",
]


class TestTextExprs:
    def setup_method(self):
        self.pdf = pd.DataFrame({"text": TEXTS})

    def test_token_count(self, spark):
        a, b = eval_both(spark, self.pdf,
                         S.token_count("text", S.SPARK),
                         S.token_count("text", S.DUCKDB))
        assert a == b
        expect = [len(t.split()) for t in TEXTS]
        assert a == expect

    def test_word_occurrences(self, spark):
        expr = S.word_occurrences("text", "the")
        a, b = eval_both(spark, self.pdf, expr, expr)
        assert a == b
        assert a[0] == 2  # "the" twice in first text
        assert a[8] == 1  # case-insensitive

    def test_lang_id(self, spark):
        expr = S.lang_id("text")
        a, b = eval_both(spark, self.pdf, expr, expr)
        assert a == b
        assert a[0] == "en"
        assert a[1] == "de"
        assert a[2] == "fr"
        assert a[3] == "es"

    def test_quality_score(self, spark):
        a, b = eval_both(spark, self.pdf,
                         S.quality_score("text", S.SPARK),
                         S.quality_score("text", S.DUCKDB))
        assert a == pytest.approx(b, abs=1e-9)
        assert all(0.0 <= v <= 1.0 for v in a)


class TestQueryEdgeParity:
    """Registry-query edge cases the sf fixtures never exercise: the
    dialect-split Spark derivations must agree with their oracles on
    empty inputs and NULL keys/dates, not just on the driver data."""

    def _spark_rows(self, spark, sql):
        return sorted(map(tuple, spark.sql(sql).collect()))

    def _duck_rows(self, con, sql):
        return sorted(map(tuple, con.execute(sql).fetchall()))

    def test_rollup_ladder_empty_input(self, spark):
        """The () grouping set emits exactly one grand-total row with
        COUNT 0 even on empty input; the two-level Spark derivation
        must reproduce it (not an all-NULL row, not zero rows)."""
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_rollup_ladder,
        )

        spark.createDataFrame(
            [], "o_orderkey bigint, o_custkey bigint, "
                "o_orderpriority string, o_totalprice double"
        ).createOrReplaceTempView("orders")
        spark.createDataFrame(
            [], "c_custkey bigint, c_nationkey bigint"
        ).createOrReplaceTempView("customer")
        spark.createDataFrame(
            [], "n_nationkey bigint, n_name string"
        ).createOrReplaceTempView("nation")
        try:
            got = self._spark_rows(spark, q_rollup_ladder(S.SPARK))
            con = duckdb.connect()
            con.execute("CREATE TABLE orders (o_orderkey BIGINT, "
                        "o_custkey BIGINT, o_orderpriority VARCHAR, "
                        "o_totalprice DOUBLE)")
            con.execute("CREATE TABLE customer "
                        "(c_custkey BIGINT, c_nationkey BIGINT)")
            con.execute("CREATE TABLE nation "
                        "(n_nationkey BIGINT, n_name VARCHAR)")
            ref = self._duck_rows(con, q_rollup_ladder(S.DUCKDB))
            assert got == ref == [("<all>", "<all>", 0, None)]
        finally:
            for v in ("orders", "customer", "nation"):
                spark.catalog.dropTempView(v)

    def test_rollup_ladder_null_prices(self, spark):
        """AVG divides by the count of NON-NULL values; the Spark
        derivation must carry COUNT(o_totalprice) as the divisor, not
        COUNT(*) (ADVICE r3), including groups that are all-NULL."""
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_rollup_ladder,
        )

        spark.createDataFrame(
            [(1, 1, "HIGH", 10.0), (2, 1, "HIGH", None),
             (3, 1, "LOW", None), (4, 2, "HIGH", 30.0)],
            "o_orderkey bigint, o_custkey bigint, "
            "o_orderpriority string, o_totalprice double"
        ).createOrReplaceTempView("orders")
        spark.createDataFrame(
            [(1, 10), (2, 20)], "c_custkey bigint, c_nationkey bigint"
        ).createOrReplaceTempView("customer")
        spark.createDataFrame(
            [(10, "DE"), (20, "FR")], "n_nationkey bigint, n_name string"
        ).createOrReplaceTempView("nation")
        try:
            got = self._spark_rows(spark, q_rollup_ladder(S.SPARK))
            con = duckdb.connect()
            con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES "
                        "(1, 1, 'HIGH', 10.0), (2, 1, 'HIGH', NULL), "
                        "(3, 1, 'LOW', NULL), (4, 2, 'HIGH', 30.0)) "
                        "t(o_orderkey, o_custkey, o_orderpriority, "
                        "o_totalprice)")
            con.execute("CREATE TABLE customer AS SELECT * FROM (VALUES "
                        "(1, 10), (2, 20)) t(c_custkey, c_nationkey)")
            con.execute("CREATE TABLE nation AS SELECT * FROM (VALUES "
                        "(10, 'DE'), (20, 'FR')) t(n_nationkey, n_name)")
            ref = self._duck_rows(con, q_rollup_ladder(S.DUCKDB))
            assert got == ref
            # the all-NULL LOW group keeps n=1 with a NULL average
            assert ("DE", "LOW", 1, None) in got
            # DE/HIGH: one NULL among two rows -> divisor 1, avg 10.0
            assert ("DE", "HIGH", 2, 10.0) in got
        finally:
            for v in ("orders", "customer", "nation"):
                spark.catalog.dropTempView(v)

    def test_asof_join_null_dates_and_keys(self, spark):
        """Orders with NULL o_orderdate / o_custkey can never match
        under the oracle's range join; the forward-fill derivation
        must not let them fill into unmatched events."""
        import pandas as pd

        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_asof_join,
        )
        from dystonse_gtfs_importer_spark.session import (
            configure_for_oracle,
        )

        configure_for_oracle(spark)
        orders = pd.DataFrame({
            "o_orderkey": pd.Series([1, 2, 3], dtype="int64"),
            "o_custkey": pd.array([10, None, 20], dtype="Int64"),
            "o_orderdate": pd.Series(
                [dt.date(2024, 1, 5), dt.date(2024, 1, 1), None],
                dtype="object"),
        })
        events = pd.DataFrame({
            "event_id": pd.Series([100, 101, 102], dtype="int64"),
            # user 10: event before its only order -> no match;
            # user 20: only a NULL-dated order exists -> no match;
            # user 10 again, after the order -> match 1
            "user_id": pd.Series([10, 20, 10], dtype="int64"),
            "ts": pd.Series(
                [dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 9),
                 dt.datetime(2024, 1, 9)], dtype="datetime64[us]"),
        })
        spark.createDataFrame(orders).createOrReplaceTempView("orders")
        spark.createDataFrame(events).createOrReplaceTempView("events")
        try:
            got = self._spark_rows(spark, q_asof_join(S.SPARK))
            con = duckdb.connect()
            con.register("orders", orders)
            con.register("events", events)
            ref = self._duck_rows(con, q_asof_join(S.DUCKDB))
            # the oracle's left-join form keeps unmatched events with
            # NULL; the Spark form drops them -- normalize like the
            # driver compare does NOT: assert the MATCHED sets agree
            # and no spurious match exists
            assert got == [r for r in ref if r[1] is not None] \
                == [(102, 1)]
        finally:
            for v in ("orders", "events"):
                spark.catalog.dropTempView(v)


class TestRegistryWindow:
    """The driver's CORRECTNESS snapshot records only the first
    DRIVER_WINDOW entries of queries() dict order; REGISTRY_ORDER is
    frozen (round 4) so that window stays stable across rounds."""

    def test_registry_window_frozen(self):
        from dystonse_gtfs_importer_spark.plans import oracle_queries as oq

        names = list(oq.queries())
        # every registered query is exposed, exactly once
        assert sorted(names) == sorted(oq.QUERIES)
        # the frozen order prefix is intact: new additions may only
        # append (after the window), never displace the first 50
        assert tuple(names[: len(oq.REGISTRY_ORDER)]) == oq.REGISTRY_ORDER
        window = set(names[: oq.DRIVER_WINDOW])
        # round-12 rotation: the 43 entries whose latest driver
        # CORRECTNESS row is round 8 — the oldest cohort after the
        # green round 11 — must all sit inside the snapshot window
        # (VERDICT r11 prescription #1); round-9 fills take the rest
        must_witness = {
            "route_sections", "delay_rounding", "interval_overlap",
            "autocomplete", "token_stats", "lang_id", "quality_score",
            "exact_dedup", "fingerprint_dedup", "source_overlap",
            "union_service_days", "latest_in_past", "orders_by_size",
            "trip_resolution", "noon_datetime", "contiguous_trips",
            "value_percentiles", "minhash_lsh_pairs", "simhash",
            "simhash_near_pairs", "simhash_near_pairs_banded",
            "ngram_jaccard_pairs", "blocklist_filter",
            "blocklist_scrub", "shard_manifest", "lsh_config_planner",
            "table_profile", "pricing_summary", "ecdf_curve",
            "ecdf_curve_focused", "curve_stack_stats",
            "hourly_event_stats", "ann_ivf_topk", "semdedup_keep",
            "global_minmax", "distinct_users", "rollup_ladder",
            "stop_pair_counts", "asof_join", "anti_join",
            "spatial_neighbors", "latest_wins", "forward_fill",
        }
        assert must_witness <= window
        # round-13 rotation (VERDICT r12 #1): every entry inside the
        # driver snapshot must be oracle-paired — a no-oracle entry
        # (image_dedup_recall_jpeg) can never turn its row green and
        # belongs below the boundary
        no_oracle = [n for n in names[: oq.DRIVER_WINDOW]
                     if oq.QUERIES[n].oracle is None]
        assert no_oracle == []
        assert "sequence_emit" in window
        assert "image_dedup_recall_jpeg" in oq.REGISTRY_ORDER
        assert "image_dedup_recall_jpeg" not in window

    def test_oracle_sql_order_matches_queries(self):
        from dystonse_gtfs_importer_spark.plans import oracle_queries as oq

        qnames = [n for n in oq.queries() if n in oq.oracle_sql()]
        assert list(oq.oracle_sql()) == qnames


class TestBigramLmDataFrameForm:
    """The registry's bigram_lm_score runs the persisted DataFrame
    pipeline (one tokenize pass); it must agree with the shared SQL
    rendering row-for-row."""

    def test_df_form_matches_sql_form(self, spark, sf_smoke):
        from dystonse_gtfs_importer_spark.functions import sampling_sql as SAMP
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            _bigram_lm_spark,
        )
        from dystonse_gtfs_importer_spark.session import configure_for_oracle
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        configure_for_oracle(spark)
        register_views(spark, sf_smoke)
        got = {tuple(r) for r in _bigram_lm_spark(spark, sf_smoke).collect()}
        ref = {tuple(r)
               for r in spark.sql(SAMP.q_bigram_lm_score(S.SPARK)).collect()}
        assert got == ref and len(got) > 0


class TestJsonExtraction:
    def test_malformed_and_missing_keys_are_null(self, spark):
        """Both dialects' json_get must be null-lenient: malformed
        JSON, missing key, NULL input — never an error."""
        import duckdb
        import pandas as pd

        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_json_props_stats,
        )

        events = pd.DataFrame({
            "event_type": ["a"] * 8,
            "props": pd.Series(['{"k": 3}', 'not json', '{"other": 1}',
                                None, '{"k": "NaNish"}', '{"k": "3.7"}',
                                '{"k": "NaN"}', '{"k": "inf"}'],
                               dtype="object"),
        })
        spark.createDataFrame(events).createOrReplaceTempView("events")
        try:
            got = sorted(map(tuple,
                             spark.sql(q_json_props_stats(S.SPARK))
                             .collect()))
            con = duckdb.connect()
            con.register("events", events)
            ref = sorted(map(tuple,
                             con.execute(q_json_props_stats(S.DUCKDB))
                             .fetchall()))
            # finite-numeric k: 3 and 3.7; non-numeric, NaN, and inf
            # drop identically on both engines
            assert got == ref == [("a", 8, 2, 3.35, 3.0, 3.7)]
        finally:
            spark.catalog.dropTempView("events")

    def test_json_key_histogram_edges(self, spark):
        """Nested objects count their top-level key only; malformed
        and NULL rows land in n_bad on both engines."""
        import duckdb
        import pandas as pd

        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_json_key_histogram,
        )

        events = pd.DataFrame({
            "event_type": ["a", "a", "b", "b", "c", "c", "d"],
            "props": pd.Series(
                ['{"k": 1, "extra": {"deep": 2}}', '{"k": 2}',
                 '{"other": 3}', 'broken{', None,
                 '[1, 2]',                 # valid JSON, not an object
                 '{"k": 1, "k": 2}'],      # duplicate top-level key
                dtype="object"),
        })
        spark.createDataFrame(events).createOrReplaceTempView("events")
        try:
            got = sorted(map(tuple,
                             spark.sql(q_json_key_histogram(S.SPARK))
                             .collect()))
            con = duckdb.connect()
            con.register("events", events)
            ref = sorted(map(tuple,
                             con.execute(q_json_key_histogram(S.DUCKDB))
                             .fetchall()))
            # bad = broken{, None, AND the non-object array; the
            # duplicate-key object counts its key once on both engines
            assert got == ref == [("extra", 1, 1, 3), ("k", 3, 2, 3),
                                  ("other", 1, 1, 3)]
        finally:
            spark.catalog.dropTempView("events")


class TestIntdivParity:
    """d.intdiv must agree cross-engine on the non-negative range it
    documents (Spark DIV truncates, DuckDB // floors — equal for
    non-negative operands)."""

    def test_grid(self, spark):
        import duckdb

        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        cases = [(a, b) for a in (0, 1, 7, 84, 10**12, 15 * 10**12)
                 for b in (1, 2, 3, 100, 1600)]
        vals = ", ".join(f"({a}, {b})" for a, b in cases)
        q_s = (f"SELECT {S.SPARK.intdiv('a', 'b')} FROM "
               f"VALUES {vals} AS t(a, b)")
        q_d = (f"SELECT {S.DUCKDB.intdiv('a', 'b')} FROM "
               f"(VALUES {vals}) t(a, b)")
        got_s = [r[0] for r in spark.sql(q_s).collect()]
        got_d = [r[0] for r in duckdb.sql(q_d).fetchall()]
        assert got_s == got_d == [a // b for a, b in cases]
