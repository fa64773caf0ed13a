"""Gap-based sessionization: hand-built gap semantics plus equality
with Spark's built-in ``session_window`` aggregation (the streaming
operator whose batch semantics the oracle query pins)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _run(spark, sf_dir="/root/testdata/sf0.001"):
    from dystonse_gtfs_importer_spark.plans.oracle_queries import QUERIES

    return QUERIES["sessionization"].spark(spark, sf_dir).collect()


class TestSessionization:
    def test_gap_splits_and_session_stats(self, spark):
        import datetime as dt

        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_sessionization,
        )
        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.session import configure_for_oracle

        configure_for_oracle(spark)
        t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
        mk = lambda m: t0 + dt.timedelta(minutes=m)
        rows = [  # user 1: 0-10-20 | 70 | 140-150; user 2: one event
            (1, mk(0), 1, 1.0), (2, mk(10), 1, 2.0), (3, mk(20), 1, 3.0),
            (4, mk(70), 1, 4.0),
            (5, mk(140), 1, 5.0), (6, mk(150), 1, 6.0),
            (7, mk(0), 2, 7.0),
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, value double"
        ).createOrReplaceTempView("events")
        got = sorted(tuple(r) for r in
                     spark.sql(q_sessionization(S.SPARK)).collect())
        ep0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
        m = 60
        assert got == [
            (1, 1, ep0, ep0 + 20 * m, 3, 6.0),
            (1, 2, ep0 + 70 * m, ep0 + 70 * m, 1, 4.0),
            (1, 3, ep0 + 140 * m, ep0 + 150 * m, 2, 11.0),
            (2, 1, ep0, ep0, 1, 7.0),
        ]

    def test_matches_builtin_session_window(self, spark):
        from dystonse_gtfs_importer_spark.session import configure_for_oracle
        from dystonse_gtfs_importer_spark.sources.testdata import load_table

        configure_for_oracle(spark)
        ours = {(r.user_id, r.start_ep, r.end_ep, r.n_events)
                for r in _run(spark)}
        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        built = (ev.groupBy("user_id",
                            F.session_window("ts", "30 minutes"))
                 .agg(F.count("*").alias("n"),
                      F.min("ts").alias("lo"), F.max("ts").alias("hi"))
                 .collect())
        theirs = {(r.user_id,
                   int(r.lo.replace(tzinfo=__import__("datetime").timezone.utc)
                       .timestamp()),
                   int(r.hi.replace(tzinfo=__import__("datetime").timezone.utc)
                       .timestamp()),
                   r.n)
                  for r in built}
        assert ours == theirs


class TestFunnel:
    def test_steps_require_order(self, spark):
        import datetime as dt

        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_funnel_steps,
        )
        from dystonse_gtfs_importer_spark.session import configure_for_oracle

        configure_for_oracle(spark)
        t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
        mk = lambda m: t0 + dt.timedelta(minutes=m)
        rows = [
            # user 1 completes in order
            (1, mk(0), 1, "view"), (2, mk(5), 1, "click"),
            (3, mk(9), 1, "purchase"),
            # user 2: purchase BEFORE click -> depth 2
            (4, mk(0), 2, "view"), (5, mk(1), 2, "purchase"),
            (6, mk(2), 2, "click"),
            # user 3: click before any view -> depth 1
            (7, mk(0), 3, "click"), (8, mk(1), 3, "view"),
            # user 4: never viewed -> absent
            (9, mk(0), 4, "purchase"),
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long,"
                  " event_type string"
        ).createOrReplaceTempView("events")
        got = {r.user_id: r.steps_completed for r in
               spark.sql(q_funnel_steps(S.SPARK)).collect()}
        assert got == {1: 3, 2: 2, 3: 1}


class TestScd2:
    def test_runs_collapse_and_reopen(self, spark):
        import datetime as dt

        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_scd2_intervals,
        )
        from dystonse_gtfs_importer_spark.session import configure_for_oracle

        configure_for_oracle(spark)
        t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
        mk = lambda m: t0 + dt.timedelta(minutes=m)
        rows = [(1, mk(0), 1, "a"), (2, mk(1), 1, "a"),
                (3, mk(2), 1, "b"), (4, mk(3), 1, "a")]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long,"
                  " event_type string"
        ).createOrReplaceTempView("events")
        got = sorted(tuple(r) for r in
                     spark.sql(q_scd2_intervals(S.SPARK)).collect())
        ep0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
        m = 60
        # a-run (2 events), b-run, reopened a-run; valid_to chains
        assert got == [
            (1, "a", 1, ep0, ep0 + 2 * m, 2),
            (1, "a", 3, ep0 + 3 * m, None, 1),
            (1, "b", 2, ep0 + 2 * m, ep0 + 3 * m, 1),
        ]
