"""Generic temporal joins (operators/joins.py) checked against naive
reference implementations on adversarial shapes: exact-tie timestamps,
no-match rows, duplicate left rows, cross-bucket intervals."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from dystonse_gtfs_importer_spark.operators.joins import (
    asof_join,
    interval_join,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [("A", _ts(9, 0), 10.0), ("A", _ts(9, 30), 11.0),
            ("A", _ts(10, 0), 12.0), ("B", _ts(9, 15), 20.0)]
    return spark.createDataFrame(
        rows, "sym string, qts timestamp, px double")


class TestAsofJoin:
    def test_backward_matches_latest_at_or_before(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 30)),   # exact tie -> 11.0
             ("A", _ts(9, 59)),   # between -> 11.0
             ("A", _ts(8, 0)),    # before all -> null
             ("B", _ts(12, 0))],  # -> 20.0
            "sym string, tts timestamp")
        out = asof_join(trades, quotes, "tts", "qts", by=["sym"])
        got = {(r.sym, r.tts): r.px_asof for r in out.collect()}
        assert got == {("A", _ts(9, 30)): 11.0, ("A", _ts(9, 59)): 11.0,
                       ("A", _ts(8, 0)): None, ("B", _ts(12, 0)): 20.0}

    def test_forward_direction(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 31)), ("A", _ts(11, 0))],
            "sym string, tts timestamp")
        out = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                        direction="forward")
        got = {r.tts: r.px_asof for r in out.collect()}
        assert got == {_ts(9, 31): 12.0, _ts(11, 0): None}

    def test_duplicate_left_rows_survive(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 45))] * 3, "sym string, tts timestamp")
        out = asof_join(trades, quotes, "tts", "qts", by=["sym"])
        assert out.count() == 3
        assert {r.px_asof for r in out.collect()} == {11.0}

    def test_strategies_agree(self, spark, quotes):
        """fill and aggregate must return identical rows on the
        adversarial fixture — exact ties, no-match rows, same-key
        duplicate quotes — in both directions."""
        dup = quotes.union(spark.createDataFrame(
            [("A", _ts(9, 30), 11.5)],  # tie on qts: max px wins
            "sym string, qts timestamp, px double"))
        trades = spark.createDataFrame(
            [("A", _ts(9, 30)), ("A", _ts(9, 59)), ("A", _ts(8, 0)),
             ("B", _ts(12, 0)), ("B", _ts(9, 15))],
            "sym string, tts timestamp")
        for direction in ("backward", "forward"):
            a = asof_join(trades, dup, "tts", "qts", by=["sym"],
                          direction=direction, strategy="aggregate")
            f = asof_join(trades, dup, "tts", "qts", by=["sym"],
                          direction=direction, strategy="fill")
            ka = sorted(map(tuple, a.collect()))
            kf = sorted(map(tuple, f.collect()))
            assert ka == kf, direction

    def test_null_keys_and_times_never_match(self, spark):
        """NULL by-keys and NULL on-columns behave like the join form:
        they can neither match nor be matched (fill strategy)."""
        quotes = spark.createDataFrame(
            [("A", _ts(9, 0), 1.0), (None, _ts(8, 0), 9.0),
             ("A", None, 8.0)],
            "sym string, qts timestamp, px double")
        trades = spark.createDataFrame(
            [("A", _ts(10, 0)), (None, _ts(10, 0)), ("A", None)],
            "sym string, tts timestamp")
        out = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                        strategy="fill")
        got = {(r.sym, r.tts): r.px_asof for r in out.collect()}
        assert got == {("A", _ts(10, 0)): 1.0,
                       (None, _ts(10, 0)): None, ("A", None): None}

    @pytest.mark.parametrize("seed", [7, 23])
    def test_strategies_agree_randomized(self, spark, seed):
        """Randomized agreement: dense key collisions, duplicated
        timestamps, NULL on-values and NULL keys on both sides — the
        two strategies must still return identical rows in both
        directions."""
        import random

        rng = random.Random(seed)
        syms = ["A", "B", "C", None]

        def maybe_ts(p_null=0.1):
            if rng.random() < p_null:
                return None
            return _ts(rng.randrange(6, 18), rng.choice([0, 15, 30]))

        quotes = spark.createDataFrame(
            [(rng.choice(syms), maybe_ts(), float(rng.randrange(100)))
             for _ in range(120)],
            "sym string, qts timestamp, px double")
        trades = spark.createDataFrame(
            [(rng.choice(syms), maybe_ts()) for _ in range(80)],
            "sym string, tts timestamp")
        for direction in ("backward", "forward"):
            a = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                          direction=direction, strategy="aggregate")
            f = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                          direction=direction, strategy="fill")
            # NULLs make tuples incomparable; repr gives a total order
            assert sorted(map(tuple, a.collect()), key=repr) \
                == sorted(map(tuple, f.collect()), key=repr), \
                (seed, direction)

    def test_matches_window_reference(self, spark, sf_smoke):
        """Cross-check on real data: MAX_BY form == windowed form."""
        from dystonse_gtfs_importer_spark.sources.testdata import (
            load_table,
        )

        events = load_table(spark, sf_smoke, "events") \
            .select("event_id", "user_id", "ts").limit(500)
        orders = load_table(spark, sf_smoke, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate")
        # equi-key as-of: match each event to its user's newest order
        out = asof_join(
            events.withColumnRenamed("user_id", "o_custkey"),
            orders, "ts", "o_orderdate", by=["o_custkey"],
            value_cols=["o_orderkey"])
        from pyspark.sql.window import Window

        j = events.join(orders,
                        (events.user_id == orders.o_custkey)
                        & (orders.o_orderdate <= events.ts), "left")
        w = Window.partitionBy("event_id").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey"))
        ref = (j.withColumn("rn", F.row_number().over(w))
               .where("rn = 1").select("event_id", "o_orderkey"))
        got_m = {r.event_id: r.o_orderkey_asof for r in out.collect()}
        ref_m = {r.event_id: r.o_orderkey for r in ref.collect()}
        assert got_m == ref_m


class TestIntervalJoin:
    def test_containment_with_cross_bucket_intervals(self, spark):
        events = spark.createDataFrame(
            [(1, _ts(9, 30)), (2, _ts(10, 30)), (3, _ts(13, 0))],
            "event_id int, ts timestamp")
        ivs = spark.createDataFrame(
            [("long", _ts(9, 0), _ts(11, 0)),    # spans 3 buckets
             ("short", _ts(10, 15), _ts(10, 45)),
             ("empty", _ts(10, 30), _ts(10, 30))],  # zero-length
            "name string, t0 timestamp, t1 timestamp")
        out = interval_join(events, ivs, "ts", "t0", "t1")
        got = sorted((r.event_id, r.name) for r in out.collect())
        assert got == [(1, "long"), (2, "long"), (2, "short")]

    def test_equals_naive_theta_join(self, spark):
        events = spark.createDataFrame(
            [(i, _ts(8 + i % 10, (i * 7) % 60)) for i in range(100)],
            "event_id int, ts timestamp")
        ivs = spark.createDataFrame(
            [(i, _ts(8 + i % 8, 0), _ts(8 + i % 8, 1 + (i * 13) % 59))
             for i in range(30)],
            "iv_id int, t0 timestamp, t1 timestamp")
        fast = sorted((r.event_id, r.iv_id) for r in
                      interval_join(events, ivs, "ts", "t0", "t1",
                                    bucket_s=600).collect())
        naive = sorted((r.event_id, r.iv_id) for r in
                       events.crossJoin(ivs).where(
                           (F.col("ts") >= F.col("t0"))
                           & (F.col("ts") < F.col("t1"))).collect())
        assert fast == naive and len(fast) > 0


class TestAsofFillGuards:
    """ADVICE r3: the fill strategy must reject inputs its internal
    plumbing cannot represent instead of silently mis-joining."""

    def test_incompatible_on_types_raise(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", "2024-01-01 09:30:00")], "sym string, tts string")
        with pytest.raises(ValueError, match="incompatible on-column"):
            asof_join(trades, quotes, "tts", "qts", by=["sym"],
                      strategy="fill")

    def test_date_vs_timestamp_still_widens(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", dt.date(2024, 1, 2))], "sym string, td date")
        out = asof_join(trades, quotes, "td", "qts", by=["sym"],
                        strategy="fill")
        # 2024-01-02 00:00 is after every quote -> latest px
        assert [r.px_asof for r in out.collect()] == [12.0]

    def test_reserved_column_names_raise(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 30), 1)], "sym string, tts timestamp, __t int")
        with pytest.raises(ValueError, match="reserves column names"):
            asof_join(trades, quotes, "tts", "qts", by=["sym"],
                      strategy="fill")

    def test_reserved_payload_field_raises(self, spark):
        right = spark.createDataFrame(
            [("A", _ts(9, 0), 1.0)], "sym string, qts timestamp, __on double")
        left = spark.createDataFrame(
            [("A", _ts(9, 30))], "sym string, tts timestamp")
        with pytest.raises(ValueError, match="__on"):
            asof_join(left, right, "tts", "qts", by=["sym"],
                      strategy="fill")


class TestAsofFillSalted:
    """The salt-by-time-range fill variant must equal the plain fill
    (and the aggregate strategy) exactly — including on a 90 %-hot-key
    fixture, exact-tie timestamps, NULL keys/times, both directions,
    and bucket counts from degenerate (1) to larger than the data."""

    def _hot_fixture(self, spark, seed=11, hot_frac=0.9):
        import random

        rng = random.Random(seed)
        syms = ["HOT", "B", "C", None]

        def sym():
            return "HOT" if rng.random() < hot_frac else rng.choice(syms)

        def maybe_ts(p_null=0.08):
            if rng.random() < p_null:
                return None
            return _ts(rng.randrange(6, 18), rng.choice([0, 15, 30]),
                       rng.choice([0, 1, 30]))

        quotes = spark.createDataFrame(
            [(sym(), maybe_ts(), float(rng.randrange(100)))
             for _ in range(300)],
            "sym string, qts timestamp, px double")
        trades = spark.createDataFrame(
            [(sym(), maybe_ts()) for _ in range(200)],
            "sym string, tts timestamp")
        return trades, quotes

    @pytest.mark.parametrize("n_buckets", [1, 4, 64])
    def test_salted_equals_plain_hot_key(self, spark, n_buckets):
        trades, quotes = self._hot_fixture(spark)
        for direction in ("backward", "forward"):
            plain = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                              direction=direction, strategy="fill")
            salted = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                               direction=direction, strategy="fill",
                               salt_buckets=n_buckets)
            assert sorted(map(tuple, plain.collect()), key=repr) \
                == sorted(map(tuple, salted.collect()), key=repr), \
                (direction, n_buckets)

    def test_salted_equals_aggregate_on_ties(self, spark, quotes):
        dup = quotes.union(spark.createDataFrame(
            [("A", _ts(9, 30), 11.5)],
            "sym string, qts timestamp, px double"))
        trades = spark.createDataFrame(
            [("A", _ts(9, 30)), ("A", _ts(9, 59)), ("A", _ts(8, 0)),
             ("B", _ts(12, 0)), ("B", _ts(9, 15))],
            "sym string, tts timestamp")
        for direction in ("backward", "forward"):
            a = asof_join(trades, dup, "tts", "qts", by=["sym"],
                          direction=direction, strategy="aggregate")
            s = asof_join(trades, dup, "tts", "qts", by=["sym"],
                          direction=direction, strategy="fill",
                          salt_buckets=8)
            assert sorted(map(tuple, a.collect())) \
                == sorted(map(tuple, s.collect())), direction

    def test_single_timestamp_degenerates_to_one_bucket(self, spark):
        quotes = spark.createDataFrame(
            [("A", _ts(9, 0), 1.0), ("A", _ts(9, 0), 2.0)],
            "sym string, qts timestamp, px double")
        trades = spark.createDataFrame(
            [("A", _ts(9, 0)), ("A", _ts(10, 0))],
            "sym string, tts timestamp")
        out = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                        strategy="fill", salt_buckets=16)
        assert {r.px_asof for r in out.collect()} == {2.0}

    def test_salt_requires_fill_strategy(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 30))], "sym string, tts timestamp")
        with pytest.raises(ValueError, match="fill strategy"):
            asof_join(trades, quotes, "tts", "qts", by=["sym"],
                      strategy="aggregate", salt_buckets=4)

    def test_partitions_actually_split(self, spark):
        """The point of the salt: a hot key's rows spread over
        n_buckets window partitions.  Verified structurally — the
        plan's window partition spec includes __bucket."""
        trades, quotes = self._hot_fixture(spark)
        salted = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                           strategy="fill", salt_buckets=8)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "__bucket" in plan


class TestReviewFixes:
    def test_salt_buckets_zero_rejected(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 30))], "sym string, tts timestamp")
        with pytest.raises(ValueError, match="salt_buckets must be"):
            asof_join(trades, quotes, "tts", "qts", by=["sym"],
                      strategy="fill", salt_buckets=0)

    def test_numeric_width_mismatch_widens(self, spark):
        """int-vs-bigint on-columns must keep working in the fill
        strategy (lossless bigint widening), agreeing with the
        aggregate strategy."""
        left = spark.createDataFrame(
            [("A", 5), ("A", 1), ("B", 9)], "k string, seq int")
        right = spark.createDataFrame(
            [("A", 2, 10.0), ("A", 4, 20.0), ("B", 9, 30.0)],
            "k string, rseq bigint, v double")
        f = asof_join(left, right, "seq", "rseq", by=["k"],
                      strategy="fill")
        a = asof_join(left, right, "seq", "rseq", by=["k"],
                      strategy="aggregate")
        fa = sorted(map(tuple, f.collect()), key=repr)
        assert fa == sorted(map(tuple, a.collect()), key=repr)
        assert {(r.k, r.seq): r.v_asof for r in f.collect()} == \
            {("A", 5): 20.0, ("A", 1): None, ("B", 9): 30.0}


class TestAsofTolerance:
    """pandas merge_asof(tolerance=...) parity: matches farther than
    the cap (seconds for temporal on-columns, raw units for numeric)
    revert to NULL payloads in every strategy."""

    def test_backward_tolerance_caps_staleness(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 31)),   # 60 s stale -> kept
             ("A", _ts(9, 59)),   # 1740 s stale -> nulled
             ("A", _ts(9, 30)),   # exact tie, 0 s -> kept
             ("B", _ts(12, 0))],  # 9900 s stale -> nulled
            "sym string, tts timestamp")
        for strategy in ("fill", "aggregate"):
            out = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                            strategy=strategy, tolerance=600)
            got = {(r.sym, r.tts): r.px_asof for r in out.collect()}
            assert got == {("A", _ts(9, 31)): 11.0,
                           ("A", _ts(9, 59)): None,
                           ("A", _ts(9, 30)): 11.0,
                           ("B", _ts(12, 0)): None}, strategy

    def test_forward_tolerance(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 55)), ("A", _ts(9, 0))],
            "sym string, tts timestamp")
        out = asof_join(trades, quotes, "tts", "qts", by=["sym"],
                        direction="forward", tolerance=600)
        got = {r.tts: r.px_asof for r in out.collect()}
        # 9:55 -> 10:00 quote (300 s ahead, kept); 9:00 -> exact tie
        assert got == {_ts(9, 55): 12.0, _ts(9, 0): 10.0}

    def test_matches_pandas_merge_asof(self, spark):
        """Randomized parity against pandas' own implementation on a
        single-key numeric axis (pandas requires sorted unique-ish
        input; NULL-free by construction)."""
        import random

        import pandas as pd

        rng = random.Random(7)
        lvals = sorted(rng.sample(range(0, 1000), 60))
        rvals = sorted(rng.sample(range(0, 1000), 40))
        left = spark.createDataFrame([(v,) for v in lvals], "x bigint")
        right = spark.createDataFrame(
            [(v, float(i)) for i, v in enumerate(rvals)],
            "y bigint, payload double")
        for direction in ("backward", "forward"):
            for tol in (0, 5, 50, 10**6):
                out = asof_join(left, right, "x", "y",
                                direction=direction,
                                strategy="aggregate", tolerance=tol)
                got = {r.x: r.payload_asof for r in out.collect()}
                ref = pd.merge_asof(
                    pd.DataFrame({"x": lvals}),
                    pd.DataFrame({"y": rvals,
                                  "payload": [float(i) for i in
                                              range(len(rvals))]}),
                    left_on="x", right_on="y", direction=direction,
                    tolerance=tol)
                ref_m = {int(r.x): (None if pd.isna(r.payload)
                                    else float(r.payload))
                         for r in ref.itertuples()}
                assert got == ref_m, (direction, tol)

    def test_strategies_agree_with_tolerance(self, spark, quotes):
        """fill, salted fill, and aggregate agree under a cap, ties
        and no-match rows included."""
        trades = spark.createDataFrame(
            [("A", _ts(h, m)) for h in (8, 9, 10, 11)
             for m in (0, 29, 30, 31)],
            "sym string, tts timestamp")
        outs = [
            asof_join(trades, quotes, "tts", "qts", by=["sym"],
                      strategy=s, tolerance=1800, salt_buckets=b)
            for s, b in (("fill", None), ("fill", 4), ("aggregate", None))
        ]
        rows = [sorted(map(tuple, o.collect()), key=repr) for o in outs]
        assert rows[0] == rows[1] == rows[2]

    def test_negative_tolerance_rejected(self, spark, quotes):
        trades = spark.createDataFrame(
            [("A", _ts(9, 30))], "sym string, tts timestamp")
        with pytest.raises(ValueError, match="tolerance must be"):
            asof_join(trades, quotes, "tts", "qts", by=["sym"],
                      tolerance=-1)

    def test_non_orderable_tolerance_type_rejected(self, spark):
        left = spark.createDataFrame([("A", "x")], "k string, s string")
        right = spark.createDataFrame(
            [("A", "y", 1.0)], "k string, rs string, v double")
        with pytest.raises(ValueError, match="temporal or numeric"):
            asof_join(left, right, "s", "rs", by=["k"],
                      strategy="aggregate", tolerance=5).collect()
