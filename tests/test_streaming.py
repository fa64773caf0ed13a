"""Structured-Streaming import tests: file-source micro-batches,
stateful prediction-basis dedup, latest-wins merge sink, TTL cleanup."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from gtfs_fixtures import build_schedule, write_gtfs_dir

from dystonse_gtfs_importer_spark.sources.gtfs_rt import encode_feed_message


# NOTE on availableNow + applyInPandasWithState waits: these queries
# never self-terminate (ProcessingTimeTimeout keeps them alive to fire
# future state timeouts) and under full-suite timing the engine
# schedules back-to-back timeout batches, so even an idle-status probe
# ("no data available / no trigger active twice in a row") never fires
# — an intermediate _await_drained helper based on it measured <6 s in
# isolation but the full 120 s in-suite.  The robust pattern, used by
# both stateful tests below: poll the SINK until it equals the
# independently computed expectation, then stop — sound because state
# only evolves from the fixed input files (a timeout firing drops
# state without emitting), so first-match is final-match, and a real
# mismatch still waits out the same deadline and fails with the same
# diff.


def _feed(ts, seq_delay_pairs, trip="TR1v1n0", start_date="20240101"):
    return encode_feed_message(ts, [
        {"trip_id": trip, "route_id": "R1", "start_date": start_date,
         "start_time": "08:00:00",
         "stop_time_updates": [(seq, f"S{seq}", d, d) for seq, d in seq_delay_pairs]},
    ])


class TestStreamingImport:
    def test_two_batches_latest_wins(self, spark, tmp_path):
        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs
        from dystonse_gtfs_importer_spark.streaming.import_stream import (
            run_import_stream,
        )

        g = tmp_path / "gtfs"
        g.mkdir()
        write_gtfs_dir(build_schedule(), g)
        sched = read_gtfs(spark, str(g))
        trips = sched["trips"].cache()
        stop_times = sched["stop_times"].cache()

        rt = tmp_path / "rt"
        rt.mkdir()
        records_dir = str(tmp_path / "records")
        ckpt = str(tmp_path / "ckpt")

        # batch 1: two files (second re-reports stop 1 with a new delay)
        (rt / "f1.pb").write_bytes(_feed(1704096000, [(1, 60), (2, 70)]))
        (rt / "f2.pb").write_bytes(_feed(1704096120, [(1, 90)]))
        q = run_import_stream(spark, str(rt), trips, stop_times,
                              "test", "sched", records_dir, ckpt)
        q.awaitTermination(120)

        recs = spark.read.parquet(records_dir)
        assert recs.count() == 2  # (stop 1, stop 2)
        s1 = recs.where(F.col("stop_sequence") == 1).first()
        assert s1.delay_arrival == 90  # newest header_timestamp won

        # batch 2 (new stream run, same checkpoint): older + newer reports
        (rt / "f3.pb").write_bytes(_feed(1704095000, [(1, 11)]))   # stale
        (rt / "f4.pb").write_bytes(_feed(1704096240, [(2, 99)]))   # fresh
        q = run_import_stream(spark, str(rt), trips, stop_times,
                              "test", "sched", records_dir, ckpt)
        q.awaitTermination(120)

        recs = spark.read.parquet(records_dir)
        assert recs.count() == 2
        assert recs.where(F.col("stop_sequence") == 1).first().delay_arrival == 90
        assert recs.where(F.col("stop_sequence") == 2).first().delay_arrival == 99

    def test_merge_is_partition_scoped(self, spark, tmp_path):
        """A micro-batch must rewrite ONLY the (source, trip_start_date)
        partitions it touches — untouched partitions stay byte-identical
        (the O(table)-per-batch rewrite would be the scale killer)."""
        import hashlib
        from pathlib import Path

        from dystonse_gtfs_importer_spark.sources.gtfs import read_gtfs
        from dystonse_gtfs_importer_spark.streaming.import_stream import (
            run_import_stream,
        )

        g = tmp_path / "gtfs"
        g.mkdir()
        write_gtfs_dir(build_schedule(), g)
        sched = read_gtfs(spark, str(g))
        trips = sched["trips"].cache()
        stop_times = sched["stop_times"].cache()

        rt = tmp_path / "rt"
        rt.mkdir()
        records_dir = str(tmp_path / "records")
        ckpt = str(tmp_path / "ckpt")

        # batch 1 covers two service days
        (rt / "f1.pb").write_bytes(_feed(1704096000, [(1, 60), (2, 70)]))
        (rt / "f2.pb").write_bytes(
            _feed(1704182400, [(1, 50)], start_date="20240102"))
        q = run_import_stream(spark, str(rt), trips, stop_times,
                              "test", "sched", records_dir, ckpt)
        q.awaitTermination(120)

        day1 = Path(records_dir) / "source=test" / "trip_start_date=2024-01-01"
        day2 = Path(records_dir) / "source=test" / "trip_start_date=2024-01-02"
        assert day1.is_dir() and day2.is_dir()

        def snapshot(d: Path):
            return {p.name: hashlib.md5(p.read_bytes()).hexdigest()
                    for p in d.glob("*.parquet")}

        before = snapshot(day1)
        assert before

        # batch 2 touches only day 2
        (rt / "f3.pb").write_bytes(
            _feed(1704182600, [(1, 80)], start_date="20240102"))
        q = run_import_stream(spark, str(rt), trips, stop_times,
                              "test", "sched", records_dir, ckpt)
        q.awaitTermination(120)

        assert snapshot(day1) == before, "untouched partition was rewritten"
        recs = spark.read.parquet(records_dir)
        d2 = recs.where(F.col("trip_start_date") == dt.date(2024, 1, 2))
        assert d2.count() == 1
        assert d2.first().delay_arrival == 80
        d1 = recs.where(F.col("trip_start_date") == dt.date(2024, 1, 1))
        assert d1.count() == 2

    def test_prediction_basis_dedup(self, spark, tmp_path):
        from dystonse_gtfs_importer_spark.schemas import RT_EVENTS
        from dystonse_gtfs_importer_spark.streaming.import_stream import (
            dedup_prediction_basis,
        )

        # memory-source streaming frame via a rate-less approach: use
        # files of json with the RT_EVENTS schema
        src = tmp_path / "events"
        src.mkdir()
        import json

        rows = []
        # same basis re-reported 3x (keep 1), then changed (keep)
        for i, (seq, dep) in enumerate([(1, 60), (1, 60), (1, 60), (2, 60), (2, 72)]):
            rows.append({
                "feed_file": f"f{i}", "header_timestamp": 1704096000 + i,
                "trip_id": "T1", "route_id": "R1", "start_date": "20240101",
                "start_time": "08:00:00", "stop_sequence": seq,
                "stop_id": f"S{seq}", "arrival_delay": 5,
                "departure_delay": dep,
            })
        (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))

        stream = (spark.readStream.schema(RT_EVENTS).json(str(src)))
        dedup = dedup_prediction_basis(stream)
        q = (dedup.writeStream.format("memory").queryName("dedup_out")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())

        # Poll the sink until the expected deduped bases appear (the
        # decayed-counter pattern): under full-suite timing the engine
        # schedules back-to-back state-timeout batches, so even
        # _await_drained's idle-status probe never fires (measured
        # 120.6 s of pure wait in the r13 full-suite profile despite a
        # <6 s isolated re-measure).  Kept rows only ever come from
        # the fixed input file — a timeout firing drops state without
        # emitting — so once the sink shows the expected bases it
        # stays there; a real mismatch still waits out the same 120 s
        # deadline and fails with the same diff below.
        import time

        def _bases():
            out = spark.sql("SELECT * FROM dedup_out").collect()
            return [(r.stop_sequence, r.departure_delay) for r in out]

        want = [(1, 60), (2, 60), (2, 72)]
        deadline = time.time() + 120
        while time.time() < deadline:
            if _bases() == want:
                break
            time.sleep(0.5)
        q.stop()
        assert _bases() == want

    def test_prediction_basis_dedup_tws_matches_classic(self, spark,
                                                        tmp_path):
        """ST2 twin on the Spark 4 transformWithState API: identical
        kept rows for the same input stream, with TTL declared on the
        ValueState instead of manual timeouts.  Requires protobuf
        (the transformWithState worker protocol) + RocksDB state
        store; skipped where the environment lacks them."""
        pytest.importorskip(
            "google.protobuf",
            reason="transformWithState worker needs protobuf")
        from dystonse_gtfs_importer_spark.schemas import RT_EVENTS
        from dystonse_gtfs_importer_spark.streaming.import_stream import (
            dedup_prediction_basis_tws,
        )

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")

        src = tmp_path / "events"
        src.mkdir()
        import json

        rows = []
        for i, (seq, dep) in enumerate([(1, 60), (1, 60), (1, 60),
                                        (2, 60), (2, 72)]):
            rows.append({
                "feed_file": f"f{i}", "header_timestamp": 1704096000 + i,
                "trip_id": "T1", "route_id": "R1", "start_date": "20240101",
                "start_time": "08:00:00", "stop_sequence": seq,
                "stop_id": f"S{seq}", "arrival_delay": 5,
                "departure_delay": dep,
            })
        (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))

        stream = spark.readStream.schema(RT_EVENTS).json(str(src))
        dedup = dedup_prediction_basis_tws(stream)
        q = (dedup.writeStream.format("memory").queryName("dedup_tws_out")
             .option("checkpointLocation", str(tmp_path / "ck_tws"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        out = spark.sql("SELECT * FROM dedup_tws_out").collect()
        bases = [(r.stop_sequence, r.departure_delay) for r in out]
        assert bases == [(1, 60), (2, 60), (2, 72)]


class TestEventTimeWindows:
    def test_watermark_windowed_counts(self, spark, tmp_path):
        """ST7 streaming form: event-time windows + watermark, append
        mode — results must match the same plan run in batch."""
        import json

        src = tmp_path / "ev"
        src.mkdir()
        base = 1704096000  # 2024-01-01T08:00Z
        rows = []
        for i in range(20):
            rows.append({"user_id": i % 3, "event_type": "click",
                         "ts": (base + i * 300) * 1000000,
                         "value": float(i)})
        # a late-but-within-watermark row and an on-time tail far
        # enough ahead to close the first hour's window
        rows.append({"user_id": 1, "event_type": "click",
                     "ts": (base + 60) * 1000000, "value": 100.0})
        rows.append({"user_id": 1, "event_type": "click",
                     "ts": (base + 4 * 3600) * 1000000, "value": 1.0})
        (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))

        schema = ("user_id long, event_type string, ts long, "
                  "value double")
        to_ts = lambda df: df.withColumn(
            "ts", F.timestamp_micros(F.col("ts")))

        from dystonse_gtfs_importer_spark.streaming.windows import (
            windowed_event_counts,
        )

        batch = windowed_event_counts(
            to_ts(spark.read.schema(schema).json(str(src))))
        stream = windowed_event_counts(
            to_ts(spark.readStream.schema(schema).json(str(src))))
        assert stream.isStreaming
        q = (stream.writeStream.format("memory").queryName("winagg")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r.window_start_s, r.event_type): (r.n, r.sum_value)
               for r in spark.sql("SELECT * FROM winagg").collect()}
        want = {(r.window_start_s, r.event_type): (r.n, r.sum_value)
                for r in batch.collect()
                # append mode only emits windows the watermark closed
                if r.window_start_s in {k[0] for k in got}}
        assert got == want and got, (got, want)
        # the within-watermark late row landed in the first window
        first = min(got)
        assert got[first][0] >= 13    # 12 on-time + 1 late


class TestCleanup:
    def test_ttl_filter(self, spark):
        from dystonse_gtfs_importer_spark.streaming.import_stream import (
            cleanup_predictions,
        )

        df = spark.createDataFrame(
            [(dt.date(2024, 1, 1), 8 * 3600),     # old
             (dt.date(2024, 1, 2), 9 * 3600)],    # fresh
            "trip_start_date date, trip_start_time int")
        kept = cleanup_predictions(df, dt.datetime(2024, 1, 2, 12, 0))
        rows = kept.collect()
        assert len(rows) == 1
        assert str(rows[0].trip_start_date) == "2024-01-02"


class TestStreamingSessionization:
    def test_session_window_stream_matches_batch(self, spark, tmp_path):
        """Streaming session_window with watermark (availableNow) must
        emit exactly the closed sessions the batch plan produces."""
        import json

        import pyspark.sql.functions as F

        src = tmp_path / "sev"
        src.mkdir()
        base = 1704096000  # 2024-01-01T08:00Z
        rows = []
        # user 0: two sessions (3 events, 40-min gap, 2 events);
        # user 1: one long session of 4 events 10 min apart
        for i, off in enumerate((0, 600, 1200, 3600 + 1800, 3600 + 2400)):
            rows.append({"user_id": 0, "ts": (base + off) * 1000000,
                         "value": float(i)})
        for i in range(4):
            rows.append({"user_id": 1, "ts": (base + i * 600) * 1000000,
                         "value": 1.0})
        # far-future tail to push the watermark past everything
        rows.append({"user_id": 9, "ts": (base + 8 * 3600) * 1000000,
                     "value": 0.0})
        (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))

        schema = "user_id long, ts long, value double"
        to_ts = lambda df: df.withColumn(
            "ts", F.timestamp_micros(F.col("ts")))

        from dystonse_gtfs_importer_spark.streaming.windows import (
            sessionized_event_stats,
        )

        batch = sessionized_event_stats(
            to_ts(spark.read.schema(schema).json(str(src))))
        stream = sessionized_event_stats(
            to_ts(spark.readStream.schema(schema).json(str(src))))
        assert stream.isStreaming
        q = (stream.writeStream.format("memory").queryName("sessagg")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "sck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r.user_id, r.start_s, r.end_s): (r.n_events, r.value_sum)
               for r in spark.sql("SELECT * FROM sessagg").collect()}
        want = {(r.user_id, r.start_s, r.end_s): (r.n_events, r.value_sum)
                for r in batch.collect()
                if (r.user_id, r.start_s, r.end_s) in got}
        assert got == want and got
        # user 0 split into two sessions, user 1 merged into one
        u0 = sorted(k for k in got if k[0] == 0)
        assert len(u0) == 2 and got[u0[0]][0] == 3 and got[u0[1]][0] == 2
        u1 = [k for k in got if k[0] == 1]
        assert len(u1) == 1 and got[u1[0]][0] == 4


class TestDecayedCounterStream:
    def _write(self, path, rows):
        import json

        path.write_text("\n".join(json.dumps(r) for r in rows))

    def test_stream_matches_batch_across_batches(self, spark, tmp_path):
        """Two micro-batches (the second including a LATE event) must
        leave exactly the state the batch fold over all rows computes
        — exact integer decay, so equality is ==, not approx."""
        import pyspark.sql.functions as F

        from dystonse_gtfs_importer_spark.streaming.windows import (
            decayed_counter_batch,
            decayed_counter_stream,
        )

        src = tmp_path / "dev"
        src.mkdir()
        base = 1704067200  # 2024-01-01T00:00Z
        day = 86400
        # user 1: events spanning three half-life buckets;
        # user 2: single event
        # deliberately NOT powers of two: the bucket-sum state must
        # make stream == batch exact for arbitrary values, including
        # the late event below (the old progressive-shift fold only
        # held for power-of-two planted values)
        self._write(src / "a.json", [
            {"user_id": 1, "ts": (base + 0 * day) * 1000000,
             "value": 8.3},
            {"user_id": 1, "ts": (base + 7 * day) * 1000000,
             "value": 2.7},
            {"user_id": 2, "ts": (base + 1 * day) * 1000000,
             "value": 1.5},
        ])
        self._write(src / "b.json", [
            # late event (one bucket older than user 1's current:
            # buckets are CALENDAR-aligned, and base day 19723 sits 4
            # days into its 7-day bucket, so +2d stays in the old
            # bucket while +3d would already share the +7d bucket)
            {"user_id": 1, "ts": (base + 2 * day) * 1000000,
             "value": 4.9},
            {"user_id": 1, "ts": (base + 14 * day) * 1000000,
             "value": 1.1},
        ])

        schema = "user_id long, ts long, value double"
        to_ts = lambda df: df.withColumn(
            "ts", F.timestamp_micros(F.col("ts")))

        batch = decayed_counter_batch(
            to_ts(spark.read.schema(schema).json(str(src))))
        stream = decayed_counter_stream(
            to_ts(spark.readStream
                  .schema(schema)
                  .option("maxFilesPerTrigger", 1).json(str(src))))
        assert stream.isStreaming
        q = (stream.writeStream.format("memory").queryName("decct")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "dck"))
             .trigger(availableNow=True).start())

        # update mode: the LAST row per key is the final state
        import pandas as pd

        def _read():
            got_df = spark.sql("SELECT * FROM decct").toPandas()
            return {int(r.key): (int(r.last_bucket),
                                 int(r.decayed_value_e6), int(r.n_events))
                    for _, r in got_df.iterrows()}  # later rows overwrite

        want = {int(r.key): (int(r.last_bucket),
                             int(r.decayed_value_e6), int(r.n_events))
                for r in batch.collect()}
        # Poll the sink until the stream state equals the batch fold:
        # this availableNow query never self-terminates
        # (ProcessingTimeTimeout schedules back-to-back timeout
        # batches, so even _await_drained's idle-status probe never
        # fires — measured 122 s of pure timeout wait in the r13
        # baseline).  State can only evolve from the fixed input files
        # (a TTL firing removes state without emitting), so once the
        # sink matches the batch fold it stays matched; on a real
        # mismatch the deadline expires and the assertion below
        # reports the diff exactly like the old 120 s wait did.
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            if _read() == want:
                break
            time.sleep(1)
        q.stop()
        got = _read()
        assert got == want and len(want) == 2

    def test_fold_hand_values(self):
        """Bucket-sum arithmetic by hand: 8.0 and a late 4.0 in bucket
        B, 2.0 in B+1, 1.0 in B+2 — each bucket's exact sum decays by
        its whole-bucket age from the newest bucket."""
        from dystonse_gtfs_importer_spark.streaming.windows import (
            _decayed_total,
            _fold_bucket_sums,
        )

        day = 86400
        base = 1704067200
        rows = [(base, 8.0), (base + 7 * day, 2.0),
                (base + 2 * day, 4.0), (base + 14 * day, 1.0)]
        acc, n = _fold_bucket_sums(rows, {}, 0)
        # buckets are calendar-aligned: base day 19723 -> bucket B,
        # +2d still B, +7d -> B+1, +14d -> B+2.  Sums: B: 12e6,
        # B+1: 2e6, B+2: 1e6.  Decayed at B+2:
        # (12e6>>2) + (2e6>>1) + 1e6 = 3e6 + 1e6 + 1e6 = 5e6
        last, total = _decayed_total(acc)
        assert (total, n) == (5_000_000, 4)
        assert last == ((base + 14 * day) // day) // 7

    def test_fold_order_independent_non_power_of_two(self):
        """The accumulation is a pure function of the event multiset:
        any arrival order (late data included) gives identical state —
        the invariant the progressive-shift fold broke for values
        whose bucket sums are not powers of two (shr(a+b,k) !=
        shr(a,k)+shr(b,k)): {1e-6 at t0, 1e-6 at t0+1h, 0 at t0+7d}
        must decay to 1 micro-unit regardless of which micro-batch
        the +1h event lands in."""
        import itertools

        from dystonse_gtfs_importer_spark.streaming.windows import (
            _decayed_total,
            _fold_bucket_sums,
        )

        day = 86400
        base = 1704067200  # day 19723, 4 days into its 7-day bucket
        rows = [(base, 1e-6), (base + 3600, 1e-6),
                (base + 7 * day, 0.0)]
        results = set()
        for perm in itertools.permutations(rows):
            # fold one event per "micro-batch" (worst-case cuts)
            acc, n = {}, 0
            for ev in perm:
                acc, n = _fold_bucket_sums([ev], acc, n)
            results.add(_decayed_total(acc) + (n,))
        assert len(results) == 1
        (last, total, n), = results
        assert total == 1 and n == 3  # (1+1) >> 1, not (1>>1)+(1>>1)

    def test_pre_1970_buckets_survive_state_roundtrip(self):
        """Negative calendar buckets are legitimate (pre-1970 event
        times) — the state schema stores the bucket map explicitly, so
        restoring a key whose newest bucket is negative must not
        re-anchor the decay (the old scalar state overloaded bucket<0
        as the 'no events yet' sentinel and silently discarded it)."""
        from dystonse_gtfs_importer_spark.streaming.windows import (
            _decayed_total,
            _fold_bucket_sums,
        )

        day = 86400
        t0 = -400 * day  # late 1968
        acc, n = _fold_bucket_sums([(t0, 4.0)], {}, 0)
        # state round-trip as the operator stores it: sorted arrays
        items = sorted(acc.items())
        restored = dict(zip([b for b, _ in items],
                            [v for _, v in items]))
        acc2, n2 = _fold_bucket_sums([(t0 + 7 * day, 1.0)], restored, n)
        last, total = _decayed_total(acc2)
        assert last == ((t0 + 7 * day) // day) // 7 < 0
        assert total == (4_000_000 >> 1) + 1_000_000 and n2 == 2
