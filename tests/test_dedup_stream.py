"""Dedup-on-arrival stream: cross-batch and within-batch exact dedup
against a growing fingerprint store, with replay idempotency."""

from __future__ import annotations

import json
import time
from pathlib import Path

import pyspark.sql.functions as F


def _write_batch(d: Path, name: str, rows: list[dict]) -> None:
    (d / name).write_text("\n".join(json.dumps(r) for r in rows))


def _await(q, timeout=60):
    q.awaitTermination(timeout)


class TestDedupStream:
    def test_cross_batch_and_within_batch(self, spark, tmp_path):
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            run_dedup_stream,
        )

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        out = tmp_path / "out"
        ck = tmp_path / "ck"

        _write_batch(in_dir, "b0.json", [
            {"doc_id": 1, "text": "alpha beta gamma", "lang": "en",
             "source": "s1"},
            {"doc_id": 2, "text": "  ALPHA   beta GAMMA ", "lang": "en",
             "source": "s2"},     # same after normalization: dropped
            {"doc_id": 3, "text": "delta epsilon", "lang": "en",
             "source": "s1"},
        ])
        q = run_dedup_stream(spark, str(in_dir), str(out), str(ck))
        _await(q)

        docs = spark.read.parquet(str(out / "documents"))
        assert sorted(r.doc_id for r in docs.collect()) == [1, 3]

        # second run: one repeat of doc 1's text, one new doc
        _write_batch(in_dir, "b1.json", [
            {"doc_id": 10, "text": "alpha beta gamma", "lang": "de",
             "source": "s3"},     # cross-batch dup: dropped
            {"doc_id": 11, "text": "zeta eta", "lang": "en",
             "source": "s3"},
        ])
        q = run_dedup_stream(spark, str(in_dir), str(out), str(ck))
        _await(q)

        docs = spark.read.parquet(str(out / "documents"))
        assert sorted(r.doc_id for r in docs.collect()) == [1, 3, 11]
        # the corpus table IS the fingerprint store (one column read)
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            read_fingerprint_store,
        )

        fps = read_fingerprint_store(spark, str(out))
        assert fps.count() == 3
        assert fps.distinct().count() == 3

    def test_blocklist_screen_on_arrival(self, spark, tmp_path):
        """Blocked documents never land and never enter the
        fingerprint store: a later clean duplicate of a blocked doc's
        text is still publishable only if IT passes the screen."""
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            read_fingerprint_store,
            run_dedup_stream,
        )

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        out = tmp_path / "out"
        _write_batch(in_dir, "b0.json", [
            {"doc_id": 1, "text": "totally fine text", "lang": "en",
             "source": "s"},
            {"doc_id": 2, "text": "contains bad phrase here",
             "lang": "en", "source": "s"},   # screened out
            {"doc_id": 3, "text": "totally fine text", "lang": "en",
             "source": "s"},                 # dup of 1: deduped
        ])
        q = run_dedup_stream(spark, str(in_dir), str(out),
                             str(tmp_path / "ck"),
                             blocklist=("bad phrase",))
        _await(q)
        docs = spark.read.parquet(str(out / "documents"))
        assert sorted(r.doc_id for r in docs.collect()) == [1]
        # the blocked doc's fingerprint is NOT in the store
        assert read_fingerprint_store(spark, str(out)).count() == 1

    def test_batch_function_replay_idempotent(self, spark):
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            dedup_batch, doc_fingerprint,
        )

        batch = spark.createDataFrame(
            [(5, "same text here", "en", "s"),
             (6, "same  TEXT here ", "en", "s"),
             (7, "other", "en", "s")],
            "doc_id LONG, text STRING, lang STRING, source STRING")
        first = dedup_batch(batch, None)
        assert sorted(r.doc_id for r in first.collect()) == [5, 7]

        # replay with the store already containing this batch's
        # fingerprints: everything drops — nothing double-lands
        store = first.select("fingerprint")
        replay = dedup_batch(batch, store)
        assert replay.count() == 0

        # normalization contract matches the declared fingerprint
        got = {r.doc_id: r.fingerprint for r in first.collect()}
        ref = batch.where("doc_id = 5") \
                   .select(doc_fingerprint().alias("f")).first().f
        assert got[5] == ref
