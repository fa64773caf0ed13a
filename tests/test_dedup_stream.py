"""Dedup-on-arrival stream: cross-batch and within-batch exact dedup
against a growing fingerprint store, with replay idempotency."""

from __future__ import annotations

import json
import time
from pathlib import Path

import pyspark.sql.functions as F


_MTIME_SEQ = [0]


def _write_batch(d: Path, name: str, rows: list[dict]) -> None:
    """Write a feed file with a strictly increasing mtime: Spark's
    file stream orders by modification time, so same-millisecond
    writes would be consumed in ARBITRARY order — the equality tests
    need arrival order = write order."""
    import os

    p = d / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    _MTIME_SEQ[0] += 10
    t = time.time() + _MTIME_SEQ[0]
    os.utime(p, (t, t))


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
            band_cols, dedup_batch, doc_fingerprint,
        )

        batch = spark.createDataFrame(
            [(5, "same text here", "en", "s"),
             (6, "same  TEXT here ", "en", "s"),
             (7, "other", "en", "s")],
            "doc_id LONG, text STRING, lang STRING, source STRING")
        first = dedup_batch(batch, None)
        assert sorted(r.doc_id for r in first.collect()) == [5, 7]

        # replay with the store already containing this batch's
        # fingerprints + bands: everything drops — nothing double-lands
        store = first.select("fingerprint", *band_cols())
        replay = dedup_batch(batch, store)
        assert replay.count() == 0

        # normalization contract matches the declared fingerprint
        got = {r.doc_id: r.fingerprint for r in first.collect()}
        ref = batch.where("doc_id = 5") \
                   .select(doc_fingerprint().alias("f")).first().f
        assert got[5] == ref


def _greedy_expected(spark, rows: list[dict]) -> list[int]:
    """Independent batch reference: the greedy-by-doc_id sweep of the
    full feed's `q_minhash_lsh_pairs` candidate graph — a document is
    kept iff it shares no LSH band with a smaller-id KEPT document.
    This is the published near-dup keeper rule the stream must equal
    when doc_ids are monotone with arrival order."""
    from dystonse_gtfs_importer_spark.functions import sql_shared as S
    from dystonse_gtfs_importer_spark.functions.dedup_sql import (
        q_minhash_lsh_pairs,
    )

    feed = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows],
        "doc_id LONG, text STRING")
    feed.createOrReplaceTempView("documents")
    pairs = spark.sql(q_minhash_lsh_pairs(S.SPARK)).collect()
    spark.catalog.dropTempView("documents")
    nbrs: dict[int, set[int]] = {}
    for p in pairs:
        lo, hi = min(p.doc_a, p.doc_b), max(p.doc_a, p.doc_b)
        nbrs.setdefault(hi, set()).add(lo)
    kept: list[int] = []
    for d in sorted(r["doc_id"] for r in rows):
        if not any(lo in kept for lo in nbrs.get(d, ())):
            kept.append(d)
    return kept


class TestNearDupStream:
    """Near-dup-on-arrival: the stream's published corpus equals the
    greedy batch dedup of the whole feed's MinHash-LSH candidate
    graph.  Each case runs MULTIPLE micro-batches through a SINGLE
    run_dedup_stream query (maxFilesPerTrigger=1), deliberately
    pinning the self-read-overwrite pattern (the sink reads
    documents/ as the store while dynamically overwriting it in the
    same action) so a Spark upgrade that tightens the overwrite
    guard fails here loudly."""

    # Deterministic MD5 band outcomes, probed once and pinned:
    # CHAIN_A ~ CHAIN_B (shared band), CHAIN_B ~ CHAIN_C, but
    # CHAIN_A and CHAIN_C share NO band — the chain case that
    # separates greedy (C kept: its only blocker B was dropped and
    # never published) from blocked-by-anyone semantics (C dropped).
    CHAIN_A = ("quick brown fox jumps over the0 lazy dog near river "
               "bank bank0")
    CHAIN_B = ("quick brown wolf0 jumps over the0 lazy cat0 near "
               "river bank bank0")
    CHAIN_C = ("slow0 brown wolf0 jumps under0 the0 lazy cat0 near "
               "river shore0 bank0")
    ALT = "completely different words about spark catalyst tungsten"

    def _rows(self) -> list[list[dict]]:
        def d(i, t):
            return {"doc_id": i, "text": t, "lang": "en", "source": "s"}

        b0 = [
            d(1, self.CHAIN_A),
            d(2, self.ALT + " engine shuffle exchange plan"),
            d(3, self.CHAIN_B),                       # near-dup of 1
            d(4, self.ALT.upper() +
              "  ENGINE shuffle   exchange plan"),    # exact dup of 2
        ]
        b1 = [
            d(10, self.CHAIN_C),                      # chain survivor
            d(11, "unrelated corpus of parquet files and arrow "
                  "batches streaming through executors tonight"),
            d(12, self.CHAIN_A),                      # exact dup of 1
        ]
        b2 = [
            d(20, b1[1]["text"].replace("arrow", "thrift")),  # near 11
            d(21, "final island of text with its own tokens "
                  "entirely alpha beta gamma delta"),
            d(22, "final island of text with its own tokens "
                  "entirely alpha beta gamma EPSILON"),  # near 21
        ]
        return [b0, b1, b2]

    def test_stream_equals_batch_greedy(self, spark, tmp_path):
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            run_dedup_stream,
        )

        batches = self._rows()
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        for i, rows in enumerate(batches):
            _write_batch(in_dir, f"b{i}.json", rows)
        out = tmp_path / "out"
        q = run_dedup_stream(spark, str(in_dir), str(out),
                             str(tmp_path / "ck"),
                             max_files_per_trigger=1)
        _await(q)

        all_rows = [r for b in batches for r in b]
        expected = _greedy_expected(spark, all_rows)
        docs = spark.read.parquet(str(out / "documents"))
        got = sorted(r.doc_id for r in docs.select("doc_id").collect())
        assert got == expected
        # the planted semantics actually fired: exact dups dropped,
        # near dups dropped (in-batch: 3, 22; cross-batch: 20), and
        # the chain survivor (near-dup of a DROPPED doc, not of any
        # kept doc) kept
        assert 4 not in got and 12 not in got        # exact dups
        assert 3 not in got and 22 not in got and 20 not in got
        assert 10 in got                             # chain survivor

        # published store is pairwise band-disjoint (greedy invariant)
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            band_cols,
        )

        bands = []
        for r in docs.select(*band_cols()).collect():
            bands.extend((i, v) for i, v in enumerate(r) if v is not None)
        assert len(bands) == len(set(bands))

    def test_replay_and_late_duplicate(self, spark, tmp_path):
        """Restarting the stream over new files keeps screening
        against the store (cross-run near-dup drop), and a replayed
        batch id re-lands identical content (dynamic overwrite)."""
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            run_dedup_stream,
        )

        batches = self._rows()
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        for i, rows in enumerate(batches):
            _write_batch(in_dir, f"b{i}.json", rows)
        out = tmp_path / "out"
        q = run_dedup_stream(spark, str(in_dir), str(out),
                             str(tmp_path / "ck"),
                             max_files_per_trigger=1)
        _await(q)
        before = sorted(
            r.doc_id for r in
            spark.read.parquet(str(out / "documents")).collect())

        # second run: one near-dup of a published doc (dropped), one
        # genuinely new doc (kept)
        _write_batch(in_dir, "b9.json", [
            {"doc_id": 30, "text": self.CHAIN_B,     # blocked by 1
             "lang": "en", "source": "s"},
            {"doc_id": 31, "text": "nothing like anything published "
                                   "before in this tiny corpus feed",
             "lang": "en", "source": "s"},
        ])
        q = run_dedup_stream(spark, str(in_dir), str(out),
                             str(tmp_path / "ck"),
                             max_files_per_trigger=1)
        _await(q)
        after = sorted(
            r.doc_id for r in
            spark.read.parquet(str(out / "documents")).collect())
        assert after == before + [31]


class TestBackfillStore:
    """`corpus backfill-bands` migration: a pre-round-9 corpus layout
    (documents without fingerprint/band columns) refuses to resume;
    after backfill_store the stream resumes with FULL exact+near-dup
    screening and publishes zero duplicates of the old corpus."""

    def _old_corpus(self, spark, out: Path) -> None:
        """Simulate a pre-round-8 output dir: documents partitioned by
        ingest_batch but carrying NO store columns."""
        rows = [
            (1, "alpha beta gamma delta epsilon", "en", "s", 0),
            (2, "totally different words entirely here now", "en", "s", 0),
            (3, "third document with its own tokens", "en", "s", 1),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, ingest_batch int")
        (df.write.mode("overwrite").partitionBy("ingest_batch")
         .parquet(str(out / "documents")))

    def test_backfill_then_resume_publishes_zero_duplicates(
            self, spark, tmp_path):
        import pytest as _pytest

        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            backfill_store,
            band_cols,
            read_fingerprint_store,
            run_dedup_stream,
        )

        out = tmp_path / "out"
        out.mkdir()
        self._old_corpus(spark, out)
        # the old layout must refuse, pointing at the migration
        with _pytest.raises(ValueError, match="backfill"):
            read_fingerprint_store(spark, str(out), near_dup=True)

        acct = backfill_store(spark, str(out))
        assert acct["docs"] == 3
        assert set(acct["added"]) == {"fingerprint", *band_cols()}
        store = read_fingerprint_store(spark, str(out), near_dup=True)
        assert store.count() == 3
        # partition layout survived the swap
        docs = spark.read.parquet(str(out / "documents"))
        assert {r.ingest_batch for r in
                docs.select("ingest_batch").collect()} == {0, 1}

        # resume: an exact dup of doc 1, a near dup of doc 2 (one
        # token off), and one genuinely new doc
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        _write_batch(in_dir, "b9.json", [
            {"doc_id": 10, "text": "alpha  beta gamma delta epsilon ",
             "lang": "en", "source": "s"},
            {"doc_id": 11,
             "text": "totally different words entirely here CHANGED",
             "lang": "en", "source": "s"},
            {"doc_id": 12, "text": "quarterly revenue summaries "
             "spanning seventeen regional markets overnight",
             "lang": "en", "source": "s"},
        ])
        q = run_dedup_stream(spark, str(in_dir), str(out),
                             str(tmp_path / "ck"), near_dup=True)
        _await(q)
        docs2 = spark.read.parquet(str(out / "documents"))
        got = sorted(r.doc_id for r in docs2.select("doc_id").collect())
        assert 10 not in got and 11 not in got     # exact + near dup
        assert got == [1, 2, 3, 12]                # old corpus intact
        # the fresh checkpoint's batch ids are OFFSET past the old
        # corpus's partitions: doc 12 landed in a NEW partition, it
        # did not dynamic-overwrite ingest_batch=0 (the round-10
        # resume footgun)
        new_part = [r.ingest_batch for r in docs2.collect()
                    if r.doc_id == 12][0]
        assert new_part >= 2

    def test_backfill_keeps_pre_migration_copy_by_default(
            self, spark, tmp_path):
        """The __pre_backfill sibling survives a verified swap (the
        only pre-migration state, kept until the operator confirms);
        keep_old=False removes it."""
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            backfill_store,
        )

        out = tmp_path / "out"
        out.mkdir()
        self._old_corpus(spark, out)
        acct = backfill_store(spark, str(out))
        old = out / "documents.__pre_backfill"
        assert acct["kept_old"] == str(old) and old.exists()
        # the kept copy is the ORIGINAL table (no store columns)
        pre = spark.read.parquet(str(old))
        assert "fingerprint" not in pre.columns and pre.count() == 3
        # second run with keep_old=False replaces the kept copy and
        # deletes it after its own verified swap
        acct2 = backfill_store(spark, str(out), keep_old=False)
        assert acct2["kept_old"] is None and not old.exists()

    def test_backfill_idempotent_and_partial(self, spark, tmp_path):
        """A round-8 layout (fingerprint, no bands) backfills the
        bands; re-running is a no-op refresh with identical content."""
        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            backfill_store,
            band_cols,
            doc_fingerprint,
        )

        out = tmp_path / "out"
        out.mkdir()
        rows = [(1, "alpha beta gamma", "en", "s"),
                (2, "other words here", "en", "s")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        ).withColumn("fingerprint", doc_fingerprint())
        df.write.mode("overwrite").parquet(str(out / "documents"))

        first = backfill_store(spark, str(out))
        assert first["had"] == ["fingerprint"]
        assert set(first["added"]) == set(band_cols())
        snap1 = sorted(map(tuple, spark.read.parquet(
            str(out / "documents")).collect()))
        second = backfill_store(spark, str(out))
        assert second["added"] == []
        snap2 = sorted(map(tuple, spark.read.parquet(
            str(out / "documents")).collect()))
        assert snap1 == snap2


class TestCheckpointGenerationOffset:
    """Batch-id offset rules: a checkpoint that already committed
    Spark offsets (a pre-round-10 generation, no ingest_offset.json)
    pins offset 0 so a crash-REPLAY keeps overwriting its own
    partition instead of publishing its documents twice; a genuinely
    fresh checkpoint against an existing corpus offsets past its
    partitions."""

    def test_crashed_first_write_probe_falls_back_to_fresh(
            self, spark, tmp_path):
        """A documents dir left with ONLY a _temporary staging subdir
        (crashed first write — no committed footers) has no readable
        schema; the start-time probe must treat it as no-committed-
        data (offset 0) instead of raising 'unable to infer schema',
        and the stream must then ingest normally."""
        import json as _json

        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            run_dedup_stream,
        )

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        out = tmp_path / "out"
        ck = tmp_path / "ck"
        staging = out / "documents" / "_temporary" / "0"
        staging.mkdir(parents=True)
        (staging / "part-stub").write_bytes(b"not parquet")
        _write_batch(in_dir, "b0.json", [
            {"doc_id": 1, "text": "alpha beta gamma delta",
             "lang": "en", "source": "s"},
        ])
        q = run_dedup_stream(spark, str(in_dir), str(out), str(ck))
        _await(q)
        if q.isActive:
            q.stop()
        assert _json.loads(
            (ck / "ingest_offset.json").read_text())["offset"] == 0
        docs = spark.read.parquet(str(out / "documents"))
        assert [r.doc_id for r in docs.collect()] == [1]

    def test_corrupt_committed_docs_fail_loud_not_offset_reset(
            self, spark, tmp_path):
        """A documents dir with COMMITTED-looking entries (names not
        starting with '_'/'.') that fail to read must PROPAGATE the
        read error at start-time, not map to 'no committed data': a
        silent offset-0 reset would let a later batch's dynamic
        partition overwrite clobber committed ingest_batch partitions
        and re-publish duplicates (round-12 ADVICE)."""
        import pytest

        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            run_dedup_stream,
        )

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        out = tmp_path / "out"
        ck = tmp_path / "ck"
        part = out / "documents" / "ingest_batch=0"
        part.mkdir(parents=True)
        (part / "part-0000.parquet").write_bytes(b"not parquet at all")
        _write_batch(in_dir, "b0.json", [
            {"doc_id": 1, "text": "alpha beta gamma delta",
             "lang": "en", "source": "s"},
        ])
        with pytest.raises(Exception):
            run_dedup_stream(spark, str(in_dir), str(out), str(ck))
        assert not (ck / "ingest_offset.json").exists()

    def test_legacy_checkpoint_replay_does_not_duplicate(
            self, spark, tmp_path):
        import json as _json
        import os
        import shutil

        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            run_dedup_stream,
        )

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        out = tmp_path / "out"
        ck = tmp_path / "ck"
        _write_batch(in_dir, "b0.json", [
            {"doc_id": 1, "text": "alpha beta gamma delta",
             "lang": "en", "source": "s"},
            {"doc_id": 2, "text": "unrelated words entirely here",
             "lang": "en", "source": "s"},
        ])
        q = run_dedup_stream(spark, str(in_dir), str(out), str(ck))
        _await(q)
        if q.isActive:
            q.stop()
        while q.isActive:
            time.sleep(0.2)
        before = sorted(map(tuple, spark.read.parquet(
            str(out / "documents")).select("doc_id", "ingest_batch")
            .collect()))

        # simulate a PRE-round-10 generation that crashed after the
        # batch's parquet write but before the checkpoint commit:
        # no ingest_offset.json, offsets/0 present, commits/0 gone
        os.remove(ck / "ingest_offset.json")
        # delete the commit AND its .crc sidecar: a stale Hadoop
        # checksum file makes the replayed commit's atomic create fail
        for c in (ck / "commits").iterdir():
            c.unlink()

        q = run_dedup_stream(spark, str(in_dir), str(out), str(ck))
        _await(q)
        if q.isActive:
            q.stop()
        # the probe pinned the legacy generation to offset 0...
        assert _json.loads(
            (ck / "ingest_offset.json").read_text())["offset"] == 0
        # ...so the replayed batch OVERWROTE its own partition:
        # identical corpus, no duplicates in a shifted partition
        after = sorted(map(tuple, spark.read.parquet(
            str(out / "documents")).select("doc_id", "ingest_batch")
            .collect()))
        assert after == before

    def test_fresh_checkpoint_offsets_past_corpus(self, spark, tmp_path):
        import json as _json

        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            annotate_batch,
            run_dedup_stream,
        )

        out = tmp_path / "out"
        out.mkdir()
        df = spark.createDataFrame(
            [(1, "alpha beta gamma", "en", "s", 0),
             (2, "other words here", "en", "s", 3)],
            "doc_id long, text string, lang string, source string, "
            "ingest_batch int")
        (annotate_batch(df, near_dup=True, exact_dedup=False)
         .write.mode("overwrite").partitionBy("ingest_batch")
         .parquet(str(out / "documents")))
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        ck = tmp_path / "ck2"
        q = run_dedup_stream(spark, str(in_dir), str(out), str(ck))
        _await(q, 30)
        if q.isActive:
            q.stop()
        assert _json.loads(
            (ck / "ingest_offset.json").read_text())["offset"] == 4

    def test_lost_sidecar_on_round10_checkpoint_refuses(
            self, spark, tmp_path):
        """A checkpoint with committed Spark offsets whose
        ingest_offset.json was lost, against a corpus holding
        partitions BEYOND those batches, must refuse loudly instead
        of pinning offset 0 (which could overwrite another
        generation's partitions)."""
        import pytest as _pytest

        from dystonse_gtfs_importer_spark.streaming.dedup_stream import (
            annotate_batch,
            run_dedup_stream,
        )

        out = tmp_path / "out"
        out.mkdir()
        df = spark.createDataFrame(
            [(1, "alpha beta gamma", "en", "s", 99)],
            "doc_id long, text string, lang string, source string, "
            "ingest_batch int")
        (annotate_batch(df, near_dup=True, exact_dedup=False)
         .write.mode("overwrite").partitionBy("ingest_batch")
         .parquet(str(out / "documents")))
        ck = tmp_path / "ck3"
        (ck / "offsets").mkdir(parents=True)
        (ck / "offsets" / "0").write_text("v1\n{}\n{\"logOffset\":0}")
        in_dir = tmp_path / "in3"
        in_dir.mkdir()
        with _pytest.raises(RuntimeError, match="ingest_offset"):
            run_dedup_stream(spark, str(in_dir), str(out), str(ck))
