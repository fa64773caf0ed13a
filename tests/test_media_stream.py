"""Streaming perceptual (media) dedup ingest: greedy-on-arrival
semantics, stream==batch equality, the store screen across batches,
undecodable singletons, and resume-safe partition offsets."""

from __future__ import annotations

import time

import numpy as np
import pytest

from dystonse_gtfs_importer_spark.operators import perceptual as P
from dystonse_gtfs_importer_spark.operators.media_codecs import encode_png
from dystonse_gtfs_importer_spark.streaming.media_stream import (
    media_dedup_batch,
    read_media_store,
    run_media_dedup_stream,
)


def _png(vec_id: int, edit: int = 0) -> bytearray:
    grid = P.synth_grid(vec_id).copy()
    if edit:
        grid[0, 0] = (int(grid[0, 0]) + 128) % 256
    return bytearray(encode_png(grid))


def _write_media_file(spark, path, rows):
    """One REAL parquet file (not a Spark output directory) — the
    file-stream source lists files, so each batch is a single file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "media_id": pa.array([int(m) for m, _ in rows],
                             type=pa.int64()),
        "payload": pa.array([bytes(p) for _, p in rows],
                            type=pa.binary()),
    })
    pq.write_table(table, str(path))


def _await(q, timeout=300):
    q.awaitTermination(timeout)
    if q.isActive:
        q.stop()


class TestMediaStream:
    def test_cross_batch_near_dup_dropped(self, spark, tmp_path):
        """A later batch's near-duplicate of a published medium is
        screened by the store; unrelated media publish."""
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        _write_media_file(spark, in_dir / "b0.parquet",
                          [(1, _png(2)), (2, _png(40))])
        time.sleep(0.01)
        _write_media_file(spark, in_dir / "b1.parquet",
                          [(3, _png(2, edit=1)),    # near-dup of 1
                           (4, _png(80))])          # fresh
        q = run_media_dedup_stream(spark, str(in_dir),
                                   str(tmp_path / "out"),
                                   str(tmp_path / "ck"),
                                   max_files_per_trigger=1)
        _await(q)
        corpus = spark.read.parquet(str(tmp_path / "out" / "media"))
        assert sorted(r.media_id for r in corpus.collect()) == [1, 2, 4]

    def test_within_batch_greedy_min_id(self, spark, tmp_path):
        """Inside one batch the minimum id of a near-dup chain
        survives (greedy ascending, same rule as the text sweep)."""
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        _write_media_file(spark, in_dir / "b0.parquet",
                          [(5, _png(6)), (9, _png(6, edit=1)),
                           (7, _png(6))])
        q = run_media_dedup_stream(spark, str(in_dir),
                                   str(tmp_path / "out"),
                                   str(tmp_path / "ck"))
        _await(q)
        corpus = spark.read.parquet(str(tmp_path / "out" / "media"))
        assert sorted(r.media_id for r in corpus.collect()) == [5]

    def test_stream_equals_batch_twin(self, spark, tmp_path):
        """Feeding the files through media_dedup_batch one at a time
        (growing store) publishes the identical corpus — the
        stream==batch equality anchor."""
        files = [
            [(1, _png(2)), (2, _png(2, edit=1)), (3, _png(40))],
            [(4, _png(2)), (5, _png(90))],
            [(6, _png(90, edit=1)), (7, _png(120))],
        ]
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        for i, rows in enumerate(files):
            _write_media_file(spark, in_dir / f"b{i}.parquet", rows)
            time.sleep(0.01)
        q = run_media_dedup_stream(spark, str(in_dir),
                                   str(tmp_path / "out"),
                                   str(tmp_path / "ck"),
                                   max_files_per_trigger=1)
        _await(q)
        streamed = sorted(
            r.media_id for r in spark.read.parquet(
                str(tmp_path / "out" / "media")).collect())

        kept: list[int] = []
        store = None
        out2 = tmp_path / "batch_out"
        for i, rows in enumerate(files):
            batch = spark.createDataFrame(
                rows, "media_id long, payload binary")
            surv = media_dedup_batch(batch, store)
            (surv.withColumn("ingest_batch", __import__(
                "pyspark.sql.functions", fromlist=["lit"]).lit(i))
             .write.mode("append").partitionBy("ingest_batch")
             .parquet(str(out2 / "media")))
            store = read_media_store(spark, str(out2))
            kept = sorted(r.media_id for r in spark.read.parquet(
                str(out2 / "media")).collect())
        assert streamed == kept

    def test_undecodable_payload_publishes_as_singleton(
            self, spark, tmp_path):
        """A payload that fails to decode has a NULL dhash: it never
        blocks anything and publishes as a singleton keeper (the
        uniform keeper rule)."""
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        _write_media_file(spark, in_dir / "b0.parquet",
                          [(1, bytearray(b"not an image")),
                           (2, _png(8))])
        q = run_media_dedup_stream(spark, str(in_dir),
                                   str(tmp_path / "out"),
                                   str(tmp_path / "ck"))
        _await(q)
        corpus = spark.read.parquet(str(tmp_path / "out" / "media"))
        rows = {r.media_id: r for r in corpus.collect()}
        assert sorted(rows) == [1, 2]
        assert rows[1].dhash is None

    def test_fresh_checkpoint_resume_offsets_partitions(
            self, spark, tmp_path):
        """A FRESH checkpoint over an existing corpus starts its
        partition ids one past max(ingest_batch) — the first dynamic
        overwrite must not clobber partition 0."""
        in1 = tmp_path / "in1"
        in1.mkdir()
        _write_media_file(spark, in1 / "b0.parquet", [(1, _png(2))])
        out = tmp_path / "out"
        q = run_media_dedup_stream(spark, str(in1), str(out),
                                   str(tmp_path / "ck1"))
        _await(q)

        in2 = tmp_path / "in2"
        in2.mkdir()
        _write_media_file(spark, in2 / "b0.parquet", [(9, _png(80))])
        q = run_media_dedup_stream(spark, str(in2), str(out),
                                   str(tmp_path / "ck2"))
        _await(q)
        corpus = spark.read.parquet(str(out / "media"))
        got = sorted((r.media_id, r.ingest_batch)
                     for r in corpus.collect())
        assert got == [(1, 0), (9, 1)]

    def test_store_screen_is_map_only_over_store(self, spark, tmp_path):
        """Plan pin: the store side of the screen carries no Exchange
        — batch keys broadcast, the store streams map-only."""
        from dystonse_gtfs_importer_spark.streaming.media_stream import (
            _store_hits,
            annotate_media_batch,
        )

        store_rows = [(1, _png(2)), (2, _png(40))]
        media_path = tmp_path / "store_media"
        based_store = annotate_media_batch(spark.createDataFrame(
            store_rows, "media_id long, payload binary"))
        based_store.write.parquet(str(media_path / "media"))
        store = read_media_store(spark, str(media_path))
        batch = annotate_media_batch(spark.createDataFrame(
            [(3, _png(2, edit=1))], "media_id long, payload binary"))
        plan = _store_hits(batch, store)._jdf.queryExecution() \
            .executedPlan().toString()
        # only batch-sized exchanges: the broadcast-build distinct on
        # (band, bv) and the final distinct on media_id.  The store
        # subtree is FileScan -> Generate -> joins, never
        # hash-repartitioned.
        ex = [ln for ln in plan.splitlines()
              if "Exchange hashpartitioning" in ln]
        assert len(ex) == 2
        assert any("band" in ln for ln in ex)
        assert any("media_id" in ln for ln in ex)
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


class TestMediaIngestCli:
    def test_media_ingest_end_to_end(self, spark, tmp_path, capsys):
        """`corpus media-ingest`: two batch files, the cross-batch
        near-dup screened, one accounting line."""
        import json as _json

        from dystonse_gtfs_importer_spark.cli import main

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        _write_media_file(spark, in_dir / "b0.parquet",
                          [(1, _png(2)), (2, _png(40))])
        time.sleep(0.01)
        _write_media_file(spark, in_dir / "b1.parquet",
                          [(3, _png(2, edit=1))])
        rc = main(["-s", "x", "--dir", str(tmp_path), "corpus",
                   "media-ingest", "--in", str(in_dir),
                   "--out", str(tmp_path / "mc"),
                   "--max-files-per-trigger", "1"],
                  spark=spark)
        assert rc == 0
        acct = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert acct["corpus_media"] == 2
        corpus = spark.read.parquet(str(tmp_path / "mc" / "media"))
        assert sorted(r.media_id for r in corpus.collect()) == [1, 2]
