"""Dedup-on-arrival for a streaming document feed: each micro-batch
is checked against the historical fingerprint store BEFORE it lands,
so the corpus never accumulates exact duplicates — the ingestion-time
counterpart of the batch `operators/dedup.py` family, structured the
way a 100 TB pipeline has to be:

* The corpus table itself IS the fingerprint store: every published
  document row carries its content fingerprint (64-bit seeded hash of
  the normalized text — the same `fingerprint_dedup` definition the
  batch oracle verifies), and the store "table" is the column-pruned
  projection of the corpus (parquet reads just the fingerprint
  column).  One table, so corpus and store can never disagree.
* Inside ``foreachBatch``: (1) within-batch dedup first (min doc_id
  per fingerprint wins — a batch can carry its own repeats), then
  (2) a LEFT ANTI join against the store drops documents seen in any
  earlier batch.  The anti join is fingerprint-keyed — at scale the
  store side is bucketed on fingerprint (`store.write_bucketed`) so
  the probe co-partitions without a fact-side shuffle, and a bloom
  filter of store fingerprints (`sketch_sql.q_bloom_membership`'s
  builder) can pre-drop the overwhelmingly-new majority before the
  join touches the store at all.
* Restart safety (exactly-once without a table format): the batch's
  survivors land in ONE write under ``ingest_batch=<id>`` with
  DYNAMIC partition overwrite.  A replay of batch N either finds its
  own fingerprints already in the store — the anti join empties the
  batch and the empty dynamic overwrite touches nothing — or
  re-derives the identical survivor set and overwrites its own
  partition with the same content.  Plain ``append`` here would
  duplicate documents on replay.

Round-8 note (measured on the 10 k-doc profile): the original
two-sink layout spent 5.4 s/run in the ``localCheckpoint`` that
shielded ``fresh`` from double computation, 1.4 s in the second
(fingerprint) write and 0.4 s in an ``isEmpty`` probe — 7 s of a
13.9 s run — while the store read + anti join cost 1.8 s.  Folding
the fingerprint column into the document write removes ALL of it:
one action per batch, no checkpoint, no empty-probe (an empty
dynamic overwrite is already a no-op), and the two-sink crash window
disappears instead of being handled.

Reference anchor: ingestion-time dedup is an LLM-pipeline extension
(SURVEY.md LLM ops); the micro-batch + foreachBatch merge structure
mirrors the GTFS-RT import stream (ST1/ST3,
streaming/import_stream.py).
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

FINGERPRINT_SEED = 0x5EED_D0C5


def doc_fingerprint(col: str = "text") -> F.Column:
    """64-bit content fingerprint of the normalized (lower, trimmed,
    whitespace-collapsed) text — matches the batch `fingerprint_dedup`
    normalization so batch and streaming agree on identity."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")
    return F.xxhash64(norm, F.lit(FINGERPRINT_SEED))


def dedup_batch(batch: DataFrame, store: DataFrame | None) -> DataFrame:
    """Pure batch logic, unit-testable without a stream: within-batch
    min-id-per-fingerprint, then anti join against the store.

    The within-batch step is ONE aggregation — ``min_by`` of the whole
    row struct keyed by doc_id (map-side partial, single exchange) —
    not the groupBy-then-join-back form, which costs a second exchange
    and a join per micro-batch for the same survivor set."""
    cols = batch.columns
    fp = batch.withColumn("fingerprint", doc_fingerprint())
    fresh = (fp.groupBy("fingerprint")
             .agg(F.min_by(F.struct(*cols), F.col("doc_id"))
                  .alias("_row"))
             .select("fingerprint", "_row.*"))
    if store is not None:
        fresh = fresh.join(store.select("fingerprint"),
                           ["fingerprint"], "left_anti")
    # restore the original column order (fingerprint last)
    return fresh.select(*cols, "fingerprint")


def read_fingerprint_store(spark: SparkSession,
                           out_dir: str) -> DataFrame | None:
    """The fingerprint store: the corpus table pruned to its
    fingerprint column (parquet reads one column)."""
    try:
        return (spark.read.parquet(str(Path(out_dir) / "documents"))
                .select("fingerprint"))
    except Exception:  # no corpus yet
        return None


def run_dedup_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
    blocklist: tuple[str, ...] | None = None,
):
    """File stream of JSON document batches → deduplicated parquet
    corpus carrying its fingerprint column (the store).  ONE action
    per micro-batch: optional blocklist screen (map-only gram join
    against the broadcast pattern set — ingest-time
    ``q_blocklist_filter``) + store read (column-pruned) + anti join
    + write.  Screening runs BEFORE dedup so blocked documents never
    enter the corpus or its fingerprint store; a later duplicate of a
    blocked document is screened again by the same patterns, so the
    published corpus is identical to batch-screening-then-dedup of
    the full feed.  Returns the streaming query (caller
    awaits/stops)."""
    docs_path = str(Path(out_dir) / "documents")

    schema = "doc_id LONG, text STRING, lang STRING, source STRING"
    stream = (spark.readStream.format("json")
              .schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .load(in_dir))

    def sink(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        if blocklist:
            from ..functions.blocklist_sql import apply_blocklist

            keep = (apply_blocklist(batch, blocklist)
                    .where(F.col("keep") == 1).select("doc_id"))
            batch = batch.join(keep, "doc_id", "left_semi")
        fresh = dedup_batch(batch, read_fingerprint_store(s, out_dir))
        # an empty survivor set writes no files under dynamic
        # overwrite, so no isEmpty probe (that would be a second
        # action recomputing the join)
        (fresh.withColumn("ingest_batch", F.lit(batch_id))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .parquet(docs_path))

    return (stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
