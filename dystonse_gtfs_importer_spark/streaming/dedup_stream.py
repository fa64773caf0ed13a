"""Dedup-on-arrival for a streaming document feed: each micro-batch
is checked against the historical fingerprint store BEFORE it lands,
so the corpus never accumulates exact duplicates — the ingestion-time
counterpart of the batch `operators/dedup.py` family, structured the
way a 100 TB pipeline has to be:

* The fingerprint store is a plain-parquet table keyed by content
  fingerprint (64-bit seeded hash of the normalized text — the same
  `fingerprint_dedup` definition the batch oracle verifies).  It only
  ever GROWS by appends of already-deduplicated fingerprints.
* Inside ``foreachBatch``: (1) within-batch dedup first (min doc_id
  per fingerprint wins — a batch can carry its own repeats), then
  (2) a LEFT ANTI join against the store drops documents seen in any
  earlier batch.  The anti join is fingerprint-keyed — at scale the
  store side is bucketed on fingerprint (`store.write_bucketed`) so
  the probe co-partitions without a fact-side shuffle, and a bloom
  filter of store fingerprints (`sketch_sql.q_bloom_membership`'s
  builder) can pre-drop the overwhelmingly-new majority before the
  join touches the store at all.
* Restart safety (exactly-once without a table format): both sinks
  write ``ingest_batch=<id>`` partitions under DYNAMIC partition
  overwrite, documents before fingerprints.  A replay of batch N
  therefore either (a) finds its own fingerprints already in the
  store — the anti join empties the batch and nothing is rewritten —
  or (b) finds them absent (the crash hit between the two writes),
  re-derives the identical survivor set, and overwrites its own
  partitions with the same content.  Plain ``append`` here would
  duplicate documents on replay.

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
    min-id-per-fingerprint, then anti join against the store."""
    fp = batch.withColumn("fingerprint", doc_fingerprint())
    w = (fp.groupBy("fingerprint")
         .agg(F.min("doc_id").alias("keep_id")))
    fresh = (fp.join(w, ["fingerprint"])
             .where(F.col("doc_id") == F.col("keep_id"))
             .drop("keep_id"))
    if store is not None:
        fresh = fresh.join(store.select("fingerprint"),
                           ["fingerprint"], "left_anti")
    return fresh


def run_dedup_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
):
    """File stream of JSON document batches → deduplicated parquet
    corpus + growing fingerprint store.  Returns the streaming query
    (caller awaits/stops)."""
    out = Path(out_dir)
    docs_path = str(out / "documents")
    fp_path = str(out / "fingerprints")

    schema = "doc_id LONG, text STRING, lang STRING, source STRING"
    stream = (spark.readStream.format("json")
              .schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .load(in_dir))

    def sink(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            store = s.read.parquet(fp_path)
        except Exception:  # first batch: no store yet
            store = None
        fresh = dedup_batch(batch, store).localCheckpoint()
        if fresh.isEmpty():
            return
        (fresh.drop("fingerprint")
         .withColumn("ingest_batch", F.lit(batch_id))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .parquet(docs_path))
        (fresh.select("fingerprint")
         .withColumn("ingest_batch", F.lit(batch_id))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .parquet(fp_path))

    return (stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
