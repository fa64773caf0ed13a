"""JSONL document ingest — the line-delimited-JSON source a corpus
pipeline actually receives its raw documents in (crawl dumps, API
exports).  The reference ingests protobuf+CSV only; this extends the
source family (SURVEY §2.1) for the training-data tier.

Scale shape: ``spark.read.json`` with an EXPLICIT schema — schema
inference is a full extra pass over 100 TB, so the documents schema
is pinned and inference is opt-in for exploration only.  Malformed
lines land in ``_corrupt_record`` (PERMISSIVE mode) instead of
failing the job; callers split good from bad and account for both —
a dropped-on-the-floor decode error at petabyte scale is silent data
loss, so the bad count is part of the contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_JSONL_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
    StructField(CORRUPT_COL, StringType()),
])


def read_documents_jsonl(spark: SparkSession, path: str,
                         schema: StructType = DOCUMENTS_JSONL_SCHEMA
                         ) -> tuple[DataFrame, DataFrame]:
    """(good, bad): well-formed document rows, and the raw text of
    every malformed line (for quarantine/accounting).  ``n_chars`` is
    derived from ``text`` when the record omits it."""
    # NOT spark.read.json: its internal corrupt column may not be the
    # only referenced column of a scan, and Catalyst's column pruning
    # reduces both `good.count()` (filter column only) and any
    # bad-side projection to exactly that shape — the documented
    # workaround caches the whole ingest, a non-starter at corpus
    # scale.  A text scan + from_json parses identically (same
    # PERMISSIVE + corrupt-record semantics, options below) with no
    # such restriction, stays whole-stage-codegen'd, and splits
    # good/bad from one pass.
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value", schema,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": CORRUPT_COL}).alias("_p"))
    good = (parsed.where(F.col(f"_p.{CORRUPT_COL}").isNull())
            .select("_p.*").drop(CORRUPT_COL)
            .withColumn("n_chars", F.coalesce(
                F.col("n_chars"), F.length("text").cast("long"))))
    bad = (parsed.where(F.col(f"_p.{CORRUPT_COL}").isNotNull())
           .select(F.col("value").alias("raw_line")))
    return good, bad
