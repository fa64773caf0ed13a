"""WebDataset-style tar-shard source for multimodal training data.

Large multimodal corpora ship as tar shards ("WebDataset"
convention): each shard is a plain tar whose members group into
SAMPLES by basename — ``000123.jpg`` + ``000123.json`` +
``000123.txt`` are one sample, the extension names the modality.
Training jobs stream shards, not files, because object stores and
schedulers handle 10⁵ × 1 GB tars far better than 10⁹ tiny objects.

Spark-first shape, mirroring the GTFS-RT zip handling
(``sources/gtfs_rt.py``): ``binaryFile`` scan (one row per shard,
whole-shard bytes on the executor) → iterator ``mapInPandas`` with
stdlib ``tarfile`` — payloads never visit the driver, parallelism =
shard count, zero shuffles for member extraction.  Sample assembly is
ONE groupBy on (shard, sample key) — the only shuffle, and it can be
skipped (`assemble=False`) when downstream wants the member stream.

A 100 TB corpus at 1 GB/shard is ~10⁵ rows into the scan —
trivially parallel; ``spark.sql.files.maxPartitionBytes`` does not
split binaryFile rows, so shard size IS the work-unit granularity
(the WebDataset authors' own guidance: size shards for your
scheduler).  Corrupt shards/members are accounted per row, never
dropped silently (the JSONL-ingest convention, sources/jsonl.py).
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEMBERS_SCHEMA = ("shard string, member string, sample_key string, "
                  "ext string, payload binary, n_bytes long, "
                  "error string")


def read_tar_members(spark: SparkSession, path: str,
                     glob: str = "*.tar") -> DataFrame:
    """One row per tar member: (shard, member, sample_key, ext,
    payload, n_bytes, error).  A shard that fails to parse yields ONE
    row with ``error`` set and NULL payload — corrupt inputs are
    visible in the output, not swallowed.  Directories and PAX/global
    header members are skipped.

    ``sample_key``/``ext`` follow the WebDataset split: the key is the
    member name up to the FIRST dot of its basename, the extension
    everything after it — so ``a/b/000123.seg.png`` groups with
    ``a/b/000123.json`` under key ``a/b/000123``.
    """
    import pandas as pd

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("shard", "member", "sample_key",
                                   "ext", "payload", "n_bytes", "error")}

            def emit(shard, member="", key=None, ext=None,
                     payload=None, err=None):
                out["shard"].append(shard)
                out["member"].append(member)
                out["sample_key"].append(key)
                out["ext"].append(ext)
                out["payload"].append(payload)
                out["n_bytes"].append(
                    len(payload) if payload is not None else 0)
                out["error"].append(err)

            for shard, content in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(
                            fileobj=io.BytesIO(content)) as tf:
                        for m in tf:
                            if not m.isfile():
                                continue
                            try:
                                payload = tf.extractfile(m).read()
                            except Exception as e:  # member-level rot
                                emit(shard, m.name,
                                     err=f"member: {e}")
                                continue
                            base = m.name.rsplit("/", 1)[-1]
                            dot = base.find(".")
                            if dot < 0:
                                key, ext = m.name, ""
                            else:
                                prefix = m.name[: len(m.name)
                                                - len(base)]
                                key = prefix + base[:dot]
                                ext = base[dot + 1:]
                            emit(shard, m.name, key, ext, payload)
                except Exception as e:  # shard-level rot
                    emit(shard, err=f"shard: {e}")
            yield pd.DataFrame(out)

    return files.mapInPandas(kernel, MEMBERS_SCHEMA)


def read_webdataset(spark: SparkSession, path: str,
                    glob: str = "*.tar") -> DataFrame:
    """Members assembled into samples: one row per (shard,
    sample_key) with an exts array and a parallel payloads array —
    the unit a multimodal pipeline feeds to decode/feature UDFs
    (operators/multimodal.py).  One shuffle (the sample groupBy);
    member order inside a sample is extension-sorted so downstream
    sees a deterministic layout regardless of tar order."""
    members = read_tar_members(spark, path, glob) \
        .where(F.col("error").isNull())
    paired = F.array_sort(F.collect_list(F.struct(
        F.col("ext"), F.col("payload"), F.col("n_bytes"))))
    return (members.groupBy("shard", "sample_key")
            .agg(paired.alias("parts"))
            .select("shard", "sample_key",
                    F.col("parts.ext").alias("exts"),
                    F.col("parts.payload").alias("payloads"),
                    F.aggregate("parts.n_bytes", F.lit(0).cast("long"),
                                lambda a, b: a + b).alias("n_bytes")))
