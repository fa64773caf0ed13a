"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

Decoding: ``media_codecs.install_stdlib_decoders()`` registers REAL
pure-stdlib PNG (zlib inflate + unfilter) and WAV (struct PCM)
decoders — no image/audio libraries needed; ``register_decoder``
swaps in PIL/librosa-backed callables where those exist.  With no
decoder registered a deterministic fake keeps every Spark-side
contract — schema, batching, partitioning, null handling — testable.
At 100 TB the shape is what matters: binary payloads never reach the
driver, never join as keys, and flow through ``mapInPandas``
(iterator form → constant memory per batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),     # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),         # typed metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", LongType()),
    StructField("content_hash", StringType()),
])

Decoder = Callable[[bytes, str], np.ndarray]

_DECODERS: dict[str, Decoder] = {}


def register_decoder(media_type: str, decoder: Decoder) -> None:
    """Install a real decoder (e.g. PIL/librosa-backed) for a media
    type; overrides the deterministic fake."""
    _DECODERS[media_type] = decoder


def _fake_decode(payload: bytes, media_type: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: features
    derive from a SHA-256 of the payload, so tests get stable,
    content-sensitive vectors.  Raises for empty payloads the way a
    real decoder raises for corrupt media."""
    if not payload:
        raise NotImplementedError(
            "real media decoding requires an image/audio library; "
            "register one via register_decoder()")
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw / np.float64(2 ** 32)).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16,
                     batch_hint: int | None = None) -> DataFrame:
    """media rows → feature vectors via mapInPandas (iterator form:
    one Arrow batch in memory at a time regardless of partition size).
    Corrupt/undecodable payloads are dropped, not fatal — the
    reference's failed-file lifecycle applied per row."""

    # snapshot the registry into the closure: a module-global lookup
    # inside the kernel would resolve against a FRESH (empty) module
    # import on the executor's Python worker — driver-side
    # register_decoder() calls must ship by value with the task
    decoders = dict(_DECODERS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                decoder = decoders.get(r.media_type)
                try:
                    vec = (decoder(payload, r.media_type) if decoder
                           else _fake_decode(payload, r.media_type, dim))
                except Exception:
                    continue
                out.append({
                    "media_id": r.media_id,
                    "media_type": r.media_type,
                    "feature": vec.tolist(),
                    "n_bytes": len(payload),
                    "content_hash": hashlib.md5(payload).hexdigest(),
                })
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: PNG payloads are REALLY decoded (stdlib zlib
    inflate + unfilter, operators/media_codecs.py), nearest-neighbor
    resampled, and re-encoded inside the batched kernel; payloads the
    stdlib codec can't read (e.g. JPEG without PIL in the container)
    pass through with only the typed metadata rewritten — same
    per-row-tolerant lifecycle as ``extract_features``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codecs as MC

        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "image"].copy()
            payloads = []
            for p in pdf["payload"]:
                raw = bytes(p) if p is not None else None
                try:
                    img = MC.decode_png(raw)
                    raw = MC.encode_png(
                        MC.resize_nearest(img, width, height))
                except Exception:
                    pass  # non-PNG or corrupt: metadata-only rewrite
                payloads.append(raw)
            pdf["payload"] = payloads
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset —
    the UDTF-shaped explode of a multimodal pipeline.  Frame payload
    extraction is the stubbed step; offsets and fan-out are real."""
    frames = media.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))).alias("frame_ms"),
        "payload",
    )
    # STUB: payload of the sampled frame = source payload marker
    return frames.withColumn("frame_payload", F.col("payload")).drop("payload")


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact multimodal dedup on content hash — same shape as document
    exact dedup (hash groupBy, min-id canonical)."""
    return (features.groupBy("content_hash")
            .agg(F.min("media_id").alias("canonical_media"),
                 F.count("*").alias("n_copies")))
