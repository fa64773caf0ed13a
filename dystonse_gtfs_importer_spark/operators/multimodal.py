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


# ---------------------------------------------------------------------------
# Perceptual near-dup (round 5): average-hash over decoded pixels +
# banded hamming join — the media analog of the SimHash text path.
# ---------------------------------------------------------------------------

PHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("phash", LongType()),
])


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash: luma → 8×8 block means → bit i set when
    block i exceeds the global mean (strict >, ties → 0).  The
    classic aHash; a DCT pHash drops in by swapping the pooling for
    an 8×8 low-frequency DCT block — the banding and join below are
    hash-family agnostic.  Deterministic: pure integer/float numpy on
    decoded pixels, no RNG."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:                       # RGB(A) → luma
        a = a[..., 0] * 0.299 + a[..., 1] * 0.587 + a[..., 2] * 0.114
    h, w = a.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            blocks[r, c] = a[ys[r]:max(ys[r + 1], ys[r] + 1),
                             xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
    bits = (blocks > blocks.mean()).flatten()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # two's-complement into signed 64-bit: Spark LongType/Arrow int64
    # cannot carry bit 63 as a positive value; XOR/bit_count are
    # bit-pattern ops, so the banding and hamming math are unchanged
    return out - (1 << 64) if out & (1 << 63) else out


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """image rows → 64-bit average hash via the registered/stdlib image
    decoders (`media_codecs.decode_image` sniffs PNG vs JPEG).
    Undecodable payloads and non-image rows are dropped, matching
    `extract_features`' corrupt-row policy.  Map-only: payloads never
    leave the executors; output is 8 bytes per image."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codecs import decode_image

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.media_type != "image" or r.payload is None:
                    continue
                try:
                    img = decode_image(bytes(r.payload))
                    out.append({"media_id": r.media_id,
                                "phash": ahash64(img)})
                except Exception:
                    continue
            yield pd.DataFrame(
                out, columns=[f.name for f in PHASH_SCHEMA.fields])

    return media.mapInPandas(kernel, PHASH_SCHEMA)


def phash_near_dup(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs: hamming(phash_a, phash_b) <=
    ``max_hamming``, found via 4×16-bit banding — a pair within
    hamming 3 differs in at most 3 bands, so by pigeonhole at least
    one band matches exactly (lossless, the SimHash banding argument).
    Candidates scale with band-bucket occupancy, never |corpus|²; the
    verify step is JVM `bit_count(a ^ b)` inside the join projection.
    Returns (media_a, media_b, hamming) with media_a < media_b."""
    bands = F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("phash", 16 * i)
                  .bitwiseAND(F.lit(0xFFFF)).alias("val"))
        for i in range(4)]))
    b = (hashes.select("media_id", "phash", bands.alias("b"))
         .select("media_id", "phash", "b.band", "b.val"))
    left = b.alias("l")
    right = b.alias("r")
    ham = F.bit_count(F.col("l.phash").bitwiseXOR(F.col("r.phash")))
    return (left.join(right,
                      (F.col("l.band") == F.col("r.band"))
                      & (F.col("l.val") == F.col("r.val"))
                      & (F.col("l.media_id") < F.col("r.media_id")))
            .where(ham <= max_hamming)
            .select(F.col("l.media_id").alias("media_a"),
                    F.col("r.media_id").alias("media_b"),
                    ham.alias("hamming"))
            .distinct())
