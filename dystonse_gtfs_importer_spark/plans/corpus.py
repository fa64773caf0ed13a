"""Corpus cleaning: the composite training-data pipeline.

Chains the beyond-reference operators into the standard pretraining
data flow: exact dedup → near-dup removal (MinHash/LSH candidates,
exact Jaccard confirm) → language ID → quality gating → token
accounting.  Everything is one DataFrame program; the only quadratic
step is confined to LSH candidate pairs.

Scale: exact dedup = one hash shuffle; LSH candidates scale with
duplicate density; annotation is map-only (whole-stage codegen'd
string expressions from functions.sql_shared).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import sql_shared as S
from ..operators.dedup import dedup_keep_canonical, minhash_lsh_pairs


def annotate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Map-only enrichment: predicted language, quality score, token
    count — all JVM-side expressions."""
    return (
        docs.withColumn("lang_pred", F.expr(S.lang_id(text_col)))
        .withColumn("quality", F.expr(S.quality_score(text_col, S.SPARK)))
        .withColumn("n_tokens", F.expr(S.token_count(text_col, S.SPARK)))
    )


def near_dup_ids(docs: DataFrame, est_threshold: float = 0.8) -> DataFrame:
    """doc_ids to drop as near-duplicates: LSH candidate pairs whose
    MinHash signature agreement >= threshold; the higher doc_id of a
    pair loses (min-id canonical, transitively safe because dropping
    is idempotent)."""
    pairs = minhash_lsh_pairs(docs)
    return (pairs.where(F.col("est_jaccard") >= est_threshold)
            .select(F.col("doc_b").alias("doc_id")).distinct())


def winnow_dup_ids(docs: DataFrame, min_shared: int = 8) -> DataFrame:
    """doc_ids to drop by winnowing-fingerprint overlap (shift-robust
    rolling-hash sketches — catches near-copies token-level MinHash
    misses, e.g. heavy boilerplate wrapping); higher id loses."""
    from ..operators.dedup import winnow_near_pairs

    pairs = winnow_near_pairs(docs, min_shared=min_shared)
    return pairs.select(F.col("doc_b").alias("doc_id")).distinct()


def embedding_dup_ids(docs: DataFrame, embeddings: DataFrame,
                      threshold: float = 0.92,
                      id_col: str = "doc_id") -> DataFrame:
    """doc_ids to drop by embedding-cosine near-duplication (semantic
    near-dups that share no surface text); higher id loses.
    ``embeddings`` carries (vec_id, embedding) with vec_id == doc_id."""
    from ..operators.similarity import cosine_near_dup

    pairs = cosine_near_dup(embeddings, threshold)
    return (pairs.join(F.broadcast(docs.select(F.col(id_col))),
                       pairs.vec_b == F.col(id_col), "left_semi")
            .select(F.col("vec_b").alias("doc_id")).distinct())


def clean_corpus(docs: DataFrame, lang: str | None = None,
                 min_quality: float = 0.2, min_tokens: int = 5,
                 near_dup_threshold: float = 0.8,
                 winnow_min_shared: int | None = None,
                 embeddings: DataFrame | None = None,
                 embedding_threshold: float = 0.92) -> DataFrame:
    """The full cleaning pass. Returns surviving documents with
    annotation columns; order of operations mirrors production
    pipelines (cheap exact dedup before quadratic-ish near-dup, then
    optional shift-robust winnowing and semantic embedding tiers)."""
    step1 = dedup_keep_canonical(docs)
    drops = near_dup_ids(step1, near_dup_threshold)
    if winnow_min_shared is not None:
        drops = drops.unionByName(
            winnow_dup_ids(step1, winnow_min_shared)).distinct()
    if embeddings is not None:
        drops = drops.unionByName(
            embedding_dup_ids(step1, embeddings,
                              embedding_threshold)).distinct()
    step2 = step1.join(drops, "doc_id", "left_anti")
    step3 = annotate(step2)
    cond = (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    if lang is not None:
        cond = cond & (F.col("lang_pred") == lang)
    return step3.where(cond)


def corpus_report(docs: DataFrame, cleaned: DataFrame) -> dict:
    """Summary statistics of a cleaning run (driver-sized scalars)."""
    n0, n1 = docs.count(), cleaned.count()
    agg = cleaned.agg(
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.sum("n_tokens").alias("total_tokens")).first()
    return {
        "input_docs": n0,
        "surviving_docs": n1,
        "removed": n0 - n1,
        "avg_quality": float(agg.avg_quality) if agg.avg_quality else None,
        "total_tokens": int(agg.total_tokens) if agg.total_tokens else 0,
    }
