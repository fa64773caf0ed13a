"""Benchmark decontamination + training-shard packing templates,
dialect-rendered (Spark runs them, DuckDB verifies them).

Two standard steps of a large-scale training-data pipeline that sit
between dedup/quality-gating and the tokenizer:

* ``q_decontaminate`` — flag training documents that share word
  n-grams with a held-out evaluation set (the GPT-3 / Llama style
  n-gram-overlap decontamination check).  The eval side is reduced to
  DISTINCT n-gram hashes, so at 100 TB the join is an inverted-index
  equi-join on the hash: eval sketches are tiny relative to the corpus
  (benchmarks are MBs, corpora are TBs) and broadcast; candidate
  volume scales with actual overlap, never |train| x |eval|.  The
  n-gram explode is map-only and partial-aggregated (DISTINCT per doc)
  before the join.
* ``q_token_shard_packing`` — assign documents to ~fixed-token-budget
  training shards, contiguously within each source partition.  The
  running token total is a window cumulative sum PARTITIONed by
  ``source``: on a cluster that is the two-phase distributed prefix
  sum (per-partition partials + offsets), never a single global
  ordering.  A doc's shard is the budget-bucket its starting offset
  falls in, so shards are deterministic, contiguous, and ~budget-sized
  regardless of how the scan is parallelized.
"""

from __future__ import annotations

from . import sql_shared as S

NGRAM_N = 5          # word n-gram length for the overlap check
EVAL_STRIDE = 50     # doc_id % stride == 0 -> held-out eval set
MIN_HITS = 3         # shared-ngram count that flags contamination
SHARD_TOKEN_BUDGET = 1000


def _word_ngram_cte(d: S.Dialect, n: int = NGRAM_N) -> str:
    """One row per (doc_id, md5-of-n-consecutive-tokens); documents
    shorter than n tokens produce no rows (guarded BEFORE the range
    explode — Spark's sequence(0, -1) would descend)."""
    return f"""
        toks AS (
            SELECT doc_id, {d.token_array('text')} AS ta FROM documents
        ),
        grams AS (
            SELECT doc_id, MD5({d.arr_slice_join('ta', 'i', n)}) AS h
            FROM (
                SELECT doc_id, ta,
                       {d.explode_range(f'{d.arr_len("ta")} - {n - 1}')} AS i
                FROM toks WHERE {d.arr_len('ta')} >= {n}
            ) g
        )
    """


def q_decontaminate(d: S.Dialect, n: int = NGRAM_N,
                    stride: int = EVAL_STRIDE,
                    min_hits: int = MIN_HITS) -> str:
    """Per training document: how many of its distinct word n-grams
    appear anywhere in the eval set, and the resulting contamination
    flag.  Training rows with zero overlap are kept (LEFT JOIN), so
    the output is the full training corpus annotation."""
    return f"""
        WITH {_word_ngram_cte(d, n)},
        eval_grams AS (
            SELECT DISTINCT h FROM grams WHERE doc_id % {stride} = 0
        ),
        train_grams AS (
            SELECT DISTINCT doc_id, h FROM grams
            WHERE doc_id % {stride} <> 0
        ),
        hits AS (
            SELECT t.doc_id, COUNT(*) AS n_shared
            FROM train_grams t JOIN eval_grams e ON t.h = e.h
            GROUP BY t.doc_id
        )
        SELECT doc.doc_id,
               CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_ngrams,
               CAST(CASE WHEN COALESCE(h.n_shared, 0) >= {min_hits}
                    THEN 1 ELSE 0 END AS INT) AS contaminated
        FROM documents doc
        LEFT JOIN hits h ON h.doc_id = doc.doc_id
        WHERE doc.doc_id % {stride} <> 0
    """


def q_token_shard_packing(d: S.Dialect,
                          budget: int = SHARD_TOKEN_BUDGET) -> str:
    """(doc_id, source, n_tokens, cum_tokens, shard_id): contiguous
    ~``budget``-token shards per source, shard = the budget-bucket of
    the document's starting token offset within its source."""
    return f"""
        WITH sized AS (
            SELECT doc_id, source,
                   CAST({d.arr_len(d.token_array('text'))} AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT doc_id, source, n_tokens,
                   CAST(SUM(n_tokens) OVER (PARTITION BY source
                        ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM sized
        )
        SELECT doc_id, source, n_tokens, cum_tokens,
               CAST(FLOOR((cum_tokens - n_tokens) / {budget}.0) AS BIGINT)
                   AS shard_id
        FROM packed
    """
