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
BP_NGRAM_N = 3       # boilerplate span length (tokens)
BP_MIN_DOCS = 5      # n-gram in >= this many docs -> boilerplate


def _word_ngram_cte(d: S.Dialect, n: int = NGRAM_N) -> str:
    """One row per (doc_id, md5-of-n-consecutive-tokens); documents
    shorter than n tokens produce no rows (guarded BEFORE the range
    explode — Spark's sequence(0, -1) would descend)."""
    return f"""
        toks AS (
            SELECT doc_id, {d.token_array('text')} AS ta FROM documents
        ),
        grams AS (
            SELECT doc_id, i, MD5({d.arr_slice_join('ta', 'i', n)}) AS h
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


def q_boilerplate_scrub(d: S.Dialect, n: int = BP_NGRAM_N,
                        min_docs: int = BP_MIN_DOCS) -> str:
    """Frequent-n-gram span removal (the Lee-et-al-style "remove
    repeated spans from the training corpus" step, word-level): any
    token covered by an n-gram that occurs in >= ``min_docs`` distinct
    documents is dropped; the survivors are re-joined in order.

    Scale shape: the frequent-gram table is a heavy-hitter set (tiny
    by construction — doc-frequency >= min_docs bounds it by
    |corpus|/min_docs, in practice sub-MB), so the gram->frequent join
    broadcasts; the position explode is map-only; the coverage
    anti-join and the ordered re-join are co-partitioned on doc_id —
    one doc-keyed shuffle end to end.
    """
    return f"""
        WITH {_word_ngram_cte(d, n)},
        freq AS (
            SELECT h FROM grams GROUP BY h
            HAVING COUNT(DISTINCT doc_id) >= {min_docs}
        ),
        cov AS (
            SELECT DISTINCT g.doc_id, g.i + s.j AS pos
            FROM grams g JOIN freq f ON g.h = f.h
            CROSS JOIN {d.series(n, 'j')} s
        ),
        toks_pos AS (
            SELECT doc_id, i AS pos, {d.arr_get('ta', 'i')} AS tok
            FROM (
                SELECT doc_id, ta, {d.explode_range(d.arr_len('ta'))} AS i
                FROM toks WHERE {d.arr_len('ta')} >= 1
            ) x
        ),
        kept AS (
            SELECT t.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   {d.arr_join(d.ordered_list('t.tok', 't.pos'))}
                       AS clean_text
            FROM toks_pos t
            LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
            WHERE c.pos IS NULL
            GROUP BY t.doc_id
        )
        SELECT t0.doc_id,
               CAST({d.arr_len('t0.ta')} AS BIGINT) AS n_tokens,
               CAST({d.arr_len('t0.ta')} - COALESCE(k.n_kept, 0) AS BIGINT)
                   AS n_removed,
               COALESCE(k.clean_text, '') AS clean_text
        FROM toks t0
        LEFT JOIN kept k ON k.doc_id = t0.doc_id
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


def q_token_shard_packing_scale(d: S.Dialect,
                                budget: int = SHARD_TOKEN_BUDGET,
                                id_bucket: int = 64) -> str:
    """Scale derivation of :func:`q_token_shard_packing` — identical
    output without a whole-source window: at 100 TB one source (a
    crawl) is most of the corpus, so ``PARTITION BY source`` running
    sums serialize terabytes through single window partitions.

    doc_id buckets of fixed width ``id_bucket`` are order-aligned with
    ``ORDER BY doc_id`` by construction, so the prefix sum decomposes
    into a within-(source, bucket) running sum plus per-bucket offsets
    from the tiny (source, bucket, token-sum) table — the numeric-sum
    analog of the rank trick in ``q_stratified_sample_scale``.
    Fixed-width id buckets assume roughly sequential document ids (how
    ingest assigns them); for arbitrary keys substitute the md5-prefix
    bucketing of the rank queries."""
    return f"""
        WITH sized AS (
            SELECT doc_id, source,
                   CAST({d.arr_len(d.token_array('text'))} AS BIGINT)
                       AS n_tokens,
                   CAST(FLOOR(doc_id / {id_bucket}) AS BIGINT) AS b
            FROM documents
        ),
        within AS (
            SELECT doc_id, source, n_tokens, b,
                   SUM(n_tokens) OVER (PARTITION BY source, b
                       ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_in_b
            FROM sized
        ),
        off AS (
            SELECT source, b,
                   COALESCE(SUM(SUM(n_tokens)) OVER (PARTITION BY source
                       ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS off
            FROM sized GROUP BY source, b
        )
        SELECT w.doc_id, w.source, w.n_tokens,
               CAST(o.off + w.cum_in_b AS BIGINT) AS cum_tokens,
               CAST(FLOOR((o.off + w.cum_in_b - w.n_tokens)
                    / {budget}.0) AS BIGINT) AS shard_id
        FROM within w JOIN off o ON w.source = o.source AND w.b = o.b
    """


SEQ_PACK_CTX = 64       # fixed training-sequence length (tokens)
SEQ_PACK_BAND = 64      # documents per packing band
SEQ_PACK_SEED = "pack1"  # seed of the banding position hash


def q_sequence_pack(d: S.Dialect, ctx: int = SEQ_PACK_CTX,
                    band_docs: int = SEQ_PACK_BAND) -> str:
    """Next-fit-decreasing training-sequence packer — the step that
    RECOVERS the padding budget :func:`q_packing_efficiency` measures:
    documents are packed whole into fixed-``ctx``-token sequences
    (oversize documents split into chained full chunks, the classic
    boundary-respecting packer of LLM data prep).

    Per document: its packing band, token count, the band-local
    sequence index and token offset where it starts, and how many
    sequences it spans (1 unless it was split).  Sequences are
    globally addressed as (band, start_seq).

    Algorithm (deterministic, hence cross-engine hashable): within a
    band, walk documents in (n_tokens DESC, doc_id ASC) order carrying
    (open_seq, fill); a document goes into the open sequence when it
    fits, else it starts at the next sequence — spanning
    ``ceil(n/ctx)`` of them when longer than ``ctx``.  Zero-token
    documents are excluded (nothing to pack).

    This template is the sequential REFERENCE derivation: a recursive
    CTE advancing one rank per step and carrying the (seq, fill)
    state.  The registered Spark side is
    ``operators/packing.pack_sequences`` — the same NFD walk run
    band-parallel (one shuffle on ``band``, one bounded Arrow batch
    per band), which the driver hash gate proves identical.

    Scale shape: bands are fixed-width doc_id ranges (the id-bucket
    trick of :func:`q_token_shard_packing_scale`), so parallelism is
    |corpus| / ``band_docs`` and NO state crosses bands — at 100 TB
    every band packs independently and the per-band walk touches
    ``band_docs`` rows.  Next-fit on a descending walk is a 2-approx
    of optimal bin count (and strictly <= the one-doc-per-sequence
    policy the planner prices, pinned in tests); the band locality
    trades a few more part-full sequences for unbounded parallelism.
    """
    div = d.intdiv
    return f"""
        WITH RECURSIVE {_sequence_pack_ctes(d, ctx, band_docs)}
        SELECT doc_id, band, n_tokens, start_seq, start_off,
               CAST({div('start_off + n_tokens - 1', str(ctx))} + 1
                    AS BIGINT) AS n_seqs_spanned
        FROM pack
    """


def _sized_ranked_ctes(d: S.Dialect, band_docs: int,
                       seed: str = SEQ_PACK_SEED) -> str:
    """Shared ``sized`` / ``ranked`` CTEs of the packer references:
    seeded-position banding + per-band (n_tokens DESC, doc_id) walk
    rank.  See :func:`_sequence_pack_ctes` for the banding contract."""
    div = d.intdiv
    h = f"MD5(CONCAT('{seed}#', CAST(doc_id AS STRING)))"
    pos = f"(ROW_NUMBER() OVER (ORDER BY {h}, doc_id) - 1)"
    return f"""sized AS (
            SELECT doc_id,
                   CAST({div(pos, str(band_docs))} AS BIGINT) AS band,
                   CAST({d.arr_len(d.token_array('text'))} AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, band, n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY band
                                      ORDER BY n_tokens DESC, doc_id) AS r
            FROM sized WHERE n_tokens > 0
        )"""


def _sequence_pack_ctes(d: S.Dialect, ctx: int, band_docs: int,
                        seed: str = SEQ_PACK_SEED) -> str:
    """Shared recursive CTE chain ``sized`` / ``ranked`` / ``pack``:
    the sequential NFD reference walk (see :func:`q_sequence_pack`).

    .. versionchanged:: round-9
       Bands are ``band_docs``-wide slices of the seeded-md5 DENSE
       position (the `q_seeded_shuffle` key), not raw
       ``doc_id DIV band_docs``: band population is now EXACTLY
       ``band_docs`` for any id distribution (sparse, hashed, or
       hot-clustered ids previously could pile one band arbitrarily
       high, unbounding the packer's per-band Arrow batch).  The
       oracle keeps the textbook global ROW_NUMBER; the Spark side
       derives the same position with the banded two-phase numbering
       and the driver hash gate proves them identical."""
    div, mod = d.intdiv, "%"
    return f"""{_sized_ranked_ctes(d, band_docs, seed)},
        pack AS (
            SELECT band, r, doc_id, n_tokens,
                   CAST(0 AS BIGINT) AS start_seq,
                   CAST(0 AS BIGINT) AS start_off,
                   CAST({div('n_tokens - 1', str(ctx))} AS BIGINT)
                       AS seq_after,
                   CAST(((n_tokens - 1) {mod} {ctx}) + 1 AS BIGINT)
                       AS fill_after
            FROM ranked WHERE r = 1
            UNION ALL
            SELECT x.band, x.r, x.doc_id, x.n_tokens,
                   CASE WHEN p.fill_after + x.n_tokens <= {ctx}
                        THEN p.seq_after ELSE p.seq_after + 1 END,
                   CASE WHEN p.fill_after + x.n_tokens <= {ctx}
                        THEN p.fill_after ELSE CAST(0 AS BIGINT) END,
                   CASE WHEN p.fill_after + x.n_tokens <= {ctx}
                        THEN p.seq_after
                        ELSE p.seq_after + 1
                             + {div('x.n_tokens - 1', str(ctx))} END,
                   CASE WHEN p.fill_after + x.n_tokens <= {ctx}
                        THEN p.fill_after + x.n_tokens
                        ELSE ((x.n_tokens - 1) {mod} {ctx}) + 1 END
            FROM pack p JOIN ranked x
              ON x.band = p.band AND x.r = p.r + 1
        )"""


def _chunk_contrib(ctx: int, spanned: str,
                   n_tokens: str = "n_tokens",
                   start_off: str = "start_off",
                   j: str = "j") -> str:
    """Tokens a placement contributes to spanned sequence ``j``: ctx
    for every spanned sequence except the last (remainder), the whole
    length for unsplit docs.  ONE definition shared by the fill and
    loss-mask references so the accounting cannot drift (the
    ``- start_off`` term is live only for unsplit docs, where it is
    offset by the spanned = 1 branch; the walks pin start_off = 0
    for any multi-span placement)."""
    return (f"CASE WHEN {j} < {spanned} - 1 THEN {ctx} "
            f"WHEN {spanned} = 1 THEN {n_tokens} "
            f"ELSE {n_tokens} - ({spanned} - 1) * {ctx} "
            f"- {start_off} END")


def q_sequence_fill(d: S.Dialect, ctx: int = SEQ_PACK_CTX,
                    band_docs: int = SEQ_PACK_BAND) -> str:
    """Per (band, sequence): documents touching it, fill tokens, and
    padding — the loader-facing occupancy table of the NFD packer
    (the number a training run actually pays for).  Derived by
    expanding each placement over the sequences it spans: a doc
    contributes ``ctx`` to every spanned sequence except the last,
    which gets the remainder; an unsplit doc contributes its whole
    length to its one sequence.

    The registered Spark side expands the OPERATOR's band-parallel
    placements (operators/packing.sequence_fill); this template is
    the sequential recursive-CTE reference — same independent-
    derivation pairing as ``sequence_pack``.  Invariants (also
    property-tested): 0 < fill <= ctx, pad = ctx - fill, per-band
    fill sums equal the band's token count."""
    div = d.intdiv
    spanned = f"({div('start_off + n_tokens - 1', str(ctx))} + 1)"
    return f"""
        WITH RECURSIVE {_sequence_pack_ctes(d, ctx, band_docs)},
        expanded AS (
            SELECT band, start_seq + j AS seq,
                   {_chunk_contrib(ctx, spanned)} AS contrib
            FROM (
                SELECT band, start_seq, start_off, n_tokens,
                       {d.explode_range(spanned)} AS j
                FROM pack
            ) x
        )
        SELECT band, CAST(seq AS BIGINT) AS seq,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(contrib) AS BIGINT) AS fill_tokens,
               CAST({ctx} - SUM(contrib) AS BIGINT) AS pad_tokens
        FROM expanded
        GROUP BY band, seq
    """


def q_sequence_emit(d: S.Dialect, ctx: int = SEQ_PACK_CTX,
                    band_docs: int = SEQ_PACK_BAND) -> str:
    """Materialized training sequences: per (band, seq) the actual
    token stream (kept tokens joined with spaces) plus boundary
    metadata ``doc_id:offset:len`` per chunk — what a training loader
    reads after the packer decides placement.  Chunk j of a placement
    covers doc tokens [j*ctx, j*ctx + chunk_len) and sits at in-seq
    offset start_off for j = 0 (an unsplit doc) or 0 (a split chunk
    owns its sequence's start).

    The registered Spark side composes the band-parallel operator
    placements with a JVM-side slice/sort emission
    (operators/packing.emit_sequences); this recursive-CTE template
    is the sequential reference.  The slice length is an EXPRESSION
    (both engines' slice functions accept one; the arr_slice_join
    dialect helper is rendered with expression strings here)."""
    div = d.intdiv
    spanned = f"({div('start_off + n_tokens - 1', str(ctx))} + 1)"
    chunk_len = (f"CASE WHEN j < {spanned} - 1 THEN {ctx} "
                 f"WHEN {spanned} = 1 THEN n_tokens "
                 f"ELSE n_tokens - ({spanned} - 1) * {ctx} END")
    return f"""
        WITH RECURSIVE {_sequence_pack_ctes(d, ctx, band_docs)},
        ta AS (
            SELECT doc_id, {d.token_array('text')} AS ta FROM documents
        ),
        chunks AS (
            SELECT band, start_seq + j AS seq, doc_id,
                   CASE WHEN j = 0 THEN start_off ELSE 0 END AS off,
                   CAST({chunk_len} AS BIGINT) AS chunk_len,
                   {d.arr_slice_join('ta', f'j * {ctx}', chunk_len)}
                       AS chunk_text
            FROM (
                SELECT p.band, p.start_seq, p.start_off, p.n_tokens,
                       p.doc_id, t.ta,
                       {d.explode_range(spanned)} AS j
                FROM pack p JOIN ta t ON t.doc_id = p.doc_id
            ) x
        )
        SELECT band, CAST(seq AS BIGINT) AS seq,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(chunk_len) AS BIGINT) AS fill_tokens,
               {d.arr_join(d.ordered_list('chunk_text', 'off'))}
                   AS seq_text,
               {d.ordered_list_csv(
                   "CONCAT(CAST(doc_id AS STRING), ':', "
                   "CAST(off AS STRING), ':', "
                   "CAST(chunk_len AS STRING))", 'off', ';')} AS spans
        FROM chunks
        GROUP BY band, seq
    """


FFD_MAX_OPEN = 16   # bounded open-bin list of the FFD packer


def q_sequence_pack_ffd(d: S.Dialect, ctx: int = SEQ_PACK_CTX,
                        band_docs: int = SEQ_PACK_BAND,
                        max_open: int = FFD_MAX_OPEN,
                        seed: str = SEQ_PACK_SEED) -> str:
    """First-fit-decreasing packer with a BOUNDED open-bin list —
    the padding-recovering sibling of :func:`q_sequence_pack`: NFD
    keeps exactly one sequence open, so a near-full sequence closes
    the moment one document misses; FFD keeps up to ``max_open``
    sequences open and places each document into the LOWEST-numbered
    open sequence it fits, recovering strictly more padding on real
    size mixes at identical determinism (same (n_tokens DESC,
    doc_id) walk, integer-only state, seeded-position bands).

    Bin-list rule: a new sequence opens only when the document fits
    no open sequence (oversize documents chain ``ceil(n/ctx)``
    dedicated sequences, the last staying open); when the list would
    exceed ``max_open``, the FULLEST open sequence closes (first of
    the fullest on ties — it is the least likely to fit any later,
    smaller document).  Bounding the list is what keeps the per-band
    walk O(band_docs x max_open) at 100 TB.

    This template is the sequential REFERENCE derivation: a DuckDB
    recursive CTE advancing one rank per step, carrying the open-bin
    state as parallel (seqs, fills) LIST columns — list_position of
    a fits-flag transform finds the first-fit index, list slicing
    rewrites the chosen bin.  The registered Spark side is
    ``operators/packing.pack_sequences_ffd`` (band-parallel Arrow
    walk); the driver hash gate proves them identical.  The list
    functions are the DuckDB leg only — Spark never runs this
    template."""
    div, mod = d.intdiv, "%"
    nspans0 = f"CAST({div('n_tokens - 1', str(ctx))} + 1 AS BIGINT)"
    rem0 = f"CAST(((n_tokens - 1) {mod} {ctx}) + 1 AS BIGINT)"
    return f"""
        WITH RECURSIVE {_sized_ranked_ctes(d, band_docs, seed)},
        packf AS (
            SELECT band, r, doc_id, n_tokens,
                   CAST(0 AS BIGINT) AS start_seq,
                   CAST(0 AS BIGINT) AS start_off,
                   {nspans0} AS n_seqs_spanned,
                   [{nspans0} - 1] AS seqs,
                   [{rem0}] AS fills,
                   {nspans0} AS next_seq
            FROM ranked WHERE r = 1
            UNION ALL
            SELECT band, r, doc_id, n_tokens,
                   CASE WHEN idx > 0 THEN seqs[idx] ELSE next_seq END,
                   CASE WHEN idx > 0 THEN fills[idx]
                        ELSE CAST(0 AS BIGINT) END,
                   CASE WHEN idx > 0 THEN CAST(1 AS BIGINT)
                        ELSE nspans END,
                   CASE WHEN idx > 0 THEN seqs
                        WHEN ci > 0 THEN list_concat(
                            seqs1[1:ci-1], seqs1[ci+1:])
                        ELSE seqs1 END,
                   CASE WHEN idx > 0 THEN list_concat(list_concat(
                            fills[1:idx-1], [fills[idx] + n_tokens]),
                            fills[idx+1:])
                        WHEN ci > 0 THEN list_concat(
                            fills1[1:ci-1], fills1[ci+1:])
                        ELSE fills1 END,
                   CASE WHEN idx > 0 THEN next_seq
                        ELSE next_seq + nspans END
            FROM (
                SELECT s.*,
                       CASE WHEN s.idx = 0
                                 AND len(s.fills1) > {max_open}
                            THEN list_position(s.fills1,
                                               list_max(s.fills1))
                            ELSE 0 END AS ci
                FROM (
                    SELECT x.band, x.r, x.doc_id, x.n_tokens,
                           p.seqs, p.fills, p.next_seq,
                           COALESCE(list_position(list_transform(
                               p.fills, f -> CASE WHEN f + x.n_tokens
                                   <= {ctx} THEN 1 ELSE 0 END), 1), 0)
                               AS idx,
                           CAST({div('x.n_tokens - 1', str(ctx))} + 1
                               AS BIGINT) AS nspans,
                           list_concat(p.seqs, [p.next_seq
                               + CAST({div('x.n_tokens - 1', str(ctx))}
                                      AS BIGINT)]) AS seqs1,
                           list_concat(p.fills,
                               [CAST(((x.n_tokens - 1) {mod} {ctx}) + 1
                                     AS BIGINT)]) AS fills1
                    FROM packf p JOIN ranked x
                      ON x.band = p.band AND x.r = p.r + 1
                ) s
            ) s2
        )
        SELECT doc_id, band, n_tokens, start_seq, start_off,
               n_seqs_spanned
        FROM packf
    """


def q_shard_manifest_oracle(d: S.Dialect, shard_tokens: int = 2000,
                            seed: str = "shuf1") -> str:
    """Sequential reference for the ``prepare_shards`` manifest table
    (plans/corpus.shard_assignments + shard_stats): global seeded-md5
    ROW_NUMBER positions, one global running token sum, shard =
    budget-bucket of the starting offset, per-shard doc/token counts
    and the commutative 32-bit-md5-prefix content fingerprint.

    The registered Spark side computes the same table with the banded
    two-phase prefix sums (never a corpus-wide window); the hash match
    proves the distributed composition equals this textbook form."""
    fp = d.hex_to_bigint(
        "SUBSTRING(MD5(CONCAT(CAST(doc_id AS STRING), '#', text)), 1, 8)")
    return f"""
        WITH pos AS (
            SELECT doc_id, text,
                   ROW_NUMBER() OVER (
                       ORDER BY MD5(CONCAT('{seed}#',
                                    CAST(doc_id AS STRING))), doc_id)
                       - 1 AS position,
                   CAST({d.arr_len(d.token_array('text'))} AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, text, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY position
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM pos
        )
        SELECT CAST({d.intdiv('cum_tokens - n_tokens',
                              str(shard_tokens))} AS BIGINT) AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM({fp}) AS BIGINT) AS content_fp
        FROM cum
        GROUP BY 1
    """


PACKING_CONTEXTS = (512, 2048, 8192)


def q_packing_efficiency(d: S.Dialect,
                         contexts: tuple[int, ...] = PACKING_CONTEXTS
                         ) -> str:
    """Context-length planner for training-sequence packing: for each
    candidate context length L and source, the cost of the SIMPLEST
    packing policy (one document per sequence, oversize documents
    split into ⌈n/L⌉ full chunks) — sequences produced, padding
    tokens (seqs·L − tokens), padding share, and how many documents
    need splitting.  This is the table a pipeline reads before
    choosing L and before reaching for a smarter packer
    (``q_token_shard_packing`` is the contiguous-concat form; the gap
    between this table's padding and zero is exactly the budget a
    concat/best-fit packer can recover).

    Everything is exact integer arithmetic (⌈n/L⌉ via non-negative
    truncating division), map-only per document then one
    (context, source) partial aggregate — scan-bound at any corpus
    size, nothing windowed."""
    vals = ", ".join(f"({c})" for c in contexts)
    seqs = d.intdiv("sized.n_tokens + L.ctx - 1", "L.ctx")
    return f"""
        WITH sized AS (
            SELECT source,
                   CAST({d.arr_len(d.token_array('text'))} AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        per_doc AS (
            SELECT L.ctx, sized.source, sized.n_tokens,
                   CAST({seqs} AS BIGINT) AS n_seqs,
                   CASE WHEN sized.n_tokens > L.ctx THEN 1 ELSE 0 END
                       AS oversize
            FROM sized CROSS JOIN (VALUES {vals}) AS L(ctx)
        )
        SELECT CAST(ctx AS INT) AS context_len, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_seqs) AS BIGINT) AS n_seqs,
               CAST(SUM(n_seqs) * ctx - SUM(n_tokens) AS BIGINT)
                   AS padding_tokens,
               CASE WHEN SUM(n_seqs) = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(ROUND(1e4 *
                              (CAST(SUM(n_seqs) AS DOUBLE) * ctx
                               - CAST(SUM(n_tokens) AS DOUBLE))
                              / (CAST(SUM(n_seqs) AS DOUBLE) * ctx))
                         AS BIGINT) END AS padding_share_e4,
               CAST(SUM(oversize) AS BIGINT) AS oversize_docs
        FROM per_doc
        GROUP BY ctx, source
        ORDER BY ctx, source
    """


BATCH_MAX_TOKENS = 256   # padded-token budget per batch (count * max_len)
BATCH_MAX_SEQS = 8       # row cap per batch


def q_batch_schedule(d: S.Dialect,
                     max_tokens: int = BATCH_MAX_TOKENS,
                     max_seqs: int = BATCH_MAX_SEQS,
                     band_docs: int = SEQ_PACK_BAND) -> str:
    """Dynamic batching (batch-by-size): assign documents to training
    batches so each batch's PADDED cost — rows × batch-max length,
    what the accelerator actually computes after padding every row to
    the batch max — stays within ``max_tokens``, with a ``max_seqs``
    row cap.  This is the loader-side alternative to sequence packing
    for losses that need document boundaries intact (seq2seq / SFT):
    packing concatenates, batching pads — the fairseq
    ``batch_by_size`` rule, made deterministic.

    Algorithm (deterministic, hence cross-engine hashable): within a
    band, walk documents in (n_tokens DESC, doc_id ASC) order carrying
    (batch, count, max_len).  Because the walk descends, the open
    batch's max length is its FIRST document's length, so the padded
    cost of adding a document is ``(count + 1) · max_len`` — one
    integer compare.  A document that doesn't fit (or would exceed
    ``max_seqs``) opens the next batch; an oversize document
    (n_tokens > max_tokens) therefore sits alone in its own batch —
    flagged by the cost rather than split (splitting is the packer's
    job, not the batcher's).

    Per document: band, token count, band-local batch index, and the
    document's slot within the batch.  This template is the
    sequential recursive-CTE REFERENCE; the registered Spark side is
    ``operators/packing.schedule_batches`` — the same walk run
    band-parallel over the seeded-position bands (one band shuffle,
    one bounded Arrow batch per band), which the driver hash gate
    proves identical.  Scale shape: identical to ``q_sequence_pack``
    — parallelism |corpus| / band_docs, no cross-band state."""
    fits = (f"(p.cnt + 1) * p.mx <= {max_tokens} "
            f"AND p.cnt + 1 <= {max_seqs}")
    return f"""
        WITH RECURSIVE {_sized_ranked_ctes(d, band_docs)},
        sched AS (
            SELECT band, r, doc_id, n_tokens,
                   CAST(0 AS BIGINT) AS batch,
                   CAST(0 AS BIGINT) AS pos,
                   CAST(1 AS BIGINT) AS cnt,
                   n_tokens AS mx
            FROM ranked WHERE r = 1
            UNION ALL
            SELECT x.band, x.r, x.doc_id, x.n_tokens,
                   CASE WHEN {fits} THEN p.batch
                        ELSE p.batch + 1 END,
                   CASE WHEN {fits} THEN p.cnt
                        ELSE CAST(0 AS BIGINT) END,
                   CASE WHEN {fits} THEN p.cnt + 1
                        ELSE CAST(1 AS BIGINT) END,
                   CASE WHEN {fits} THEN p.mx ELSE x.n_tokens END
            FROM sched p JOIN ranked x
              ON x.band = p.band AND x.r = p.r + 1
        )
        SELECT doc_id, band, n_tokens, batch, pos FROM sched
    """


def q_sequence_loss_mask(d: S.Dialect, ctx: int = SEQ_PACK_CTX,
                         band_docs: int = SEQ_PACK_BAND) -> str:
    """Loss-mask propagation through the NFD packer: per (band, seq),
    fill tokens split into masked (below-source-median quality docs —
    the q_below_median_quality_flags rule) and kept.  Packing keeps
    low-quality docs in the stream for context; the loss is zeroed on
    their tokens — this table is what the loader reads to do it.

    Sequential recursive-CTE REFERENCE; the registered Spark side is
    ``operators/packing.sequence_loss_mask`` over the band-parallel
    packer + the same flag rule.  Docs absent from the flag table
    (e.g. a NULL source falls out of the per-source median join)
    default to UNMASKED — matching the operator's left-join rule,
    so a partial flag table can't silently drop token accounting.  Scale shape: q_sequence_fill's
    explode + one broadcast flag join."""
    from .sampling_sql import q_below_median_quality_flags

    div = d.intdiv
    spanned = f"({div('start_off + n_tokens - 1', str(ctx))} + 1)"
    spanned_x = f"({div('x.start_off + x.n_tokens - 1', str(ctx))} + 1)"
    return f"""
        WITH RECURSIVE {_sequence_pack_ctes(d, ctx, band_docs)},
        flags AS ({q_below_median_quality_flags(d)}),
        expanded AS (
            SELECT x.band, x.start_seq + x.j AS seq,
                   COALESCE(f.masked, 0) AS masked,
                   {_chunk_contrib(ctx, spanned_x,
                                   n_tokens='x.n_tokens',
                                   start_off='x.start_off',
                                   j='x.j')} AS contrib
            FROM (
                SELECT band, doc_id, start_seq, start_off, n_tokens,
                       {d.explode_range(spanned)} AS j
                FROM pack
            ) x
            LEFT JOIN flags f ON f.doc_id = x.doc_id
        )
        SELECT band, CAST(seq AS BIGINT) AS seq,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(masked) AS BIGINT) AS n_masked_docs,
               CAST(SUM(contrib) AS BIGINT) AS fill_tokens,
               CAST(SUM(masked * contrib) AS BIGINT) AS masked_tokens,
               CAST(SUM(contrib) - SUM(masked * contrib) AS BIGINT)
                   AS kept_tokens
        FROM expanded
        GROUP BY band, seq
    """


def q_decontamination_report(d: S.Dialect, n: int = NGRAM_N,
                             stride: int = EVAL_STRIDE,
                             min_hits: int = MIN_HITS) -> str:
    """Per-source rollup of :func:`q_decontaminate`: training docs,
    contaminated docs and share, total shared n-grams, and the
    character mass a contamination excision would remove — the
    release-review table behind "is source X safe to train on given
    eval set Y".  Same n-gram machinery, ONE extra
    partial-aggregatable groupBy(source); shares are single exact-int
    divisions ROUNDed to 4."""
    base = q_decontaminate(d, n=n, stride=stride, min_hits=min_hits)
    return f"""
        WITH flagged AS ({base})
        SELECT doc.source,
               COUNT(*) AS n_train_docs,
               CAST(SUM(f.contaminated) AS BIGINT) AS n_contaminated,
               ROUND(CAST(SUM(f.contaminated) AS DOUBLE) / COUNT(*), 4)
                   AS contaminated_share,
               CAST(SUM(f.n_shared_ngrams) AS BIGINT)
                   AS n_shared_ngrams,
               CAST(SUM(f.contaminated * doc.n_chars) AS BIGINT)
                   AS n_chars_flagged,
               ROUND(CAST(SUM(f.contaminated * doc.n_chars) AS DOUBLE)
                     / SUM(doc.n_chars), 4) AS char_flag_share
        FROM flagged f
        JOIN documents doc ON doc.doc_id = f.doc_id
        GROUP BY doc.source
    """
