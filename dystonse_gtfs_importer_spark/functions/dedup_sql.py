"""Dedup + similarity-search templates, dialect-rendered.

These are the training-data-pipeline operators (MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine top-k) expressed as engine-portable
SQL so the DuckDB oracle verifies the exact same semantics the Spark
engine runs.  All hashing is MD5-based (identical lowercase hex in
both engines) so signatures are deterministic across engines.

Scale notes (100 TB thinking):

* MinHash/LSH: tokenize → k conditional MINs per doc (one shuffle),
  band join on (band, band_hash) — candidate pairs only, never the
  full O(n²) cross join.  At cluster scale the band join is the only
  shuffle whose fan-out depends on duplicate density.
* SimHash: one shuffle (doc × 16 bit positions aggregated by
  conditional sums); pairs by exact / near fingerprint match.
* n-gram Jaccard: intersection via token equi-join; bounded by
  document token counts, prefilter with LSH for the full-scale path.
* cosine top-k: brute force is query-broadcast × corpus scan; the
  LSH-bucketed variant (operators/similarity.py) prunes the corpus
  side first.
"""

from __future__ import annotations

from . import sql_shared as S

K_MINHASH = 8
ROWS_PER_BAND = 2
N_BANDS = K_MINHASH // ROWS_PER_BAND


def doc_tokens_cte(d: S.Dialect, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """Distinct lowercase tokens per document."""
    return f"""
        tokens AS (
            SELECT DISTINCT {id_col} AS doc_id, tok FROM (
                SELECT {id_col}, {d.explode_tokens(text_col)} AS tok
                FROM {table}
            ) t WHERE tok <> ''
        )
    """


def minhash_signature_cte(d: S.Dialect, k: int = K_MINHASH) -> str:
    """k-permutation MinHash via seeded MD5; one conditional MIN per
    hash function (single aggregation, no pivot shuffle)."""
    mins = ", ".join(
        f"MIN(CASE WHEN i = {j} THEN h END) AS mh{j}" for j in range(k)
    )
    return f"""
        hashed AS (
            SELECT doc_id, i, MD5(CONCAT(CAST(i AS STRING), '#', tok)) AS h
            FROM tokens CROSS JOIN {d.series(k)}
        ),
        signatures AS (
            SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
        )
    """


def band_hash_expr(b: int, rows_per_band: int = ROWS_PER_BAND) -> str:
    """SQL expression for band ``b``'s LSH bucket hash over the
    ``signatures`` CTE columns — THE band definition, shared by the
    pair query, the config planner, and the streaming store's band
    columns so all three agree byte-for-byte."""
    cols = "||'|'||".join(
        f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
    return f"MD5({cols})"


def minhash_bands_cte(k: int = K_MINHASH,
                      rows_per_band: int = ROWS_PER_BAND,
                      d: S.Dialect | None = None) -> str:
    """Band rows per document.  On Spark, ONE signature pass with a
    band-index explode (a CTE is inlined per reference, so the UNION
    ALL form stamps the token+minhash aggregation into the plan once
    per band — and twice that in the self-joining pair query; guide
    §3.3).  ``slice``+``array_join`` reproduces :func:`band_hash_expr`
    byte-for-byte (mh columns are never NULL — every hash index exists
    for every doc).  Callers that render for DuckDB (or render shared
    SQL) keep the UNION ALL textbook form, which also keeps the
    oracle derivation independent."""
    n_bands = k // rows_per_band
    if d is not None and d.name == "spark":
        sig = ", ".join(f"mh{j}" for j in range(k))
        return f"""bands AS (
            SELECT doc_id, CAST(b AS INT) AS band,
                   MD5(array_join(
                       slice(sig, b * {rows_per_band} + 1,
                             {rows_per_band}), '|')) AS band_hash
            FROM (SELECT doc_id, array({sig}) AS sig FROM signatures)
            LATERAL VIEW explode(sequence(0, {n_bands - 1})) t AS b
        )"""
    bands = []
    for b in range(n_bands):
        bands.append(
            f"SELECT doc_id, {b} AS band, "
            f"{band_hash_expr(b, rows_per_band)} AS band_hash FROM signatures")
    return "bands AS (" + " UNION ALL ".join(bands) + ")"


def q_minhash_lsh_pairs(d: S.Dialect,
                        doc_table: str = "documents") -> str:
    """LSH candidate pairs + exact signature-agreement estimate."""
    sig_eq = " + ".join(
        f"(CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END)"
        for j in range(K_MINHASH))
    return f"""
        WITH {doc_tokens_cte(d, table=doc_table)},
        {minhash_signature_cte(d)},
        {minhash_bands_cte(d=d)},
        cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM bands x
            JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash
                        AND x.doc_id < y.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               ROUND(CAST({sig_eq} AS DOUBLE) / {K_MINHASH}, 4) AS est_jaccard
        FROM cand c
        JOIN signatures a ON a.doc_id = c.doc_a
        JOIN signatures b ON b.doc_id = c.doc_b
    """


HEX_NIBBLE = ("(CASE {c} " + " ".join(
    f"WHEN '{h}' THEN {v}" for v, h in enumerate("0123456789abcdef"))
    + " END)")


def _nibble(c: str) -> str:
    return HEX_NIBBLE.format(c=c)


def q_simhash(d: S.Dialect) -> str:
    """16-bit SimHash over MD5'd tokens: bit b of the fingerprint is
    the sign of Σ_tokens (±1 by bit b of the token hash)."""
    # bit b lives in hex char (b // 4) of the first 4 md5 chars,
    # at weight 2^(b % 4) within that nibble (chars are big-endian
    # nibbles; this fixed layout just needs to be consistent)
    terms = []
    for b in range(16):
        char = f"SUBSTR(h, {1 + b // 4}, 1)"
        bit = f"({d.trunc_num(f'{_nibble(char)} / {1 << (b % 4)}.0')} % 2)"
        # Σ tokens of (2*bit - 1) > 0  →  output bit b set
        terms.append(
            f"(CASE WHEN SUM(2 * {bit} - 1) > 0 THEN {1 << b} ELSE 0 END)")
    fingerprint = " + ".join(terms)
    return f"""
        WITH {doc_tokens_cte(d)},
        hashed AS (SELECT doc_id, MD5(tok) AS h FROM tokens)
        SELECT doc_id, CAST({fingerprint} AS BIGINT) AS simhash
        FROM hashed GROUP BY doc_id
    """


def q_simhash_near_pairs(d: S.Dialect) -> str:
    """Near-duplicate pairs by SimHash hamming distance <= 3 (16-bit).
    This is the quadratic reference form, kept as the ORACLE; the scale
    path is q_simhash_near_pairs_banded below (the default in
    operators/dedup.py)."""
    sim = q_simhash(d)
    return f"""
        WITH fp AS ({sim})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count({d.xor('a.simhash', 'b.simhash')}) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count({d.xor('a.simhash', 'b.simhash')}) <= 3
    """


SIMHASH64_BITS = 60     # 15 MD5 nibbles; clear of the BIGINT sign bit
SIMHASH64_BANDS = 4     # 4 x 15-bit bands: pigeonhole for hamming <= 3


def q_simhash64(d: S.Dialect) -> str:
    """60-bit SimHash over MD5'd tokens.

    The 16-bit sketch (q_simhash) hash-matches its quadratic oracle at
    sf0.01 but is too narrow for corpus scale: with random 16-bit
    fingerprints, P(hamming <= 3) ~ 697/2^16 ~ 1.1%, so a 5 k-doc
    corpus already emits ~130 k coincidental pairs and the output
    grows quadratically with corpus size.  At 60 bits the random
    collision mass (~36 k/2^60) is negligible at any realistic corpus
    size, so emitted pairs track true near-duplicates — this is the
    width production systems use (cf. Manku et al., WWW'07, 64-bit)."""
    terms = []
    for b in range(SIMHASH64_BITS):
        # one hex->int conversion per token (hashed CTE); per-bit work
        # is a shift+mask, not a nibble CASE chain — ~10x cheaper on
        # both engines at corpus scale
        bit = f"({d.shiftright('hv', b)} % 2)"
        terms.append(
            f"(CASE WHEN SUM(2 * {bit} - 1) > 0 THEN {1 << b} ELSE 0 END)")
    fingerprint = "\n                 + ".join(terms)
    return f"""
        WITH {doc_tokens_cte(d)},
        hashed AS (
            SELECT doc_id, {d.hex_to_bigint("SUBSTR(MD5(tok), 1, 15)")} AS hv
            FROM tokens
        )
        SELECT doc_id, CAST({fingerprint} AS BIGINT) AS simhash
        FROM hashed GROUP BY doc_id
    """


def q_simhash64_near_pairs(d: S.Dialect) -> str:
    """Quadratic reference form of the 60-bit near-pair set (oracle
    twin of q_simhash64_near_pairs_banded)."""
    return f"""
        WITH fp AS ({q_simhash64(d)})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count({d.xor('a.simhash', 'b.simhash')}) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count({d.xor('a.simhash', 'b.simhash')}) <= 3
    """


def q_simhash64_near_pairs_banded(d: S.Dialect) -> str:
    """Scale path: 4 bands x 15 bits; hamming <= 3 flips at most 3
    bands, so every qualifying pair agrees exactly on >= 1 band
    (pigeonhole — banding is lossless, same argument as the 16-bit
    form).  Band extraction uses integer shifts: float-division
    truncation is not exact above 2**53 and a 60-bit fingerprint
    exceeds that.

    On Spark the band rows come from ONE fingerprint pass with a
    band-index explode — the UNION ALL form inlines the whole
    60-term simhash aggregate once per band (guide §2.4/§3.3; this
    is the dominant cost of the capped edit-distance verify chain,
    whose candidates embed this CTE)."""
    if d.name == "spark":
        band_selects = f"""
            SELECT doc_id, simhash, CAST(b AS INT) AS band,
                   (shiftright(simhash, 15 * b) % 32768) AS bv
            FROM fp LATERAL VIEW explode(
                sequence(0, {SIMHASH64_BANDS - 1})) t AS b"""
    else:
        band_selects = " UNION ALL ".join(
            f"SELECT doc_id, simhash, {b} AS band, "
            f"({d.shiftright('simhash', 15 * b)} % 32768) AS bv FROM fp"
            for b in range(SIMHASH64_BANDS))
    return f"""
        WITH fp AS ({q_simhash64(d)}),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, x.simhash AS sim_a,
                            y.doc_id AS doc_b, y.simhash AS sim_b
            FROM bands x
            JOIN bands y ON x.band = y.band AND x.bv = y.bv
                        AND x.doc_id < y.doc_id
        )
        SELECT doc_a, doc_b,
               bit_count({d.xor('sim_a', 'sim_b')}) AS hamming
        FROM cand
        WHERE bit_count({d.xor('sim_a', 'sim_b')}) <= 3
    """


def q_simhash_near_pairs_banded(d: S.Dialect) -> str:
    """Scale path for SimHash near-dup pairs: 4 bands x 4 bits.
    Pigeonhole: hamming <= 3 flips bits in at most 3 of the 4 bands, so
    every qualifying pair agrees EXACTLY on >= 1 band — candidates come
    from a band equi-join (volume scales with near-duplicate density),
    never the all-pairs product.  Output is identical to
    q_simhash_near_pairs; the driver runs this Spark plan against the
    all-pairs oracle, so the hash match proves banding is lossless.

    On Spark the band rows come from ONE fingerprint pass with a
    band-index explode: the UNION ALL form inlines the whole simhash
    aggregate once per band (guide §2.4/§3.3); shifts are exact (the
    16-bit fingerprint is far below 2^53, and a shift equals the
    truncating power-of-two division on non-negatives)."""
    sim = q_simhash(d)
    if d.name == "spark":
        band_selects = f"""
            SELECT doc_id, simhash, CAST(b AS INT) AS band,
                   (shiftright(simhash, 4 * b) % 16) AS bv
            FROM fp LATERAL VIEW explode(sequence(0, 3)) t AS b"""
    else:
        band_selects = " UNION ALL ".join(
            f"SELECT doc_id, simhash, {b} AS band, "
            f"({d.trunc_num(f'simhash / {1 << (4 * b)}.0')} % 16) AS bv FROM fp"
            for b in range(4))
    return f"""
        WITH fp AS ({sim}),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT x.doc_id AS doc_a, x.simhash AS sim_a,
                            y.doc_id AS doc_b, y.simhash AS sim_b
            FROM bands x
            JOIN bands y ON x.band = y.band AND x.bv = y.bv
                        AND x.doc_id < y.doc_id
        )
        SELECT doc_a, doc_b,
               bit_count({d.xor('sim_a', 'sim_b')}) AS hamming
        FROM cand
        WHERE bit_count({d.xor('sim_a', 'sim_b')}) <= 3
    """


EDIT_SIM_E3 = 600   # keep pairs with edit similarity >= 0.600


def _edit_verify_select(d: S.Dialect) -> str:
    """Shared verification tail: per-pair edit distance, max length,
    and integer-exact similarity ``sim_e6 = trunc((max_len - dist) *
    1e6 / max_len)``.  The threshold compare is pure integer
    arithmetic (``dist * 1000 <= (1000 - t) * max_len``) so both
    engines agree bit-for-bit; sim_e6 uses trunc-toward-zero float
    division (numerator <= ~5.5e8 — exact in a double)."""
    sim_e6 = d.trunc_num(
        "(GREATEST(la, lb) - dist) * 1000000.0 / GREATEST(la, lb)")
    return f"""
        SELECT doc_a, doc_b, hamming,
               CAST(dist AS BIGINT) AS edit_dist,
               CAST(GREATEST(la, lb) AS BIGINT) AS max_len,
               CAST({sim_e6} AS BIGINT) AS sim_e6
        FROM pairs
        WHERE dist >= 0
          AND dist * 1000 <= {1000 - EDIT_SIM_E3} * GREATEST(la, lb)
    """


def q_edit_distance_near_pairs(d: S.Dialect) -> str:
    """Quadratic REFERENCE form of sketch-then-verify near-dup
    detection: candidates are all simhash64 pairs at hamming <= 3,
    each verified by full (uncapped) Levenshtein distance; a pair
    survives iff its character-level edit similarity
    ``1 - dist / max(len_a, len_b)`` is >= 0.600.  The token-level
    sketch recalls permutation-heavy look-alikes that character
    edits reject — the verify stage is what separates true
    near-duplicates from coincidental token-mix matches (at sf0.01,
    2 932 candidates -> 6 verified pairs).  Oracle twin of
    q_edit_distance_near_pairs_capped."""
    return f"""
        WITH cand AS ({q_simhash64_near_pairs(d)}),
        pairs AS (
            SELECT c.doc_a, c.doc_b, c.hamming,
                   LENGTH(a.text) AS la, LENGTH(b.text) AS lb,
                   levenshtein(a.text, b.text) AS dist
            FROM cand c
            JOIN documents a ON a.doc_id = c.doc_a
            JOIN documents b ON b.doc_id = c.doc_b
        )
        {_edit_verify_select(d)}
    """


def q_edit_distance_near_pairs_capped(d: S.Dialect,
                                      capped_view: str | None = None
                                      ) -> str:
    """Scale path (Spark): banded simhash64 candidates (pigeonhole —
    lossless for hamming <= 3), a length prefilter
    (``lev(a, b) >= |len_a - len_b|``, so pairs whose length gap
    alone exceeds the allowed distance never run the DP), and
    Spark's three-argument ``levenshtein(a, b, cap)`` whose banded
    DP is O(cap * min_len) instead of O(len_a * len_b) and returns
    -1 above the cap.  The cap is the pair's own allowed distance
    ``floor((1000 - t) * max_len / 1000)``, so the verify cost per
    candidate is bounded by the similarity threshold — at corpus
    scale the verify stage is linear in candidate count, not
    quadratic in document length.  Output is identical to
    q_edit_distance_near_pairs (the driver hash-match proves both
    the banding and the cap are lossless).

    ``capped_view``: name of a pre-materialized view holding the
    capped candidate table (:func:`q_edit_capped_candidates`).  The
    registry's Spark side materializes the candidates once and
    ROUND-ROBIN-spreads them before the DP: the verify stage's rows
    are tiny in BYTES but huge in CPU, so AQE's byte-based partition
    coalescing funnels them into one task — measured at sf0.01 the
    2.8 k-candidate DP ran 3.4 s in one task vs 0.9 s spread over the
    local cores (guide §2.5: a skew AQE cannot see)."""
    max_d = d.trunc_num(
        f"{1000 - EDIT_SIM_E3} * GREATEST(la, lb) / 1000.0")
    head = f"""WITH cand AS ({q_simhash64_near_pairs_banded(d)}),
        sized AS (
            SELECT c.doc_a, c.doc_b, c.hamming,
                   a.text AS ta, b.text AS tb,
                   LENGTH(a.text) AS la, LENGTH(b.text) AS lb
            FROM cand c
            JOIN documents a ON a.doc_id = c.doc_a
            JOIN documents b ON b.doc_id = c.doc_b
        ),
        capped AS (
            SELECT doc_a, doc_b, hamming, ta, tb, la, lb,
                   CAST({max_d} AS INT) AS cap
            FROM sized
            WHERE ABS(la - lb) * 1000 <= {1000 - EDIT_SIM_E3} * GREATEST(la, lb)
        ),"""
    if capped_view is not None:
        head = f"WITH capped AS (SELECT * FROM {capped_view}),"
    return f"""
        {head}
        pairs AS (
            SELECT doc_a, doc_b, hamming, la, lb,
                   levenshtein(ta, tb, cap) AS dist
            FROM capped
        )
        {_edit_verify_select(d)}
    """


def q_edit_capped_candidates(d: S.Dialect) -> str:
    """The banded-candidate + length-prefilter + per-pair-cap table of
    :func:`q_edit_distance_near_pairs_capped` as a standalone SELECT —
    the piece the registry's Spark side materializes once so the
    Levenshtein verify stage can be spread across cores."""
    max_d = d.trunc_num(
        f"{1000 - EDIT_SIM_E3} * GREATEST(la, lb) / 1000.0")
    return f"""
        WITH cand AS ({q_simhash64_near_pairs_banded(d)}),
        sized AS (
            SELECT c.doc_a, c.doc_b, c.hamming,
                   a.text AS ta, b.text AS tb,
                   LENGTH(a.text) AS la, LENGTH(b.text) AS lb
            FROM cand c
            JOIN documents a ON a.doc_id = c.doc_a
            JOIN documents b ON b.doc_id = c.doc_b
        )
        SELECT doc_a, doc_b, hamming, ta, tb, la, lb,
               CAST({max_d} AS INT) AS cap
        FROM sized
        WHERE ABS(la - lb) * 1000 <= {1000 - EDIT_SIM_E3} * GREATEST(la, lb)
    """


WINNOW_K = 5      # k-gram length (characters)
WINNOW_W = 4      # winnowing window (consecutive k-gram hashes)


def winnow_cte(d: S.Dialect, k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """MOSS-style winnowing fingerprints: hash every character k-gram
    of the lowercased text (rolling window), then keep the MINIMUM
    hash of each window of ``w`` consecutive positions — a document's
    fingerprint set is position-independent and robust to small edits
    (Schleimer/Wilkerson/Aiken, SIGMOD'03).  All set arithmetic is
    windowed SQL, identical in both engines (binary collation MIN
    over hex md5)."""
    return f"""
        grams AS (
            SELECT doc_id, i,
                   MD5(SUBSTR(lower(text), i + 1, {k})) AS h
            FROM (
                SELECT doc_id, text,
                       {d.explode_range(f'GREATEST(length(text) - {k} + 1, 0)')} AS i
                FROM documents
            ) g
        ),
        winnowed AS (
            SELECT DISTINCT doc_id,
                   MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW
                                AND {w - 1} FOLLOWING) AS fp
            FROM grams
        )
    """


def q_winnow_fingerprint_stats(d: S.Dialect) -> str:
    """Per-document winnowing fingerprint cardinality (the sketch a
    plagiarism/near-dup index stores)."""
    return f"""
        WITH {winnow_cte(d)}
        SELECT doc_id, COUNT(*) AS n_fingerprints
        FROM winnowed GROUP BY doc_id
    """


def q_winnow_near_pairs(d: S.Dialect, min_shared: int = 3) -> str:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    — candidates come from the fingerprint equi-join (shared-sketch
    pairs only, the inverted-index shape), never an all-pairs scan."""
    return f"""
        WITH {winnow_cte(d)}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_shared
        FROM winnowed a
        JOIN winnowed b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_shared}
    """


def q_ngram_jaccard_prefix(d: S.Dialect, threshold: float = 0.5) -> str:
    """Exact token-set Jaccard >= threshold with LOSSLESS prefix
    filtering (Bayardo all-pairs / PPJoin): tokens get a canonical
    global order (ascending document frequency, then token), each doc
    only indexes its first ``n − ceil(t·n) + 1`` tokens, and candidate
    pairs must collide on a prefix token.  Any pair with J >= t shares
    its first-common token inside BOTH prefixes (the suffix of either
    side is shorter than the required overlap), so the candidate set
    loses nothing; survivors are verified with an exact array
    intersection.  Scale shape: the df table is a broadcast heavy-
    hitter map; candidate volume scales with Σ prefix-df² instead of
    Σ df² — on Zipfian corpora the prefix excludes exactly the
    frequent tokens that blow the quadratic up; verification is a
    per-pair JVM array op, not a join.

    Caveat measured on the driver's synthetic corpus: its vocabulary
    is tiny and uniform (~30 tokens, every token in ~half the docs),
    so >70 % of ALL pairs genuinely pass t=0.5 and no candidate
    scheme can beat the textbook join there — the prefix win appears
    exactly when the df distribution is skewed, which is every real
    corpus."""
    return f"""
        WITH {doc_tokens_cte(d)},
        df AS (SELECT tok, COUNT(*) AS df FROM tokens GROUP BY tok),
        ord AS (
            SELECT t.doc_id, t.tok,
                   ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                      ORDER BY f.df, t.tok) AS rn,
                   COUNT(*) OVER (PARTITION BY t.doc_id) AS n_tok
            FROM tokens t JOIN df f ON f.tok = t.tok
        ),
        docs AS (
            SELECT doc_id, MAX(n_tok) AS n_tok,
                   {d.ordered_list('tok', 'rn')} AS ta
            FROM ord GROUP BY doc_id
        ),
        pref AS (
            SELECT doc_id, n_tok, tok FROM ord
            WHERE rn <= n_tok - CEIL({threshold} * n_tok) + 1
        ),
        idx AS (
            SELECT doc_id, n_tok, tok FROM ord
            WHERE rn <= n_tok
                  - CEIL(2 * {threshold} / (1 + {threshold}) * n_tok) + 1
        ),
        cand AS (
            -- the shorter index prefix is only valid when the PROBING
            -- record is at least as large (PPJoin size order); equal
            -- sizes fire both directions, deduped downstream
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM pref a JOIN idx b ON a.tok = b.tok
            WHERE a.n_tok >= b.n_tok AND a.doc_id <> b.doc_id
        ),
        scored AS (
            SELECT LEAST(c.doc_a, c.doc_b) AS doc_a,
                   GREATEST(c.doc_a, c.doc_b) AS doc_b,
                   CAST({d.arr_intersect_len('da.ta', 'db.ta')} AS DOUBLE)
                       AS inter,
                   da.n_tok AS na, db.n_tok AS nb
            FROM cand c
            JOIN docs da ON da.doc_id = c.doc_a
            JOIN docs db ON db.doc_id = c.doc_b
        )
        SELECT doc_a, doc_b,
               MAX(ROUND(inter / (na + nb - inter), 4)) AS jaccard
        FROM scored
        WHERE inter / (na + nb - inter) >= {threshold}
        GROUP BY doc_a, doc_b
    """


def q_ngram_jaccard_pairs(d: S.Dialect, threshold: float = 0.5) -> str:
    """Exact token-set Jaccard similarity >= threshold via
    intersection equi-join (shared-token pairs only) — the textbook
    form, kept as the cross-derivation oracle for
    :func:`q_ngram_jaccard_prefix`."""
    return f"""
        WITH {doc_tokens_cte(d)},
        sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tokens GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM tokens a JOIN tokens b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b,
               ROUND(CAST(i.n_common AS DOUBLE)
                     / (sa.n_tok + sb.n_tok - i.n_common), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.n_common AS DOUBLE)
              / (sa.n_tok + sb.n_tok - i.n_common) >= {threshold}
    """


def q_cosine_topk(d: S.Dialect, k: int = 3, query_stride: int = 50) -> str:
    """Brute-force cosine top-k: every vec_id % stride == 0 is a query;
    rank corpus vectors by ROUND(cosine, 6) with id tie-break so the
    ordering is identical across engines despite double ulp drift."""
    dot = f"""
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               SUM({d.arr_get('q.emb', 's.i')} * {d.arr_get('c.emb', 's.i')}) AS dot,
               SUM({d.arr_get('q.emb', 's.i')} * {d.arr_get('q.emb', 's.i')}) AS qq,
               SUM({d.arr_get('c.emb', 's.i')} * {d.arr_get('c.emb', 's.i')}) AS cc
        FROM qv q
        JOIN cv c ON q.vec_id <> c.vec_id
        CROSS JOIN {d.series(64)} AS s
        GROUP BY 1, 2
    """
    return f"""
        WITH qv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings WHERE vec_id % {query_stride} = 0
        ),
        cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        dots AS ({dot}),
        scored AS (
            SELECT query_id, cand_id,
                   ROUND(dot / (SQRT(qq) * SQRT(cc)), 6) AS cosine
            FROM dots
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, cand_id) AS rk
            FROM scored
        )
        SELECT query_id, cand_id, cosine, rk FROM ranked WHERE rk <= {k}
    """


SPAN_TOKENS = 10


def q_span_dedup(d: S.Dialect, span: int = SPAN_TOKENS) -> str:
    """C4/CCNet-style cross-document span dedup: split every document
    into consecutive ``span``-token windows, and a span whose exact
    text occurs in MORE than one document is dropped everywhere except
    the lowest-doc_id owner (C4 §2.2 keeps one occurrence of each
    three-sentence span; CCNet hashes paragraphs — this corpus is a
    punctuation-free token stream, so fixed token windows are the
    deterministic structural analog).  Emits per-document sufficient
    statistics — total/kept token counts and span drop counts — the
    reassembled text is a trivial ordered join of the kept spans.

    Scale shape: tokenize and span construction are map-only
    (`arr_slice_join` over an index range — no self-join); ONE
    span_text-keyed shuffle builds the owner table (MIN doc_id +
    occurrence count) and the flag join is co-keyed on the same
    span_text, so a 100 TB corpus pays one fact-grain exchange plus
    the final doc_id aggregation.  No broadcast of anything
    corpus-sized.  Within-document repeats of a span are NOT dropped
    (the keeper doc keeps all its occurrences) — pinned in tests."""
    n_spans = d.trunc_num(f"(n_tok + {span - 1}) / {span}.0")
    return f"""
        WITH docs AS (
            SELECT doc_id, {d.token_array('text')} AS toks
            FROM documents
        ),
        sized AS (
            SELECT doc_id, toks, {d.arr_len('toks')} AS n_tok
            FROM docs WHERE {d.arr_len('toks')} > 0
        ),
        spans AS (
            SELECT doc_id, n_tok, i AS span_idx,
                   LEAST({span}, n_tok - i * {span}) AS span_len,
                   {d.arr_slice_join('toks', f'i * {span}', span)}
                       AS span_text
            FROM (
                SELECT doc_id, toks, n_tok,
                       {d.explode_range(n_spans)} AS i
                FROM sized
            ) t
        ),
        owners AS (
            SELECT span_text, MIN(doc_id) AS keeper,
                   COUNT(*) AS n_occ
            FROM spans GROUP BY span_text
        ),
        flagged AS (
            SELECT s.doc_id, s.n_tok, s.span_len,
                   CASE WHEN o.n_occ > 1 AND s.doc_id <> o.keeper
                        THEN 1 ELSE 0 END AS dropped
            FROM spans s
            JOIN owners o ON o.span_text = s.span_text
        )
        SELECT doc_id,
               CAST(MAX(n_tok) AS BIGINT) AS n_tok,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(dropped) AS BIGINT) AS n_dropped_spans,
               CAST(SUM(CASE WHEN dropped = 0 THEN span_len
                             ELSE 0 END) AS BIGINT) AS kept_tokens
        FROM flagged
        GROUP BY doc_id
    """


def q_containment_pairs(d: S.Dialect, threshold_e3: int = 600,
                        max_df: int = 64) -> str:
    """ASYMMETRIC near-dup detection: fingerprint containment
    ``|fp(A) ∩ fp(B)| / |fp(A)|`` over the winnowing sketches — the
    relation Jaccard misses when one document quotes or extends
    another (a long page containing a short page scores near-zero
    Jaccard but containment ~1 for the short side).  Emits ordered
    (contained, container) pairs with containment ≥ threshold (1e-3
    units) and at least 2 shared fingerprints; both directions of an
    A/B pair can qualify independently (mutual containment = exact
    near-dup).

    Determinism: containment is one division of exact integer counts,
    rounded once to 1e-3 units.

    Scale shape: the inverted fingerprint index equi-join generates
    candidates (never an all-pairs product) AFTER the MOSS-standard
    too-common-fingerprint drop: fingerprints present in more than
    ``max_df`` documents are excluded from BOTH the index and the
    per-doc size denominator, which caps the per-fingerprint join
    fan-out at ``max_df²`` — without it a stop-gram-like fingerprint
    (df in the thousands on duplicate-heavy corpora) alone emits df²
    candidate rows.  The same candidate pass feeds both directions
    (the join emits unordered pairs once; the SELECT fans them into
    per-side containment rows)."""
    return f"""
        WITH {winnow_cte(d)},
        fdf AS (
            -- winnowed is DISTINCT (doc_id, fp), so COUNT(*) IS the df
            SELECT fp, COUNT(*) AS df
            FROM winnowed GROUP BY fp
        ),
        kept AS (
            SELECT w.doc_id, w.fp
            FROM winnowed w JOIN fdf ON fdf.fp = w.fp
            WHERE fdf.df <= {max_df}
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS n_fp FROM kept GROUP BY doc_id
        ),
        shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS n_shared
            FROM kept a
            JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 2
        ),
        directed AS (
            SELECT s.doc_a AS contained, s.doc_b AS container,
                   s.n_shared, za.n_fp AS n_contained_fp
            FROM shared s JOIN sizes za ON za.doc_id = s.doc_a
            UNION ALL
            SELECT s.doc_b AS contained, s.doc_a AS container,
                   s.n_shared, zb.n_fp AS n_contained_fp
            FROM shared s JOIN sizes zb ON zb.doc_id = s.doc_b
        )
        SELECT contained, container,
               CAST(n_shared AS BIGINT) AS n_shared,
               CAST(n_contained_fp AS BIGINT) AS n_contained_fp,
               CAST(ROUND(1e3 * CAST(n_shared AS DOUBLE)
                          / CAST(n_contained_fp AS DOUBLE)) AS BIGINT)
                   AS containment_e3
        FROM directed
        WHERE CAST(ROUND(1e3 * CAST(n_shared AS DOUBLE)
                         / CAST(n_contained_fp AS DOUBLE)) AS BIGINT)
              >= {threshold_e3}
    """


EXACTSUBSTR_MIN_LEN = 8


def exactsubstr_cut_tail(d: S.Dialect,
                         min_len: int = EXACTSUBSTR_MIN_LEN,
                         emit: str = "fingerprint",
                         keep_array: str = "ta") -> str:
    """Shared post-profile SQL for the ExactSubstr CUT operator (Lee
    et al. 2022 §4: remove the actual repeated spans the suffix index
    finds, not fixed windows): assumes CTEs ``ta(doc_id, ta)`` (token
    arrays) and ``prof(doc_id, pos, rep_len)`` (the repeated-span
    profile, rep_len >= ``min_len``) are already defined — the Spark
    registry form derives ``prof`` from distributed prefix doubling
    (operators/suffix.suffix_ranks), the DuckDB oracle from a direct
    suffix sort, so the hash match cross-verifies both the profile
    AND the excision.

    Semantics: each profile position anchors a repeated span; anchors
    are keyed by their exact leading ``min_len``-token text, the
    lowest-doc_id occurrence of a key OWNS it (that document keeps
    ALL its occurrences — the span_dedup keeper rule), and every
    non-owner document cuts tokens [pos, pos + rep_len).  Overlapping
    cuts merge into maximal regions (running-max interval union), so
    ``n_removed`` counts each token once.  Within-document repeats
    whose key never leaves the document are self-owned, hence kept —
    this operator removes CROSS-document contamination.

    ``emit='fingerprint'`` (default) hashes the excised text (the
    driver-comparable scalar); ``emit='text'`` returns the excised
    text itself as ``kept_text`` — the form the corpus-pipeline
    excision stage (operators/dedup.exactsubstr_excise) consumes.
    ``keep_array`` names the ``ta``-CTE column the kept tokens are
    read from: matching/ownership always use the lowercase ``ta``,
    but an excision caller can supply a case-preserving token array
    (same ' +' split, so positions align) and pass its name here.

    Emits one row per AFFECTED document: token totals, removed token
    count, merged region count, and MD5 of the excised text (the
    reassembly, hash-portable across engines; a fully-cut document
    emits MD5('')).

    Scale shape: anchors live at profile grain (duplicated positions
    only); the owner table is one akey-keyed aggregate; the interval
    union windows per document (never corpus-wide); the excision is
    one doc_id-keyed join of token positions against the (tiny,
    post-union) region list plus one per-doc aggregate.  Nothing
    corpus-sized is broadcast or single-tasked."""
    return f"""
        sized AS (
            SELECT doc_id, {d.arr_len('ta')} AS n_tok FROM ta
        ),
        anchors AS (
            SELECT p.doc_id, p.pos, p.rep_len,
                   {d.arr_slice_join('t.ta', 'p.pos', min_len)} AS akey
            FROM prof p JOIN ta t ON t.doc_id = p.doc_id
        ),
        owner AS (
            SELECT akey, MIN(doc_id) AS odoc FROM anchors GROUP BY akey
        ),
        cuts AS (
            SELECT a.doc_id, a.pos AS st, a.pos + a.rep_len AS en
            FROM anchors a JOIN owner o ON o.akey = a.akey
            WHERE a.doc_id <> o.odoc
        ),
        marked AS (
            SELECT doc_id, st, en,
                   CASE WHEN st > COALESCE(MAX(en) OVER (
                            PARTITION BY doc_id ORDER BY st, en
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS is_new
            FROM cuts
        ),
        grp AS (
            SELECT doc_id, st, en,
                   SUM(is_new) OVER (
                       PARTITION BY doc_id ORDER BY st, en
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS g
            FROM marked
        ),
        regions AS (
            SELECT doc_id, g, MIN(st) AS st, MAX(en) AS en
            FROM grp GROUP BY doc_id, g
        ),
        rstats AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_regions,
                   CAST(SUM(en - st) AS BIGINT) AS n_removed
            FROM regions GROUP BY doc_id
        ),
        toks AS (
            SELECT t.doc_id, {d.explode_range(d.arr_len('t.ta'))} AS i,
                   t.{keep_array} AS ka
            FROM ta t JOIN rstats rs ON rs.doc_id = t.doc_id
        ),
        keep AS (
            SELECT tk.doc_id, tk.i, {d.arr_get('tk.ka', 'tk.i')} AS tok
            FROM toks tk LEFT JOIN regions r
                ON r.doc_id = tk.doc_id
                AND tk.i >= r.st AND tk.i < r.en
            WHERE r.doc_id IS NULL
        ),
        keepagg AS (
            SELECT doc_id,
                   {d.ordered_list_csv('tok', 'i', ' ')} AS kept
            FROM keep GROUP BY doc_id
        )
        SELECT rs.doc_id,
               CAST(sz.n_tok AS BIGINT) AS n_tok,
               rs.n_removed, rs.n_regions,
               {"MD5(COALESCE(k.kept, '')) AS kept_fp"
                if emit == "fingerprint"
                else "COALESCE(k.kept, '') AS kept_text"}
        FROM rstats rs
        JOIN sized sz ON sz.doc_id = rs.doc_id
        LEFT JOIN keepagg k ON k.doc_id = rs.doc_id
        ORDER BY rs.doc_id
    """


NOVELTY_NGRAM = 8


def q_lsh_config_planner(d: S.Dialect, k: int = K_MINHASH) -> str:
    """LSH banding planner: for every (rows_per_band r, n_bands b)
    factorization of the k-hash MinHash signature, the EXACT probe
    cost the candidate join would pay — without materializing a
    single candidate pair.

    Per config: bucket count, multi-occupancy buckets, candidate-pair
    probe volume Σ_buckets C(n,2) (with cross-band multiplicity —
    the join's actual fan-in; the DISTINCT pair set is what
    ``q_minhash_lsh_pairs`` then builds for the chosen config), the
    number of documents that would enter any candidate pair, and the
    S-curve midpoint threshold t ≈ (1/b)^(1/r) (emitted as a literal
    per config — no cross-engine float math).  This is the table a
    pipeline reads BEFORE committing to a banding: more bands → lower
    effective threshold → more candidates; the planner prices that
    tradeoff on the actual corpus.

    Scale shape: band rows are doc-grain × Σb (a small constant),
    bucket counts are one partial-aggregated groupBy, the doc counter
    is one bucket-keyed join + distinct — everything linear in the
    corpus, nothing pairwise, no window."""
    configs = [(r, k // r) for r in (1, 2, 4, 8) if k % r == 0]
    if d.name == "spark":
        # ONE signature pass, bands by a literal (r, band) explode:
        # a WITH CTE is inlined per reference, so the former
        # Σb = 30-branch UNION ALL stamped the whole token+minhash
        # aggregation into the plan 30× (AQE exchange reuse collapsed
        # most of the EXECUTION, but planning/codegen still paid the
        # 30× plan; guide §3.3 'very wide unions produce enormous
        # plans').  slice+array_join reproduces band_hash_expr
        # byte-for-byte (mh columns are never NULL: every hash index
        # exists per doc), and the explode multiplies doc-grain rows
        # by a constant 30 — same data volume as the union it
        # replaces.  The DuckDB oracle keeps the textbook UNION ALL
        # form, so the two derivations stay independent.  Measured at
        # sf0.01: 3.71 s -> 1.19 s total (exec 3.14 -> 0.89,
        # Exchange nodes 141 -> 15).
        cfg = ", ".join(f"struct({r} AS r, {band} AS band)"
                        for r, b in configs for band in range(b))
        sig = ", ".join(f"mh{j}" for j in range(k))
        allbands = f"""SELECT doc_id, c.r AS rows_per_band,
                   c.band AS band,
                   MD5(array_join(
                       slice(sig, c.band * c.r + 1, c.r), '|')) AS bh
            FROM (SELECT doc_id, array({sig}) AS sig FROM signatures)
            LATERAL VIEW explode(array({cfg})) t AS c"""
    else:
        branches = []
        for r, b in configs:
            for band in range(b):
                branches.append(
                    f"SELECT doc_id, {r} AS rows_per_band, {band} AS band, "
                    f"{band_hash_expr(band, r)} AS bh FROM signatures")
        allbands = "\n            UNION ALL ".join(branches)
    thr = " ".join(
        f"WHEN {r} THEN {round(1e4 * (1.0 / b) ** (1.0 / r))}"
        for r, b in configs)
    pairs = d.intdiv("k * (k - 1)", "2")
    return f"""
        WITH {doc_tokens_cte(d)},
        {minhash_signature_cte(d, k)},
        allbands AS (
            {allbands}
        ),
        buckets AS (
            SELECT rows_per_band, band, bh, COUNT(*) AS k
            FROM allbands GROUP BY rows_per_band, band, bh
        ),
        cand_docs AS (
            SELECT a.rows_per_band,
                   COUNT(DISTINCT a.doc_id) AS docs_in_candidates
            FROM allbands a
            JOIN buckets c ON c.rows_per_band = a.rows_per_band
                          AND c.band = a.band AND c.bh = a.bh
            WHERE c.k >= 2
            GROUP BY a.rows_per_band
        )
        SELECT CAST(b.rows_per_band AS INT) AS rows_per_band,
               CAST({k} / b.rows_per_band AS INT) AS n_bands,
               CAST(CASE b.rows_per_band {thr} END AS BIGINT)
                   AS threshold_e4,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(CASE WHEN b.k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS multi_buckets,
               CAST(SUM({pairs}) AS BIGINT) AS candidate_pairs,
               CAST(COALESCE(MAX(cd.docs_in_candidates), 0) AS BIGINT)
                   AS docs_in_candidates
        FROM buckets b
        LEFT JOIN cand_docs cd ON cd.rows_per_band = b.rows_per_band
        GROUP BY b.rows_per_band
    """


def q_ngram_novelty(d: S.Dialect, n: int = NOVELTY_NGRAM) -> str:
    """Per-document n-gram NOVELTY: the share of a document's distinct
    ``n``-token shingles that occur in NO other document — the
    memorization-risk / freshness scalar a curation run thresholds on
    (a low-novelty doc is mostly assembled from text that exists
    elsewhere even when no single pair-similarity fires).  The
    complement of the containment/Jaccard family: per-document scalar,
    no pairs.

    Scale shape: shingles are map-only (index-range slices, no
    self-join); ONE shingle-keyed aggregate builds (df, one owner) per
    shingle; novelty re-aggregates per document.  A shingle occurring
    in >1 documents is non-novel for ALL of them — including repeats
    inside one document only, which stay novel (df counts DISTINCT
    documents).  Cost is two partial-aggregated shuffles at shingle
    grain, corpus-linear."""
    return f"""
        WITH docs AS (
            SELECT doc_id, {d.token_array('text')} AS toks
            FROM documents
        ),
        sized AS (
            SELECT doc_id, toks, {d.arr_len('toks')} AS n_tok
            FROM docs WHERE {d.arr_len('toks')} >= {n}
        ),
        shingles AS (
            SELECT DISTINCT doc_id,
                   {d.arr_slice_join('toks', 'i', n)} AS sh
            FROM (
                SELECT doc_id, toks,
                       {d.explode_range(f'n_tok - {n} + 1')} AS i
                FROM sized
            ) g
        ),
        df AS (
            SELECT sh, COUNT(*) AS n_docs FROM shingles GROUP BY sh
        )
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN f.n_docs = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               CAST(ROUND(1e4 * CAST(SUM(CASE WHEN f.n_docs = 1
                                             THEN 1 ELSE 0 END)
                                 AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS novelty_e4
        FROM shingles s JOIN df f ON f.sh = s.sh
        GROUP BY s.doc_id
        ORDER BY s.doc_id
    """


def q_normalized_dedup(d: S.Dialect) -> str:
    """Canonicalized exact dedup: documents are normalized (lowercase,
    punctuation stripped to spaces, whitespace collapsed, trimmed)
    BEFORE hashing, so casing/punctuation/spacing perturbations of the
    same text — which sail straight past ``q_exact_dedup``'s raw
    MD5(text) — land in one cluster.  This is the first rung of the
    near-dup ladder (cheaper than MinHash, catches the most common
    mechanical perturbations); clusters it can't see (word-level
    edits) fall through to the LSH family.

    Emits one row per normalized cluster — the canonical keeper (min
    doc_id), member count, and the id-range fingerprint — plus the
    cluster's normalized hash so a downstream excision can join back
    (singleton clusters ride along, mirroring q_exact_dedup, so the
    keep-list is total; the >1 rows are the perturbed duplicates).
    Deliberately NO member-id list column: a degenerate cluster (all
    punctuation-only docs normalize to the empty string) would
    otherwise collect unboundedly many ids into one cell at corpus
    scale; members are recoverable by joining the hash back.
    Scale shape: map-only normalization +
    ONE groupBy on the 128-bit hash (same shape as exact_dedup; the
    normalization adds two regex passes inside the scan stage, no new
    shuffle).  Reference anchor: LLM-pipeline extension (SURVEY.md
    LLM ops)."""
    # lower → strip non-alphanumerics to spaces → collapse runs → trim.
    # Character classes only: identical semantics in Java regex / RE2.
    norm = d.regexp_replace_all(
        d.regexp_replace_all("LOWER(text)", "[^a-z0-9 ]", " "),
        "  *", " ")
    return f"""
        WITH n AS (
            SELECT doc_id, MD5(TRIM({norm})) AS norm_hash
            FROM documents
        )
        SELECT norm_hash,
               MIN(doc_id) AS canonical_doc,
               COUNT(*) AS n_members,
               MAX(doc_id) AS max_member
        FROM n
        GROUP BY norm_hash
    """


def q_dedup_impact(d: S.Dialect) -> str:
    """Per-source dedup impact report: what an exact-dedup pass would
    REMOVE from each source — non-canonical copies (keeper = global
    min doc_id per content hash, the q_exact_dedup rule) counted in
    documents and characters, plus each source's share of its own
    volume lost.  This is the governance face of the dedup family:
    mixture planning (q_mixture_weights) needs post-dedup token
    counts per source, and this query is exactly that delta.

    Determinism: integer counts and sums only; the two shares are
    single divisions of exact integers, ROUNDed to 4.  Scale shape:
    one groupBy(content_hash) carrying (hash → min doc_id) — the same
    single shuffle exact_dedup pays — joined back doc-keyed
    (hash-partitioned equi-join), then ONE partial-aggregatable
    groupBy(source).  No window, no pair materialization."""
    return """
        WITH h AS (
            SELECT doc_id, source, n_chars, MD5(text) AS content_hash
            FROM documents
        ),
        keepers AS (
            SELECT content_hash, MIN(doc_id) AS canonical_doc
            FROM h GROUP BY content_hash
        ),
        marked AS (
            SELECT h.source, h.n_chars,
                   CASE WHEN h.doc_id = k.canonical_doc
                        THEN 0 ELSE 1 END AS is_removed
            FROM h JOIN keepers k ON k.content_hash = h.content_hash
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(is_removed) AS BIGINT) AS n_docs_removed,
               ROUND(CAST(SUM(is_removed) AS DOUBLE) / COUNT(*), 4)
                   AS doc_removal_share,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST(SUM(is_removed * n_chars) AS BIGINT)
                   AS n_chars_removed,
               ROUND(CAST(SUM(is_removed * n_chars) AS DOUBLE)
                     / SUM(n_chars), 4) AS char_removal_share
        FROM marked
        GROUP BY source
    """


def _sweep_accounting(d: S.Dialect, pairs_sql: str, score_col: str,
                      t_min_e4: int, step_e4: int, n_steps: int,
                      doc_table: str = "documents") -> str:
    """Shared count-only sweep over a (doc_a, doc_b, score) pair
    source: the grid join, min-id-keeper removal rule, affected/
    removed/character accounting, and share columns — ONE definition
    so the exact (PPJoin) and estimate (banded MinHash) sweeps cannot
    drift apart on the rules they report.

    The Spark rendering reads the candidate-pair source exactly ONCE:
    ``hits`` feeds a doc-role explode and a single (t, doc) aggregate
    from which every reported count derives (pairs = Σ doc_b
    occurrences, affected = row count, removed = docs with a doc_b
    occurrence).  A CTE is inlined per reference, so the textbook
    shape — four independent aggregates over ``hits`` — re-plans the
    entire pair pass (the dominant cost) four times (guide
    §2.4/§3.3); the DuckDB oracle keeps that textbook form as the
    independent derivation.  Measured at sf0.01:
    dedup_threshold_sweep_lsh 2.04 s -> 1.53 s total."""
    if d.name == "spark":
        return f"""
        WITH grid AS (
            SELECT {t_min_e4} + i * {step_e4} AS t_e4
            FROM {d.series(n_steps)} s
        ),
        pj AS (
            SELECT doc_a, doc_b,
                   CAST(ROUND({score_col} * 10000) AS BIGINT) AS j_e4
            FROM ({pairs_sql}) p
        ),
        hits AS (
            SELECT g.t_e4, p.doc_a, p.doc_b
            FROM pj p JOIN grid g ON p.j_e4 >= g.t_e4
        ),
        ex AS (
            SELECT t_e4, s.doc_id, s.is_b
            FROM hits
            LATERAL VIEW explode(array(
                struct(doc_a AS doc_id, 0 AS is_b),
                struct(doc_b AS doc_id, 1 AS is_b))) t AS s
        ),
        docagg AS (
            SELECT t_e4, doc_id, MAX(is_b) AS removed,
                   SUM(is_b) AS b_occ
            FROM ex GROUP BY t_e4, doc_id
        ),
        corpus AS (
            SELECT COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
            FROM {doc_table}
        ),
        stats AS (
            SELECT da.t_e4,
                   SUM(da.b_occ) AS n_pairs,
                   COUNT(*) AS n_affected,
                   SUM(da.removed) AS n_removed,
                   SUM(CASE WHEN da.removed = 1 THEN dd.n_chars
                       ELSE 0 END) AS chars_removed
            FROM docagg da JOIN {doc_table} dd ON dd.doc_id = da.doc_id
            GROUP BY da.t_e4
        )
        SELECT g.t_e4,
               CAST(COALESCE(st.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(st.n_affected, 0) AS BIGINT)
                   AS n_docs_affected,
               CAST(COALESCE(st.n_removed, 0) AS BIGINT)
                   AS n_docs_removed,
               CAST(COALESCE(st.chars_removed, 0) AS BIGINT)
                   AS n_chars_removed,
               ROUND(CAST(COALESCE(st.n_removed, 0) AS DOUBLE)
                     / c.n_docs, 4) AS doc_removal_share,
               ROUND(CAST(COALESCE(st.chars_removed, 0) AS DOUBLE)
                     / c.n_chars, 4) AS char_removal_share
        FROM grid g
        CROSS JOIN corpus c
        LEFT JOIN stats st ON st.t_e4 = g.t_e4
    """
    return f"""
        WITH grid AS (
            SELECT {t_min_e4} + i * {step_e4} AS t_e4
            FROM {d.series(n_steps)} s
        ),
        pj AS (
            SELECT doc_a, doc_b,
                   CAST(ROUND({score_col} * 10000) AS BIGINT) AS j_e4
            FROM ({pairs_sql}) p
        ),
        hits AS (
            SELECT g.t_e4, p.doc_a, p.doc_b
            FROM pj p JOIN grid g ON p.j_e4 >= g.t_e4
        ),
        removed AS (
            SELECT t_e4, doc_b AS doc_id
            FROM hits GROUP BY t_e4, doc_b
        ),
        affected AS (
            SELECT t_e4, doc_id FROM (
                SELECT t_e4, doc_a AS doc_id FROM hits
                UNION
                SELECT t_e4, doc_b AS doc_id FROM hits
            ) u
        ),
        corpus AS (
            SELECT COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
            FROM {doc_table}
        ),
        pair_counts AS (
            SELECT t_e4, COUNT(*) AS n_pairs FROM hits GROUP BY t_e4
        ),
        removed_stats AS (
            SELECT r.t_e4, COUNT(*) AS n_removed,
                   SUM(dd.n_chars) AS chars_removed
            FROM removed r JOIN {doc_table} dd ON dd.doc_id = r.doc_id
            GROUP BY r.t_e4
        ),
        affected_counts AS (
            SELECT t_e4, COUNT(*) AS n_affected
            FROM affected GROUP BY t_e4
        )
        SELECT g.t_e4,
               CAST(COALESCE(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(ac.n_affected, 0) AS BIGINT)
                   AS n_docs_affected,
               CAST(COALESCE(rs.n_removed, 0) AS BIGINT)
                   AS n_docs_removed,
               CAST(COALESCE(rs.chars_removed, 0) AS BIGINT)
                   AS n_chars_removed,
               ROUND(CAST(COALESCE(rs.n_removed, 0) AS DOUBLE)
                     / c.n_docs, 4) AS doc_removal_share,
               ROUND(CAST(COALESCE(rs.chars_removed, 0) AS DOUBLE)
                     / c.n_chars, 4) AS char_removal_share
        FROM grid g
        CROSS JOIN corpus c
        LEFT JOIN pair_counts pc ON pc.t_e4 = g.t_e4
        LEFT JOIN removed_stats rs ON rs.t_e4 = g.t_e4
        LEFT JOIN affected_counts ac ON ac.t_e4 = g.t_e4
    """



def q_dedup_threshold_sweep(d: S.Dialect,
                            t_min_e4: int = 7000,
                            step_e4: int = 500,
                            n_steps: int = 5) -> str:
    """Dedup threshold planner: what an n-gram-Jaccard near-dup pass
    would remove at EACH candidate threshold — pairs, affected docs,
    removed docs (keeper = min doc_id: a doc is removed at t iff it
    has a more-similar-than-t partner with a smaller id), and the
    character mass removed.  This is the knob-sweep a pipeline runs
    BEFORE committing to a threshold (the Jaccard analog of the LSH
    banding planner): one similarity pass, a count-only sweep, no
    per-threshold recomputation.

    The pair set is computed ONCE with the lossless prefix filter at
    the grid floor (every pair relevant to any grid threshold has
    J >= t_min, so the sweep loses nothing); thresholds compare in
    exact e4 integer units against the ROUND(…, 4)-quantized Jaccard
    the pair queries already emit.  Scale shape: the sweep adds one
    tiny threshold-series join and two count aggregates on top of the
    candidate machinery — the similarity pass dominates, exactly
    once.  The default grid covers 0.70–0.90 (the range production
    near-dup thresholds actually live in); lowering the floor costs
    pair volume quadratically on uniform-vocabulary corpora like the
    driver fixture (see the q_ngram_jaccard_prefix caveat)."""
    t_min = t_min_e4 / 10000.0
    pairs = q_ngram_jaccard_prefix(d, threshold=t_min)
    return _sweep_accounting(d, pairs, "jaccard",
                             t_min_e4, step_e4, n_steps)


def q_dedup_threshold_sweep_lsh(d: S.Dialect,
                                t_min_e4: int = 5000,
                                step_e4: int = 1250,
                                n_steps: int = 4,
                                doc_table: str = "documents") -> str:
    """The threshold sweep's LAKE-SCALE rung: identical grid join and
    accounting columns to :func:`q_dedup_threshold_sweep`, but the
    pair set is the banded MinHash candidates with the signature-
    agreement ESTIMATE of Jaccard (q_minhash_lsh_pairs) instead of
    the exact PPJoin pass.  On a uniform-vocabulary corpus (like the
    driver fixture) the exact sweep's true pair set itself grows n²
    and no candidate scheme can prune below the output size — the
    banded estimate keeps pair volume at the LSH collision mass and
    the sweep stays linear-ish, at estimate precision 1/8 (eight
    hash functions → the default grid steps by exactly 1250
    e4-units, the estimate's quantum; finer steps are
    indistinguishable).  Planner doctrine: sweep here first, commit a
    threshold, then pay the exact pass once at that threshold."""
    return _sweep_accounting(
        d, q_minhash_lsh_pairs(d, doc_table), "est_jaccard",
        t_min_e4, step_e4, n_steps, doc_table=doc_table)


# ---------------------------------------------------------------------------
# Perceptual image fingerprints (dHash) — the SQL derivation half.
#
# The Spark production path lives in operators/perceptual.py: binary
# image column -> stdlib decode -> luminance -> 9x8 resample -> 60-bit
# difference hash, all inside Arrow-batched mapInPandas kernels.  The
# functions below derive the SAME integers from the deterministic
# pixel grid in pure SQL, so the driver's hash compare proves the
# whole codec pipeline (PNG encode -> decode -> resample -> dHash)
# against an engine that never touches a byte of PNG.
# ---------------------------------------------------------------------------

DHASH_W = 9             # grid width: 9 columns -> 8 comparisons/row
DHASH_H = 8             # grid height
DHASH_BITS = 60         # keep bits 0..59: clear of the BIGINT sign bit
                        # and aligned with the simhash64 conventions
DHASH_BANDS = 4         # 4 x 15-bit bands: pigeonhole for hamming <= 3
DHASH_GROUPS = 2000     # synthetic grid: vec_id % DHASH_GROUPS share a
                        # family (vec_id % 2 perturbs one pixel)
assert DHASH_BITS <= DHASH_H * (DHASH_W - 1)  # bits must fit the comparison grid


def _dhash_lum(d: S.Dialect, fam: str, idx: str, parity: str) -> str:
    """Deterministic synthetic pixel: base luminance is the first MD5
    byte of 'img#<family>#<idx>'; odd-parity members perturb exactly
    ONE pixel (chosen by 'pert#<family>') by +128 mod 256 — flipping
    at most two dHash comparisons, so family members stay within
    hamming <= 2 of each other while unrelated images sit near the
    30-bit random expectation."""
    base = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('img#', CAST({fam} AS STRING), '#', "
        f"CAST({idx} AS STRING))), 1, 2)")
    pert = (f"({d.hex_to_bigint(_md5_pert(fam))} % "
            f"{DHASH_W * DHASH_H})")
    return (f"CASE WHEN {parity} = 1 AND {idx} = {pert} "
            f"THEN (({base}) + 128) % 256 ELSE {base} END")


def _md5_pert(fam: str) -> str:
    return f"SUBSTR(MD5(CONCAT('pert#', CAST({fam} AS STRING))), 1, 2)"


def q_image_dhash(d: S.Dialect) -> str:
    """Pure-SQL derivation of the 60-bit image dHash over the
    synthetic grid keyed by embeddings.vec_id (the driver schema has
    no binary column; the Spark side BUILDS real PNG payloads from
    this exact grid and runs them through the stdlib codec).

    dHash (difference hash): bit i (row r = i//8, col c = i%8) is set
    iff lum(r, c) < lum(r, c+1) on the 9x8 luminance grid — the
    classic gradient fingerprint (Krawetz's dHash), integer-exact in
    both engines."""
    bits = []
    for i in range(DHASH_BITS):
        r, c = divmod(i, DHASH_W - 1)
        left = _dhash_lum(d, "fam", str(r * DHASH_W + c), "parity")
        right = _dhash_lum(d, "fam", str(r * DHASH_W + c + 1), "parity")
        bits.append(f"(CASE WHEN ({left}) < ({right}) "
                    f"THEN {1 << i} ELSE 0 END)")
    packed = "\n                 + ".join(bits)
    return f"""
        WITH keyed AS (
            SELECT vec_id AS media_id,
                   {d.intdiv(f'(vec_id % {DHASH_GROUPS})', '2')} AS fam,
                   (vec_id % {DHASH_GROUPS}) % 2 AS parity
            FROM embeddings
        )
        SELECT media_id, CAST({packed} AS BIGINT) AS dhash
        FROM keyed
    """


def q_image_near_pairs(d: S.Dialect) -> str:
    """Quadratic reference form of the image near-pair set (oracle
    twin of the banded Spark path in operators/perceptual.py):
    all pairs of fingerprints within hamming <= 3."""
    return f"""
        WITH fp AS ({q_image_dhash(d)})
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               bit_count({d.xor('a.dhash', 'b.dhash')}) AS hamming
        FROM fp a JOIN fp b ON a.media_id < b.media_id
        WHERE bit_count({d.xor('a.dhash', 'b.dhash')}) <= 3
    """


# ---------------------------------------------------------------------------
# Distortion-robustness recall audit (VERDICT r11 #2): plant REAL
# distortions through the codecs and measure how many distorted copies
# stay within the shipping near-dup threshold (hamming <= DHASH_BANDS-1)
# of their original.  The oracle derives each distortion's EXACT effect
# on the luminance grid in pure SQL — brightness clips are LEAST/
# GREATEST arithmetic; nearest-neighbor resizes compose two integer
# index maps (src = min(dst*n_in//n_out, n_in-1), the published
# formula) — so the cross-engine hash match proves the real
# encode -> distort -> decode -> resample -> dHash pipeline behaves
# exactly as the integer model predicts.  JPEG re-encode (float DCT +
# quantization) has no bit-exact SQL twin; that class ships as a
# separate rows-only registry entry with pytest-pinned recall values.
# ---------------------------------------------------------------------------

RECALL_BRIGHT_DELTA = 24      # +/- luminance shift; clips at 0/255
RECALL_DOWN_W, RECALL_DOWN_H = 7, 6    # lossy downscale dims
RECALL_UP_W, RECALL_UP_H = 18, 16      # integer x2 upscale dims
RECALL_CLASSES = ("bright_down", "bright_up", "resize_down",
                  "resize_up2")
JPEG_RECALL_QUALITIES = (85, 50)


def _nn_index_map(n_out: int, n_in: int) -> list[int]:
    """resize_nearest's integer source-index map (same published
    formula, derived independently of the numpy code)."""
    return [min(i * n_in // n_out, n_in - 1) for i in range(n_out)]


def _dhash_expr_over(pix) -> str:
    """60-bit dHash SQL expression over a pixel macro pix(r, c)."""
    bits = []
    for i in range(DHASH_BITS):
        r, c = divmod(i, DHASH_W - 1)
        bits.append(f"(CASE WHEN ({pix(r, c)}) < ({pix(r, c + 1)}) "
                    f"THEN {1 << i} ELSE 0 END)")
    return "(" + "\n                 + ".join(bits) + ")"


def q_image_dedup_recall(d: S.Dialect) -> str:
    """Pure-SQL derivation of the distortion-recall table: per
    distortion class over the family originals (even vec_id <
    DHASH_GROUPS), the planted count, how many distorted copies stay
    within hamming <= DHASH_BANDS-1 of their original (= exactly the
    pairs the shipping banded join emits — banding is pigeonhole-
    lossless, proven by image_near_pairs_banded's own oracle), the
    recall in basis points, and the mean hamming in centibits.

    resize_up2 is PROVABLY identity: an integer-factor nearest
    upscale followed by the dHash grid's exact down-map lands every
    sample back on its source pixel (dst*2 -> src dst*2*h//(2h) =
    dst), so its oracle hash is the original's — the Spark side still
    round-trips a real 16x18 PNG to prove the codec path honors it."""
    opix = lambda r, c: _dhash_lum(d, "fam", str(r * DHASH_W + c),
                                   "parity")
    bu = lambda r, c: (f"LEAST(({opix(r, c)}) + {RECALL_BRIGHT_DELTA},"
                       " 255)")
    bd = lambda r, c: (f"GREATEST(({opix(r, c)}) - "
                       f"{RECALL_BRIGHT_DELTA}, 0)")
    # resize_down composition: dHash resamples the (DOWN_H, DOWN_W)
    # image back to (DHASH_H, DHASH_W); each final (r, c) reads the
    # original pixel at (down_rows[gr_rows[r]], down_cols[gr_cols[c]])
    gr_rows = _nn_index_map(DHASH_H, RECALL_DOWN_H)
    gr_cols = _nn_index_map(DHASH_W, RECALL_DOWN_W)
    down_rows = _nn_index_map(RECALL_DOWN_H, DHASH_H)
    down_cols = _nn_index_map(RECALL_DOWN_W, DHASH_W)
    rd = lambda r, c: _dhash_lum(
        d, "fam",
        str(down_rows[gr_rows[r]] * DHASH_W + down_cols[gr_cols[c]]),
        "parity")
    legs = [
        ("bright_down", "h_bd", _dhash_expr_over(bd)),
        ("bright_up", "h_bu", _dhash_expr_over(bu)),
        ("resize_down", "h_rd", _dhash_expr_over(rd)),
        ("resize_up2", "h_orig", None),  # identity by index math
    ]
    hash_cols = ",\n               ".join(
        f"CAST({expr} AS BIGINT) AS {col}"
        for _, col, expr in legs if expr is not None)
    per = "\n            UNION ALL ".join(
        f"SELECT '{name}' AS distortion, "
        f"bit_count({d.xor('h_orig', col)}) AS hamming FROM hashes"
        for name, col, _ in legs)
    return f"""
        WITH keyed AS (
            SELECT vec_id AS media_id,
                   {d.intdiv(f'(vec_id % {DHASH_GROUPS})', '2')} AS fam,
                   (vec_id % {DHASH_GROUPS}) % 2 AS parity
            FROM embeddings
            WHERE vec_id < {DHASH_GROUPS} AND vec_id % 2 = 0
        ),
        hashes AS (
            SELECT media_id,
               CAST({_dhash_expr_over(opix)} AS BIGINT) AS h_orig,
               {hash_cols}
            FROM keyed
        ),
        per AS (
            {per}
        )
        SELECT distortion,
               CAST(COUNT(*) AS BIGINT) AS n_planted,
               CAST(SUM(CASE WHEN hamming <= {DHASH_BANDS - 1}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_recalled,
               CAST({d.intdiv(
                   f'SUM(CASE WHEN hamming <= {DHASH_BANDS - 1} '
                   'THEN 1 ELSE 0 END) * 10000', 'COUNT(*)')}
                    AS BIGINT) AS recall_e4,
               CAST({d.intdiv('SUM(hamming) * 100', 'COUNT(*)')}
                    AS BIGINT) AS mean_hamming_e2
        FROM per
        GROUP BY distortion
    """


def cc_iterative_ctes(rounds: int = 24) -> str:
    """Scalable connected-components oracle fragment (VERDICT r11
    #5): UNROLLED iterative min-label propagation with pointer
    jumping, as a chain of MATERIALIZED CTEs — replaces the
    recursive-CTE ``reach`` fixpoint whose (node, reachable-label)
    working set is QUADRATIC on near-clique graphs (the sf0.1
    25-min/20 GB oracle wall, SCALING.md round-11 notes).

    Expects upstream CTEs ``edges(u, v)`` (each undirected edge in
    BOTH directions) and ``nodes(node)``; emits ``comp(node,
    cluster_id)``.  Per round every node takes the min of its own
    label, its label's label (pointer jump — doubles propagation
    distance, O(log n) convergence), and its neighbors' min label.
    Working set is |V| rows per round and each round is one
    edge-join + one self-join — linear memory, ``rounds``·|E| work.

    Self-auditing: one EXTRA round runs after the last; if any label
    still moves (not converged within ``rounds`` — impossible for
    n <= 2^rounds, pinned by test), every cluster_id comes back NULL
    so the cross-engine hash mismatches LOUDLY instead of silently
    blessing a half-propagated labeling."""
    parts = [
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"]
    for t in range(rounds + 1):
        parts.append(f"""
        l{t + 1} AS MATERIALIZED (
            SELECT u.node,
                   LEAST(u.label,
                         COALESCE(j.label, u.label),
                         COALESCE(nm.ml, u.label)) AS label
            FROM l{t} u
            LEFT JOIN l{t} j ON j.node = u.label
            LEFT JOIN (SELECT e.u AS node, MIN(l.label) AS ml
                       FROM edges e JOIN l{t} l ON l.node = e.v
                       GROUP BY e.u) nm ON nm.node = u.node
        )""")
    parts.append(f"""
        comp AS (
            SELECT f.node,
                   CASE WHEN (SELECT COUNT(*) FROM l{rounds} a
                              JOIN l{rounds + 1} b ON a.node = b.node
                              AND a.label <> b.label) > 0
                        THEN NULL ELSE f.label END AS cluster_id
            FROM l{rounds} f
        )""")
    return ",\n".join(parts)


def q_image_dedup_keep_oracle(d: S.Dialect) -> str:
    """Iterative label-propagation oracle for the perceptual dedup
    keeper (cross-derivation twin of perceptual.image_dedup_keep's
    large-star/small-star CC — independent because the round
    structure, join shape, and engine all differ): min-label
    propagation with pointer jumping over the quadratic pair set,
    min-id keeper.  Replaced the recursive-CTE ``reach`` fixpoint in
    round 12: its working set is quadratic on near-clique graphs
    (the sf0.1 oracle wall); this form is linear per round — see
    :func:`cc_iterative_ctes`."""
    return f"""
        WITH
        fp AS MATERIALIZED ({q_image_dhash(d)}),
        pairs AS MATERIALIZED (
            SELECT a.media_id AS media_a, b.media_id AS media_b
            FROM fp a JOIN fp b ON a.media_id < b.media_id
            WHERE bit_count({d.xor('a.dhash', 'b.dhash')}) <= 3
        ),
        edges AS MATERIALIZED (
            SELECT media_a AS u, media_b AS v FROM pairs
            UNION ALL
            SELECT media_b, media_a FROM pairs
        ),
        nodes AS MATERIALIZED (SELECT media_id AS node FROM fp),
        {cc_iterative_ctes()}
        SELECT node AS media_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               CAST(CASE WHEN node = cluster_id THEN 1 ELSE 0 END
                    AS INT) AS is_keeper
        FROM comp
    """


# ---------------------------------------------------------------------------
# Perceptual AUDIO fingerprints (energy-sign hash) — SQL derivation half.
#
# The audio twin of the dHash family: decoded PCM -> per-segment
# integer L1 energy over EHASH_SEGMENTS time segments -> bit i set iff
# energy(i) < energy(i+1) (the sign-of-gradient fingerprint the
# classic audio fingerprinting literature builds on, reduced to the
# energy envelope).  Spark runs the real WAV codec
# (operators/perceptual.py); the SQL below derives the same integers
# from the deterministic amplitude grid.
# ---------------------------------------------------------------------------

EHASH_SEGMENTS = 61      # 61 segments -> 60 gradient bits
EHASH_SEG_LEN = 8        # samples per segment (constant amplitude)
EHASH_AMP_STEP = 100     # amplitude = md5 byte * step (< 32767)


def _ehash_amp_byte(d: S.Dialect, fam: str, idx: str, parity: str) -> str:
    """Deterministic per-segment amplitude byte: first MD5 byte of
    'aud#<family>#<idx>'; odd-parity members perturb ONE segment
    (chosen by 'pertA#<family>') by +128 mod 256 — flipping at most
    two energy-gradient bits (the dHash planting argument on the
    time axis)."""
    base = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('aud#', CAST({fam} AS STRING), '#', "
        f"CAST({idx} AS STRING))), 1, 2)")
    pert = (f"({d.hex_to_bigint(_md5_pert_a(fam))} % {EHASH_SEGMENTS})")
    return (f"CASE WHEN {parity} = 1 AND {idx} = {pert} "
            f"THEN (({base}) + 128) % 256 ELSE {base} END")


def _md5_pert_a(fam: str) -> str:
    return f"SUBSTR(MD5(CONCAT('pertA#', CAST({fam} AS STRING))), 1, 2)"


def q_audio_ehash(d: S.Dialect) -> str:
    """Pure-SQL derivation of the 60-bit audio energy hash over the
    synthetic amplitude grid keyed by embeddings.vec_id.  Constant
    amplitude per segment makes segment L1 energy = EHASH_SEG_LEN *
    amplitude, so the gradient comparison reduces EXACTLY to comparing
    the amplitude bytes — what the decoded-PCM Spark kernel computes
    from the reconstructed integer samples."""
    bits = []
    for i in range(EHASH_SEGMENTS - 1):
        left = _ehash_amp_byte(d, "fam", str(i), "parity")
        right = _ehash_amp_byte(d, "fam", str(i + 1), "parity")
        bits.append(f"(CASE WHEN ({left}) < ({right}) "
                    f"THEN {1 << i} ELSE 0 END)")
    packed = "\n                 + ".join(bits)
    return f"""
        WITH keyed AS (
            SELECT vec_id AS media_id,
                   {d.intdiv(f'(vec_id % {DHASH_GROUPS})', '2')} AS fam,
                   (vec_id % {DHASH_GROUPS}) % 2 AS parity
            FROM embeddings
        )
        SELECT media_id, CAST({packed} AS BIGINT) AS ehash
        FROM keyed
    """


def q_audio_near_pairs(d: S.Dialect) -> str:
    """Quadratic reference form of the audio near-pair set (oracle
    twin of the banded Spark path)."""
    return f"""
        WITH fp AS ({q_audio_ehash(d)})
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               bit_count({d.xor('a.ehash', 'b.ehash')}) AS hamming
        FROM fp a JOIN fp b ON a.media_id < b.media_id
        WHERE bit_count({d.xor('a.ehash', 'b.ehash')}) <= 3
    """


# ---------------------------------------------------------------------------
# Spectral audio fingerprint ("sHash", VERDICT r11 #3) — SQL half.
#
# The r11 eHash is a time-domain energy envelope: it provably cannot
# distinguish equal-energy different-pitch clips (a tone at bin 2 and
# a tone at bin 4 with DC >= amplitude have IDENTICAL per-segment L1
# envelopes — see tests/test_perceptual.py::TestSpectralHash).  The
# spectral hash is the Haitsma–Kalker robust-fingerprint shape
# (public audio-fingerprinting literature) reduced to this clip
# grid: per 8-sample window, rFFT band energies; bit = sign of the
# TIME-DELTA of adjacent BAND-energy differences.
#
# Cross-engine exactness: the kernel runs numpy's real rFFT (the true
# float DSP path); the oracle computes band energies by exact integer
# algebra.  Bins 0/2/4 of an 8-point DFT have twiddles in {±1, ±i},
# so their energies are integers and float64 reproduces them
# BIT-EXACTLY (|X|^2 < 2^53; verified over random int16 windows) —
# the hash match therefore proves the float FFT agrees with integer
# algebra on every window.  Bins 1/3 involve sqrt(2)/2 and are
# excluded from the band set for exactly that reason (documented
# restriction, not a limitation of the Spark side).
#
# Synthetic clip grid: segment j carries a pure tone at bin k_j in
# {2, 4} with amplitude A_j over a DC offset D_j >= A_j (so the L1
# envelope is 8*D_j*STEP regardless of pitch — the eHash blind spot
# is BUILT INTO the fixture).  Band energies (x STEP^2):
#   B0 = (8 D)^2,  B1 = |X_2|^2 = (4A)^2 if k=2 else 0,
#   B2 = |X_4|^2 = (8A)^2 if k=4 else 0.
# Odd parity perturbs ONE segment's DC by +64: only B0 of that
# segment moves -> at most 2 bits flip (planted near-dup), while a
# pitch flip moves B1/B2 by (4A)^2..(8A)^2 -> many bits.
# ---------------------------------------------------------------------------

SPEC_SEGMENTS = 31      # 31 windows -> 30 time-deltas x 2 band-deltas
SPEC_SEG_LEN = 8        # rFFT window
SPEC_AMP_STEP = 64      # max |sample| = (320+128)*64 = 28672 < 32767


def _spec_md5(d: S.Dialect, tag: str, fam: str, idx: str) -> str:
    return d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('{tag}#', CAST({fam} AS STRING), '#', "
        f"CAST({idx} AS STRING))), 1, 2)")


def _spec_params(d: S.Dialect, fam: str, j: int,
                 parity: str) -> tuple[str, str, str]:
    """(D, A, k) SQL expressions for segment j: DC 129..256 (+64 on
    the odd-parity perturbed segment), amplitude 1..128, tone bin
    2 or 4."""
    dc = (f"(129 + {d.intdiv(_spec_md5(d, 'sd', fam, str(j)), '2')})")
    pert = (f"({d.hex_to_bigint(_md5_pert_s(fam))} % {SPEC_SEGMENTS})")
    dc = (f"(CASE WHEN {parity} = 1 AND {j} = {pert} "
          f"THEN {dc} + 64 ELSE {dc} END)")
    amp = f"(1 + {d.intdiv(_spec_md5(d, 'sa', fam, str(j)), '2')})"
    tone = f"(2 + 2 * ({_spec_md5(d, 'st', fam, str(j))} % 2))"
    return dc, amp, tone


def _md5_pert_s(fam: str) -> str:
    return f"SUBSTR(MD5(CONCAT('pertS#', CAST({fam} AS STRING))), 1, 2)"


def q_audio_spectral_hash(d: S.Dialect) -> str:
    """Pure-SQL derivation of the 60-bit spectral hash: per-segment
    integer band energies (the exact-bin algebra above), band deltas
    d0 = B0-B1, d1 = B1-B2, bit (j-1)*2+b set iff d_b[j] > d_b[j-1]."""
    step2 = SPEC_AMP_STEP * SPEC_AMP_STEP
    delta_cols = []
    for j in range(SPEC_SEGMENTS):
        dc, amp, tone = _spec_params(d, "fam", j, "parity")
        b0 = f"(64 * {dc} * {dc} * {step2})"
        b1 = (f"(CASE WHEN {tone} = 2 THEN 16 * {amp} * {amp} * {step2}"
              f" ELSE 0 END)")
        b2 = (f"(CASE WHEN {tone} = 4 THEN 64 * {amp} * {amp} * {step2}"
              f" ELSE 0 END)")
        delta_cols.append(f"({b0} - {b1}) AS d0_{j}")
        delta_cols.append(f"({b1} - {b2}) AS d1_{j}")
    bits = []
    for j in range(1, SPEC_SEGMENTS):
        for b in (0, 1):
            i = (j - 1) * 2 + b
            bits.append(f"(CASE WHEN d{b}_{j} > d{b}_{j - 1} "
                        f"THEN {1 << i} ELSE 0 END)")
    packed = "\n                 + ".join(bits)
    cols = ",\n                   ".join(delta_cols)
    return f"""
        WITH keyed AS (
            SELECT vec_id AS media_id,
                   {d.intdiv(f'(vec_id % {DHASH_GROUPS})', '2')} AS fam,
                   (vec_id % {DHASH_GROUPS}) % 2 AS parity
            FROM embeddings
        ),
        deltas AS (
            SELECT media_id,
                   {cols}
            FROM keyed
        )
        SELECT media_id, CAST({packed} AS BIGINT) AS shash
        FROM deltas
    """


def q_audio_spectral_near_pairs(d: S.Dialect) -> str:
    """Quadratic reference form of the spectral near-pair set (oracle
    twin of the banded Spark path)."""
    return f"""
        WITH fp AS ({q_audio_spectral_hash(d)})
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               bit_count({d.xor('a.shash', 'b.shash')}) AS hamming
        FROM fp a JOIN fp b ON a.media_id < b.media_id
        WHERE bit_count({d.xor('a.shash', 'b.shash')}) <= 3
    """


# ---------------------------------------------------------------------------
# Perceptual VIDEO fingerprints — SQL derivation half.
#
# A video is frame-sampled into VHASH_FRAMES stills (the lake layout
# is an array<binary> frames column; at 100 TB the sampler lives in
# the ingest kernel).  Each frame gets the image dHash; two videos are
# near-duplicates when they SHARE >= VHASH_MIN_COMMON frame hashes —
# set containment over exact 60-bit frame fingerprints, the
# inverted-index join shape (winnowing's argument on frames), never
# an all-pairs product.
# ---------------------------------------------------------------------------

VHASH_FRAMES = 4        # sampled frames per video
VHASH_MIN_COMMON = 3    # shared-frame threshold for a near-pair


def _vframe_lum(d: S.Dialect, fam: str, frame: str, idx: str,
                parity: str) -> str:
    """Deterministic pixel of frame ``frame``: base from
    'vid#<family>#<frame>#<idx>'; odd-parity members REPLACE one whole
    frame (chosen by 'pertV#<family>') with an alternate grid
    ('vidX#...') — family members share VHASH_FRAMES - 1 frames."""
    base = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('vid#', CAST({fam} AS STRING), '#', "
        f"CAST({frame} AS STRING), '#', CAST({idx} AS STRING))), 1, 2)")
    alt = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('vidX#', CAST({fam} AS STRING), '#', "
        f"CAST({frame} AS STRING), '#', CAST({idx} AS STRING))), 1, 2)")
    pert = (f"({d.hex_to_bigint(_md5_pert_v(fam))} % {VHASH_FRAMES})")
    return (f"CASE WHEN {parity} = 1 AND {frame} = {pert} "
            f"THEN {alt} ELSE {base} END")


def _md5_pert_v(fam: str) -> str:
    return f"SUBSTR(MD5(CONCAT('pertV#', CAST({fam} AS STRING))), 1, 2)"


def q_video_frame_dhash(d: S.Dialect) -> str:
    """Pure-SQL derivation of the per-frame dHash table
    (media_id, frame_idx, dhash) over the synthetic frame grids keyed
    by embeddings.vec_id."""
    bits = []
    for i in range(DHASH_BITS):
        r, c = divmod(i, DHASH_W - 1)
        left = _vframe_lum(d, "fam", "frame_idx",
                           str(r * DHASH_W + c), "parity")
        right = _vframe_lum(d, "fam", "frame_idx",
                            str(r * DHASH_W + c + 1), "parity")
        bits.append(f"(CASE WHEN ({left}) < ({right}) "
                    f"THEN {1 << i} ELSE 0 END)")
    packed = "\n                 + ".join(bits)
    return f"""
        WITH keyed AS (
            SELECT vec_id AS media_id,
                   {d.intdiv(f'(vec_id % {DHASH_GROUPS})', '2')} AS fam,
                   (vec_id % {DHASH_GROUPS}) % 2 AS parity
            FROM embeddings
        ),
        frames AS (
            SELECT media_id, fam, parity,
                   CAST({d.explode_range(str(VHASH_FRAMES))} AS BIGINT)
                       AS frame_idx
            FROM keyed
        )
        SELECT media_id, frame_idx, CAST({packed} AS BIGINT) AS dhash
        FROM frames
    """


def q_video_near_pairs(d: S.Dialect,
                       min_common: int = VHASH_MIN_COMMON) -> str:
    """Video near-pairs by shared-frame containment: DISTINCT frame
    hashes per video, inverted-index equi-join on the hash, pairs
    with >= ``min_common`` shared frames.  The join volume tracks
    true frame-duplication density (random 60-bit collisions are
    negligible) — the winnowing shape on frames."""
    return f"""
        WITH fh AS (
            SELECT DISTINCT media_id, dhash
            FROM ({q_video_frame_dhash(d)}) t
        )
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM fh a JOIN fh b
          ON a.dhash = b.dhash AND a.media_id < b.media_id
        GROUP BY a.media_id, b.media_id
        HAVING COUNT(*) >= {min_common}
    """


def q_video_shingle_pairs(d: S.Dialect, min_common: int = 1) -> str:
    """ORDER-AWARE video shingle pairs (oracle twin of
    operators/perceptual.video_shingle_pairs): order-2 frame-hash
    shingles via LEAD, inverted-index join on the shingle value,
    gaps-and-islands (pos - ROW_NUMBER at constant offset) for the
    longest common aligned frame run."""
    return f"""
        WITH fp AS ({q_video_frame_dhash(d)}),
        sh AS (
            SELECT media_id, frame_idx AS pos, dhash AS h0,
                   LEAD(dhash) OVER (PARTITION BY media_id
                                     ORDER BY frame_idx) AS h1
            FROM fp
        ),
        sh2 AS (SELECT * FROM sh WHERE h1 IS NOT NULL),
        m AS (
            SELECT a.media_id AS media_a, b.media_id AS media_b,
                   a.h0 AS h0, a.h1 AS h1,
                   a.pos AS pos_a, a.pos - b.pos AS off
            FROM sh2 a JOIN sh2 b
              ON a.h0 = b.h0 AND a.h1 = b.h1
             AND a.media_id < b.media_id
        ),
        islands AS (
            SELECT media_a, media_b, off,
                   pos_a - ROW_NUMBER() OVER (
                       PARTITION BY media_a, media_b, off
                       ORDER BY pos_a) AS grp
            FROM m
        ),
        runs AS (
            SELECT media_a, media_b,
                   CAST(MAX(island) + 1 AS BIGINT) AS longest_run
            FROM (
                SELECT media_a, media_b, off, grp,
                       COUNT(*) AS island
                FROM islands
                GROUP BY media_a, media_b, off, grp
            ) t
            GROUP BY media_a, media_b
        ),
        nc AS (
            SELECT media_a, media_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common_shingles
            FROM (SELECT DISTINCT media_a, media_b, h0, h1 FROM m) t
            GROUP BY media_a, media_b
        )
        SELECT nc.media_a, nc.media_b, nc.n_common_shingles,
               runs.longest_run
        FROM nc JOIN runs
          ON nc.media_a = runs.media_a AND nc.media_b = runs.media_b
        WHERE nc.n_common_shingles >= {min_common}
    """
