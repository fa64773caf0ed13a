"""Count-min and HyperLogLog sketches, dialect-rendered.

The classic heavy-hitter sketch (Cormode/Muthukrishnan '05) as a
first-class relational operator: ``depth`` seeded MD5 hash rows map
each token into a ``width``-cell row, cell counts are a plain
partial-aggregated groupBy (one shuffle of at most depth×width
groups), and a point estimate is the MIN over the token's depth
cells.  Everything is deterministic (seeded MD5, no RNG state), so
the DuckDB oracle hash-matches the Spark run exactly — the driver
verifies both the sketch construction AND its estimation guarantee
(estimate >= truth, overcount bounded by row collisions).

``q_hll_distinct`` is the same idea for COUNT(DISTINCT): a full
HyperLogLog (Flajolet '07) built relationally — seeded MD5 splits
into a register index and a 48-bit suffix, registers are MAX(rho)
over a groupBy, and the harmonic-mean estimate (with the
small-range linear-counting correction) comes out of one more
aggregation.  The float-drift trap is the harmonic sum Σ 2^-M:
summed as doubles its value depends on accumulation order, so both
dialects sum the EXACT integer 2^(49-M) as BIGINT and divide once
at the end — the estimate is bit-identical cross-engine and the
driver hash-verifies estimate AND error, not just a tolerance bit.

At 100 TB the sketches are THE way to get approximate vocabulary
heavy hitters / user cardinalities without shuffling the full
stream: the sketch tables are O(width) rows regardless of corpus
size, and merging shards is cell-wise addition (CMS) or
register-wise MAX (HLL) — associative, like the curve bases in
plans/incremental.py.
"""

from __future__ import annotations

from . import sql_shared as S

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cell(d: S.Dialect, tok: str, row: str) -> str:
    """Deterministic cell index in [0, width): low 2 hex chars of the
    row-seeded MD5.  Hex→int via a 2-char nibble decode (shared
    HEX_NIBBLE trick from dedup_sql's SimHash)."""
    from .dedup_sql import _nibble

    h = f"MD5(CONCAT(CAST({row} AS STRING), '#', {tok}))"
    hi = _nibble(f"SUBSTR({h}, 1, 1)")
    lo = _nibble(f"SUBSTR({h}, 2, 1)")
    return f"({hi} * 16 + {lo})"


def cms_cte(d: S.Dialect, depth: int = CMS_DEPTH) -> str:
    """The sketch table: (rw, cell, cnt) — depth×width rows total.

    Spark rendering counts tokens FIRST (``tcnt``) and derives the
    sketch by summing those counts into cells: the ``depth`` MD5 cell
    hashes run per DISTINCT token instead of per occurrence (guide
    §1.2 "per-task work"), and the heavy-hitter query's ``truth`` CTE
    reads the same aggregate instead of re-tokenizing the corpus —
    cell counts are identical (Σ occurrences hashing to a cell =
    Σ per-token counts of tokens hashing to it).  DuckDB keeps the
    per-occurrence textbook derivation, so the driver hash still
    cross-verifies the cell layout from two independent shapes."""
    if d.name == "spark":
        return f"""
        toks AS (
            SELECT tok FROM (
                SELECT {d.explode_tokens('text')} AS tok FROM documents
            ) t WHERE tok <> ''
        ),
        tcnt AS (
            SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok
        ),
        hashed AS (
            SELECT s.i AS rw, {_cell(d, 'tok', 's.i')} AS cell, tf
            FROM tcnt CROSS JOIN {d.series(depth)} AS s
        ),
        cms AS (
            SELECT rw, cell, SUM(tf) AS cnt
            FROM hashed GROUP BY rw, cell
        )
    """
    return f"""
        toks AS (
            SELECT tok FROM (
                SELECT {d.explode_tokens('text')} AS tok FROM documents
            ) t WHERE tok <> ''
        ),
        hashed AS (
            SELECT s.i AS rw, {_cell(d, 'tok', 's.i')} AS cell
            FROM toks CROSS JOIN {d.series(depth)} AS s
        ),
        cms AS (
            SELECT rw, cell, COUNT(*) AS cnt
            FROM hashed GROUP BY rw, cell
        )
    """


def q_countmin_heavy_hitters(d: S.Dialect, k: int = 20,
                             depth: int = CMS_DEPTH) -> str:
    """Top-k true-frequency tokens with their count-min estimates:
    (tok, true_tf, cms_estimate, overcount).  The hash match pins the
    sketch's exact cell layout AND that estimate >= truth for every
    reported token."""
    truth = ("SELECT tok, tf AS true_tf FROM tcnt" if d.name == "spark"
             else "SELECT tok, COUNT(*) AS true_tf FROM toks GROUP BY tok")
    return f"""
        WITH {cms_cte(d, depth)},
        truth AS (
            {truth}
        ),
        top AS (
            SELECT tok, true_tf,
                   ROW_NUMBER() OVER (ORDER BY true_tf DESC, tok) AS rank
            FROM truth
        ),
        est AS (
            SELECT t.tok, t.true_tf, t.rank, MIN(c.cnt) AS cms_estimate
            FROM top t
            CROSS JOIN {d.series(depth)} AS s
            JOIN cms c ON c.rw = s.i
                      AND c.cell = {_cell(d, 't.tok', 's.i')}
            WHERE t.rank <= {k}
            GROUP BY t.tok, t.true_tf, t.rank
        )
        SELECT tok, true_tf, cms_estimate,
               cms_estimate - true_tf AS overcount
        FROM est
    """

HLL_M = 256        # registers: first 2 hex nibbles of the hash
HLL_RHO_MAX = 49   # 48-bit suffix -> leading-zero rank in [1, 49]
_POW2_49 = 1 << 49


def _hll_w(h: str) -> str:
    """The 48-bit hash suffix (hex chars 3..14) as one BIGINT."""
    from .dedup_sql import _nibble

    terms = " + ".join(
        f"{_nibble(f'SUBSTR({h}, {pos}, 1)')}"
        f" * CAST({16 ** (14 - pos)} AS BIGINT)"
        for pos in range(3, 15))
    return f"({terms})"


def _hll_rho(w: str) -> str:
    """rho(w) = leading zeros of the 48-bit suffix + 1 — a pure
    integer CASE ladder, no log2/float anywhere."""
    whens = " ".join(
        f"WHEN {w} >= {1 << (48 - k)} THEN {k}" for k in range(1, 49))
    return f"(CASE {whens} ELSE {HLL_RHO_MAX} END)"


def q_hll_distinct(d: S.Dialect, seed: str = "hll1") -> str:
    """Per-event-type HyperLogLog cardinality vs exact truth:
    (event_type, n_exact, hll_est, rel_err_pct).

    Scale shape: the register build is ONE partial-aggregatable
    groupBy whose output is <= groups x 256 rows no matter how many
    input rows — at 100 TB this replaces COUNT(DISTINCT)'s full
    repartition of the raw keys.  The exact COUNT(DISTINCT) column
    exists only so the driver can verify the estimate's error; the
    production path would emit the sketch alone.
    """
    # every float literal CAST to DOUBLE: Spark folds bare decimal
    # literals into DECIMAL arithmetic, whose rounding diverges from
    # DuckDB's double path
    alpha = ("(CAST(0.7213 AS DOUBLE) "
             "/ (1.0 + CAST(1.079 AS DOUBLE) / 256.0))")
    return f"""
        WITH h AS (
            SELECT event_type,
                   MD5(CONCAT('{seed}#', CAST(user_id AS STRING))) AS hx
            FROM events
        ),
        bw AS (
            SELECT event_type,
                   ({_nibble_ref("SUBSTR(hx, 1, 1)")} * 16
                    + {_nibble_ref("SUBSTR(hx, 2, 1)")}) AS bucket,
                   {_hll_w('hx')} AS w
            FROM h
        ),
        regs AS (
            SELECT event_type, bucket, MAX({_hll_rho('w')}) AS mr
            FROM bw GROUP BY event_type, bucket
        ),
        agg AS (
            SELECT event_type,
                   SUM(CAST(POWER(2.0, {HLL_RHO_MAX} - mr) AS BIGINT))
                       AS t_present,
                   COUNT(*) AS n_buckets
            FROM regs GROUP BY event_type
        ),
        est AS (
            SELECT event_type,
                   ({HLL_M} - n_buckets) AS v_zero,
                   {alpha} * {HLL_M * HLL_M} * CAST({_POW2_49} AS DOUBLE)
                     / (t_present + ({HLL_M} - n_buckets) * {_POW2_49})
                       AS e_raw
            FROM agg
        ),
        fin AS (
            SELECT event_type, v_zero,
                   CASE WHEN e_raw <= {int(2.5 * HLL_M)} AND v_zero > 0
                        THEN {HLL_M} * LN(CAST({HLL_M} AS DOUBLE) / v_zero)
                        ELSE e_raw END AS e
            FROM est
        ),
        truth AS (
            SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
            FROM events GROUP BY event_type
        )
        SELECT t.event_type, t.n_exact,
               ROUND(f.e, 2) AS hll_est,
               ROUND(CAST(100 AS DOUBLE) * (f.e - t.n_exact) / t.n_exact, 2)
                   AS rel_err_pct
        FROM truth t JOIN fin f ON t.event_type = f.event_type
        ORDER BY t.event_type
    """


def _nibble_ref(c: str) -> str:
    from .dedup_sql import _nibble

    return _nibble(c)


HIST_BIN_WIDTH = 10.0
HIST_QUANTILES = (0.5, 0.9, 0.95, 0.99)


def q_histogram_quantiles(d: S.Dialect,
                          width: float = HIST_BIN_WIDTH) -> str:
    """Equi-width histogram quantile sketch over ``events.value``:
    (pct, n, est_micros, exact_micros, abs_err_micros).

    The sketch is ONE partial-aggregatable groupBy producing <=
    range/width bins regardless of input rows — the 100 TB substitute
    for a full-sort percentile; bins merge across shards by count
    addition like the CMS cells.  Estimates interpolate linearly
    inside the covering bin.  Bin ids are FLOOR(value/width): IEEE
    double division + FLOOR are bit-identical cross-engine, so the
    driver hash-verifies the full estimate.  The ``exact_micros``
    column (rank-statistic via one window sort) exists only so the
    driver also pins the estimation error — a production run emits
    the sketch alone (the exact sort is the thing this operator
    avoids).

    Every emitted column is integer-exact (quantile as percent,
    values as BIGINT micro-units): round-4's only red driver row was
    this query's ROUND(float, 6) doubles hash-flipping at a
    representation boundary while both engines agreed on every
    digit — integers leave no formatting to disagree on.
    """
    w = f"CAST({width} AS DOUBLE)"
    qs = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS p" for q in HIST_QUANTILES)
    return f"""
        WITH vals AS (
            SELECT value FROM events WHERE value IS NOT NULL
        ),
        hist AS (
            SELECT CAST(FLOOR(value / {w}) AS BIGINT) AS bin,
                   COUNT(*) AS cnt
            FROM vals GROUP BY 1
        ),
        cum AS (
            SELECT bin, cnt,
                   SUM(cnt) OVER (ORDER BY bin
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cnt) OVER () AS n
            FROM hist
        ),
        qs AS ({qs}),
        pick AS (
            SELECT q.p, c.bin, c.cnt, c.cum, c.n,
                   ROW_NUMBER() OVER (PARTITION BY q.p
                                      ORDER BY c.bin) AS rk
            FROM qs q JOIN cum c ON c.cum >= q.p * c.n
        ),
        ranked_vals AS (
            SELECT value,
                   ROW_NUMBER() OVER (ORDER BY value) AS vrk,
                   COUNT(*) OVER () AS n
            FROM vals
        ),
        exact AS (
            SELECT q.p, MIN(r.value) AS exact_v
            FROM qs q JOIN ranked_vals r
              ON r.vrk = CAST(CEIL(q.p * r.n) AS BIGINT)
            GROUP BY q.p
        )
        SELECT CAST(ROUND(p.p * 100) AS INT) AS pct,
               CAST(p.n AS BIGINT) AS n,
               CAST(ROUND((p.bin * {w}
                     + (p.p * p.n - (p.cum - p.cnt)) / p.cnt * {w})
                     * 1e6) AS BIGINT) AS est_micros,
               CAST(ROUND(e.exact_v * 1e6) AS BIGINT) AS exact_micros,
               CAST(ROUND(ABS(p.bin * {w}
                     + (p.p * p.n - (p.cum - p.cnt)) / p.cnt * {w}
                     - e.exact_v) * 1e6) AS BIGINT) AS abs_err_micros
        FROM pick p JOIN exact e ON e.p = p.p
        WHERE p.rk = 1
        ORDER BY pct
    """


BLOOM_WORDS = 32        # 32 x 60-bit words = 1920 bits
BLOOM_WORD_BITS = 60    # stay clear of the BIGINT sign bit
BLOOM_K = 3             # hash functions


def _bloom_pos(d: S.Dialect, tok: str, k: str) -> str:
    """Deterministic bit position in [0, words*word_bits): 4 seeded
    MD5 nibbles -> 16 bits -> modulo the filter size."""
    h = f"MD5(CONCAT('bloom', CAST({k} AS STRING), '#', {tok}))"
    n = " + ".join(
        f"{_nibble_ref(f'SUBSTR({h}, {pos}, 1)')} * {16 ** (4 - pos)}"
        for pos in range(1, 5))
    return f"(({n}) % {BLOOM_WORDS * BLOOM_WORD_BITS})"


def q_bloom_membership(d: S.Dialect, k: int = BLOOM_K) -> str:
    """Bloom-filter membership probe: build a {BLOOM_WORDS}x60-bit
    filter over the distinct tokens of the lexicographically FIRST
    source, probe every other source's distinct tokens against it,
    and report per-source truth-vs-filter counts:
    (source, n_probed, n_flagged, n_truly_shared, n_false_pos).

    Scale shape: the filter build is one partial-aggregatable BIT_OR
    groupBy collapsing to {BLOOM_WORDS} rows total (broadcast to the
    probe side); probing is a map-side word lookup + AND per hash —
    the relational form of the bloom-join prune that skips shuffling
    probe rows that cannot match.  The false-positive count the
    driver hash-verifies IS the sketch's quality statement.

    Plan note: the probe's ``word IN (wpos_0..k)`` and the
    ``source <> base`` comparison each plan as a
    BroadcastNestedLoopJoin, which is correct and bounded here — the
    build sides are the 32-row filter table and the 1-row base
    scalar, constants independent of corpus size.
    """
    probes = " AND ".join(
        f"MAX(CASE WHEN pw.word = wpos_{i} THEN pw.bits ELSE 0 END)"
        f" & bval_{i} <> 0"
        for i in range(k))
    wcols = ", ".join(
        f"CAST({_bloom_pos(d, 'tok', str(i))} / {BLOOM_WORD_BITS} AS INT)"
        f" AS wpos_{i}, "
        + d.shl1(f"{_bloom_pos(d, 'tok', str(i))} % {BLOOM_WORD_BITS}")
        + f" AS bval_{i}"
        for i in range(k))
    if d.name == "spark":
        # one stamping of the 12-MD5 ``keyed`` projection exploded k
        # ways instead of a k-branch UNION ALL re-stamping it per hash
        # (identical (tok, word, bits) rows)
        wb = ", ".join(f"named_struct('word', wpos_{i}, "
                       f"'bits', bval_{i})" for i in range(k))
        sets = (f"SELECT tok, wb.word AS word, wb.bits AS bits "
                f"FROM keyed LATERAL VIEW explode(array({wb})) t AS wb")
    else:
        sets = " UNION ALL ".join(
            f"SELECT tok, wpos_{i} AS word, bval_{i} AS bits FROM keyed"
            for i in range(k))
    in_list = ", ".join(f"kk.wpos_{i}" for i in range(k))
    group_cols = ", ".join(f"kk.wpos_{i}, kk.bval_{i}" for i in range(k))
    return f"""
        WITH toks AS (
            SELECT DISTINCT source, tok FROM (
                SELECT source, {d.explode_tokens('text')} AS tok
                FROM documents
            ) t WHERE tok <> ''
        ),
        base AS (SELECT MIN(source) AS src FROM toks),
        keyed AS (
            SELECT tok, {wcols} FROM (SELECT DISTINCT tok FROM toks)
        ),
        filt AS (
            SELECT s.word, BIT_OR(s.bits) AS bits
            FROM ({sets}) s
            JOIN toks t ON t.tok = s.tok
            JOIN base b ON t.source = b.src
            GROUP BY s.word
        ),
        probe AS (
            SELECT t.source, t.tok,
                   CASE WHEN {probes} THEN 1 ELSE 0 END AS flagged
            FROM toks t
            JOIN base b ON t.source <> b.src
            JOIN keyed kk ON kk.tok = t.tok
            LEFT JOIN filt pw ON pw.word IN ({in_list})
            GROUP BY t.source, t.tok, {group_cols}
        ),
        truth AS (
            SELECT DISTINCT t.tok FROM toks t
            JOIN base b ON t.source = b.src
        )
        SELECT p.source,
               CAST(COUNT(*) AS BIGINT) AS n_probed,
               CAST(SUM(p.flagged) AS BIGINT) AS n_flagged,
               CAST(SUM(CASE WHEN tr.tok IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_truly_shared,
               CAST(SUM(CASE WHEN p.flagged = 1 AND tr.tok IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
        FROM probe p
        LEFT JOIN truth tr ON tr.tok = p.tok
        GROUP BY p.source
    """


def q_hll_shard_merge(d: S.Dialect, seed: str = "hll1") -> str:
    """HLL MERGEABILITY, verified in the gate: build per-day shard
    sketches (the artifact each day's job would persist), merge them
    register-wise (MAX per bucket — associative, order-free), and
    emit the merged estimate next to the direct single-pass estimate
    with an equality flag.  At 100 TB this is the whole point of the
    sketch: per-shard register tables are 256 rows each, the merge
    touches sketches only, and the estimate never rescans history —
    same contract as the mergeable curve bases in plans/incremental.
    The harmonic term stays an exact BIGINT (2^(49−rho)), so merged
    == direct is bit-exact and the driver hash pins it."""
    alpha = ("(CAST(0.7213 AS DOUBLE) "
             "/ (1.0 + CAST(1.079 AS DOUBLE) / 256.0))")
    if d.name == "spark":
        day = "(unix_timestamp(ts) div 86400)"
    else:
        day = "(epoch_us(ts) // 1000000 // 86400)"

    def est_chain(regs: str, sfx: str) -> str:
        return f"""
        agg{sfx} AS (
            SELECT SUM(CAST(POWER(2.0, {HLL_RHO_MAX} - mr) AS BIGINT))
                       AS t_present,
                   COUNT(*) AS n_buckets
            FROM {regs}
        ),
        fin{sfx} AS (
            SELECT CASE WHEN e_raw <= {int(2.5 * HLL_M)} AND v_zero > 0
                        THEN {HLL_M} * LN(CAST({HLL_M} AS DOUBLE) / v_zero)
                        ELSE e_raw END AS e
            FROM (
                SELECT ({HLL_M} - n_buckets) AS v_zero,
                       {alpha} * {HLL_M * HLL_M} * CAST({_POW2_49} AS DOUBLE)
                         / (t_present + ({HLL_M} - n_buckets) * {_POW2_49})
                           AS e_raw
                FROM agg{sfx}
            ) x
        )"""

    return f"""
        WITH bw AS (
            SELECT {day} AS day,
                   ({_nibble_ref("SUBSTR(hx, 1, 1)")} * 16
                    + {_nibble_ref("SUBSTR(hx, 2, 1)")}) AS bucket,
                   {_hll_w('hx')} AS w
            FROM (
                SELECT ts,
                       MD5(CONCAT('{seed}#', CAST(user_id AS STRING))) AS hx
                FROM events
            ) h
        ),
        shard_regs AS (
            SELECT day, bucket, MAX({_hll_rho('w')}) AS mr
            FROM bw GROUP BY day, bucket
        ),
        merged_regs AS (
            SELECT bucket, MAX(mr) AS mr FROM shard_regs GROUP BY bucket
        ),
        direct_regs AS (
            SELECT bucket, MAX({_hll_rho('w')}) AS mr
            FROM bw GROUP BY bucket
        ),
        {est_chain('merged_regs', '_m')},
        {est_chain('direct_regs', '_d')},
        nsh AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_shards
                FROM shard_regs)
        SELECT nsh.n_shards,
               ROUND(fm.e, 2) AS merged_est,
               ROUND(fd.e, 2) AS direct_est,
               CAST(CASE WHEN fm.e = fd.e THEN 1 ELSE 0 END AS INT)
                   AS merge_is_lossless
        FROM nsh CROSS JOIN fin_m fm CROSS JOIN fin_d fd
    """


def q_skew_profile(d: S.Dialect) -> str:
    """Key-skew diagnostic per aggregation domain — the profile you
    run BEFORE deciding whether a 100 TB groupBy/join needs salting:
    per event_type, the user_id key-frequency distribution reduced to
    key count, row count, heaviest-key share (1e-4 units), the
    Herfindahl concentration index (1e-8 units — 1e8/n_keys for
    uniform keys, 1e8 for one hot key), and the salt-bucket count the
    repo's salted operators (operators/skew.py) would need to level
    the heaviest key down to the mean (``CEIL(max/avg)``).

    Determinism: everything derives from exact integer counts; the two
    emitted ratios are single IEEE divisions of exact BIGINTs rounded
    once to integer units.  ``SUM(c*c)`` stays int64-exact while
    ``rows_total * max_key_rows < 2^63`` per domain (~3e9 x 3e9);
    beyond that accumulate c*c as DECIMAL(38,0).

    Scale shape: one partial-aggregatable (type, key) groupBy — the
    only pass over the fact table — then a tiny per-type reduce.  The
    profile's own aggregation is skew-IMMUNE: the inner groupBy key
    includes the hot key itself, so its combine happens map-side."""
    return f"""
        WITH kc AS (
            SELECT event_type, user_id, COUNT(*) AS c
            FROM events
            WHERE user_id IS NOT NULL
            GROUP BY event_type, user_id
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(c) AS BIGINT) AS n_rows,
                   CAST(MAX(c) AS BIGINT) AS max_c,
                   CAST(SUM(c * c) AS BIGINT) AS s2
            FROM kc GROUP BY event_type
        )
        SELECT event_type,
               n_keys,
               n_rows AS rows_total,
               max_c AS max_key_rows,
               CAST(ROUND(1e4 * CAST(max_c AS DOUBLE)
                          / CAST(n_rows AS DOUBLE)) AS BIGINT)
                   AS top1_share_e4,
               CAST(ROUND(1e8 * CAST(s2 AS DOUBLE)
                          / (CAST(n_rows AS DOUBLE)
                             * CAST(n_rows AS DOUBLE))) AS BIGINT)
                   AS hhi_e8,
               CAST(CEIL(CAST(max_c AS DOUBLE) * CAST(n_keys AS DOUBLE)
                         / CAST(n_rows AS DOUBLE)) AS BIGINT)
                   AS salt_buckets
        FROM agg
        ORDER BY event_type
    """


KMV_K = 256


def _kmv_sketch_ctes(d: S.Dialect, k: int) -> str:
    """Shared sketch-side CTE chain for the KMV overlap family: the
    per-source bottom-k fingerprint sketches and the pairwise
    ``(k_used, n_both_k)`` estimator counts.  Cost is |S|²·k rows in
    the pair stage regardless of corpus size; the corpus is touched
    only by the DISTINCT (source, h) collapse."""
    fp_expr = f"MD5({d.arr_slice_join(d.token_array('text'), '0', 5)})"
    return f"""
        fp AS (
            SELECT DISTINCT source, {fp_expr} AS h
            FROM documents
        ),
        ranked AS (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h)
                       AS r
            FROM fp
        ),
        bk AS (SELECT source, h, r FROM ranked WHERE r <= {k}),
        srcs AS (SELECT DISTINCT source FROM fp),
        pairs AS (
            SELECT a.source AS sa, b.source AS sb
            FROM srcs a JOIN srcs b ON a.source < b.source
        ),
        u AS (
            SELECT p.sa, p.sb, s.h,
                   MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END)
                       AS in_a,
                   MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END)
                       AS in_b
            FROM pairs p
            JOIN bk s ON s.source = p.sa OR s.source = p.sb
            GROUP BY p.sa, p.sb, s.h
        ),
        mk AS (
            SELECT sa, sb, in_a, in_b,
                   ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h)
                       AS r
            FROM u
        ),
        est AS (
            SELECT sa, sb,
                   CAST(LEAST({k}, COUNT(*)) AS BIGINT) AS k_used,
                   CAST(SUM(CASE WHEN r <= {k} AND in_a = 1
                                  AND in_b = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_both_k
            FROM mk GROUP BY sa, sb
        )"""


def q_kmv_overlap_estimate(d: S.Dialect, k: int = KMV_K) -> str:
    """KMV cross-source Jaccard — the PRODUCTION entry point: sketch
    estimate only, no exact-truth branch.  This is the form a
    pipeline (``prepare_training_set``-style source mixing, crawl
    dedup planning) should call: total cost beyond the one DISTINCT
    (source, h) collapse is |S|²·k rows, however large the corpus.
    The verified combined form (:func:`q_kmv_source_overlap`) keeps
    the exact fingerprint-universe join alongside so the driver can
    pin the estimation error — run that one only at oracle/test
    scale.  Estimate columns are byte-identical between the two forms
    (same CTE chain — pinned in tests)."""
    return f"""
        WITH {_kmv_sketch_ctes(d, k)}
        SELECT sa AS source_a, sb AS source_b, k_used, n_both_k,
               CAST(ROUND(1e4 * CAST(n_both_k AS DOUBLE)
                          / CAST(k_used AS DOUBLE)) AS BIGINT)
                   AS jaccard_kmv_e4
        FROM est
        ORDER BY sa, sb
    """


def q_kmv_source_overlap(d: S.Dialect, k: int = KMV_K) -> str:
    """Cross-source overlap from K-MINIMUM-VALUES sketches — the
    mergeable way to estimate Jaccard between datasets when the exact
    fingerprint join (``source_overlap``) is too big to run: each
    source keeps only its k smallest fingerprint hashes, and for any
    source pair the k smallest of the union (with membership bits)
    give ``J ≈ |bottom-k(A∪B) ∩ A ∩ B| / k`` (Beyer et al.,
    SIGMOD'07).  Sketches merge by min-union, so shards combine like
    the HLL registers.

    The driver-verified output pins BOTH the sketch mechanics and its
    accuracy: the exact Jaccard (computed on the same fingerprint
    universe — affordable at oracle scale) rides along with the
    estimate and the absolute error in 1e-4 units.  Everything
    derives from deterministic MD5 order (binary collation, identical
    in both engines) and exact integer counts.

    Scale shape: fingerprints collapse to DISTINCT (source, h) — one
    hash-keyed shuffle, partial-aggregated — then the bottom-k window
    runs per source (k rows survive per source, |S|·k total); the
    pair stage touches only sketch rows, so its cost is |S|²·k no
    matter the corpus.  The exact-truth CTEs here exist for
    verification ONLY — they join the full fingerprint universe, the
    exact cost the sketch avoids; production pipelines call
    :func:`q_kmv_overlap_estimate` (same sketch CTE chain, estimate
    columns byte-identical) instead."""
    return f"""
        WITH {_kmv_sketch_ctes(d, k)},
        exact AS (
            SELECT p.sa, p.sb,
                   CAST(SUM(CASE WHEN fa.in_a = 1 AND fa.in_b = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_inter,
                   CAST(COUNT(*) AS BIGINT) AS n_union
            FROM (
                SELECT p2.sa, p2.sb, f.h,
                       MAX(CASE WHEN f.source = p2.sa THEN 1 ELSE 0 END)
                           AS in_a,
                       MAX(CASE WHEN f.source = p2.sb THEN 1 ELSE 0 END)
                           AS in_b
                FROM pairs p2
                JOIN fp f ON f.source = p2.sa OR f.source = p2.sb
                GROUP BY p2.sa, p2.sb, f.h
            ) fa
            JOIN pairs p ON p.sa = fa.sa AND p.sb = fa.sb
            GROUP BY p.sa, p.sb
        )
        SELECT e.sa AS source_a, e.sb AS source_b, e.k_used,
               e.n_both_k,
               CAST(ROUND(1e4 * CAST(e.n_both_k AS DOUBLE)
                          / CAST(e.k_used AS DOUBLE)) AS BIGINT)
                   AS jaccard_kmv_e4,
               CAST(ROUND(1e4 * CAST(x.n_inter AS DOUBLE)
                          / CAST(x.n_union AS DOUBLE)) AS BIGINT)
                   AS jaccard_exact_e4,
               ABS(CAST(ROUND(1e4 * CAST(e.n_both_k AS DOUBLE)
                              / CAST(e.k_used AS DOUBLE)) AS BIGINT)
                   - CAST(ROUND(1e4 * CAST(x.n_inter AS DOUBLE)
                                / CAST(x.n_union AS DOUBLE)) AS BIGINT))
                   AS abs_err_e4
        FROM est e
        JOIN exact x ON x.sa = e.sa AND x.sb = e.sb
        ORDER BY e.sa, e.sb
    """


ORDERS_PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "num"), ("o_custkey", "num"),
    ("o_orderstatus", "str"), ("o_totalprice", "num"),
    ("o_orderdate", "ts"), ("o_orderpriority", "str"),
)


def q_table_profile(d: S.Dialect, table: str = "orders",
                    cols: tuple[tuple[str, str], ...] =
                    ORDERS_PROFILE_COLS,
                    approx: bool = False) -> str:
    """Column-level table profile — the "profile before you train /
    join" data-quality staple: per column, row count, nulls, exact
    distinct count, and integer-quantized min/max (micro-units for
    numerics, epoch seconds for timestamps; strings skip min/max —
    cross-engine collation is not part of the parity contract).

    ONE scan: a single aggregate computes every column's statistics,
    then a literal unpivot emits one row per column (map-only over
    the 1-row aggregate).  The multi-column COUNT(DISTINCT) plans as
    one Expand (rows x |cols|) — fine for exact profiling; at lake
    scale swap exact distincts for ``approx_count_distinct`` / the
    ``q_hll_distinct`` register sketch (same shape, one pass, no
    Expand), which is the documented 100 TB rung."""
    aggs, rows = [], []
    for i, (c, kind) in enumerate(cols):
        aggs.append(f"COUNT({c}) AS nn_{i}")
        if approx:
            # HLL estimate — no Expand, the 100 TB rung (engines'
            # sketches differ, so this form is NOT oracle-paired;
            # the registered witness is q_table_profile_approx)
            aggs.append(f"approx_count_distinct({c}) AS nd_{i}")
        else:
            aggs.append(f"COUNT(DISTINCT {c}) AS nd_{i}")
        aggs.extend(_profile_minmax_aggs(d, c, kind, i))
        rows.append(
            f"SELECT '{c}' AS col_name, n_rows, "
            f"CAST(n_rows - nn_{i} AS BIGINT) AS n_null, "
            f"CAST(nd_{i} AS BIGINT) AS n_distinct, "
            f"mn_{i} AS min_e, mx_{i} AS max_e FROM agg")
    agg_sql = ",\n                   ".join(aggs)
    union = "\n        UNION ALL ".join(rows)
    return f"""
        WITH agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   {agg_sql}
            FROM {table}
        )
        {union}
    """


def _profile_minmax_aggs(d: S.Dialect, c: str, kind: str,
                         i: int) -> list[str]:
    if kind == "num":
        # Decimal, not double, arithmetic: ROUND(x * 1e6) in
        # doubles loses exactness past 2^53 (|x| > ~9.0e9) and
        # hits Spark-half-up vs DuckDB-half-even ROUND ties.
        # double -> DECIMAL(25,6) rounds ties up in BOTH engines
        # (probed), * 1000000 is exact (DECIMAL(36,6), integral),
        # and the BIGINT cast truncates a zero fraction.  Domain
        # bound of the parity contract: |x| < ~9.2e12 so the
        # micro-units fit BIGINT.
        return [f"CAST(CAST(MIN({c}) AS DECIMAL(25,6)) * 1000000"
                f" AS BIGINT) AS mn_{i}",
                f"CAST(CAST(MAX({c}) AS DECIMAL(25,6)) * 1000000"
                f" AS BIGINT) AS mx_{i}"]
    if kind == "ts":
        if d.name == "spark":
            lo, hi = f"unix_timestamp(MIN({c}))", \
                     f"unix_timestamp(MAX({c}))"
        else:
            lo, hi = f"(epoch_us(MIN({c})) // 1000000)", \
                     f"(epoch_us(MAX({c})) // 1000000)"
        return [f"CAST({lo} AS BIGINT) AS mn_{i}",
                f"CAST({hi} AS BIGINT) AS mx_{i}"]
    return [f"CAST(NULL AS BIGINT) AS mn_{i}",
            f"CAST(NULL AS BIGINT) AS mx_{i}"]


def q_table_profile_approx(d: S.Dialect, table: str = "orders",
                           cols: tuple[tuple[str, str], ...] =
                           ORDERS_PROFILE_COLS,
                           tol_pct: int = 5) -> str:
    """Driver-witnessed form of the profile's APPROX rung: exact
    rows/nulls/min-max per column (oracle-hashable as in
    :func:`q_table_profile`) plus ``approx_within_tol`` — on the
    Spark side, whether ``approx_count_distinct``'s HLL++ estimate
    lands within ``tol_pct`` % of the exact distinct count; the
    DuckDB oracle pins the flag to 1.  Engines' HLL sketches differ,
    so the estimate VALUE cannot hash cross-engine — the tolerance
    flag is the honest contract, and the driver goes red if Spark's
    sketch ever drifts outside it.  (This witness pays the exact
    count by construction; the production face —
    ``q_table_profile(approx=True)``, the CLI's default above its
    row threshold — runs the estimate alone, no Expand.)"""
    aggs, rows = [], []
    for i, (c, kind) in enumerate(cols):
        aggs.append(f"COUNT({c}) AS nn_{i}")
        aggs.append(f"COUNT(DISTINCT {c}) AS nd_{i}")
        if d.name == "spark":
            # rsd 0.02: measured worst error 2.29% across sf0.001 /
            # 0.01 / 0.1 vs the 5% tolerance (>2x margin; HLL++ is
            # deterministic per dataset, so the flag is stable) — the
            # default rsd 0.05 genuinely exceeds 5% on high-
            # cardinality columns, which is exactly what this witness
            # is for, while the r11 rsd 0.01 bought nothing but
            # sketch width: its register arrays made this one
            # aggregate 4.3 s of the query's 5.5 s at sf0.01
            # (rsd 0.02 runs the same six estimates in 1.1 s)
            aggs.append(f"approx_count_distinct({c}, 0.02) AS na_{i}")
            flag = (f"CASE WHEN ABS(na_{i} - nd_{i}) * 100 <= "
                    f"{tol_pct} * nd_{i} THEN 1 ELSE 0 END")
        else:
            flag = "1"
        aggs.extend(_profile_minmax_aggs(d, c, kind, i))
        rows.append(
            f"SELECT '{c}' AS col_name, n_rows, "
            f"CAST(n_rows - nn_{i} AS BIGINT) AS n_null, "
            f"CAST(nd_{i} AS BIGINT) AS n_distinct, "
            f"mn_{i} AS min_e, mx_{i} AS max_e, "
            f"CAST({flag} AS INT) AS approx_within_tol FROM agg")
    agg_sql = ",\n                   ".join(aggs)
    union = "\n        UNION ALL ".join(rows)
    return f"""
        WITH agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   {agg_sql}
            FROM {table}
        )
        {union}
    """


def q_corpus_diff(d: S.Dialect) -> str:
    """Corpus snapshot diff, summarized per (source, status): how
    many documents (and tokens) were added / removed / changed /
    unchanged between two corpus versions — the audit a pipeline
    runs before republishing shards or invalidating caches after a
    recrawl or cleaning pass.

    The oracle fixture simulates v2 INSIDE the query (drop every
    13th doc, edit every 17th, add synthetic docs under a new
    source), so all four statuses are driver-witnessed; the
    DataFrame operator (`plans/corpus.corpus_diff`) runs the same
    FULL OUTER id join + text comparison over two REAL tables.

    Scale shape: one FULL OUTER equi-join on doc_id (co-partitioned,
    the only corpus shuffle) with direct text inequality — no
    hashing round-trip — then a (sources x 4)-row aggregate.  Token
    counting reads the NEW side (old side for removals)."""
    tok = d.arr_len(d.token_array("txt"))
    return f"""
        WITH v1 AS (
            SELECT doc_id, source, text FROM documents
        ),
        v2 AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 17 = 3
                        THEN CONCAT(text, ' edited marker')
                        ELSE text END AS text
            FROM documents WHERE doc_id % 13 <> 5
            UNION ALL
            SELECT doc_id + 1000000, 'src_new',
                   CONCAT('synthetic new doc ',
                          CAST(doc_id AS STRING))
            FROM documents WHERE doc_id % 29 = 1
        ),
        diff AS (
            SELECT COALESCE(b.source, a.source) AS source,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN a.text <> b.text THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   COALESCE(b.text, a.text) AS txt
            FROM v1 a FULL OUTER JOIN v2 b ON b.doc_id = a.doc_id
        )
        SELECT source, status,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM({tok}) AS BIGINT) AS n_tokens
        FROM diff GROUP BY source, status
    """
