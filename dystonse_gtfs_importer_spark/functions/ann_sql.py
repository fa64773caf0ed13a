"""Dual-dialect ANN templates: the FULL LSH / IVF pipelines rendered
for both Spark and DuckDB, so the driver hash-verifies the approximate
result cross-engine (stronger than a recall metric — every candidate,
cosine, and rank must agree).

Determinism across engines:

* LSH hyperplanes are Python-generated literals (splitmix64 mixing,
  shared with operators/similarity.py) embedded identically in both
  dialects; the sign-bit dot is a left-associated sum in both engines
  (DuckDB: explicit 64-term sum; Spark: aggregate-over-zip_with fold,
  the same association order — see _plane_dot), so both produce
  bitwise-equal IEEE doubles.
* Every value that feeds an ORDER BY / comparison that could flip on
  last-ulp drift (cosines, centroid components, cell scores) is
  ROUNDed to 6 decimals on both sides, with an id/cell tie-break.
* IVF centroids are derived fully in-SQL (lowest-id seeds → one
  Lloyd mean pass via a dimension series → ordered_list rebuild), so
  the verified path has NO driver-side collect — this is also the
  shape that scales: the centroid table is 8 rows joined broadcast.

Reference anchor: the similarity tier itself is an LLM-pipeline
extension (SURVEY.md LLM ops), not a reference operator.
"""

from __future__ import annotations

from . import sql_shared as S
from ..operators.similarity import _hyperplane

DIM = 64
K = 5
QUERY_STRIDE = 100
LSH_PLANES = 4
LSH_TABLES = 2
IVF_CELLS = 8
IVF_NPROBE = 2


def _plane_dot(d: S.Dialect, emb: str, weights: list[float],
               explicit: bool = False) -> str:
    """Left-associated dot product — identical association order in
    both engines, hence bitwise-equal (no rounding guard needed for
    the sign test).

    DuckDB spells it as the explicit 64-term sum (its native
    list_dot_product may reassociate).  Spark has two bitwise-equal
    renderings of the same left-associated fold, chosen by workload:

    * default — aggregate over zip_with against the weight-array
      literal (the 0D seed is exact — 0 + x == x in IEEE, and a ±0
      flip cannot change the > 0 sign test).  The analyzed tree is
      one array literal instead of 64 arithmetic nodes per plane,
      which cuts the ann_lsh_topk Catalyst compile+run from 6.2 s to
      1.4 s cold at sf0.01.  But the fold itself is an INTERPRETED
      higher-order function — fine when sketch count is small.
    * ``explicit=True`` — the same 64-term sum DuckDB uses, which
      whole-stage codegen compiles to straight-line JVM arithmetic.
      Worth it once planes × rows dominates compile cost: at 12
      planes × 200 k vectors the explicit form computes the sketches
      2.6× faster (21 s → 8 s, SCALING.md "near-dup at scale").
      Same multiply/add sequence, so sketches are bit-identical
      either way.  Do NOT widen past ~12 planes × 64 dims per
      expression: a many-hundred-term tree risks exceeding the JVM
      64 KB method limit and silently de-optimizing the whole stage
      to interpreted mode (measured: inlining the 64-term PAIR dot
      twice per row made the join stage 2.7× slower than the HOF
      form)."""
    if d.name == "spark" and not explicit:
        ws = ", ".join(repr(w) for w in weights)
        return d.arr_dot(emb, f"array({ws})")
    return " + ".join(f"{d.arr_get(emb, str(i))} * {w!r}"
                      for i, w in enumerate(weights))


def _sketch(d: S.Dialect, emb: str, table: int,
            n_planes: int = LSH_PLANES) -> str:
    # Wider-than-default sketches imply a corpus large enough that
    # per-row evaluation dominates Catalyst compile — render them
    # codegen-friendly (see _plane_dot).
    explicit = n_planes > LSH_PLANES
    bits = []
    for p in range(n_planes):
        dot = _plane_dot(d, emb, _hyperplane(DIM, p, table), explicit)
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _norm_cte(d: S.Dialect, src: str = "cv") -> str:
    """`cvn(vec_id, emb, nrm)`: per-vector norms computed ONCE — the
    per-pair cosine then spends one dot product instead of three.
    The value is bit-identical to the inline form (same SQRT over the
    same dot, same multiplication), so the ROUND(…, 6) guard behaves
    exactly as before."""
    return (f"cvn AS (SELECT vec_id, emb, "
            f"SQRT({d.arr_dot('emb', 'emb')}) AS nrm FROM {src})")


def _rank_tail(d: S.Dialect, k: int = K) -> str:
    """Shared scoring tail over a `cand(query_id, cand_id)` CTE and the
    `cvn(vec_id, emb, nrm)` norm-carrying corpus CTE (see _norm_cte)."""
    return f"""
        scored AS (
            SELECT cand.query_id, cand.cand_id,
                   ROUND({d.arr_dot('q.emb', 'c.emb')}
                         / (q.nrm * c.nrm), 6) AS cosine
            FROM cand
            JOIN cvn q ON q.vec_id = cand.query_id
            JOIN cvn c ON c.vec_id = cand.cand_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, cand_id) AS rk
            FROM scored
        )
        SELECT query_id, cand_id, cosine, rk FROM ranked WHERE rk <= {k}
    """


def q_ann_lsh_topk(d: S.Dialect) -> str:
    """Random-hyperplane LSH top-k: bucket on sign-bit sketches across
    {LSH_TABLES} tables, exact-cosine re-rank of colliding candidates.
    Corpus sketching is map-only; the candidate join shuffles only
    (table, bucket, id) — never the all-pairs product."""
    cb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket FROM cv"
        for t in range(LSH_TABLES))
    qb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket FROM qv"
        for t in range(LSH_TABLES))
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        qv AS (SELECT * FROM cv WHERE vec_id % {QUERY_STRIDE} = 0),
        {_norm_cte(d)},
        cb AS ({cb}),
        qb AS ({qb}),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
            FROM qb q
            JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
                     AND q.vec_id <> c.vec_id
        ),
        {_rank_tail(d)}
    """


def q_knn_label_agreement(d: S.Dialect) -> str:
    """Embedding-space label purity: for each strided query vector,
    the fraction of its LSH top-{K} neighbors sharing its label,
    aggregated per label — the standard sanity check that an
    embedding space separates its classes before trusting it for
    retrieval/dedup.  Same bucket-join candidate generation and exact
    re-rank as q_ann_lsh_topk (the approximation is deterministic on
    both engines, so the driver hash-verifies it); queries without
    any bucket collision drop out on both sides identically."""
    cb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket FROM cv"
        for t in range(LSH_TABLES))
    qb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket FROM qv"
        for t in range(LSH_TABLES))
    return f"""
        WITH cv AS (
            SELECT vec_id, label, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        qv AS (SELECT * FROM cv WHERE vec_id % {QUERY_STRIDE} = 0),
        {_norm_cte(d)},
        cb AS ({cb}),
        qb AS ({qb}),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
            FROM qb q
            JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
                     AND q.vec_id <> c.vec_id
        ),
        scored AS (
            SELECT cand.query_id, cand.cand_id,
                   ROUND({d.arr_dot('q.emb', 'c.emb')}
                         / (q.nrm * c.nrm), 6) AS cosine
            FROM cand
            JOIN cvn q ON q.vec_id = cand.query_id
            JOIN cvn c ON c.vec_id = cand.cand_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, cand_id) AS rk
            FROM scored
        ),
        topk AS (
            SELECT query_id, cand_id FROM ranked WHERE rk <= {K}
        ),
        per_query AS (
            SELECT t.query_id, qq.label,
                   -- CAST, not a 1.0 literal: Spark types 1.0 as
                   -- DECIMAL(2,1) while DuckDB uses DOUBLE, and the
                   -- AVGs round differently
                   AVG(CAST(CASE WHEN cc.label = qq.label
                            THEN 1 ELSE 0 END AS DOUBLE)) AS agree
            FROM topk t
            JOIN cv qq ON qq.vec_id = t.query_id
            JOIN cv cc ON cc.vec_id = t.cand_id
            GROUP BY t.query_id, qq.label
        )
        SELECT label, COUNT(*) AS n_queries,
               ROUND(AVG(agree), 4) AS knn_label_agreement
        FROM per_query GROUP BY label
    """


def q_retrieval_eval(d: S.Dialect) -> str:
    """Ranking-quality metrics of the LSH top-{K} retrieval against
    label relevance: per label, MRR (reciprocal rank of the first
    same-label neighbor) and binary-relevance nDCG@{K} — the two
    numbers a retrieval index is accepted or rejected on, computed
    on the same deterministic candidate set the driver already
    hash-verifies (q_ann_lsh_topk / q_knn_label_agreement family).

    nDCG uses the standard corpus-ideal normalizer: IDCG@k over
    ``min(k, |same-label corpus| - 1)`` ideal positions, derived
    from a {K}-row series joined to the per-label size table (no
    hard-coded log constants).  All log arithmetic is double-typed
    (CASTs keep Spark's DECIMAL literal typing out), and the
    per-label AVGs are ROUNDed to 4 — same drift guard as
    knn_label_agreement.  Scale shape: adds only a label-size
    aggregate (tiny) and a {K}-row series join on top of the
    candidate machinery; everything heavy is shared with the
    retrieval itself."""
    cb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket FROM cv"
        for t in range(LSH_TABLES))
    qb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket FROM qv"
        for t in range(LSH_TABLES))
    log_gain = "LN(CAST(2 AS DOUBLE)) / LN(CAST(1 + rk AS DOUBLE))"
    return f"""
        WITH cv AS (
            SELECT vec_id, label, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        qv AS (SELECT * FROM cv WHERE vec_id % {QUERY_STRIDE} = 0),
        {_norm_cte(d)},
        cb AS ({cb}),
        qb AS ({qb}),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
            FROM qb q
            JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
                     AND q.vec_id <> c.vec_id
        ),
        scored AS (
            SELECT cand.query_id, cand.cand_id,
                   ROUND({d.arr_dot('q.emb', 'c.emb')}
                         / (q.nrm * c.nrm), 6) AS cosine
            FROM cand
            JOIN cvn q ON q.vec_id = cand.query_id
            JOIN cvn c ON c.vec_id = cand.cand_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, cand_id) AS rk
            FROM scored
        ),
        topk AS (
            SELECT query_id, cand_id, rk FROM ranked WHERE rk <= {K}
        ),
        rel AS (
            SELECT r.query_id, qq.label, r.rk,
                   CASE WHEN cc.label = qq.label THEN 1 ELSE 0 END AS rel
            FROM topk r
            JOIN cv qq ON qq.vec_id = r.query_id
            JOIN cv cc ON cc.vec_id = r.cand_id
        ),
        per_query AS (
            SELECT query_id, label,
                   SUM(CAST(rel AS DOUBLE) * {log_gain}) AS dcg,
                   MIN(CASE WHEN rel = 1 THEN rk END) AS first_rel
            FROM rel GROUP BY query_id, label
        ),
        label_sizes AS (
            SELECT label, COUNT(*) AS n FROM cv GROUP BY label
        ),
        idcg AS (
            SELECT ls.label, SUM({log_gain}) AS idcg
            FROM label_sizes ls
            JOIN (SELECT i + 1 AS rk FROM {d.series(K)} AS s) pos
              ON pos.rk <= LEAST({K}, ls.n - 1)
            GROUP BY ls.label
        )
        SELECT p.label,
               COUNT(*) AS n_queries,
               ROUND(AVG(COALESCE(CAST(1 AS DOUBLE) / p.first_rel,
                                  CAST(0 AS DOUBLE))), 4) AS mrr,
               ROUND(AVG(p.dcg / i.idcg), 4) AS ndcg
        FROM per_query p
        JOIN idcg i ON i.label = p.label
        GROUP BY p.label
    """


def q_cosine_near_dup_pairs(d: S.Dialect, threshold: float = 0.35) -> str:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    ROUND(cosine, 6) >= threshold.  This exact form is the oracle
    (quadratic, fine at verification scale); the scale path is
    ``operators.similarity.cosine_near_dup`` which prefilters
    candidates through the same LSH buckets as lsh_topk.  The default
    threshold is tuned to the driver's synthetic random embeddings
    (pair cosines top out near 0.5); real near-duplicates sit at
    0.9+, where LSH collision probability is far higher."""
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        {_norm_cte(d)},
        scored AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND({d.arr_dot('a.emb', 'b.emb')}
                         / (a.nrm * b.nrm), 6) AS cosine
            FROM cvn a JOIN cvn b ON a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, cosine FROM scored
        WHERE cosine >= {threshold}
    """


def q_cosine_near_dup_lsh(d: S.Dialect, threshold: float = 0.35,
                          n_planes: int = LSH_PLANES,
                          tables: int = LSH_TABLES) -> str:
    """The SCALE path of :func:`q_cosine_near_dup_pairs` rendered
    dual-dialect: candidates restricted to same-LSH-bucket pairs (the
    identical bitwise-deterministic sketches both engines compute),
    then the exact cosine residual.  Hash-verifiable because the
    approximation itself is reproduced on both sides; recall vs the
    exact form is asserted separately (tests/test_similarity.py).
    Candidate volume scales with bucket occupancy, never |corpus|².

    ``n_planes`` must grow ~log2(corpus) to HOLD occupancy constant:
    2^n_planes buckets means expected occupancy N/2^n_planes, and the
    within-bucket pair count is quadratic in occupancy — measured in
    SCALING.md ("near-dup at scale"): the 4-plane default (16 buckets,
    pinned by the sf0.01 oracle) is right for the driver fixture but
    candidate volume grows ~N²/16 at corpus scale; 12 planes holds a
    200 k-vector corpus at ~50/bucket.  Recall per table for a pair
    at angle θ is (1 - θ/π)^n_planes — compensate wider sketches with
    more ``tables`` when hunting lower-cosine pairs.

    Plan shape (round 5): the embedding + norm ride WITH the sketch
    row through the bucket self-join, so the pair cosine is computed
    inside the join stage and pair dedup happens AFTER the threshold
    filter.  That trades a wider bucket shuffle (corpus × tables
    rows, each carrying its vector — the standard LSH-join layout)
    for eliminating the three pair-grain exchanges the naive form
    pays: DISTINCT over all candidates plus two vec_id-keyed joins
    back to the corpus, each shuffling |candidates| ≫ |corpus| rows
    (15.4 M candidate pairs from 200 k vectors).  Measured at 200 k
    vectors: 43 s → 21.6 s cold, 13.1 s warm, identical output
    (SCALING.md "near-dup at scale").  Crucially it does NOT
    broadcast the corpus — at 100 TB the corpus never fits an
    executor; the only structures this plan moves are bucket-keyed."""
    cb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{_sketch(d, 'emb', t, n_planes)} AS bucket, emb, nrm "
        f"FROM cvn"
        for t in range(tables))
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        {_norm_cte(d)},
        cb AS ({cb}),
        scored AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND({d.arr_dot('a.emb', 'b.emb')}
                         / (a.nrm * b.nrm), 6) AS cosine
            FROM cb a
            JOIN cb b ON a.tbl = b.tbl AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
        )
        SELECT DISTINCT vec_a, vec_b, cosine
        FROM scored
        WHERE cosine >= {threshold}
    """


def q_embedding_decontamination(d: S.Dialect,
                                threshold: float = 0.35,
                                n_planes: int = LSH_PLANES,
                                tables: int = LSH_TABLES) -> str:
    """SEMANTIC decontamination: corpus vectors embedding-similar to
    any EVAL-set vector — the paraphrase leakage the n-gram
    `decontaminate` pass cannot see (an eval answer reworded shares
    no 8-gram but sits at high cosine).  Eval membership uses the
    registry's query-sample convention (vec_id % {QUERY_STRIDE} = 0 —
    in production the eval table is a separate input, same plan).

    Candidates are LSH-bucket-limited exactly as q_cosine_near_dup_lsh
    (bitwise-deterministic sketches, so the driver hash-verifies the
    decision INCLUDING the approximation); per flagged corpus vector:
    eval-hit count, the max cosine, and the smallest hitting eval id
    (deterministic representative).  Scale shape: map-only sketching,
    bucket equi-join with the eval side a {1}/{QUERY_STRIDE} slice
    riding the same bucket layout, one vec_id-keyed aggregate — the
    corpus never broadcasts, nothing pair-grain survives past the
    threshold filter."""
    cb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{_sketch(d, 'emb', t, n_planes)} AS bucket, emb, nrm "
        f"FROM cvn"
        for t in range(tables))
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        {_norm_cte(d)},
        cb AS ({cb}),
        scored AS (
            SELECT c.vec_id, e.vec_id AS eval_id,
                   ROUND({d.arr_dot('e.emb', 'c.emb')}
                         / (e.nrm * c.nrm), 6) AS cosine
            FROM cb e
            JOIN cb c ON e.tbl = c.tbl AND e.bucket = c.bucket
                     AND e.vec_id % {QUERY_STRIDE} = 0
                     AND c.vec_id % {QUERY_STRIDE} <> 0
        ),
        hits AS (
            -- threshold BEFORE the pair dedup (the
            -- q_cosine_near_dup_lsh plan doctrine: |candidates| >>
            -- |hits|, so nothing pair-grain survives into the
            -- DISTINCT exchange)
            SELECT DISTINCT vec_id, eval_id, cosine
            FROM scored WHERE cosine >= {threshold}
        )
        SELECT vec_id,
               CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
               MAX(cosine) AS max_cosine,
               CAST(MIN(eval_id) AS BIGINT) AS first_eval_id
        FROM hits
        GROUP BY vec_id
    """


def q_embedding_decontam_recall(
        d: S.Dialect,
        thresholds: tuple[float, ...] = (0.25, 0.30, 0.35)) -> str:
    """Decontamination recall AUDIT (VERDICT r10 "what's missing" #3):
    per threshold, how many of the EXACTLY-contaminated corpus vectors
    (∃ eval vector at cosine >= t, brute force) the LSH-bucket-limited
    `q_embedding_decontamination` decision actually flags — the
    `q_ann_recall` doctrine applied to the decontamination decision,
    quantifying the paraphrase leakage the bucket limitation misses
    instead of hand-waving it.

    The approximate leg is the registered query VERBATIM, so the audit
    measures exactly what ships.  Because LSH candidates are a subset
    of all pairs and both legs apply the same cosine threshold, the
    flagged set is a SUBSET of the exact set by construction —
    ``lsh_subset`` pins that invariant (test-checked too), and
    precision is 1 by the same argument; recall is the one free
    number.  Measured on the fixture (near-random embeddings, LSH's
    worst case): recall ~29/28/33 % at t = 0.25/0.30/0.35 with
    {LSH_TABLES} tables x {LSH_PLANES} planes — the honest cost of
    the bucket limitation, recorded in SCALING.md.

    Scale shape: the EXACT leg pairs the stride-{QUERY_STRIDE} eval
    sample against the corpus — |corpus|/{QUERY_STRIDE} x |corpus|,
    an audit probe run on a sampled eval set, never the production
    path (whitelisted in tools/audit_plans.py exactly like
    ann_recall's exact leg); the LSH leg keeps its production
    bucket-join shape.

    The Spark rendering derives every count of a leg from ONE FULL
    OUTER join of that leg's exact and LSH sets (both are DISTINCT
    vec_id, so the join is 1:1 and the counts are exact): the
    textbook scalar-subquery form re-expands each CTE — including the
    whole registered decontamination query — once per COUNT
    reference (3-4× per leg; guide §2.4/§3.3).  DuckDB keeps the
    scalar-subquery textbook form as the independent derivation."""
    legs = []
    for t in thresholds:
        tt = round(t * 100)
        if d.name == "spark":
            legs.append(f"""
        SELECT CAST({tt} AS INT) AS threshold_e2,
               CAST(COUNT(e.vec_id) AS BIGINT) AS n_exact,
               CAST(COUNT(l.vec_id) AS BIGINT) AS n_lsh,
               CAST(COUNT(CASE WHEN e.vec_id IS NOT NULL
                          AND l.vec_id IS NOT NULL THEN 1 END)
                    AS BIGINT) AS n_hit,
               CAST({d.intdiv(
                   "COUNT(CASE WHEN e.vec_id IS NOT NULL "
                   "AND l.vec_id IS NOT NULL THEN 1 END) * 10000",
                   "GREATEST(COUNT(e.vec_id), 1)")} AS BIGINT)
                   AS recall_e4,
               CAST(CASE WHEN COUNT(l.vec_id)
                         = COUNT(CASE WHEN e.vec_id IS NOT NULL
                                 AND l.vec_id IS NOT NULL THEN 1 END)
                    THEN 1 ELSE 0 END AS INT) AS lsh_subset
        FROM exact_{tt} e FULL OUTER JOIN lsh_{tt} l
          ON l.vec_id = e.vec_id""")
            continue
        legs.append(f"""
        SELECT CAST({tt} AS INT) AS threshold_e2,
               CAST((SELECT COUNT(*) FROM exact_{tt}) AS BIGINT)
                   AS n_exact,
               CAST((SELECT COUNT(*) FROM lsh_{tt}) AS BIGINT)
                   AS n_lsh,
               CAST((SELECT COUNT(*) FROM lsh_{tt} l
                     JOIN exact_{tt} e ON e.vec_id = l.vec_id)
                    AS BIGINT) AS n_hit,
               CAST({d.intdiv(
                   f"(SELECT COUNT(*) FROM lsh_{tt} l "
                   f"JOIN exact_{tt} e ON e.vec_id = l.vec_id)"
                   " * 10000",
                   f"GREATEST((SELECT COUNT(*) FROM exact_{tt}),"
                   " 1)")} AS BIGINT) AS recall_e4,
               CAST(CASE WHEN (SELECT COUNT(*) FROM lsh_{tt})
                         = (SELECT COUNT(*) FROM lsh_{tt} l
                            JOIN exact_{tt} e
                              ON e.vec_id = l.vec_id)
                    THEN 1 ELSE 0 END AS INT) AS lsh_subset""")
    ctes = []
    for t in thresholds:
        ctes.append(f"""
        exact_{round(t * 100)} AS (
            SELECT DISTINCT c.vec_id
            FROM cvn e JOIN cvn c
              ON e.vec_id % {QUERY_STRIDE} = 0
             AND c.vec_id % {QUERY_STRIDE} <> 0
            WHERE ROUND({d.arr_dot('e.emb', 'c.emb')}
                        / (e.nrm * c.nrm), 6) >= {t}
        ),
        lsh_{round(t * 100)} AS (
            SELECT vec_id FROM ({q_embedding_decontamination(d, t)})
        )""")
    union = "\n        UNION ALL".join(legs)
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        {_norm_cte(d)},
        {','.join(ctes)}
        {union}
    """


def q_embedding_decontam_recall_tables(
        d: S.Dialect,
        threshold: float = 0.35,
        table_counts: tuple[int, ...] = (2, 4, 8)) -> str:
    """The recall audit's SECOND axis — the one the operator can
    actually turn: recall vs LSH TABLE COUNT at the production
    threshold (the `q_ann_recall` nprobe-sweep idea applied to the
    decontamination banding).  Each leg runs the registered query with
    that table count; more tables = more independent bucketings = a
    candidate union that misses exponentially fewer true pairs.
    Measured on the fixture: recall 33% -> 67% -> 83% at 2/4/8 tables
    (threshold 0.35) — the curve a pipeline reads to buy its recall
    target, each extra table costing one more map-only sketch column
    + its share of the bucket join.

    Spark rendering: one FULL OUTER join per leg (see
    q_embedding_decontam_recall — same scalar-subquery re-expansion
    argument; here the brute-force ``exact_t`` was re-expanded ~3×
    per leg on top of the per-leg decontamination query)."""
    legs = []
    for t in table_counts:
        if d.name == "spark":
            legs.append(f"""
        SELECT CAST({t} AS INT) AS n_tables,
               CAST(COUNT(e.vec_id) AS BIGINT) AS n_exact,
               CAST(COUNT(l.vec_id) AS BIGINT) AS n_lsh,
               CAST(COUNT(CASE WHEN e.vec_id IS NOT NULL
                          AND l.vec_id IS NOT NULL THEN 1 END)
                    AS BIGINT) AS n_hit,
               CAST({d.intdiv(
                   "COUNT(CASE WHEN e.vec_id IS NOT NULL "
                   "AND l.vec_id IS NOT NULL THEN 1 END) * 10000",
                   "GREATEST(COUNT(e.vec_id), 1)")} AS BIGINT)
                   AS recall_e4
        FROM exact_t e FULL OUTER JOIN lsh_t{t} l
          ON l.vec_id = e.vec_id""")
            continue
        legs.append(f"""
        SELECT CAST({t} AS INT) AS n_tables,
               CAST((SELECT COUNT(*) FROM exact_t) AS BIGINT) AS n_exact,
               CAST((SELECT COUNT(*) FROM lsh_t{t}) AS BIGINT) AS n_lsh,
               CAST((SELECT COUNT(*) FROM lsh_t{t} l
                     JOIN exact_t e ON e.vec_id = l.vec_id) AS BIGINT)
                   AS n_hit,
               CAST({d.intdiv(
                   f"(SELECT COUNT(*) FROM lsh_t{t} l "
                   f"JOIN exact_t e ON e.vec_id = l.vec_id) * 10000",
                   "GREATEST((SELECT COUNT(*) FROM exact_t), 1)")}
                   AS BIGINT) AS recall_e4""")
    ctes = [f"""
        exact_t AS (
            SELECT DISTINCT c.vec_id
            FROM cvn e JOIN cvn c
              ON e.vec_id % {QUERY_STRIDE} = 0
             AND c.vec_id % {QUERY_STRIDE} <> 0
            WHERE ROUND({d.arr_dot('e.emb', 'c.emb')}
                        / (e.nrm * c.nrm), 6) >= {threshold}
        )"""]
    for t in table_counts:
        ctes.append(f"""
        lsh_t{t} AS (
            SELECT vec_id FROM
            ({q_embedding_decontamination(d, threshold, tables=t)})
        )""")
    union = "\n        UNION ALL".join(legs)
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        {_norm_cte(d)},
        {','.join(ctes)}
        {union}
    """


SEMDEDUP_THETA = 0.3


def q_semdedup_keep(d: S.Dialect, theta: float = SEMDEDUP_THETA) -> str:
    """SemDeDup-style semantic dedup decision: embeddings whose cosine
    to a LOWER-id LSH-bucket neighbor is >= ``theta`` are dropped; the
    lowest id of each near-duplicate neighborhood survives (greedy
    deterministic representative — pinned semantics; the
    connected-component survivor variant is ``dedup_clusters``).

    The candidate set is LSH-bucket-limited on BOTH engines (the
    sketches are bitwise-deterministic literals, see module docstring),
    so the driver hash-verifies the full keep/drop decision including
    the approximation.  Scale shape: sketching is map-only; the
    embedding + norm ride through the bucket self-join so the cosine
    happens inside the join stage and pair dedup happens after the
    threshold filter (the pair-shuffle-free layout measured 2.9×
    faster on q_cosine_near_dup_lsh at 200 k vectors — see its
    docstring); candidate volume scales with bucket occupancy, never
    |corpus|²; one groupBy ends the pipeline."""
    cb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket, "
        f"emb, nrm FROM cvn"
        for t in range(LSH_TABLES))
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        {_norm_cte(d)},
        cb AS ({cb}),
        near AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM cb a
            JOIN cb b ON a.tbl = b.tbl AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
            WHERE ROUND({d.arr_dot('a.emb', 'b.emb')}
                        / (a.nrm * b.nrm), 6) >= {theta}
        ),
        stats AS (
            SELECT vec_id, COUNT(*) AS n_near, MAX(has_smaller) AS removed
            FROM (
                SELECT vec_a AS vec_id, 0 AS has_smaller FROM near
                UNION ALL
                SELECT vec_b AS vec_id, 1 AS has_smaller FROM near
            ) u GROUP BY vec_id
        )
        SELECT v.vec_id,
               CAST(COALESCE(s.n_near, 0) AS BIGINT) AS n_near,
               CAST(CASE WHEN COALESCE(s.removed, 0) = 1
                    THEN 0 ELSE 1 END AS INT) AS kept
        FROM cv v
        LEFT JOIN stats s ON s.vec_id = v.vec_id
    """


def q_ann_ivf_topk(d: S.Dialect, nprobe: int = IVF_NPROBE) -> str:
    """IVF-Flat top-k, centroids derived in-SQL: seeds = the
    {IVF_CELLS} lowest-id corpus vectors, one Lloyd mean pass
    (per-dimension AVG over a dimension series, ROUNDed so engine
    summation order can't drift), reassign, probe the ``nprobe``
    best cells per query, exact-rank the probed subset."""
    dot_vs = f"ROUND({d.arr_dot('v.emb', 's.emb')}, 6)"
    dot_vc = f"ROUND({d.arr_dot('v.emb', 'c.cemb')}, 6)"
    dot_qc = f"ROUND({d.arr_dot('q.emb', 'c.cemb')}, 6)"
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        qv AS (SELECT * FROM cv WHERE vec_id % {QUERY_STRIDE} = 0),
        {_norm_cte(d)},
        seeds AS (
            SELECT emb, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM (SELECT * FROM cv ORDER BY vec_id LIMIT {IVF_CELLS}) s0
        ),
        assign0 AS (
            SELECT v.vec_id, v.emb, s.rn - 1 AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY {dot_vs} DESC, s.rn) AS pick
            FROM cv v CROSS JOIN seeds s
        ),
        a0 AS (SELECT vec_id, emb, cell FROM assign0 WHERE pick = 1),
        dims AS (
            SELECT cell, i, ROUND(AVG({d.arr_get('emb', 'i')}), 6) AS mv
            FROM a0 CROSS JOIN {d.series(DIM)}
            GROUP BY cell, i
        ),
        cents AS (
            SELECT cell, {d.ordered_list('mv', 'i')} AS cemb
            FROM dims GROUP BY cell
        ),
        assign1 AS (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY {dot_vc} DESC, c.cell) AS pick
            FROM cv v CROSS JOIN cents c
        ),
        a1 AS (SELECT vec_id, cell FROM assign1 WHERE pick = 1),
        probes AS (
            SELECT q.vec_id AS query_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY {dot_qc} DESC, c.cell) AS pr
            FROM qv q CROSS JOIN cents c
        ),
        cand AS (
            SELECT p.query_id, a.vec_id AS cand_id
            FROM (SELECT query_id, cell FROM probes
                  WHERE pr <= {nprobe}) p
            JOIN a1 a ON a.cell = p.cell AND a.vec_id <> p.query_id
        ),
        {_rank_tail(d)}
    """


# ---------------------------------------------------------------------------
# Embedding compression (round 5): int8 scalar quantization + seeded
# random projection — the two storage/bandwidth levers a 100 TB
# embedding corpus pulls before any ANN structure is even built.
# ---------------------------------------------------------------------------

RP_DIM = 8
RP_TABLE = 97  # hyperplane seed namespace, disjoint from LSH tables


def _int8_codes_ctes(d: S.Dialect) -> str:
    """Shared CTE chain ``cv → flat → qscale → codes`` for symmetric
    per-dimension int8 quantization: code = ROUND(x·127 / max|x|_dim).

    Determinism: MAX is exact (no summation order), the per-code
    arithmetic is one multiply then one divide in the same written
    order on both engines (identical IEEE doubles in → identical
    out), and both engines round halves away from zero — so the codes
    are hash-verifiable without any tolerance.

    Scale shape: ``qscale`` is ONE explode-by-dimension aggregate —
    dim rows out of the shuffle regardless of corpus size (the
    label_centroid_stats pattern) — broadcast back over a map-only
    projection.  The flat (vec_id, dim, x) form here is the
    dual-dialect oracle rendering; a production writer keeps codes as
    array<tinyint> per row (dim·1 B vs dim·8 B — a 4-8× scan/storage
    cut for ANN candidate re-scoring)."""
    return f"""
        cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        flat AS (
            SELECT vec_id, i.i AS dim, {d.arr_get('emb', 'i.i')} AS x
            FROM cv CROSS JOIN {d.series(DIM)} i
        ),
        qscale AS (
            SELECT dim, MAX(ABS(x)) AS mx
            FROM flat GROUP BY dim
        ),
        codes AS (
            SELECT f.vec_id, f.dim,
                   CAST(COALESCE(ROUND((f.x * 127.0) / NULLIF(s.mx, 0)),
                                 0) AS INT) AS code,
                   CAST(ROUND(s.mx * 1e6) AS BIGINT) AS scale_micros
            FROM flat f JOIN qscale s ON s.dim = f.dim
        )"""


def q_embedding_quantize_int8(d: S.Dialect) -> str:
    """Symmetric per-dimension int8 quantization of the embedding
    corpus, emitted as (vec_id, dim, code, scale_micros) — code in
    [-127, 127], scale in integer micro-units so no float formatting
    reaches the driver hash (the histogram_quantiles lesson).

    This is the storage tier of the similarity family: at 100 TB of
    float32/float64 embeddings the int8 codes cut the resident corpus
    4-8× while `q_ann_quantized_topk` shows the ranking they support.
    Reference anchor: LLM-pipeline extension (SURVEY.md LLM ops)."""
    return f"""
        WITH {_int8_codes_ctes(d)}
        SELECT vec_id, dim, code, scale_micros
        FROM codes
    """


def q_ann_quantized_topk(d: S.Dialect, k: int = 3) -> str:
    """Top-k nearest neighbors ranked by the INTEGER dot product of
    int8 codes — the cheap first-pass ranking a quantized ANN system
    runs before (optionally) re-scoring survivors with full floats.

    Exact integer arithmetic end to end: SUM(code·code) has no
    summation-order hazard, so ranks are hash-verifiable with a
    deterministic (idot DESC, cand_id) tie-break.  The flat dim-join
    SUM here is the dual-dialect oracle rendering; the production
    path keeps array<tinyint> codes and folds the dot JVM-side like
    `cosine_topk`.  Recall vs the float path is asserted in
    tests/test_similarity.py."""
    return f"""
        WITH {_int8_codes_ctes(d)},
        qs AS (
            SELECT vec_id, dim, code FROM codes
            WHERE vec_id % {QUERY_STRIDE} = 0
        ),
        dots AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   SUM(q.code * c.code) AS idot
            FROM qs q
            JOIN codes c ON c.dim = q.dim AND c.vec_id <> q.vec_id
            GROUP BY q.vec_id, c.vec_id
        ),
        ranked AS (
            SELECT query_id, cand_id, idot,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY idot DESC, cand_id) AS rnk
            FROM dots
        )
        SELECT query_id, cand_id, CAST(idot AS BIGINT) AS idot,
               CAST(rnk AS INT) AS rnk
        FROM ranked WHERE rnk <= {k}
    """


def q_random_projection(d: S.Dialect, out_dim: int = RP_DIM) -> str:
    """Johnson-Lindenstrauss-style seeded random projection
    DIM → ``out_dim``: y_j = ROUND(emb · R_j, 6) with R_j the same
    splitmix64-derived hyperplane literals the LSH sketches use
    (seed table {RP_TABLE}, disjoint from the LSH namespace), emitted
    as one row per vector with y0..y{{out_dim-1}} columns.

    Map-only — zero shuffles at any corpus size; the projection
    matrix is out_dim × DIM literals baked into the plan.  Both
    engines evaluate the identical left-associated fold
    (see _plane_dot), so the ROUNDed outputs are hash-verifiable.
    At 100 TB this is the cheapest pre-filter dimension cut before
    LSH/IVF structures, and doubles as a decorrelated feature map
    for the dedup sketches."""
    cols = ",\n               ".join(
        f"ROUND({_plane_dot(d, 'emb', _hyperplane(DIM, j, RP_TABLE))}, 6)"
        f" AS y{j}"
        for j in range(out_dim))
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        )
        SELECT vec_id,
               {cols}
        FROM cv
    """


# ---------------------------------------------------------------------------
# Distributed k-means — the Lloyd-iteration kernel, driver-verifiable
# (round 5).  operators/clustering.py::kmeans is the full operator
# (k-means|| init, convergence loop); this template unrolls exactly
# TWO Lloyd rounds from the deterministic lowest-id seeds so the
# iterative kernel itself gets a cross-engine hash check.

KM_CELLS = 8


def q_kmeans_lloyd2(d: S.Dialect) -> str:
    """Two unrolled Lloyd rounds over the embeddings table: seeds =
    the {KM_CELLS} lowest-id vectors, assignment by the L2 argmin
    rendered as argmax(dot(v,c) − |c|²/2) (ROUNDed with a cell
    tie-break, as everywhere in this module), update = per-dimension
    ROUND(AVG, 6) over a dimension series.  Output is integer-only —
    per-cell population, id range, and a centroid fingerprint in
    summed micro-units — so no float formatting can reach the driver
    hash (the histogram_quantiles lesson)."""
    def pick(src: str, cents: str) -> str:
        dot = d.arr_dot("v.emb", "c.cent")
        return f"""(
            SELECT vec_id, emb, cell FROM (
                SELECT v.vec_id, v.emb, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                           ORDER BY ROUND({dot} - c.cn2 / 2, 6) DESC,
                                    c.cell) AS pick
                FROM {src} v CROSS JOIN {cents} c) t
            WHERE pick = 1)"""

    def means(src: str) -> str:
        return f"""(
            SELECT cell, i, ROUND(AVG({d.arr_get('emb', 'i')}), 6) AS mv
            FROM {src} CROSS JOIN {d.series(DIM)}
            GROUP BY cell, i)"""

    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        seeds AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
                   emb AS cent
            FROM (SELECT * FROM cv ORDER BY vec_id
                  LIMIT {KM_CELLS}) s0
        ),
        c0 AS (SELECT cell, cent,
                      ROUND({d.arr_dot('cent', 'cent')}, 6) AS cn2
               FROM seeds),
        a0 AS {pick('cv', 'c0')},
        m1 AS {means('a0')},
        c1 AS (
            SELECT cell, {d.ordered_list('mv', 'i')} AS cent
            FROM m1 GROUP BY cell
        ),
        c1n AS (SELECT cell, cent,
                       ROUND({d.arr_dot('cent', 'cent')}, 6) AS cn2
                FROM c1),
        a1 AS {pick('cv', 'c1n')},
        m2 AS {means('a1')},
        fp AS (
            SELECT cell,
                   CAST(SUM(CAST(ROUND(mv * 1e6) AS BIGINT)) AS BIGINT)
                       AS cent_fp
            FROM m2 GROUP BY cell
        ),
        sizes AS (
            SELECT cell, COUNT(*) AS n_points,
                   MIN(vec_id) AS min_id, MAX(vec_id) AS max_id
            FROM a1 GROUP BY cell
        )
        SELECT s.cell, s.n_points, s.min_id, s.max_id, f.cent_fp
        FROM sizes s JOIN fp f ON f.cell = s.cell
        ORDER BY s.cell
    """


def q_embedding_norm_outliers(d: S.Dialect) -> str:
    """Per-label embedding health screen: the unit-norm check (mean
    L2 norm in milli-units — a well-normalized encoder reports 1000
    with zero spread) plus per-DIMENSION component outlier counts
    (cells more than 2 standard deviations from their (label, dim)
    mean) — the cheap first-pass a vector pipeline runs before
    trusting embeddings for retrieval/dedup; degenerate encoders show
    up as off-unit norms or heavy-tailed component columns.

    Determinism: the per-row norm and each component are rounded ONCE
    to integer units, so all moments are exact integer sums
    (order-free in both engines); mean/stddev/threshold come from
    single-expression IEEE arithmetic over exact integer operands —
    identical doubles on both sides.  Components scale at e3 (norms
    at e3 too): with |x| <= 1 (unit-norm encoders) ``x_e3`` is at
    most 1e3, so ``n*s2 - s1*s1 <= n^2 * 1e6`` stays BIGINT-exact up
    to n ~ 3e6 rows per (label, dim) — e6 scaling overflowed int64 at
    n ~ 3e3 worst case, silently wrapping under non-ANSI Spark while
    DuckDB widened to HUGEINT.  Beyond 3e6 per label, accumulate s2
    as DECIMAL(38,0).

    Scale shape: one explode-by-dimension aggregate — the shuffle
    carries |labels|·{DIM} moment cells regardless of corpus size
    — then the tiny stats table BROADCASTS back over a second
    map-only scan.  No window over the fact table, no all-pairs."""
    return f"""
        WITH cv AS (
            SELECT vec_id, label,
                   {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        norms AS (
            SELECT label, COUNT(*) AS n_vec,
                   SUM(CAST(ROUND(SQRT({d.arr_dot('emb', 'emb')}) * 1e3)
                            AS BIGINT)) AS s_norm
            FROM cv GROUP BY label
        ),
        comp AS (
            SELECT label, i.i AS dim,
                   CAST(ROUND({d.arr_get('emb', 'i.i')} * 1e3)
                        AS BIGINT) AS x_e3
            FROM cv CROSS JOIN {d.series(DIM)} i
        ),
        agg AS (
            SELECT label, dim, COUNT(*) AS n,
                   CAST(SUM(x_e3) AS BIGINT) AS s1,
                   CAST(SUM(x_e3 * x_e3) AS BIGINT) AS s2
            FROM comp GROUP BY label, dim
        ),
        stats AS (
            SELECT label, dim,
                   CAST(s1 AS DOUBLE) / n AS mean_d,
                   SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n AS sd_d
            FROM agg
        ),
        flagged AS (
            SELECT c.label,
                   CASE WHEN ABS(CAST(c.x_e3 AS DOUBLE) - st.mean_d)
                             > 2.0 * st.sd_d
                        THEN 1 ELSE 0 END AS o
            FROM comp c
            JOIN stats st ON st.label = c.label AND st.dim = c.dim
        ),
        cells AS (
            SELECT label, COUNT(*) AS n_cells, SUM(o) AS n_out
            FROM flagged GROUP BY label
        )
        SELECT n.label,
               CAST(n.n_vec AS BIGINT) AS n_vec,
               CAST(ROUND(CAST(n.s_norm AS DOUBLE) / n.n_vec) AS BIGINT)
                   AS mean_norm_e3,
               CAST(c.n_cells AS BIGINT) AS n_cells,
               CAST(c.n_out AS BIGINT) AS n_outlier_cells
        FROM norms n JOIN cells c ON c.label = n.label
    """


PCA_ITERS = 3


def q_pca_scatter(d: S.Dialect) -> str:
    """The n²-scaled centered scatter matrix of
    :func:`q_pca_power_iter` as a standalone SELECT (columns
    i, j, a, n) — the one corpus-pass piece, materialized once by the
    registry's Spark side so the iteration CTEs never re-expand it."""
    x_i = f"CAST(ROUND({d.arr_get('emb', 'i.i')} * 1e3) AS BIGINT)"
    x_j = f"CAST(ROUND({d.arr_get('emb', 'j.i')} * 1e3) AS BIGINT)"
    return f"""
        WITH cv AS (
            SELECT {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        cells AS (
            SELECT i.i AS i, j.i AS j, {x_i} AS xi, {x_j} AS xj
            FROM cv
            CROSS JOIN {d.series(DIM)} i
            CROSS JOIN {d.series(DIM)} j
        ),
        mom AS (
            SELECT i, j,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xi) AS BIGINT) AS si,
                   CAST(SUM(xj) AS BIGINT) AS sj,
                   CAST(SUM(xi * xj) AS BIGINT) AS sij
            FROM cells GROUP BY i, j
        )
        SELECT i, j, CAST(n * sij - si * sj AS DOUBLE) AS a, n
        FROM mom
    """


def q_pca_power_iter(d: S.Dialect, iters: int = PCA_ITERS,
                     amat_view: str | None = None) -> str:
    """Leading principal component of the embedding cloud by POWER
    ITERATION over the exact integer scatter matrix — the spectral
    health check (and whitening/decorrelation input) an embedding
    pipeline runs corpus-wide: a healthy encoder spreads variance;
    one dominant component means collapsed representations.

    Math: with components rounded once to e3 integers, the n²-scaled
    centered scatter ``A[i][j] = n·Σx_i x_j − (Σx_i)(Σx_j)`` is
    BIGINT-exact (|x_e3| ≤ 1e3 ⇒ |A| ≤ n²·1e6: int64-safe to
    n ~ 3e6 vectors, DECIMAL beyond).  ``v₀ = 1/8`` uniform (exact:
    unit norm at DIM=64); each iteration is one matvec + normalize.
    Determinism: every Σ over doubles is a LEFT-ASSOCIATED fold of a
    dim-ORDERED array (``arr_fsum``/``ordered_list``) — never a
    parallel SUM — and v is re-quantized to e9 integers after each
    normalize, so both engines iterate identical vectors bit for bit.
    Output: (dim, v_e6 component, lambda_micro) where lambda_micro is
    the Rayleigh quotient in micro-units of original variance.

    Scale shape: the scatter build is ONE pass — a map-side DIM×DIM
    expansion per vector (no self-join on vec_id, nothing shuffles
    but the 4096 moment cells) with partial aggregation; the
    iterations run on the 4096-row A and 64-row v — driver-scale
    tables regardless of corpus size.  (As rendered SQL the engine
    may re-expand the scan per matvec CTE reference; the production
    DataFrame form persists the moment table — semantics identical.)

    Sign is pinned by the iteration itself (v₀ all-positive), not by
    an eigensolver's arbitrary choice.

    ``amat_view``: name of a pre-materialized view holding the
    scatter table (columns i, j, a, n — :func:`q_pca_scatter`).  A
    CTE is inlined per reference, and ``amat`` is referenced by every
    matvec step plus the Rayleigh quotient — as one SQL string the
    engine re-expands the corpus×DIM² scatter pass ``iters+1`` times
    (guide §2.4).  The registry's Spark side materializes the
    4096-row scatter once (localCheckpoint) and passes its view name
    here; the DuckDB oracle keeps the self-contained single string."""
    x_i = f"CAST(ROUND({d.arr_get('emb', 'i.i')} * 1e3) AS BIGINT)"
    x_j = f"CAST(ROUND({d.arr_get('emb', 'j.i')} * 1e3) AS BIGINT)"
    prev = "CAST(0.125 AS DOUBLE)"  # v0: exact 1/8, unit at DIM=64
    steps = []
    for k in range(1, iters + 1):
        vk = (f"(CAST(v{k - 1}.v_e9 AS DOUBLE) / 1e9)"
              if k > 1 else prev)
        join = (f" JOIN v{k - 1} ON v{k - 1}.i = a.j" if k > 1 else "")
        # the 64-row v table is post-aggregate, so Catalyst can't SIZE
        # it for auto-broadcast — hint it (comment syntax: DuckDB
        # ignores it as a plain comment)
        hint = f"/*+ BROADCAST(v{k - 1}) */ " if k > 1 else ""
        steps.append(f"""
        r{k} AS (
            SELECT {hint}a.i AS i,
                   {d.arr_fsum(d.ordered_list(f'a.a * {vk}', 'a.j'))}
                       AS r
            FROM amat a{join}
            GROUP BY a.i
        ),
        n{k} AS (
            SELECT SQRT({d.arr_fsum(d.ordered_list('r * r', 'i'))})
                       AS nv
            FROM r{k}
        ),
        v{k} AS (
            SELECT i, CAST(ROUND(r / nv * 1e9) AS BIGINT) AS v_e9
            FROM r{k} CROSS JOIN n{k}
        )""")
    last = f"v{iters}"
    vfin = f"(CAST({last}.v_e9 AS DOUBLE) / 1e9)"
    if amat_view is not None:
        head = f"""amat AS (
            SELECT i, j, a, n FROM {amat_view}
        )"""
    else:
        head = f"""cv AS (
            SELECT {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        cells AS (
            SELECT i.i AS i, j.i AS j, {x_i} AS xi, {x_j} AS xj
            FROM cv
            CROSS JOIN {d.series(DIM)} i
            CROSS JOIN {d.series(DIM)} j
        ),
        mom AS (
            SELECT i, j,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xi) AS BIGINT) AS si,
                   CAST(SUM(xj) AS BIGINT) AS sj,
                   CAST(SUM(xi * xj) AS BIGINT) AS sij
            FROM cells GROUP BY i, j
        ),
        amat AS (
            SELECT i, j, CAST(n * sij - si * sj AS DOUBLE) AS a, n
            FROM mom
        )"""
    return f"""
        WITH {head},{",".join(steps)},
        ray AS (
            SELECT /*+ BROADCAST(vi, vj) */ {d.arr_fsum(d.ordered_list(
                f'a.a * (CAST(vj.v_e9 AS DOUBLE) / 1e9) '
                f'* (CAST(vi.v_e9 AS DOUBLE) / 1e9)',
                f'a.i * {DIM} + a.j'))}
                       AS num,
                   MAX(a.n) AS n_vec
            FROM amat a
            JOIN {last} vi ON vi.i = a.i
            JOIN {last} vj ON vj.i = a.j
        ),
        den AS (
            SELECT {d.arr_fsum(d.ordered_list(
                f'(CAST(v_e9 AS DOUBLE) / 1e9) '
                f'* (CAST(v_e9 AS DOUBLE) / 1e9)', 'i'))} AS den
            FROM {last}
        )
        SELECT {last}.i AS dim,
               CAST(ROUND(CAST({last}.v_e9 AS DOUBLE) / 1e3) AS BIGINT)
                   AS v_e6,
               CAST(ROUND(r.num / d2.den
                          / (CAST(r.n_vec AS DOUBLE)
                             * CAST(r.n_vec AS DOUBLE))) AS BIGINT)
                   AS lambda_micro
        FROM {last} CROSS JOIN ray r CROSS JOIN den d2
        ORDER BY dim
    """


def q_ann_recall(d: S.Dialect, k: int = K,
                 nprobes: tuple[int, ...] = (1, 2, 4, 8)) -> str:
    """IVF recall AUDIT: per query, how many of the exact brute-force
    cosine top-k the IVF-Flat path actually returned — "measure,
    don't guess" for the approximate index: a driver-witnessed recall
    table instead of a hand-waved quality claim.  Both legs are the
    registry's own derivations (`q_ann_ivf_topk` verbatim; the exact
    leg is the same norm/rank machinery over the all-pairs candidate
    set), so the audit measures exactly what the registered operator
    ships.

    Output per (nprobe, query): evaluated k, hits, recall_e4
    (floored integer) — the recall-vs-cost CURVE a pipeline reads to
    pick its probe budget (the ANN analog of the LSH banding
    planner).  The ``nprobe = IVF_CELLS`` leg probes every cell and
    therefore MUST hit recall 10000 exactly (the candidate set
    equals brute force) — a built-in sanity anchor, test-pinned.
    On the synthetic fixture embeddings (near-random, little cluster
    structure — IVF's worst case) the curve runs ~32/44/72/100 % for
    nprobe 1/2/4/8 of 8 cells.  At 100 TB the
    exact leg is the expensive one BY DESIGN — a recall audit runs
    on a sampled query set (the stride-{QUERY_STRIDE} queries here),
    never the full corpus; the IVF leg stays the production path."""
    exact = f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        qv AS (SELECT * FROM cv WHERE vec_id % {QUERY_STRIDE} = 0),
        {_norm_cte(d)},
        cand AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id
            FROM qv q JOIN cv c ON c.vec_id <> q.vec_id
        ),
        {_rank_tail(d, k)}
    """
    legs = []
    for np_ in nprobes:
        legs.append(f"""
        SELECT {np_} AS nprobe, e.query_id,
               CAST(COUNT(*) AS BIGINT) AS k_eval,
               CAST(SUM(CASE WHEN i.cand_id IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               CAST({d.intdiv(
                   "SUM(CASE WHEN i.cand_id IS NOT NULL "
                   "THEN 1 ELSE 0 END) * 10000", "COUNT(*)")}
                   AS BIGINT) AS recall_e4
        FROM ex e
        LEFT JOIN ({q_ann_ivf_topk(d, np_)}) i
               ON i.query_id = e.query_id
              AND i.cand_id = e.cand_id
        GROUP BY e.query_id""")
    union = "\n        UNION ALL".join(legs)
    return f"""
        WITH ex AS ({exact})
        {union}
    """


RRF_C = 60          # the standard reciprocal-rank-fusion constant
RRF_LEG_K = 10      # per-leg candidate depth feeding the fusion
RRF_TOPK = 5


def q_hybrid_rrf_topk(d: S.Dialect, k: int = RRF_TOPK,
                      leg_k: int = RRF_LEG_K, c: int = RRF_C) -> str:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009): for each sampled query document, fuse an EMBEDDING leg
    (cosine top-``leg_k`` over the embeddings table) with a LEXICAL
    leg (token-set Jaccard top-``leg_k`` over the documents table)
    by ``score = sum_legs 1/(c + rank)`` — the standard two-tower +
    BM25-family hybrid every retrieval pipeline ships, rank-only so
    the two legs' incomparable score scales never need calibration.

    Exact integers: each leg contributes ``1e6 DIV (c + rank)``
    (floored), summed; candidates missing from a leg contribute 0
    (fusion runs over the UNION of the legs' top-k sets).  Ties on
    the fused score break by (cand_id) for a stable cross-engine
    order.

    Scale shape: the embedding leg is the sampled-query brute-force
    scorer (or the IVF path in production — rank lists are
    interchangeable by construction); the lexical leg explodes ONLY
    the query documents' tokens (|queries| x doc-length rows) into
    an inverted-index join against the corpus token table, so
    corpus-side work is one token aggregate; the fusion itself is a
    FULL OUTER join of two (queries x leg_k)-sized lists."""
    from .dedup_sql import q_cosine_topk

    cos = q_cosine_topk(d, k=leg_k, query_stride=QUERY_STRIDE)
    return f"""
        WITH cos AS ({cos}),
        dtoks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, {d.explode_tokens('text')} AS tok
                FROM documents
            ) t WHERE tok <> '' GROUP BY doc_id, tok
        ),
        dsz AS (
            SELECT doc_id, COUNT(*) AS n FROM dtoks GROUP BY doc_id
        ),
        qtoks AS (
            SELECT doc_id AS query_id, tok FROM dtoks
            WHERE doc_id % {QUERY_STRIDE} = 0
        ),
        inter AS (
            SELECT q.query_id, t.doc_id AS cand_id,
                   COUNT(*) AS n_inter
            FROM qtoks q JOIN dtoks t ON t.tok = q.tok
                                     AND t.doc_id <> q.query_id
            GROUP BY q.query_id, t.doc_id
        ),
        lexr AS (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY ROUND(CAST(n_inter AS DOUBLE)
                           / (qs.n + cs.n - n_inter), 6) DESC,
                           cand_id) AS rk
            FROM inter i
            JOIN dsz qs ON qs.doc_id = i.query_id
            JOIN dsz cs ON cs.doc_id = i.cand_id
        ),
        lex AS (SELECT * FROM lexr WHERE rk <= {leg_k}),
        fused AS (
            SELECT COALESCE(c.query_id, l.query_id) AS query_id,
                   COALESCE(c.cand_id, l.cand_id) AS cand_id,
                   CAST(COALESCE({d.intdiv('1000000',
                                           f'({c} + c.rk)')}, 0)
                        + COALESCE({d.intdiv('1000000',
                                             f'({c} + l.rk)')}, 0)
                        AS BIGINT) AS rrf_e6,
                   c.rk AS cos_rank, l.rk AS lex_rank
            FROM cos c
            FULL OUTER JOIN lex l ON l.query_id = c.query_id
                                 AND l.cand_id = c.cand_id
        ),
        final AS (
            SELECT query_id, cand_id, rrf_e6,
                   CAST(COALESCE(cos_rank, 0) AS BIGINT) AS cos_rank,
                   CAST(COALESCE(lex_rank, 0) AS BIGINT) AS lex_rank,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rrf_e6 DESC, cand_id) AS rk
            FROM fused
        )
        SELECT query_id, cand_id, rrf_e6, cos_rank, lex_rank,
               CAST(rk AS BIGINT) AS rk
        FROM final WHERE rk <= {k}
    """


def q_hard_negative_topk(d: S.Dialect, k: int = K) -> str:
    """Hard-negative mining for contrastive / embedding training: per
    query vector, the top-{k} most-cosine-similar candidates whose
    label DIFFERS from the query's — the "close but wrong" examples a
    contrastive loss learns the most from (InfoNCE / DPR-style
    in-batch negatives are random; hard negatives come from exactly
    this mined set).

    Candidate generation is the SAME deterministic LSH machinery the
    driver already hash-verifies (q_ann_lsh_topk / q_retrieval_eval):
    per-table sign-sketch buckets, bucket-equijoin, distinct pairs.
    The label filter lands BEFORE scoring, so the per-query score set
    is the negatives-only set and ranks are dense within it.

    Scale shape: identical to the retrieval path — sketches are
    map-only, the bucket join is an equi-join on (table, bucket),
    scoring joins the norm-carrying corpus twice by vec_id, and the
    window partitions by query_id (never corpus-wide).  At 100 TB the
    only new cost over lsh_topk is the label columns riding along.
    Reference anchor: LLM-pipeline extension (SURVEY.md LLM ops)."""
    cb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket FROM cv"
        for t in range(LSH_TABLES))
    qb = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_sketch(d, 'emb', t)} AS bucket FROM qv"
        for t in range(LSH_TABLES))
    return f"""
        WITH cv AS (
            SELECT vec_id, label, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        qv AS (SELECT * FROM cv WHERE vec_id % {QUERY_STRIDE} = 0),
        {_norm_cte(d)},
        cb AS ({cb}),
        qb AS ({qb}),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
            FROM qb q
            JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
                     AND q.vec_id <> c.vec_id
        ),
        neg AS (
            SELECT cand.query_id, cand.cand_id,
                   qq.label AS query_label, cc.label AS neg_label
            FROM cand
            JOIN cv qq ON qq.vec_id = cand.query_id
            JOIN cv cc ON cc.vec_id = cand.cand_id
            WHERE cc.label <> qq.label
        ),
        scored AS (
            SELECT n.query_id, n.cand_id, n.query_label, n.neg_label,
                   ROUND({d.arr_dot('q.emb', 'c.emb')}
                         / (q.nrm * c.nrm), 6) AS cosine
            FROM neg n
            JOIN cvn q ON q.vec_id = n.query_id
            JOIN cvn c ON c.vec_id = n.cand_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, cand_id) AS rk
            FROM scored
        )
        SELECT query_id, query_label, cand_id, neg_label, cosine,
               CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {k}
    """


def q_centroid_similarity_matrix(d: S.Dialect) -> str:
    """Label-confusability matrix: pairwise cosine between per-label
    embedding centroids (a < b), plus each label's member count — the
    one-screen summary that tells you which classes an embedding
    space cannot separate (high centroid cosine = labels a retrieval
    or dedup pass will conflate).

    Determinism: centroid components are QUANTIZED at the aggregate
    boundary — ROUND(AVG(x), 6) — so both engines feed bit-identical
    doubles into the pairwise cosine, and the final ROUND(…, 6) can
    never flip on summation-order drift (stricter than the
    label_centroid_stats ROUND-at-the-end guard, since values here
    feed a cross-label comparison surface).

    Scale shape: the centroid table is ONE explode-by-dimension
    aggregate — (label, dim) cells, |labels|·dim rows regardless of
    corpus size — and the pairwise join is |labels|² rows over a
    table that fits in a broadcast many times over.  Reference
    anchor: LLM-pipeline extension (SURVEY.md LLM ops)."""
    return f"""
        WITH cv AS (
            SELECT vec_id, label,
                   {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        cells AS (
            SELECT label, i.i AS dim,
                   ROUND(AVG({d.arr_get('emb', 'i.i')}), 6) AS c,
                   COUNT(*) AS n
            FROM cv CROSS JOIN {d.series(DIM)} i
            GROUP BY label, i.i
        ),
        centroids AS (
            SELECT label, {d.ordered_list('c', 'dim')} AS cemb,
                   MAX(n) AS n
            FROM cells GROUP BY label
        ),
        norms AS (
            SELECT label, cemb, n,
                   SQRT({d.arr_dot('cemb', 'cemb')}) AS nrm
            FROM centroids
        )
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
               ROUND({d.arr_dot('a.cemb', 'b.cemb')}
                     / (a.nrm * b.nrm), 6) AS centroid_cosine
        FROM norms a
        JOIN norms b ON a.label < b.label
    """


# ---------------------------------------------------------------------------
# Product quantization (round 9): the compression rung between int8
# scalar quantization and IVF — subspace codebooks + asymmetric
# distance computation (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011).
# ---------------------------------------------------------------------------

PQ_M = 8                  # subspaces (the classic PQ shape: DIM/8 dims each)
PQ_SUBDIM = DIM // PQ_M   # dims per subspace
PQ_K = 32                 # centroids per subspace codebook (256 = the
                          # classic 1-byte code in production; 32 keeps
                          # the verification-scale codebook meaningful
                          # against 500 fixture vectors)


def _l2sq(d: S.Dialect, a: str, b: str) -> str:
    """Squared L2 via the dot identity — no per-pair zip/fold."""
    return (f"({d.arr_dot(a, a)} + {d.arr_dot(b, b)}"
            f" - 2 * {d.arr_dot(a, b)})")


def _pq_ctes(d: S.Dialect) -> str:
    """Shared CTE chain ``cv → subv → … → pcodes``: per-subspace
    codebooks derived fully in-SQL (seeds = the {PQ_K} lowest-id
    subvectors per subspace, ONE Lloyd mean pass quantized at the
    aggregate boundary — the q_ann_ivf_topk recipe applied per
    subspace), then every vector's nearest-centroid code per
    subspace.

    Determinism: every ordering key is ROUND(…, 6) with a
    cell/seed tie-break; centroid components are ROUND(AVG(…), 6) so
    both engines feed identical doubles downstream.  Scale shape:
    ``subv`` is a map-only explode into {PQ_M} subvector rows; the
    codebook CTEs aggregate to {PQ_M}·{PQ_K}·{PQ_SUBDIM} cells (tiny,
    broadcast); assignment is vectors × {PQ_K} codebook rows per
    subspace — linear in the corpus with a constant fan-out."""
    subdim = PQ_SUBDIM
    sl = d.arr_slice("emb", f"s.i * {subdim}", str(subdim))
    l2_vs = f"ROUND({_l2sq(d, 'v.semb', 's.semb')}, 6)"
    l2_vc = f"ROUND({_l2sq(d, 'v.semb', 'c.cemb')}, 6)"
    return f"""
        cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        subv AS (
            SELECT vec_id, s.i AS sub, {sl} AS semb
            FROM cv CROSS JOIN {d.series(PQ_M)} s
        ),
        sseeds AS (
            SELECT sub, semb, rn FROM (
                SELECT sub, semb,
                       ROW_NUMBER() OVER (PARTITION BY sub
                                          ORDER BY vec_id) AS rn
                FROM subv
            ) s0 WHERE rn <= {PQ_K}
        ),
        passign0 AS (
            SELECT v.vec_id, v.sub, v.semb, s.rn - 1 AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
                       ORDER BY {l2_vs} ASC, s.rn) AS pick
            FROM subv v JOIN sseeds s ON s.sub = v.sub
        ),
        pa0 AS (
            SELECT vec_id, sub, semb, cell FROM passign0 WHERE pick = 1
        ),
        pdims AS (
            SELECT sub, cell, j.i AS j,
                   ROUND(AVG({d.arr_get('semb', 'j.i')}), 6) AS mv
            FROM pa0 CROSS JOIN {d.series(PQ_SUBDIM, 'i')} j
            GROUP BY sub, cell, j.i
        ),
        pcents AS (
            SELECT sub, cell, {d.ordered_list('mv', 'j')} AS cemb
            FROM pdims GROUP BY sub, cell
        ),
        pq_assign AS (
            SELECT v.vec_id, v.sub, v.semb, c.cell,
                   ROUND({_l2sq(d, 'v.semb', 'c.cemb')}, 6) AS err,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
                       ORDER BY {l2_vc} ASC, c.cell) AS pick
            FROM subv v JOIN pcents c ON c.sub = v.sub
        ),
        pcodes AS (
            SELECT vec_id, sub, cell AS code, err
            FROM pq_assign WHERE pick = 1
        )"""


def q_pq_codes(d: S.Dialect) -> str:
    """Product-quantization codes: each vector compressed to {PQ_M}
    codebook indices (5 bits each at the verification scale; 8 bits =
    the classic PQ byte per subspace in production) plus the
    subspace reconstruction error.  At 100 TB of embeddings PQ is the
    storage tier that makes exhaustive re-ranking affordable:
    {PQ_M} small ints per vector instead of {PQ_SUBDIM}·{PQ_M}
    doubles, with q_ann_pq_topk showing the ADC ranking those codes
    support.  Reference anchor: LLM-pipeline extension (SURVEY.md
    LLM ops); algorithm: Jégou et al. TPAMI 2011."""
    return f"""
        WITH {_pq_ctes(d)}
        SELECT vec_id, CAST(sub AS BIGINT) AS sub,
               CAST(code AS BIGINT) AS code,
               err AS recon_err
        FROM pcodes
    """


def q_ann_pq_topk(d: S.Dialect, k: int = K) -> str:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, a
    {PQ_M}×{PQ_K} lookup table of exact query-subvector → centroid
    squared distances in integer micro-units, then every candidate
    scored by ONE table lookup per subspace and an exact integer sum
    — the cheap exhaustive scan PQ exists for (IVF composes in front
    of it as the candidate pruner at cluster scale; the verified form
    keeps the scan flat so the oracle covers every pair).

    Determinism: LUT entries are micro-unit BIGINTs (ROUND at the
    1e-6 boundary), so the per-candidate sum is exact integer
    arithmetic — no float summation order anywhere past the LUT.
    Scale shape: LUT is queries × {PQ_M}·{PQ_K} rows (broadcast);
    scoring joins the code table on (sub, code) and aggregates
    (query, cand) partial-sums map-side; the only corpus-sized
    shuffle is the final per-query top-k."""
    lut_dist = f"CAST(ROUND({_l2sq(d, 'q.semb', 'c.cemb')} * 1e6) AS BIGINT)"
    return f"""
        WITH {_pq_ctes(d)},
        qsub AS (
            SELECT vec_id AS query_id, sub, semb FROM subv
            WHERE vec_id % {QUERY_STRIDE} = 0
        ),
        lut AS (
            SELECT q.query_id, c.sub, c.cell, {lut_dist} AS pdist_e6
            FROM qsub q JOIN pcents c ON c.sub = q.sub
        ),
        scored AS (
            SELECT l.query_id, p.vec_id AS cand_id,
                   CAST(SUM(l.pdist_e6) AS BIGINT) AS adist_e6
            FROM pcodes p
            JOIN lut l ON l.sub = p.sub AND l.cell = p.code
                      AND l.query_id <> p.vec_id
            GROUP BY l.query_id, p.vec_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adist_e6 ASC, cand_id) AS rk
            FROM scored
        )
        SELECT query_id, cand_id, adist_e6, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {k}
    """


def q_pq_lut(d: S.Dialect) -> str:
    """The per-query ADC lookup table alone — (query_id, sub, cell,
    pdist_e6) — for benches that MATERIALIZE the index once and time
    only the scoring scan (the production shape: codes and LUTs are
    stored/derived once; q_ann_pq_topk re-derives the codebooks
    inline only so the oracle covers the whole chain)."""
    lut_dist = f"CAST(ROUND({_l2sq(d, 'q.semb', 'c.cemb')} * 1e6) AS BIGINT)"
    return f"""
        WITH {_pq_ctes(d)},
        qsub AS (
            SELECT vec_id AS query_id, sub, semb FROM subv
            WHERE vec_id % {QUERY_STRIDE} = 0
        )
        SELECT q.query_id, c.sub, c.cell, {lut_dist} AS pdist_e6
        FROM qsub q JOIN pcents c ON c.sub = q.sub
    """


def q_ann_pq_topk_packed(d: S.Dialect = S.SPARK, k: int = K) -> str:
    """PRODUCTION form of the flat ADC scan: codes packed to ONE
    ``array`` row per vector and the per-query LUT packed to one
    {PQ_M}·{PQ_K} array, so scoring is a broadcast nested loop with a
    single in-expression integer fold per (query, cand) — no
    (vec, subspace) row explosion anywhere past the codebook CTEs
    (the cosine_topk shape applied to PQ; SCALING.md's prescribed
    array-form).  At 100 TB the codes table IS the stored index
    ({PQ_M} small ints per vector), the LUT side broadcasts, and the
    corpus never shuffles until the per-query top-k.

    Spark-rendered ONLY (the fold uses Spark's 0-based ``arr[i]`` and
    ``aggregate`` lambda): the registry pins it equal to the EXPLODED
    q_ann_pq_topk run on DuckDB — a cross-derivation oracle, stronger
    than the shared-template check (the _sql_cross_pair doctrine).
    """
    assert d is S.SPARK, "packed ADC fold is Spark-rendered only"
    lut_dist = f"CAST(ROUND({_l2sq(d, 'q.semb', 'c.cemb')} * 1e6) AS BIGINT)"
    # PQ_M is a render-time constant, so the ADC sum EXPANDS to static
    # array-index adds instead of an aggregate() lambda: Spark
    # evaluates higher-order functions interpreted (outside
    # whole-stage codegen) — the lambda fold measured SLOWER than the
    # exploded join+aggregate at 20 k vectors, and a MAP-keyed LUT
    # measured 2.4x slower still (Spark's GetMapValue is a LINEAR
    # key scan).  Positional indexing is made safe BY CONSTRUCTION:
    # the LUT densifies over every (sub, cell) slot (an empty
    # codebook cell — duplicate seed subvectors, real on real data —
    # would otherwise leave a gap that silently misaligns every later
    # position), so lvec always has exactly PQ_M*PQ_K entries and a
    # stored code always references a REAL cell's entry; the NULL
    # filler of a dead slot is unreachable and would surface loudly
    # (NULL adist ranks first) rather than silently.
    fold = " + ".join(f"l.lvec[{m} * {PQ_K} + c.cvec[{m}]]"
                      for m in range(PQ_M))
    return f"""
        WITH {_pq_ctes(d)},
        codes AS (
            SELECT vec_id, {d.ordered_list('code', 'sub')} AS cvec
            FROM pcodes GROUP BY vec_id
        ),
        qsub AS (
            SELECT vec_id AS query_id, sub, semb FROM subv
            WHERE vec_id % {QUERY_STRIDE} = 0
        ),
        lut AS (
            SELECT q.query_id, c.sub, c.cell, {lut_dist} AS pdist_e6
            FROM qsub q JOIN pcents c ON c.sub = q.sub
        ),
        slots AS (
            SELECT s.i AS sub, k.i AS cell
            FROM {d.series(PQ_M, 'i')} s CROSS JOIN {d.series(PQ_K, 'i')} k
        ),
        lutd AS (
            SELECT q.query_id, sl.sub, sl.cell, l.pdist_e6
            FROM (SELECT DISTINCT query_id FROM lut) q
            CROSS JOIN slots sl
            LEFT JOIN lut l ON l.query_id = q.query_id
                           AND l.sub = sl.sub AND l.cell = sl.cell
        ),
        lutp AS (
            SELECT query_id,
                   {d.ordered_list('pdist_e6', f'sub * {PQ_K} + cell')}
                       AS lvec
            FROM lutd GROUP BY query_id
        ),
        scored AS (
            SELECT /*+ BROADCAST(l) */
                   l.query_id, c.vec_id AS cand_id,
                   {fold} AS adist_e6
            FROM codes c CROSS JOIN lutp l
            WHERE l.query_id <> c.vec_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adist_e6 ASC, cand_id) AS rk
            FROM scored
        )
        SELECT query_id, cand_id, adist_e6, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {k}
    """


def q_ann_ivfpq_topk(d: S.Dialect, nprobe: int = IVF_NPROBE,
                     k: int = K) -> str:
    """IVF-PQ: the production FAISS composition — the IVF coarse
    quantizer (identical recipe to q_ann_ivf_topk: lowest-id seeds,
    one quantized Lloyd pass, dot-product cell assignment) prunes the
    candidate set to ``nprobe`` cells, then PQ ADC (integer
    micro-unit LUT, q_ann_pq_topk's scorer) ranks only the survivors.

    At 100 TB this is THE ANN shape: the coarse index bounds the scan
    to nprobe/cells of the corpus and PQ makes each survivor cost one
    {PQ_M}-lookup integer sum instead of a {DIM}-dim float dot.
    Scale shape: both codebooks are tiny broadcast tables; the only
    corpus-sized operations are the two map-only assignments and the
    per-query top-k.  Algorithm: Jégou et al. TPAMI 2011 §IV."""
    dot_vs = f"ROUND({d.arr_dot('v.emb', 's.emb')}, 6)"
    dot_vc = f"ROUND({d.arr_dot('v.emb', 'c.cemb')}, 6)"
    dot_qc = f"ROUND({d.arr_dot('q.emb', 'c.cemb')}, 6)"
    lut_dist = f"CAST(ROUND({_l2sq(d, 'q.semb', 'c.cemb')} * 1e6) AS BIGINT)"
    return f"""
        WITH {_pq_ctes(d)},
        qv AS (SELECT * FROM cv WHERE vec_id % {QUERY_STRIDE} = 0),
        cseeds AS (
            SELECT emb, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM (SELECT * FROM cv ORDER BY vec_id LIMIT {IVF_CELLS}) s0
        ),
        cassign0 AS (
            SELECT v.vec_id, v.emb, s.rn - 1 AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY {dot_vs} DESC, s.rn) AS pick
            FROM cv v CROSS JOIN cseeds s
        ),
        ca0 AS (SELECT vec_id, emb, cell FROM cassign0 WHERE pick = 1),
        cdims AS (
            SELECT cell, i, ROUND(AVG({d.arr_get('emb', 'i')}), 6) AS mv
            FROM ca0 CROSS JOIN {d.series(DIM)}
            GROUP BY cell, i
        ),
        ccents AS (
            SELECT cell, {d.ordered_list('mv', 'i')} AS cemb
            FROM cdims GROUP BY cell
        ),
        cassign1 AS (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY {dot_vc} DESC, c.cell) AS pick
            FROM cv v CROSS JOIN ccents c
        ),
        ca1 AS (SELECT vec_id, cell FROM cassign1 WHERE pick = 1),
        cprobes AS (
            SELECT q.vec_id AS query_id, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY {dot_qc} DESC, c.cell) AS pr
            FROM qv q CROSS JOIN ccents c
        ),
        cand AS (
            SELECT p.query_id, a.vec_id AS cand_id
            FROM (SELECT query_id, cell FROM cprobes
                  WHERE pr <= {nprobe}) p
            JOIN ca1 a ON a.cell = p.cell AND a.vec_id <> p.query_id
        ),
        qsub AS (
            SELECT vec_id AS query_id, sub, semb FROM subv
            WHERE vec_id % {QUERY_STRIDE} = 0
        ),
        lut AS (
            SELECT q.query_id, c.sub, c.cell, {lut_dist} AS pdist_e6
            FROM qsub q JOIN pcents c ON c.sub = q.sub
        ),
        scored AS (
            SELECT cand.query_id, cand.cand_id,
                   CAST(SUM(l.pdist_e6) AS BIGINT) AS adist_e6
            FROM cand
            JOIN pcodes p ON p.vec_id = cand.cand_id
            JOIN lut l ON l.query_id = cand.query_id
                      AND l.sub = p.sub AND l.cell = p.code
            GROUP BY cand.query_id, cand.cand_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adist_e6 ASC, cand_id) AS rk
            FROM scored
        )
        SELECT query_id, cand_id, adist_e6, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {k}
    """


def q_pq_recall(d: S.Dialect, k: int = K) -> str:
    """PQ recall AUDIT against the exact squared-L2 top-k (the metric
    PQ quantizes, so the number isolates QUANTIZATION loss rather
    than an L2-vs-cosine metric mismatch): per query, hits and
    floored recall_e4 for the flat ADC scan (`pq_flat`) and the
    IVF-pruned composition (`ivfpq`).  Both legs are the registry's
    own derivations verbatim — the audit measures exactly what the
    registered operators ship (the q_ann_recall doctrine).  Note the
    ivfpq leg's per-query recall is NOT bounded by the flat leg's:
    coarse pruning shrinks the CANDIDATE set, which can evict false
    positives that out-ranked a true hit in the flat ADC scan and so
    let the hit into the pruned top-k (observed on the fixture).
    The planted exact-codebook case, where both legs must read
    10000, is test-pinned.  At scale the exact leg runs on the sampled query
    stride only — the audit is a quality probe, not a production
    path."""
    l2 = f"ROUND({_l2sq(d, 'q.emb', 'c.emb')}, 6)"
    exact = f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        qv AS (SELECT * FROM cv WHERE vec_id % {QUERY_STRIDE} = 0),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   {l2} AS dist
            FROM qv q JOIN cv c ON c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dist ASC, cand_id) AS rk
            FROM scored
        )
        SELECT query_id, cand_id FROM ranked WHERE rk <= {k}
    """
    legs = []
    for label, leg_sql in (("pq_flat", q_ann_pq_topk(d, k)),
                           ("ivfpq", q_ann_ivfpq_topk(d, k=k))):
        legs.append(f"""
        SELECT {d.str_lit(label)} AS variant, e.query_id,
               CAST(COUNT(*) AS BIGINT) AS k_eval,
               CAST(SUM(CASE WHEN i.cand_id IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               CAST({d.intdiv(
                   "SUM(CASE WHEN i.cand_id IS NOT NULL "
                   "THEN 1 ELSE 0 END) * 10000", "COUNT(*)")}
                   AS BIGINT) AS recall_e4
        FROM ex e
        LEFT JOIN ({leg_sql}) i
               ON i.query_id = e.query_id
              AND i.cand_id = e.cand_id
        GROUP BY e.query_id""")
    union = "\n        UNION ALL".join(legs)
    return f"""
        WITH ex AS ({exact})
        {union}
    """


def q_embedding_exact_dedup(d: S.Dialect) -> str:
    """Exact-duplicate VECTOR dedup: embeddings hashed on their
    e6-quantized component string (trunc-toward-zero per component,
    so the key is rule-free cross-engine and robust to float
    formatting) — the embedding-table twin of q_exact_dedup, run
    before any ANN structure is built (duplicate vectors waste index
    space and bias k-NN votes).  One map-only projection + one
    groupBy on the 128-bit hash; same scale shape as exact dedup."""
    comp = d.trunc_num(f"{d.arr_get('emb', 'i.i')} * 1000000.0")
    return f"""
        WITH cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        keyed AS (
            SELECT vec_id,
                   MD5({d.ordered_list_csv(comp, 'i.i')}) AS vec_hash
            FROM cv CROSS JOIN {d.series(DIM)} i
            GROUP BY vec_id
        )
        SELECT vec_hash,
               MIN(vec_id) AS canonical_vec,
               COUNT(*) AS n_copies,
               MAX(vec_id) AS max_member
        FROM keyed
        GROUP BY vec_hash
    """


def q_nn_similarity_histogram(d: S.Dialect,
                              query_stride: int = 50) -> str:
    """Embedding-space diversity profile: the distribution of each
    sampled query's TOP-1 neighbor cosine, bucketed at 0.1 — the
    curve the SemDeDup analysis plots to pick its dedup threshold
    (mass near 1.0 = embedding-level duplicate density; mass near 0 =
    a diverse corpus).  Reuses the exact brute-force machinery of
    q_cosine_topk on the same stride-sampled queries, so the audit
    measures the corpus the registered operators see.

    Determinism: cosines ROUND(…, 6) as everywhere; the bucket is a
    FLOOR of the rounded value (rule-free), top-1 ties break by
    cand_id.  Scale shape: the exact leg runs on the sampled query
    stride only (the q_ann_recall doctrine — an audit probe, not a
    production path; the LSH/IVF candidates serve the scaled form)."""
    return f"""
        WITH qv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings WHERE vec_id % {query_stride} = 0
        ),
        cv AS (
            SELECT vec_id, {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        {_norm_cte(d)},
        qvn AS (
            SELECT vec_id, emb, SQRT({d.arr_dot('emb', 'emb')}) AS nrm
            FROM qv
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   ROUND({d.arr_dot('q.emb', 'c.emb')}
                         / (q.nrm * c.nrm), 6) AS cosine
            FROM qvn q JOIN cvn c ON c.vec_id <> q.vec_id
        ),
        top1 AS (
            SELECT query_id, cosine FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, cand_id) AS rk
                FROM scored
            ) r WHERE rk = 1
        )
        SELECT CAST(FLOOR(cosine * 10) AS BIGINT) AS bucket_d1,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               ROUND(MIN(cosine), 6) AS min_cos,
               ROUND(MAX(cosine), 6) AS max_cos
        FROM top1
        GROUP BY 1
    """
