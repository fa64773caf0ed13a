"""Corpus sampling + vocabulary templates, dialect-rendered.

Training-data pipelines subsample and inventory their corpus before
anything else; these are the standard shapes, written once and
rendered for both engines (Spark runs them, DuckDB verifies them):

* ``q_hash_bernoulli_sample`` — deterministic per-stratum Bernoulli
  sampling by seeded MD5.  MAP-ONLY: at 100 TB this is the sampling
  path (no shuffle, no state, retry-safe because the coin flip is a
  pure function of the row key).  Rates are encoded as 8-hex-char
  thresholds compared lexicographically — lowercase hex under binary
  collation orders identically in every engine, avoiding hex→int
  conversion differences.
* ``q_stratified_sample`` — exact per-stratum quotas (proportional
  with a floor) via a seeded-hash ROW_NUMBER per stratum.  One
  shuffle on the stratum key; use the Bernoulli form instead when a
  stratum is huge and exact quotas aren't required (window-rank over
  a hot stratum funnels it through one partition).
* ``q_vocab_topk`` — term/document frequency vocabulary, top-k by
  term frequency.  Partial (map-side) aggregation handles the heavy
  token stream; the final rank only sees the aggregated vocabulary.
  At 100 TB the global top-k over a billion-term vocabulary would use
  orderBy+limit (TakeOrdered, no single-partition window) or a
  count-min sketch; the windowed form here keeps the oracle exact.
"""

from __future__ import annotations

from . import sql_shared as S

# lang → keep-probability as an 8-hex-char md5-prefix threshold
# (value = floor(rate * 16^8) in hex; 2^32 granularity)
SAMPLE_RATES_HEX = {
    "en": "33333333",   # 0.20
    "de": "80000000",   # 0.50
}
DEFAULT_RATE_HEX = "1999999a"  # 0.10


def _rate_case(lang_col: str = "lang") -> str:
    whens = " ".join(f"WHEN '{k}' THEN '{v}'"
                     for k, v in SAMPLE_RATES_HEX.items())
    return f"(CASE {lang_col} {whens} ELSE '{DEFAULT_RATE_HEX}' END)"


def q_hash_bernoulli_sample(d: S.Dialect, seed: str = "bern1") -> str:
    """Map-only deterministic sample: keep a row iff the first 8 hex
    chars of md5(seed # doc_id) fall below the stratum's threshold."""
    u = f"SUBSTR(MD5(CONCAT('{seed}#', CAST(doc_id AS STRING))), 1, 8)"
    return f"""
        SELECT doc_id, lang, {u} AS u_hex
        FROM documents
        WHERE {u} < {_rate_case()}
    """


def q_stratified_sample(d: S.Dialect, rate: float = 0.2, floor: int = 10,
                        seed: str = "strat1") -> str:
    """Exact proportional quota per language stratum (with a minimum),
    rows chosen by seeded-hash rank so the sample is deterministic."""
    h = f"MD5(CONCAT('{seed}#', CAST(doc_id AS STRING)))"
    return f"""
        WITH ranked AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY {h}, doc_id) AS sample_rank,
                   COUNT(*) OVER (PARTITION BY lang) AS stratum_size
            FROM documents
        )
        SELECT doc_id, lang, sample_rank, stratum_size
        FROM ranked
        WHERE sample_rank <= GREATEST({floor},
              CAST(CEIL({rate} * stratum_size) AS BIGINT))
    """


def q_stratified_sample_scale(d: S.Dialect, rate: float = 0.2,
                              floor: int = 10,
                              seed: str = "strat1") -> str:
    """Scale derivation of :func:`q_stratified_sample` — identical
    output, but NO window over a whole stratum: at 100 TB a language
    stratum is most of the corpus, so `PARTITION BY lang` windows (the
    oracle's form) put terabytes through single window partitions.

    Same bucket trick as :func:`q_seeded_shuffle`, per stratum: the
    seeded-md5 key's hex prefix gives 4096 order-aligned range
    buckets; ranks come from a ROW_NUMBER partitioned by
    (lang, bucket) — partition size ~ stratum/4096 — plus per-bucket
    offsets computed on the tiny (lang, bucket, count) table.  Quota
    math (CEIL(rate·stratum) with a floor) rides on the same count
    table.  The cross-engine hash match against the windowed oracle
    proves rank equality row for row."""
    h = f"MD5(CONCAT('{seed}#', CAST(doc_id AS STRING)))"
    return f"""
        WITH keyed AS (
            SELECT doc_id, lang, {h} AS h,
                   CAST(CONV(SUBSTRING({h}, 1, 3), 16, 10) AS INT)
                       AS bucket
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, lang, bucket,
                   ROW_NUMBER() OVER (PARTITION BY lang, bucket
                                      ORDER BY h, doc_id) AS r
            FROM keyed
        ),
        off AS (
            SELECT lang, bucket,
                   COALESCE(SUM(COUNT(*)) OVER (PARTITION BY lang
                       ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS off,
                   SUM(COUNT(*)) OVER (PARTITION BY lang)
                       AS stratum_size
            FROM keyed GROUP BY lang, bucket
        )
        SELECT k.doc_id, k.lang,
               CAST(o.off + k.r AS BIGINT) AS sample_rank,
               CAST(o.stratum_size AS BIGINT) AS stratum_size
        FROM ranked k
        JOIN off o ON k.lang = o.lang AND k.bucket = o.bucket
        WHERE o.off + k.r <= GREATEST({floor},
              CAST(CEIL({rate} * o.stratum_size) AS BIGINT))
    """


def q_vocab_topk(d: S.Dialect, k: int = 100) -> str:
    """Vocabulary inventory: term frequency + document frequency per
    token, top-k by tf (token tie-break for a stable cross-engine
    order)."""
    return f"""
        WITH toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, {d.explode_tokens('text')} AS tok
                FROM documents
            ) t WHERE tok <> ''
        ),
        stats AS (
            SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
            FROM toks GROUP BY tok
        ),
        ranked AS (
            SELECT tok, tf, df,
                   ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS rank
            FROM stats
        )
        SELECT tok, tf, df, rank FROM ranked WHERE rank <= {k}
    """


def q_vocab_topk_take(d: S.Dialect, k: int = 100) -> str:
    """The SCALE derivation of :func:`q_vocab_topk`: a global ORDER BY
    + LIMIT, which Spark plans as TakeOrderedAndProject (per-partition
    top-k heaps + a k-row driver merge) instead of funneling the whole
    vocabulary through one ROW_NUMBER partition; rank is recomputed by
    a window over the ALREADY-REDUCED k rows.  Registered cross-paired
    against the windowed oracle form — the hash match proves the two
    derivations equal."""
    return f"""
        WITH toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, {d.explode_tokens('text')} AS tok
                FROM documents
            ) t WHERE tok <> ''
        ),
        stats AS (
            SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
            FROM toks GROUP BY tok
        ),
        top AS (
            SELECT tok, tf, df FROM stats
            ORDER BY tf DESC, tok LIMIT {k}
        )
        SELECT tok, tf, df,
               ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS rank
        FROM top
    """


OOV_VOCAB_N = 16


def q_oov_rate(d: S.Dialect, n: int = OOV_VOCAB_N) -> str:
    """Per-source out-of-vocabulary profile against a top-``n``
    global frequency vocabulary (tf-ranked, token tie-break): token
    and type counts, OOV counts, and the OOV token share in exact
    micro-units — the coverage number a tokenizer/vocab decision is
    made on (a source whose OOV share spikes is mis-tokenized or
    off-distribution).

    Scale shape: one tokenize pass feeds BOTH the vocab derivation
    and the per-source rollup; the vocab is a global ORDER BY +
    LIMIT (Spark: TakeOrderedAndProject — per-partition heaps, an
    ``n``-row driver merge, no full-vocab window) and the membership
    probe is a LEFT JOIN against those ``n`` rows, which AQE plans
    broadcast — so the only fact-grain shuffles are the tok tf
    aggregation and the final source rollup.  The rate is
    trunc-toward-zero integer micro-units; SUMs are cast to BIGINT
    (DuckDB SUM(int) is HUGEINT, which the driver hash treats as a
    different type)."""
    rate = d.trunc_num("SUM(oov) * 1000000.0 / COUNT(*)")
    return f"""
        WITH toks AS (
            SELECT source, tok FROM (
                SELECT source, {d.explode_tokens('text')} AS tok
                FROM documents
            ) t WHERE tok <> ''
        ),
        stats AS (
            SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok
        ),
        vocab AS (
            SELECT tok FROM stats ORDER BY tf DESC, tok LIMIT {n}
        ),
        flagged AS (
            SELECT t.source, t.tok,
                   CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
            FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
        )
        SELECT source,
               COUNT(*) AS n_tok,
               CAST(SUM(oov) AS BIGINT) AS n_oov_tok,
               COUNT(DISTINCT tok) AS n_types,
               COUNT(DISTINCT CASE WHEN oov = 1 THEN tok END)
                   AS n_oov_types,
               CAST({rate} AS BIGINT) AS oov_rate_e6
        FROM flagged
        GROUP BY source
    """


def q_tfidf_topk(d: S.Dialect, per_doc: int = 3) -> str:
    """Per-document top TF-IDF terms — the classic relevance score a
    training-data pipeline uses for keyword extraction and topic
    tagging: (doc_id, tok, tf, df, tfidf, term_rank).

    Scale shape: the only heavy aggregation is the (doc, term) tf
    groupBy, which partial-aggregates the raw token stream; df is
    derived FROM the tf table (never a second pass over tokens), the
    corpus size N is a broadcast scalar, and the top-k window
    partitions by doc_id so no single partition sees more than one
    document's terms.  Ranking uses the ROUNDed score plus the token
    as tie-break, keeping the cross-engine order deterministic.
    """
    return f"""
        WITH toks AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, {d.explode_tokens('text')} AS tok
                FROM documents
            ) t WHERE tok <> ''
        ),
        tf AS (
            SELECT doc_id, tok, COUNT(*) AS tf
            FROM toks GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.tok, tf.tf, df.df,
                   ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                       AS tfidf
            FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, tok, tf, df, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, tok) AS term_rank
            FROM scored
        )
        SELECT doc_id, tok, tf, df, tfidf, term_rank
        FROM ranked WHERE term_rank <= {per_doc}
    """


TEMP_TARGET = 150   # total docs the temperature-balanced mix keeps


def q_seeded_shuffle(d: S.Dialect, seed: str = "shuf1",
                     doc_table: str = "documents") -> str:
    """Deterministic global training-order shuffle: every document gets
    a contiguous position 0..n-1 in seeded-md5 order (the standard
    corpus-shuffle step before epoch sharding).

    The Spark derivation NEVER runs a single-partition window over the
    corpus: the md5 key's first 3 hex chars form 4096 value-
    deterministic range buckets that are order-aligned with the full
    key (equal-length hex strings compare lexicographically =
    numerically), so position = per-bucket ROW_NUMBER (one fact
    shuffle, partitioned window) + the bucket's global offset (a
    ≤4096-row cumsum, broadcast-joined back).  The oracle keeps the
    textbook global ROW_NUMBER; the hash match proves the two-phase
    numbering contiguous and collision-free."""
    h = f"MD5(CONCAT('{seed}#', CAST(doc_id AS STRING)))"
    return f"""
        WITH keyed AS (
            SELECT doc_id, {h} AS h,
                   CAST(CONV(SUBSTRING({h}, 1, 3), 16, 10) AS INT)
                       AS bucket
            FROM {doc_table}
        ),
        ranked AS (
            SELECT doc_id, h, bucket,
                   ROW_NUMBER() OVER (PARTITION BY bucket
                                      ORDER BY h, doc_id) AS r
            FROM keyed
        ),
        offsets AS (
            SELECT bucket,
                   SUM(COUNT(*)) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS off
            FROM keyed GROUP BY bucket
        )
        SELECT r.doc_id,
               CAST(COALESCE(o.off, 0) + r.r - 1 AS BIGINT) AS position
        FROM ranked r JOIN offsets o ON r.bucket = o.bucket
    """


def q_seeded_shuffle_oracle(d: S.Dialect, seed: str = "shuf1") -> str:
    """Cross-derivation reference for :func:`q_seeded_shuffle`: the
    global single-partition ROW_NUMBER that the Spark side must never
    run at scale."""
    h = f"MD5(CONCAT('{seed}#', CAST(doc_id AS STRING)))"
    return f"""
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY {h}, doc_id) - 1 AS position
        FROM documents
    """


MIX_BUDGET = 35_500        # token budget of the default mixture solve
# (at sf0.01: ~27.2k corpus tokens, so the 1.4-epoch cap binds for the
# smallest sources and the rest split the remainder -- both solver
# branches are driver-witnessed)
MIX_EPOCH_CAP_E6 = 1_400_000  # max epochs per source (micro-units)


def q_mixture_weights(d: S.Dialect, budget: int = MIX_BUDGET,
                      epoch_cap_e6: int = MIX_EPOCH_CAP_E6,
                      doc_table: str = "documents") -> str:
    """Per-source sampling rates + epoch counts that hit a
    TEMPERATURE-target token mixture under a budget with an epoch
    cap — the number every pretraining run computes before
    ``prepare_shards``: the pipeline could already MEASURE a mixture
    (source KL, DSIR, temperature sampling); this SOLVES for one.

    Semantics (alpha = 0.5 temperature, the multilingual-mixing
    standard): target share of source s is sqrt(n_s)/SUM sqrt, i.e.
    ``budget * w_s / W`` tokens — but no source may repeat beyond
    ``epoch_cap_e6`` epochs (cap_s = n_s * cap tokens).  That is the
    classic capped water-filling problem, CLOSED FORM in one pass:
    sort sources by cap tightness (cap_s / w_s ascending); the capped
    set is a PREFIX of that order, and source k caps iff
    ``cap_k * W_(>=k) < (budget - C_(<k)) * w_k`` — evaluated as
    exact INTEGER cross-multiplications, never a float division, so
    both engines agree bit-for-bit.  Uncapped sources split the
    post-cap budget proportionally (floored integer division; the
    <= |sources| leftover tokens stay unallocated, deterministic).

    Output per source: token count, weight, capped flag, allotted
    tokens, epochs_e6 (= the sampling RATE in micro-units: 1e6 = one
    full epoch, 600000 = subsample 60%, 2300000 = 2 epochs + 30%),
    share_e6 of the budget.

    Exactness domain (documented parity bound): weights are
    ``FLOOR(SQRT(n) * 1e6)`` — correctly-rounded IEEE SQRT and an
    exactly-representable 1e6 make the double identical cross-engine
    and FLOOR is tie-free; the integer cross-products bound the
    domain to ``budget * max(w_e6) < 2^63`` (~1e9-token sources at a
    1e12 budget).  Beyond that, re-rung the weight quantization to
    ``FLOOR(SQRT(n))`` — same plan, coarser ties.

    Scale shape: ONE corpus scan (the per-source token aggregate);
    everything after operates on the |sources|-row table — the
    unpartitioned windows run over an aggregate subtree, never over
    fact rows (the plan contract every sampler here follows)."""
    w_expr = "CAST(FLOOR(SQRT(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT)"
    return f"""
        WITH {_mixture_src_cte(d, doc_table)},
        w AS (
            SELECT source, n_tok,
                   {w_expr} AS w_e6,
                   CAST({_mixture_cap_expr(d, epoch_cap_e6)} AS BIGINT)
                       AS cap_tok
            FROM src WHERE n_tok > 0
        ),
        {_waterfill_tail(d, budget)}
    """


def _mixture_src_cte(d: S.Dialect, doc_table: str) -> str:
    return f"""src AS (
            SELECT source,
                   CAST(SUM({d.arr_len(d.token_array('text'))})
                        AS BIGINT) AS n_tok
            FROM {doc_table} GROUP BY source
        )"""


def _mixture_cap_expr(d: S.Dialect, epoch_cap_e6: int) -> str:
    return d.intdiv(f"CAST({epoch_cap_e6} AS BIGINT) * n_tok",
                    "1000000")


def _waterfill_tail(d: S.Dialect, budget: int,
                    extra_cols: str = "",
                    extra_from: str = "") -> str:
    """The weight-agnostic closed-form water-fill over a ``w`` CTE of
    (source, n_tok, w_e6, cap_tok) rows — shared by the temperature,
    explicit-target, and quality-weighted mixture solvers (see
    :func:`q_mixture_weights` for the derivation and the exactness
    domain).  ``extra_cols``/``extra_from`` append to the final
    SELECT (the quality solver rides its gate cutpoint along)."""
    div = d.intdiv
    # GREATEST guard: when every source caps, w_free = 0 and the
    # uncapped branch is dead but still EVALUATED (vectorized CASE) —
    # the LEAST picks cap_tok there, so the guard never changes a
    # live value
    uncapped = div(f"({budget} - cap_spent) * w_e6",
                   "GREATEST(w_free, 1)")
    alloc = (f"(CASE WHEN capped = 1 THEN cap_tok "
             f"ELSE LEAST(cap_tok, {uncapped}) END)")
    return f"""ord AS (
            SELECT source, n_tok, w_e6, cap_tok,
                   ROW_NUMBER() OVER (
                       ORDER BY {div('cap_tok * 1000000',
                                     'GREATEST(w_e6, 1)')},
                                source) AS k
            FROM w
        ),
        pre AS (
            SELECT *,
                   COALESCE(SUM(cap_tok) OVER (ORDER BY k
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cap_before,
                   SUM(w_e6) OVER (ORDER BY k
                       ROWS BETWEEN CURRENT ROW
                       AND UNBOUNDED FOLLOWING) AS w_from
            FROM ord
        ),
        flagged AS (
            SELECT *,
                   MIN(CASE WHEN cap_tok * w_from <
                            ({budget} - cap_before) * w_e6
                            THEN 1 ELSE 0 END)
                       OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)
                       AS capped
            FROM pre
        ),
        sized AS (
            SELECT *,
                   COALESCE(SUM(CASE WHEN capped = 1 THEN cap_tok END)
                            OVER (), 0) AS cap_spent,
                   COALESCE(SUM(CASE WHEN capped = 0 THEN w_e6 END)
                            OVER (), 0) AS w_free
            FROM flagged
        )
        SELECT source, n_tok, w_e6,
               CAST(capped AS INT) AS capped,
               CAST({alloc} AS BIGINT) AS alloc_tok,
               CAST({div(f"{alloc} * 1000000", "n_tok")} AS BIGINT)
                   AS epochs_e6,
               CAST({div(f"{alloc} * 1000000", str(budget))} AS BIGINT)
                   AS share_e6{extra_cols}
        FROM sized{extra_from}
    """


MIX_TARGETS: tuple[tuple[str, int], ...] = tuple(
    (f"src{i}", (i % 5 + 1) * 100_000) for i in range(20))


def q_mixture_weights_target(d: S.Dialect,
                             targets: tuple[tuple[str, int], ...] =
                             MIX_TARGETS,
                             budget: int = MIX_BUDGET,
                             epoch_cap_e6: int = MIX_EPOCH_CAP_E6,
                             doc_table: str = "documents") -> str:
    """EXPLICIT-target sibling of :func:`q_mixture_weights`: the
    caller hands the desired per-source mixture (relative weights,
    e.g. the shares a data-ablation study prescribes) instead of
    deriving it from a temperature rule; the same closed-form capped
    water-filling then computes what is actually ACHIEVABLE under
    the epoch cap and how the shortfall redistributes.

    ``targets`` are (source, relative-weight) pairs — any positive
    integer scale (they normalize in the proportional split).
    Sources present in the corpus but absent from the target table
    get weight 0 rows (alloc 0 — explicitly priced out rather than
    silently dropped); targeted sources missing from the corpus
    contribute nothing (no tokens to sample).  The default fixture
    targets are deliberately uneven (weights 1x-5x cycling over the
    20 sources) so small sources with big targets cap and the
    remainder redistributes — both branches driver-witnessed.

    Same exactness domain and scale shape as the temperature form
    (one corpus scan; |sources|-row windows)."""
    vals = ", ".join(f"({d.str_lit(src)}, {int(w)})"
                     for src, w in targets)
    return f"""
        WITH {_mixture_src_cte(d, doc_table)},
        tgt AS (
            SELECT * FROM (VALUES {vals}) AS t(source, tw)
        ),
        w AS (
            SELECT s.source, s.n_tok,
                   CAST(COALESCE(t.tw, 0) AS BIGINT) AS w_e6,
                   CAST({_mixture_cap_expr(d, epoch_cap_e6)} AS BIGINT)
                       AS cap_tok
            FROM src s LEFT JOIN tgt t ON t.source = s.source
            WHERE s.n_tok > 0
        ),
        {_waterfill_tail(d, budget)}
    """


MIX_DRIFT_TOL_E6 = 20_000   # flag sources >2pp off their target share


def q_mixture_drift(d: S.Dialect,
                    targets: tuple[tuple[str, int], ...] = MIX_TARGETS,
                    tol_e6: int = MIX_DRIFT_TOL_E6,
                    doc_table: str = "documents") -> str:
    """Mixture AUDIT: per source, the achieved token share of the
    corpus vs a prescribed target mixture, with an exact-integer
    drift and an out-of-tolerance flag — the check a pipeline runs
    AFTER ``apply_mixture``/``prepare_shards`` (and continuously on a
    live corpus) to confirm the mixture actually landed.

    Shares and targets are e6 micro-units via floored integer
    division (target weights normalize against their own sum, so any
    positive scale works); drift = share - target.  FULL OUTER join:
    a targeted source missing from the corpus shows share 0 (pure
    shortfall), an untargeted source present in the corpus shows
    target 0 (pure excess) — both flag when past ``tol_e6``.

    Scale shape: one corpus scan (the per-source token aggregate),
    then |sources|-row arithmetic; the only windows are full-frame
    sums over that aggregate."""
    div = d.intdiv
    vals = ", ".join(f"({d.str_lit(src)}, {int(w)})"
                     for src, w in targets)
    share = div("COALESCE(n_tok, 0) * 1000000", "GREATEST(tot, 1)")
    tgt = div("COALESCE(tw, 0) * 1000000", "GREATEST(tw_tot, 1)")
    return f"""
        WITH {_mixture_src_cte(d, doc_table)},
        tgt AS (
            SELECT * FROM (VALUES {vals}) AS t(source, tw)
        ),
        joined AS (
            SELECT COALESCE(s.source, t.source) AS source,
                   s.n_tok, CAST(t.tw AS BIGINT) AS tw
            FROM src s FULL OUTER JOIN tgt t ON t.source = s.source
        ),
        summed AS (
            SELECT *,
                   SUM(COALESCE(n_tok, 0)) OVER () AS tot,
                   SUM(COALESCE(tw, 0)) OVER () AS tw_tot
            FROM joined
        )
        SELECT source,
               CAST(COALESCE(n_tok, 0) AS BIGINT) AS n_tok,
               CAST({share} AS BIGINT) AS share_e6,
               CAST({tgt} AS BIGINT) AS target_e6,
               CAST({share} - ({tgt}) AS BIGINT) AS drift_e6,
               CAST(CASE WHEN ABS({share} - ({tgt})) > {tol_e6}
                    THEN 1 ELSE 0 END AS INT) AS out_of_tol
        FROM summed
    """


def q_temperature_sample(d: S.Dialect, n_target: int = TEMP_TARGET,
                         seed: str = "temp1") -> str:
    """Temperature-balanced (α = 0.5) language resampling — the
    multilingual-corpus mixing rule (sample language l with
    probability ∝ p_l^α) that upweights low-resource languages.

    α is pinned to 0.5 so the weight is SQRT (correctly-rounded IEEE,
    bit-identical cross-engine, unlike libm POWER); the normalizing
    sum folds an ORDERED per-language array left-associatively
    (``arr_fsum``) so its double value is deterministic under any
    partitioning; per-language quotas are then FLOOR'd integers and
    rows are picked by seeded-hash rank.  Scale shape: the language
    table is tiny (one groupBy), quotas broadcast back, and the only
    per-row work is the hash rank window inside each language
    stratum — same profile as ``q_stratified_sample``.
    """
    u = f"MD5(CONCAT('{seed}#', CAST(doc_id AS STRING)))"
    return f"""
        WITH lc AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l
            FROM documents WHERE lang IS NOT NULL GROUP BY lang
        ),
        w AS (
            SELECT lang, n_l, SQRT(CAST(n_l AS DOUBLE)) AS w_l FROM lc
        ),
        tot AS (
            SELECT {d.arr_fsum(d.ordered_list('w_l', 'lang'))} AS s
            FROM w
        ),
        quota AS (
            SELECT w.lang, w.n_l,
                   CAST(FLOOR({n_target} * w.w_l / t.s) AS BIGINT) AS k_l
            FROM w CROSS JOIN tot t
        ),
        ranked AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY {u}, doc_id) AS rk
            FROM documents WHERE lang IS NOT NULL
        )
        SELECT r.doc_id, r.lang, q.n_l, q.k_l
        FROM ranked r
        JOIN quota q ON q.lang = r.lang
        WHERE r.rk <= LEAST(q.k_l, q.n_l)
    """


def q_bigram_lm_score(d: S.Dialect) -> str:
    """Corpus-self-trained bigram LM score per document — the n-gram
    analog of the perplexity quality filter (KenLM-style) in training
    pipelines: avg log P(w2|w1) under add-one smoothing, trained on
    the corpus itself.  Low scores mark improbable token streams
    (boilerplate, noise, wrong-language fragments).

    Scale shape: the bigram/unigram count tables are vocabulary-sized
    heavy-hitter aggregations (broadcastable); scoring joins each
    doc's bigram stream against them and one doc-keyed SUM ends the
    pipeline.  LN operates on count RATIOS (exact integers), and the
    per-doc sum is ~doc-length terms, so ROUND(.,4) absorbs libm/
    accumulation-order ulp drift — the driver hash stays stable.

    Fact-scan discipline: the corpus is tokenized exactly once (the
    ``docs`` CTE); ``w1_counts`` re-aggregates the vocabulary-sized
    ``bg_counts`` (SUM of per-bigram counts grouped by w1 equals the
    former COUNT over the exploded stream), and the vocabulary is a
    COUNT(DISTINCT) over the same token arrays.  Spark inlines CTEs,
    so ``docs``/``doc_bg`` still evaluate per consumer in the pure-SQL
    form — the registry's Spark entry is the DataFrame pipeline
    ``bigram_lm_score_df`` which persists them (oracle_queries.py)."""
    return f"""
        WITH docs AS (
            SELECT doc_id, toks, {d.bigram_list('toks')} AS bgs,
                   {d.arr_len('toks')} AS n_tok
            FROM (
                SELECT doc_id, {d.token_array('text')} AS toks
                FROM documents
            ) t0
        ),
        doc_bg AS (
            SELECT doc_id, {d.explode_arr('bgs')} AS bg FROM docs
            WHERE {d.arr_len('bgs')} >= 1
        ),
        bg_counts AS (
            SELECT bg, COUNT(*) AS c_bg FROM doc_bg GROUP BY bg
        ),
        vocab AS (
            SELECT COUNT(DISTINCT tok) AS v FROM (
                SELECT {d.explode_arr('toks')} AS tok FROM docs
            ) t
        ),
        -- add-one denominator: count of bigrams STARTING with w1
        -- (so sum over w2 of P(w2|w1) = 1), not the corpus unigram
        -- count, which over-counts document-final occurrences of w1;
        -- derived from the vocabulary-sized bg_counts, not a second
        -- pass over the exploded fact stream
        w1_counts AS (
            SELECT SUBSTR(bg, 1, POSITION(' ' IN bg) - 1) AS tok,
                   SUM(c_bg) AS c_w1dot
            FROM bg_counts GROUP BY 1
        ),
        scored AS (
            SELECT db.doc_id,
                   SUM(LN(CAST(bc.c_bg + 1 AS DOUBLE)
                          / (wc.c_w1dot + vb.v))) AS logp,
                   COUNT(*) AS n_bg
            FROM doc_bg db
            JOIN bg_counts bc ON bc.bg = db.bg
            JOIN w1_counts wc
              ON wc.tok = SUBSTR(db.bg, 1,
                                 POSITION(' ' IN db.bg) - 1)
            CROSS JOIN vocab vb
            GROUP BY db.doc_id
        )
        SELECT dd.doc_id,
               CAST(dd.n_tok AS BIGINT) AS n_tok,
               ROUND(s.logp / s.n_bg, 4) AS avg_logp
        FROM docs dd
        LEFT JOIN scored s ON s.doc_id = dd.doc_id
    """


# ---------------------------------------------------------------------------
# Leakage-safe split + quality-budget selection (round 5)
# ---------------------------------------------------------------------------

def q_leakage_safe_split(d: S.Dialect, seed: str = "split1",
                         train_pct: int = 80, valid_pct: int = 10) -> str:
    """Train/valid/test assignment that near-duplicates cannot
    straddle: documents collapse to their normalized-fingerprint
    family (the ``fingerprint_dedup`` normalization), the family
    anchor is MIN(doc_id), and the split comes from a seeded MD5
    bucket of the ANCHOR — so every member of a duplicate family
    lands in the same split (the standard eval-contamination guard).

    Map-only after one fingerprint groupBy; the anchor table is
    family-sized and broadcastable.  The operator-level composition
    with MinHash/CC *near*-dup clusters (not just exact-normalized
    families) is ``operators.dedup.grouped_split`` — same hash rule
    applied to any cluster column."""
    norm = d.regexp_replace_all(
        d.regexp_replace_all("LOWER(text)", "[^a-z0-9 ]", ""), " +", " ")
    h = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('{seed}#', CAST(anchor AS STRING))), 1, 12)")
    return f"""
        WITH fams AS (
            SELECT doc_id, MD5(TRIM({norm})) AS fp FROM documents
        ),
        anchors AS (
            SELECT fp, MIN(doc_id) AS anchor FROM fams GROUP BY fp
        ),
        bucketed AS (
            SELECT f.doc_id, a.anchor, ({h} % 100) AS h
            FROM fams f JOIN anchors a ON a.fp = f.fp
        )
        SELECT doc_id, anchor,
               CASE WHEN h < {train_pct} THEN 'train'
                    WHEN h < {train_pct + valid_pct} THEN 'valid'
                    ELSE 'test' END AS split
        FROM bucketed
    """


QUALITY_BUDGET_TOKENS = 800


def _quality_sized(d: S.Dialect) -> str:
    """Shared base: per-doc ROUNDed quality + token count + the
    score-band bucket used by the scale derivation."""
    q = S.quality_score("text", d)
    return f"""sized AS (
            SELECT doc_id, source, {q} AS q,
                   CAST({d.arr_len(d.token_array('text'))} AS BIGINT)
                       AS n_tokens,
                   CAST(FLOOR({q} * -1000) AS BIGINT) AS band
            FROM documents
        )"""


_QB_TAIL = """
        SELECT doc_id, source,
               CAST(ROUND(q * 1e6) AS BIGINT) AS q_micros,
               n_tokens, cum_tokens,
               CASE WHEN cum_tokens <= {budget} THEN 1 ELSE 0 END AS kept
        FROM packed
"""


def q_quality_budget_select(d: S.Dialect,
                            budget: int = QUALITY_BUDGET_TOKENS) -> str:
    """Budgeted data selection (textbook derivation — the oracle
    side): per source, take documents best-quality-first until the
    token budget is exhausted; ``kept`` marks the selected set.  One
    window per source."""
    return f"""
        WITH {_quality_sized(d)},
        packed AS (
            SELECT doc_id, source, q, n_tokens,
                   CAST(SUM(n_tokens) OVER (PARTITION BY source
                        ORDER BY q DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM sized
        )
        {_QB_TAIL.format(budget=budget)}
    """


def q_quality_budget_select_scale(d: S.Dialect,
                                  budget: int = QUALITY_BUDGET_TOKENS
                                  ) -> str:
    """Scale derivation of :func:`q_quality_budget_select` — identical
    output without a whole-source window (one crawl dominating the
    corpus would serialize through a single window partition).  The
    quality sort key decomposes into 0.001-wide score BANDS
    (``FLOOR(q * -1000)`` — monotone with ``q DESC``, so band order
    aligns with the sort): a running sum within (source, band) plus
    per-band offsets from the tiny (source, band, token-sum) table —
    the ordered-prefix-sum trick of ``q_token_shard_packing_scale``
    keyed by score instead of id."""
    return f"""
        WITH {_quality_sized(d)},
        within AS (
            SELECT doc_id, source, q, n_tokens, band,
                   SUM(n_tokens) OVER (PARTITION BY source, band
                       ORDER BY q DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_in_b
            FROM sized
        ),
        off AS (
            SELECT source, band,
                   COALESCE(SUM(SUM(n_tokens)) OVER (PARTITION BY source
                       ORDER BY band
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS off
            FROM sized GROUP BY source, band
        ),
        packed AS (
            SELECT w.doc_id, w.source, w.q, w.n_tokens,
                   CAST(o.off + w.cum_in_b AS BIGINT) AS cum_tokens
            FROM within w
            JOIN off o ON w.source = o.source AND w.band = o.band
        )
        {_QB_TAIL.format(budget=budget)}
    """


# ---------------------------------------------------------------------------
# DSIR importance weights + BM25 retrieval (round 5, second batch)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"


def _dsir_common(d: S.Dialect) -> str:
    """Shared CTE prefix for both DSIR derivations: tokenized docs,
    the hashed-unigram feature stream, and the bucket log-ratio table.

    Hashed n-gram importance resampling (DSIR, Xie et al. 2023):
    features are word unigrams hashed into ``DSIR_BUCKETS`` buckets;
    the per-bucket importance log-ratio compares add-one-smoothed
    feature probabilities of the TARGET corpus (``lang = 'en'``)
    against the BACKGROUND (everything else).

    Cross-engine determinism: the ratio itself is built from exact
    integer counts with only IEEE ``*``/``/`` double ops (bit-exact
    in both engines); ``LN`` (libm, ulp-risky) touches ONLY the
    bucket table — ``DSIR_BUCKETS`` values, each rounded once to
    integer ten-thousandths — and every per-document number after
    that is pure BIGINT arithmetic, so accumulation order can never
    flip a hash."""
    b = DSIR_BUCKETS
    tgt = DSIR_TARGET_LANG
    # 8 hex chars < 2**32, so hex_to_bigint never overflows; both
    # engines' % on non-negative operands agree
    bucket = f"({d.hex_to_bigint('SUBSTR(MD5(tok), 1, 8)')} % {b})"
    return f"""docs AS (
            SELECT doc_id, lang, {d.token_array('text')} AS toks
            FROM documents
        ),
        toks AS (
            SELECT doc_id, lang, {bucket} AS bucket
            FROM (
                SELECT doc_id, lang, {d.explode_arr('toks')} AS tok
                FROM docs
            ) t
        ),
        counts AS (
            SELECT bucket,
                   SUM(CASE WHEN lang = '{tgt}' THEN 1 ELSE 0 END) AS c_t,
                   SUM(CASE WHEN lang = '{tgt}' THEN 0 ELSE 1 END) AS c_b
            FROM toks GROUP BY bucket
        ),
        tot AS (
            SELECT SUM(c_t) AS t_tot, SUM(c_b) AS g_tot FROM counts
        ),
        ratio AS (
            SELECT bucket,
                   CAST(ROUND(LN(((CAST(c_t AS DOUBLE) + 1.0)
                                  * (g_tot + {b}))
                                 / ((CAST(c_b AS DOUBLE) + 1.0)
                                    * (t_tot + {b})))
                              * 1e4) AS BIGINT) AS lr_e4
            FROM counts CROSS JOIN tot
        )"""


def q_dsir_weights(d: S.Dialect) -> str:
    """DSIR importance weight per document — the scale derivation.

    Per-document hashed-unigram counts aggregate FIRST (map-side
    combine over (doc_id, bucket) — the fact shuffle carries at most
    ``docs x DSIR_BUCKETS`` rows, usually far fewer), then one
    broadcast join against the {DSIR_BUCKETS}-row log-ratio table and
    an integer dot product per document.  At 100 TB: one fact pass
    builds the bucket table (vocabulary-free — the hash space is
    fixed), a second pass scores; both joins broadcast.  Documents
    with no tokens keep weight 0 via the LEFT JOIN.

    Spark inlines CTEs, so this rendering would tokenize once per
    consuming branch — the registry's Spark entry is the persisted
    single-tokenize DataFrame pipeline ``plans/corpus.py::
    dsir_weight`` (same contract, hash-identical); this rendering is
    the shared semantic spec and the plan-shape test subject."""
    return f"""
        WITH {_dsir_common(d)},
        dbc AS (
            SELECT doc_id, bucket, COUNT(*) AS n
            FROM toks GROUP BY doc_id, bucket
        ),
        scored AS (
            SELECT dbc.doc_id, SUM(dbc.n * r.lr_e4) AS w_e4
            FROM dbc JOIN ratio r ON r.bucket = dbc.bucket
            GROUP BY dbc.doc_id
        )
        SELECT dd.doc_id, dd.lang,
               CAST({d.arr_len('dd.toks')} AS BIGINT) AS n_tok,
               CAST(COALESCE(s.w_e4, 0) AS BIGINT) AS dsir_weight_e4
        FROM docs dd
        LEFT JOIN scored s ON s.doc_id = dd.doc_id
    """


def q_dsir_weights_oracle(d: S.Dialect) -> str:
    """Textbook DSIR derivation (the oracle side): every token row
    joins the log-ratio table directly and the per-document sum runs
    over the raw token stream — no per-(doc, bucket) pre-aggregation.
    Hash-matching :func:`q_dsir_weights` proves the map-side-combine
    rewrite is semantics-preserving."""
    return f"""
        WITH {_dsir_common(d)},
        scored AS (
            SELECT t.doc_id, SUM(r.lr_e4) AS w_e4
            FROM toks t JOIN ratio r ON r.bucket = t.bucket
            GROUP BY t.doc_id
        )
        SELECT dd.doc_id, dd.lang,
               CAST({d.arr_len('dd.toks')} AS BIGINT) AS n_tok,
               CAST(COALESCE(s.w_e4, 0) AS BIGINT) AS dsir_weight_e4
        FROM docs dd
        LEFT JOIN scored s ON s.doc_id = dd.doc_id
    """


BM25_TERMS = ("merge", "batch", "scan")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def q_bm25_topk(d: S.Dialect, k: int = BM25_TOPK) -> str:
    """BM25 top-k retrieval (Robertson/Zaragoza) for a fixed term set
    — the retrieval scorer a RAG / dedup-by-query pipeline runs over
    the corpus.  Uses the positive idf form
    ``LN(1 + (N - df + 0.5) / (df + 0.5))``.

    Scale shape: the token explode filters to the query terms BEFORE
    any shuffle (the per-(doc, term) aggregate only ever sees matching
    tokens); ``df``/``idf`` live in a terms-sized table (broadcast);
    the final top-k is ORDER BY + LIMIT — TakeOrderedAndProject, per-
    partition heaps, no global sort.  Determinism: ``LN`` is confined
    to the per-term idf (rounded once to integer 1e-4 units); each
    (doc, term) contribution rounds the IEEE-exact double factor to
    BIGINT before the per-doc sum, so the sum is integer-exact in any
    accumulation order."""
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
        WITH docs AS (
            SELECT doc_id, {d.token_array('text')} AS toks
            FROM documents
        ),
        sized AS (
            SELECT doc_id, CAST({d.arr_len('toks')} AS BIGINT) AS dl
            FROM docs
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM sized
        ),
        tf AS (
            SELECT doc_id, tok, COUNT(*) AS tf
            FROM (
                SELECT doc_id, {d.explode_arr('toks')} AS tok FROM docs
            ) t
            WHERE tok IN ({terms})
            GROUP BY doc_id, tok
        ),
        idf AS (
            SELECT tok,
                   CAST(ROUND(LN(1 + (CAST(st.n_docs - df AS DOUBLE) + 0.5)
                                     / (CAST(df AS DOUBLE) + 0.5))
                              * 1e4) AS BIGINT) AS idf_e4
            FROM (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok) f
            CROSS JOIN stats st
        ),
        contrib AS (
            SELECT tf.doc_id,
                   CAST(ROUND(i.idf_e4 * (tf.tf * ({BM25_K1} + 1))
                              / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                                 + {BM25_B} * sz.dl / st.avgdl)))
                        AS BIGINT) AS c_e4
            FROM tf
            JOIN idf i ON i.tok = tf.tok
            JOIN sized sz ON sz.doc_id = tf.doc_id
            CROSS JOIN stats st
        )
        SELECT doc_id,
               CAST(SUM(c_e4) AS BIGINT) AS bm25_e4,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM contrib
        GROUP BY doc_id
        ORDER BY bm25_e4 DESC, doc_id
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Corpus distribution profiling: per-source KL divergence and Zipf slope
# ---------------------------------------------------------------------------

def _kl_common(d: S.Dialect) -> str:
    """Shared CTEs for the per-source unigram KL divergence: one
    tokenize+explode fact pass, then everything downstream runs over
    the vocabulary-sized ``(source, tok)`` count table.

    Cross-engine determinism follows the DSIR recipe: all
    probabilities come from exact integer counts, ``LN`` (the only
    libm call) touches each ``(source, tok)`` cell exactly once and is
    rounded once to integer micro-nats — every later step is integer
    arithmetic plus one final exact-operand division, so accumulation
    order can never flip a hash.

    Tokenize form: ``explode_tokens`` + a post-explode WHERE, not the
    array-lambda ``token_array`` — the filter() higher-order function
    is a codegen fallback in Spark (measured ~1.6x slower on the
    500 k-doc replica), while explode+predicate stays in whole-stage
    codegen."""
    return f"""toks AS (
            SELECT source, tok FROM (
                SELECT source, {d.explode_tokens('text')} AS tok
                FROM documents
            ) t WHERE tok <> ''
        ),
        sw AS (
            SELECT source, tok, COUNT(*) AS c
            FROM toks GROUP BY source, tok
        ),
        s_tot AS (
            SELECT source, SUM(c) AS n_s, COUNT(*) AS vocab_s
            FROM sw GROUP BY source
        ),
        w_tot AS (
            SELECT tok, SUM(c) AS c_w FROM sw GROUP BY tok
        ),
        g_tot AS (SELECT SUM(c) AS n_g FROM sw),
        lnr AS (
            -- CAST AS DOUBLE, not "* 1.0": Spark types a 1.0 literal
            -- as DECIMAL and the decimal division truncates the ratio
            -- before LN sees it (DuckDB's 1.0 is a double — the two
            -- engines would diverge in the 7th digit)
            SELECT sw.source, sw.tok, sw.c,
                   CAST(ROUND(LN((CAST(sw.c AS DOUBLE) * g.n_g)
                                 / (CAST(st.n_s AS DOUBLE) * w.c_w))
                              * 1e6)
                        AS BIGINT) AS ln_e6
            FROM sw
            JOIN s_tot st ON st.source = sw.source
            JOIN w_tot w ON w.tok = sw.tok
            CROSS JOIN g_tot g
        )"""


def q_source_kl_divergence(d: S.Dialect) -> str:
    """KL(source ‖ corpus) of unigram distributions, per source — the
    standard distribution-shift screen before mixing corpora into a
    training set (cf. the DSIR importance-weight derivation, which
    uses the same log-ratio machinery per document).

    Scale shape: the ONE fact pass is tokenize→explode→partial-count;
    the shuffle carries at most ``|vocab| x |sources|`` rows (map-side
    combine collapses per-document repeats).  Every CTE after ``sw``
    is vocabulary-sized, so the joins broadcast and the final per-
    source reduce is over integer cells.  At 100 TB this is one fact
    scan + vocab-sized bookkeeping; BIGINT headroom note: ``c *
    ln_e6`` stays below 2^63 while per-source token counts stay below
    ~10^11 — beyond that, drop to e4 scaling or a DECIMAL
    accumulator."""
    return f"""
        WITH {_kl_common(d)},
        terms AS (
            SELECT source, SUM(c * ln_e6) AS s_e6
            FROM lnr GROUP BY source
        )
        SELECT st.source,
               CAST(st.n_s AS BIGINT) AS n_tok,
               CAST(st.vocab_s AS BIGINT) AS vocab,
               CAST(ROUND(CAST(t.s_e6 AS DOUBLE) / st.n_s) AS BIGINT) AS kl_e6
        FROM s_tot st JOIN terms t ON t.source = st.source
    """


def q_source_kl_divergence_oracle(d: S.Dialect) -> str:
    """Textbook KL derivation (the oracle side): every token
    OCCURRENCE joins the per-(source, tok) log-ratio and the
    per-source sum runs over the raw token stream.  Hash-matching
    :func:`q_source_kl_divergence` proves the count-weighted
    (map-side-combine) rewrite is semantics-preserving."""
    return f"""
        WITH {_kl_common(d)},
        occ AS (
            SELECT t.source, l.ln_e6
            FROM toks t
            JOIN lnr l ON l.source = t.source AND l.tok = t.tok
        ),
        terms AS (
            SELECT source, SUM(ln_e6) AS s_e6 FROM occ GROUP BY source
        )
        SELECT st.source,
               CAST(st.n_s AS BIGINT) AS n_tok,
               CAST(st.vocab_s AS BIGINT) AS vocab,
               CAST(ROUND(CAST(t.s_e6 AS DOUBLE) / st.n_s) AS BIGINT) AS kl_e6
        FROM s_tot st JOIN terms t ON t.source = st.source
    """


ZIPF_MAX_RANK = 1000


def q_zipf_slope(d: S.Dialect, max_rank: int = ZIPF_MAX_RANK) -> str:
    """Zipf rank-frequency slope per language: least-squares fit of
    ``ln(freq)`` against ``ln(rank)`` over the top-{ZIPF_MAX_RANK}
    vocabulary head (natural corpora sit near slope −1; a corpus that
    doesn't is synthetic, templated, or broken — a cheap corpus-health
    check alongside [[lang_id]]/quality scoring).

    Determinism: both ``LN`` values are rounded once to integer
    milli-units per (lang, rank) point; the regression moments are
    then EXACT integer sums (order-free), and the slope is one
    double division over exact operands.  Tied frequencies may swap
    ranks between tokens, but the (rank, freq) point SET — and hence
    every moment — is invariant under any tie order.

    Scale shape: one tokenize fact pass → (lang, tok) partial counts;
    the rank window runs per-lang over vocabulary-sized data and the
    head filter bounds the regression to {ZIPF_MAX_RANK} points per
    lang, so moments never overflow BIGINT."""
    return f"""
        WITH tf AS (
            SELECT lang, tok, COUNT(*) AS freq
            FROM (SELECT lang, {d.explode_tokens('text')} AS tok
                  FROM documents) t
            WHERE tok <> ''
            GROUP BY lang, tok
        ),
        ranked AS (
            SELECT lang, freq,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY freq DESC, tok ASC) AS rnk
            FROM tf
        ),
        pts AS (
            SELECT lang,
                   CAST(ROUND(LN(rnk) * 1e3) AS BIGINT) AS x_e3,
                   CAST(ROUND(LN(freq) * 1e3) AS BIGINT) AS y_e3
            FROM ranked WHERE rnk <= {max_rank}
        ),
        agg AS (
            SELECT lang, COUNT(*) AS n,
                   SUM(x_e3) AS sx, SUM(y_e3) AS sy,
                   SUM(x_e3 * y_e3) AS sxy, SUM(x_e3 * x_e3) AS sxx
            FROM pts GROUP BY lang
        )
        SELECT lang,
               CAST(n AS BIGINT) AS vocab_ranks,
               CAST(ROUND((n * sxy - sx * sy) * 1e4
                          / (n * sxx - sx * sx)) AS BIGINT)
                   AS zipf_slope_e4
        FROM agg WHERE n >= 2
    """


AES_TOPK = 400          # weighted-sample draw size
AES_U_BITS = 52         # 13 hex chars — largest md5 prefix exact in a double


def q_weighted_sample_topk(d: S.Dialect, k: int = AES_TOPK,
                           seed: str = "aes1") -> str:
    """Weighted sampling WITHOUT replacement via the Efraimidis–
    Spirakis A-ES one-pass reduction: each row draws a deterministic
    uniform u from a seeded hash and is ranked by ``ln(u) / w`` (the
    monotone form of ``u^(1/w)``); the global top-k IS an exact
    w-weighted sample without replacement.  Weight here is document
    size (``n_chars + 1``) — the "sample proportional to length"
    draw a token-budgeted corpus selection makes; any positive weight
    column drops in.

    Determinism: u is the first 52 BITS of md5 (13 hex chars — the
    largest prefix exactly representable in an IEEE double), mapped to
    (0, 1] by an exact power-of-two division; ``LN(u)/w`` is a single
    IEEE expression over exact operands, rounded once to 1e-12 units
    (BIGINT) so the ranking key itself is integer; ties break on
    doc_id.

    Scale shape: map-only key computation + global top-k — Spark
    plans ORDER BY..LIMIT k as TakeOrderedAndProject (per-partition
    partial top-k, then a k-row merge on the driver); no full sort,
    no shuffle of the corpus.  This is THE one-pass distributed
    weighted-sampling plan: reservoir semantics with no sequential
    reservoir."""
    u52 = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('{seed}#', CAST(doc_id AS STRING))), 1, 13)")
    # (u52 + 1) / 2^52 in (0, 1]: numerator <= 2^52 is double-exact,
    # the division by a power of two only shifts the exponent
    u01 = f"(CAST({u52} + 1 AS DOUBLE) / 4503599627370496E0)"
    key = f"LN({u01}) / CAST(n_chars + 1 AS DOUBLE)"
    return f"""
        WITH keyed AS (
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(ROUND(({key}) * 1e12) AS BIGINT) AS key_e12
            FROM documents
        )
        SELECT doc_id, lang, n_chars, key_e12
        FROM keyed
        ORDER BY key_e12 DESC, doc_id
        LIMIT {k}
    """


def q_curriculum_schedule(d: S.Dialect, seed: str = "curr1") -> str:
    """Curriculum training order: every document gets a contiguous
    global position 0..n-1 ordered by quality band (best band first —
    the easy-to-hard curriculum), with a seeded shuffle WITHIN each
    band so same-difficulty documents arrive in random order each
    seed.  This is the epoch-ordering step after selection: consumers
    shard ``position`` ranges.

    The quality band reuses :func:`_quality_sized`'s 0.001-wide
    ``FLOOR(q * -1000)`` bands (monotone with quality DESC — band 
    order IS curriculum order); within a band the order key is the
    seeded md5.

    Scale shape (the same two-phase numbering as
    :func:`q_seeded_shuffle`, keyed finer): positions come from a
    ROW_NUMBER partitioned by (band, 3-hex bucket) — no partition
    sees more than ~1/4096 of a band — plus per-(band, bucket)
    offsets cumulated over the tiny count table.  The oracle
    (:func:`q_curriculum_schedule_oracle`) is the textbook global
    window; the hash match proves the two-phase numbering equals it
    row for row."""
    h = f"MD5(CONCAT('{seed}#', CAST(doc_id AS STRING)))"
    return f"""
        WITH {_quality_sized(d)},
        keyed AS (
            SELECT doc_id, band, {h} AS h,
                   CAST({d.hex_to_bigint(f'SUBSTRING({h}, 1, 3)')}
                        AS INT) AS bucket
            FROM sized
        ),
        ranked AS (
            SELECT doc_id, band, bucket, h,
                   ROW_NUMBER() OVER (PARTITION BY band, bucket
                                      ORDER BY h, doc_id) AS r
            FROM keyed
        ),
        offsets AS (
            SELECT band, bucket,
                   COALESCE(SUM(COUNT(*)) OVER (
                       ORDER BY band, bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS off
            FROM keyed GROUP BY band, bucket
        )
        SELECT r.doc_id, CAST(r.band AS BIGINT) AS band,
               CAST(o.off + r.r - 1 AS BIGINT) AS position
        FROM ranked r
        JOIN offsets o ON r.band = o.band AND r.bucket = o.bucket
    """


def q_curriculum_schedule_oracle(d: S.Dialect, seed: str = "curr1") -> str:
    """Cross-derivation reference for :func:`q_curriculum_schedule`:
    the global single-partition window the Spark side must never run
    at scale."""
    h = f"MD5(CONCAT('{seed}#', CAST(doc_id AS STRING)))"
    return f"""
        WITH {_quality_sized(d)}
        SELECT doc_id, CAST(band AS BIGINT) AS band,
               ROW_NUMBER() OVER (ORDER BY band, {h}, doc_id) - 1
                   AS position
        FROM sized
    """


def q_weighted_stratified_sample(d: S.Dialect, per_stratum: int = 50,
                                 seed: str = "aes2") -> str:
    """A-ES weighted sampling without replacement PER STRATUM: the
    top ``per_stratum`` documents of each language by the
    Efraimidis–Spirakis key ``ln(u)/w`` — exact per-stratum quotas
    (unlike a weighted Bernoulli) with size-proportional draw inside
    each stratum.  This is the mixture-building primitive: fix the
    language budget, let weights pick WHICH documents fill it.

    Same integer-exact key as :func:`q_weighted_sample_topk` (52-bit
    seeded uniform, one IEEE expression, 1e-12 quantization, doc_id
    tiebreak).

    Scale shape: one window partitioned by (lang) over the keyed scan
    — the oracle form; a terabyte stratum would use the
    (lang, key-prefix bucket) two-phase trick of
    ``q_stratified_sample_scale``, or per-partition heaps via
    TakeOrdered per stratum."""
    u52 = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('{seed}#', CAST(doc_id AS STRING))), 1, 13)")
    u01 = f"(CAST({u52} + 1 AS DOUBLE) / 4503599627370496E0)"
    key = f"LN({u01}) / CAST(n_chars + 1 AS DOUBLE)"
    return f"""
        WITH keyed AS (
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(ROUND(({key}) * 1e12) AS BIGINT) AS key_e12
            FROM documents WHERE lang IS NOT NULL
        ),
        ranked AS (
            SELECT doc_id, lang, n_chars, key_e12,
                   ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY key_e12 DESC, doc_id) AS draw_rank
            FROM keyed
        )
        SELECT doc_id, lang, n_chars, key_e12,
               CAST(draw_rank AS BIGINT) AS draw_rank
        FROM ranked WHERE draw_rank <= {per_stratum}
    """


def q_weighted_stratified_sample_scale(d: S.Dialect,
                                       per_stratum: int = 50,
                                       seed: str = "aes2",
                                       band_width: int = 10 ** 10
                                       ) -> str:
    """Scale derivation of :func:`q_weighted_stratified_sample` —
    identical output with NO whole-stratum window: at 100 TB one
    language is most of the corpus, and ``PARTITION BY lang`` puts
    terabytes through single window partitions.

    Two phases on the negated A-ES key (``-key_e12 >= 0``, ascending
    = best-first, so truncating and flooring integer division agree
    cross-engine): (1) one partial-aggregated (lang, band) COUNT
    table (band = neg_key // ``band_width``; ~3,600 bands max since
    |ln(u)/w| <= 52·ln 2) gives each band its preceding cumulative
    count; (2) ONLY rows of bands whose preceding count < the quota
    are ranked — a window over (lang, band) partitions of ~quota
    size, everything past the cutoff band never enters a window.
    draw_rank = band offset + within-band rank, exactly the windowed
    oracle's ROW_NUMBER (ties: doc_id, which the band split
    preserves because banding is order-aligned with the key)."""
    u52 = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('{seed}#', CAST(doc_id AS STRING))), 1, 13)")
    u01 = f"(CAST({u52} + 1 AS DOUBLE) / 4503599627370496E0)"
    key = f"LN({u01}) / CAST(n_chars + 1 AS DOUBLE)"
    band = d.intdiv("neg_key", str(band_width))
    return f"""
        WITH keyed AS (
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(ROUND(({key}) * 1e12) AS BIGINT) AS key_e12
            FROM documents WHERE lang IS NOT NULL
        ),
        banded AS (
            SELECT doc_id, lang, n_chars, key_e12,
                   {band} AS band
            FROM (SELECT doc_id, lang, n_chars, key_e12,
                         -key_e12 AS neg_key FROM keyed) t
        ),
        off AS (
            SELECT lang, band,
                   COALESCE(SUM(COUNT(*)) OVER (PARTITION BY lang
                       ORDER BY band
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS off
            FROM banded GROUP BY lang, band
        ),
        live AS (
            SELECT b.doc_id, b.lang, b.n_chars, b.key_e12, b.band,
                   o.off
            FROM banded b
            JOIN off o ON o.lang = b.lang AND o.band = b.band
            WHERE o.off < {per_stratum}
        ),
        ranked AS (
            SELECT doc_id, lang, n_chars, key_e12, off,
                   ROW_NUMBER() OVER (PARTITION BY lang, band
                       ORDER BY key_e12 DESC, doc_id) AS r
            FROM live
        )
        SELECT doc_id, lang, n_chars, key_e12,
               CAST(off + r AS BIGINT) AS draw_rank
        FROM ranked WHERE off + r <= {per_stratum}
    """


def q_readability_scores(d: S.Dialect) -> str:
    """Per-source readability profile — a Flesch-style reading-ease
    proxy computed from exact integer counts: words (whitespace
    tokens), sentences (terminal-punctuation runs, floored at 1 so
    fragments count as one sentence), and syllables (text-wide
    vowel-group runs floored at the word count — an AGGREGATE floor:
    consonant-only tokens still cost a syllable in total, though not
    per-word as a per-token walk would).  Readability gates are a standard quality rung
    in training-data pipelines (too-low = boilerplate/gibberish,
    too-high = tables/code masquerading as prose).

    Flesch reading ease = 206.835 − 1.015·(words/sentence)
    − 84.6·(syllables/word), computed per SOURCE from summed integer
    counts, so the two divisions are each a single exact-int/exact-int
    divide and the score expression is a fixed-order three-term
    affine — bit-identical cross-engine, ROUND(…, 4) as the usual
    formatting guard.  Per-doc scores feed an ease-tier CASE (the
    gate a filter would apply); tier counts are exact integers.

    Scale shape: map-only per-doc scalar counts (regexp_count +
    token_array inside the scan — no explode, no per-token shuffle)
    then ONE partial-aggregatable groupBy(source).  Reference anchor:
    LLM-pipeline extension (SURVEY.md LLM ops)."""
    words = d.arr_len(d.token_array("text"))
    sentences = f"GREATEST({d.regexp_count('text', '[.!?]+')}, 1)"
    # vowel-group runs across the whole text, floored at the word
    # count: a deterministic scalar proxy (the floor acts in
    # aggregate — a doc can't have fewer syllables than words).
    vowel_runs = d.regexp_count("LOWER(text)", "[aeiouy]+")
    return f"""
        WITH counts AS (
            SELECT doc_id, source,
                   CAST({words} AS BIGINT) AS n_words,
                   CAST({sentences} AS BIGINT) AS n_sentences,
                   CAST(GREATEST({vowel_runs}, {words}) AS BIGINT)
                       AS n_syllables
            FROM documents
        ),
        scored AS (
            SELECT *,
                   206.835
                   - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                   - 84.6 * (CAST(n_syllables AS DOUBLE)
                             / GREATEST(n_words, 1)) AS ease
            FROM counts
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_words,
               CAST(SUM(n_sentences) AS BIGINT) AS n_sentences,
               CAST(SUM(n_syllables) AS BIGINT) AS n_syllables,
               ROUND(206.835
                     - 1.015 * (CAST(SUM(n_words) AS DOUBLE)
                                / SUM(n_sentences))
                     - 84.6 * (CAST(SUM(n_syllables) AS DOUBLE)
                               / GREATEST(SUM(n_words), 1)), 4)
                   AS flesch_ease,
               CAST(SUM(CASE WHEN ease < 30 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hard,
               CAST(SUM(CASE WHEN ease >= 30 AND ease < 70 THEN 1
                             ELSE 0 END) AS BIGINT) AS n_medium,
               CAST(SUM(CASE WHEN ease >= 70 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_easy
        FROM scored
        GROUP BY source
    """


def q_tokenizer_fertility(d: S.Dialect,
                          doc_table: str = "documents") -> str:
    """Tokenizer fertility per language: BPE-ish subword tokens per
    whitespace word and characters per subword token — the two
    numbers a tokenizer/vocab choice is evaluated on per language
    (fertility ≫ 1 for a language means its text costs dispropor-
    tionately many tokens, skewing any token-budgeted mixture; see
    the multilingual-tokenizer literature, e.g. Rust et al. 2021).

    Counts are the shared token_count / bpe_token_count scalar
    expressions (identical SQL in both engines) summed exactly in
    BIGINT; each rate is ONE float multiply+divide FLOORed into
    BIGINT micro-units (FLOOR of the same IEEE double is rule-free
    cross-engine, and BIGINT holds any realistic ratio — a 32-bit
    cast would overflow past ~2147 chars/token).  Exactness caveat:
    the product SUM·1e6 is a double, so rates drift past 2^53 total
    tokens — micro-unit truncation absorbs it long before then for
    any per-lang ratio.  Scale shape:
    map-only scalar counts inside the scan, ONE partial-aggregatable
    groupBy(lang)."""
    tc = S.token_count("text", d)
    bpe = S.bpe_token_count("text", d)
    # GREATEST(.., 1) guards: a language whose docs are all empty /
    # whitespace has SUM(n_words)=0 (and SUM(n_bpe)=0) — rates read 0,
    # not NULL, matching q_readability_scores' divisor contract
    fert = "FLOOR(SUM(n_bpe) * 1000000.0 / GREATEST(SUM(n_words), 1))"
    cpt = "FLOOR(SUM(n_c) * 1000000.0 / GREATEST(SUM(n_bpe), 1))"
    return f"""
        WITH counts AS (
            SELECT lang,
                   CAST({tc} AS BIGINT) AS n_words,
                   CAST({bpe} AS BIGINT) AS n_bpe,
                   CAST(LENGTH(text) AS BIGINT) AS n_c
            FROM {doc_table}
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_words,
               CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
               CAST(SUM(n_c) AS BIGINT) AS n_chars,
               CAST({fert} AS BIGINT) AS fertility_e6,
               CAST({cpt} AS BIGINT) AS chars_per_token_e6
        FROM counts
        GROUP BY lang
    """


def _quality_cells_cum(d: S.Dialect,
                       doc_table: str = "documents") -> str:
    """Shared CTE chain ``sig → cells → cum`` behind the per-source
    quality percentiles: e4-quantized scores, (source, score) cell
    counts, and the per-source cumulative/total counts every
    percentile cutpoint reads.  ONE definition so the calibration
    table (q_quality_calibration) and the loss-mask flag rule
    (q_below_median_quality_flags) cannot drift apart on the
    percentile they both claim to share."""
    q = S.quality_score("text", d)
    return f"""sig AS (
            SELECT doc_id, source,
                   CAST(ROUND({q} * 10000) AS BIGINT) AS q_e4
            FROM {doc_table}
        ),
        cells AS (
            SELECT source, q_e4, COUNT(*) AS c
            FROM sig GROUP BY source, q_e4
        ),
        cum AS (
            SELECT source, q_e4,
                   SUM(c) OVER (PARTITION BY source ORDER BY q_e4) AS cc,
                   SUM(c) OVER (PARTITION BY source) AS n
            FROM cells
        )"""


def q_quality_calibration(d: S.Dialect,
                          doc_table: str = "documents") -> str:
    """Per-source quality-score calibration: p10/p50/p90 cutpoints of
    the (verified) heuristic quality score WITHIN each source, the
    global median alongside, and the share of each source's documents
    passing its own median vs the global one.  This is the decision
    table behind per-source thresholds (the FineWeb-style practice:
    a fixed global quality bar over-filters clean-but-plain sources
    and under-filters noisy ones; calibrated per-source percentiles
    equalize the cut).

    Percentile definition: smallest score s with cum_count(≤ s) ≥
    ⌈q·n⌉ — all-integer comparisons over e4-quantized scores (the
    score is ROUND(…, 4) by construction, so ×1e4 is exact).

    Scale shape: docs aggregate FIRST to (source, score) cells —
    bounded by 10⁴ distinct scores per source regardless of corpus
    size — and every window (cumulative count, total) rides on that
    aggregate, never on raw documents; the cutpoint table joins back
    broadcast for the pass-share pass.  No corpus-wide or whole-
    source row window anywhere."""
    return f"""
        WITH {_quality_cells_cum(d, doc_table)},
        cuts AS (
            SELECT source,
                   CAST(MAX(n) AS BIGINT) AS n_docs,
                   MIN(CASE WHEN cc * 10 >= n THEN q_e4 END) AS p10_e4,
                   MIN(CASE WHEN cc * 2 >= n THEN q_e4 END) AS p50_e4,
                   MIN(CASE WHEN cc * 10 >= n * 9 THEN q_e4 END) AS p90_e4
            FROM cum GROUP BY source
        ),
        gcum AS (
            SELECT q_e4,
                   SUM(SUM(c)) OVER (ORDER BY q_e4) AS cc,
                   SUM(SUM(c)) OVER () AS n
            FROM cells GROUP BY q_e4
        ),
        gcut AS (
            SELECT MIN(CASE WHEN cc * 2 >= n THEN q_e4 END) AS gp50_e4
            FROM gcum
        )
        SELECT c.source, c.n_docs, c.p10_e4, c.p50_e4, c.p90_e4,
               g.gp50_e4 AS global_p50_e4,
               ROUND(CAST(SUM(CASE WHEN s.q_e4 >= c.p50_e4
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / c.n_docs, 4) AS pass_local_share,
               ROUND(CAST(SUM(CASE WHEN s.q_e4 >= g.gp50_e4
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / c.n_docs, 4) AS pass_global_share
        FROM sig s
        JOIN cuts c ON c.source = s.source
        CROSS JOIN gcut g
        GROUP BY c.source, c.n_docs, c.p10_e4, c.p50_e4, c.p90_e4,
                 g.gp50_e4
    """


def q_bpe_merges_iter2(d: S.Dialect,
                       doc_table: str = "documents") -> str:
    """BPE merge INDUCTION, two iterations fully in-SQL — the
    vocabulary-learning step the tokenizer family was missing
    (fertility / OOV / bpe_token_histogram all EVALUATE a tokenizer;
    this LEARNS one): per iteration, the corpus-weighted most-frequent
    adjacent symbol pair (Sennrich et al. 2016's algorithm), with the
    merge applied between iterations.  Fourth member of the iterative
    family (pagerank_iter2, kmeans_lloyd2, logreg_quality_iter2):
    fixed unrolled iterations so the oracle covers the whole chain.

    Mechanics shared by both engines: pair counting aggregates on
    the DISTINCT-WORD vocabulary weighted by frequency (the classic
    BPE trick — corpus-sized work collapses to vocab-sized after one
    token aggregate); iteration 1 reads character pairs by SUBSTRING
    position; the winning merge applies via the DOUBLE-SPACE symbol
    encoding ('h  e  l  l  o', needle ' a  b ' -> ' ab '), whose
    isolation makes plain left-to-right REPLACE exactly BPE's
    greedy-left application with no cross-symbol false matches
    (' l lo ' can never match inside 'al  lo'); iteration 2 recounts
    over the re-split symbol arrays.  Ties break (count DESC, a, b)
    — deterministic cross-engine.

    Scale shape: ONE token explode -> vocab aggregate; everything
    after is vocab-sized (positions explode is O(vocab x word_len));
    the winning-merge tables are LIMIT-1 one-row aggregates, bounded
    for the audit, broadcast into the apply projection."""
    sub1 = "SUBSTRING(w, p + 1, 1)"
    sub2 = "SUBSTRING(w, p + 2, 1)"
    a2 = d.arr_get("arr", "p")
    b2 = d.arr_get("arr", "p + 1")
    return f"""
        WITH tok AS (
            SELECT {d.explode_tokens('text')} AS w FROM {doc_table}
        ),
        vocab AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w),
        pos1 AS (
            SELECT w, freq, {d.explode_range('LENGTH(w) - 1')} AS p
            FROM vocab
        ),
        c1 AS (
            SELECT {sub1} AS a, {sub2} AS b, SUM(freq) AS cnt
            FROM pos1 GROUP BY {sub1}, {sub2}
        ),
        m1 AS (SELECT a, b, cnt FROM c1 ORDER BY cnt DESC, a, b LIMIT 1),
        chars AS (
            SELECT w, freq, {d.explode_range('LENGTH(w)')} AS p
            FROM vocab
        ),
        seqs AS (
            SELECT w, freq,
                   {d.ordered_list_csv('SUBSTRING(w, p + 1, 1)', 'p',
                                       '  ')} AS s0
            FROM chars GROUP BY w, freq
        ),
        ap1 AS (
            SELECT s.freq,
                   REPLACE(CONCAT(' ', s.s0, ' '),
                           CONCAT(' ', m.a, '  ', m.b, ' '),
                           CONCAT(' ', m.a, m.b, ' ')) AS s1r
            FROM seqs s CROSS JOIN m1 m
        ),
        sym2 AS (
            SELECT freq,
                   {d.token_array(f"TRIM({d.regexp_replace_all('s1r', '  *', ' ')})")}
                       AS arr
            FROM ap1
        ),
        pos2 AS (
            SELECT freq, arr,
                   {d.explode_range(d.arr_len('arr') + ' - 1')} AS p
            FROM sym2
        ),
        c2 AS (
            SELECT {a2} AS a, {b2} AS b, SUM(freq) AS cnt
            FROM pos2 GROUP BY {a2}, {b2}
        ),
        m2 AS (SELECT a, b, cnt FROM c2 ORDER BY cnt DESC, a, b LIMIT 1)
        SELECT CAST(1 AS INT) AS iter, a, b,
               CONCAT(a, b) AS merged,
               CAST(cnt AS BIGINT) AS pair_count
        FROM m1
        UNION ALL
        SELECT CAST(2 AS INT), a, b, CONCAT(a, b), CAST(cnt AS BIGINT)
        FROM m2
    """


def q_quality_weighted_mixture(d: S.Dialect,
                               budget: int = MIX_BUDGET,
                               epoch_cap_e6: int = MIX_EPOCH_CAP_E6,
                               doc_table: str = "documents") -> str:
    """Quality-weighted mixture solve — the composition of the two
    verified pieces (round 10, VERDICT r9 #7): the calibration
    machinery's global-median cutpoint gates each source down to its
    quality-ELIGIBLE token mass (docs scoring at or above the global
    p50 — q_quality_calibration's pass_global set), and the capped
    water-filling solver (q_mixture_weights' shared tail, identical
    integer closed form) allocates the budget over THAT mass.  A
    noisy source whose docs sit mostly below the global median
    contributes little eligible mass and is down-weighted exactly by
    sqrt(eligible); epochs_e6 is the sampling rate over the eligible
    docs, which is what the apply step resamples from.

    ONE corpus scan: per-doc (source, q_e4, n_tok) aggregates to
    (source, q_e4) cells carrying both doc and token counts; the
    global median and the per-source eligible mass both read those
    cells, and every window from there on rides |sources|- or
    |cells|-row aggregates (the mixture plan contract)."""
    q = S.quality_score("text", d)
    return f"""
        WITH sigq AS (
            SELECT source,
                   CAST(ROUND({q} * 10000) AS BIGINT) AS q_e4,
                   CAST({d.arr_len(d.token_array('text'))} AS BIGINT)
                       AS n_tok_doc
            FROM {doc_table}
        ),
        cellsq AS (
            SELECT source, q_e4, COUNT(*) AS c,
                   SUM(n_tok_doc) AS tok
            FROM sigq GROUP BY source, q_e4
        ),
        gcum AS (
            SELECT q_e4,
                   SUM(SUM(c)) OVER (ORDER BY q_e4) AS cc,
                   SUM(SUM(c)) OVER () AS n
            FROM cellsq GROUP BY q_e4
        ),
        gcut AS (
            SELECT MIN(CASE WHEN cc * 2 >= n THEN q_e4 END) AS gp50_e4
            FROM gcum
        ),
        src AS (
            SELECT source,
                   CAST(SUM(CASE WHEN cq.q_e4 >= g.gp50_e4
                                 THEN tok ELSE 0 END) AS BIGINT)
                       AS n_tok
            FROM cellsq cq CROSS JOIN gcut g
            GROUP BY source
        ),
        w AS (
            SELECT source, n_tok,
                   CAST(FLOOR(SQRT(CAST(n_tok AS DOUBLE)) * 1e6)
                        AS BIGINT) AS w_e6,
                   CAST({_mixture_cap_expr(d, epoch_cap_e6)} AS BIGINT)
                       AS cap_tok
            FROM src WHERE n_tok > 0
        ),
        {_waterfill_tail(
            d, budget,
            extra_cols=", CAST(g.gp50_e4 AS BIGINT) AS gp50_e4",
            extra_from=" CROSS JOIN gcut g")}
    """


def q_below_median_quality_flags(d: S.Dialect,
                                 doc_table: str = "documents") -> str:
    """Per document: masked = 1 iff its quality score sits BELOW its
    source's median (the q_quality_calibration p50 cutpoint — same
    integer percentile definition, so exactly the complement of that
    query's pass_local set).  This is the doc-grain mask feeding
    ``sequence_loss_mask``: train on the good half of every source,
    keep the rest as packed context.  Scale shape: the calibration
    aggregate plus one broadcast join back to documents — no raw-doc
    window."""
    return f"""
        WITH {_quality_cells_cum(d, doc_table)},
        cuts AS (
            SELECT source,
                   MIN(CASE WHEN cc * 2 >= n THEN q_e4 END) AS p50_e4
            FROM cum GROUP BY source
        )
        SELECT s.doc_id,
               CASE WHEN s.q_e4 < c.p50_e4 THEN 1 ELSE 0 END AS masked
        FROM sig s
        JOIN cuts c ON c.source = s.source
    """


def q_logreg_feats(d: S.Dialect, doc_table: str = "documents") -> str:
    """The feature projection ``q_logreg_quality_iter2`` trains on,
    as its own query: (y, f0..f3) per document.  The registry's Spark
    side materializes this ONCE (localCheckpoint → view) — the
    feature exprs carry two regex passes over ``text``, and the
    single-string form re-inlines them into every gradient/accuracy
    consumer (guide §2.3 "project before the exchange": 40 bytes of
    features per doc instead of three re-scans of raw text)."""
    feats = _logreg_feat_exprs(d)
    fcols = ", ".join(f"{expr} AS f{j}" for j, (_, expr) in
                      enumerate(feats))
    return f"""
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               {fcols}
        FROM {doc_table}
    """


def _logreg_feat_exprs(d: S.Dialect) -> list[tuple[str, str]]:
    n = "LENGTH(text)"
    alpha = f"LENGTH({d.regexp_replace_all('text', '[^a-zA-Z ]', '')})"
    stop = S.stopword_count("text")
    return [("bias", "1.0"),
            ("len_signal", f"LEAST(1.0, {n} / 500.0)"),
            ("alpha_ratio",
             f"(CASE WHEN {n} = 0 THEN 0.0 "
             f"ELSE CAST({alpha} AS DOUBLE) / {n} END)"),
            ("stop_signal", f"LEAST(1.0, {stop} / 10.0)")]


def q_logreg_quality_iter2(d: S.Dialect,
                           doc_table: str = "documents",
                           feats_view: str | None = None) -> str:
    """A LEARNED quality filter trained fully in-SQL: two batch
    gradient-descent iterations of logistic regression predicting the
    English label from the verified quality-signal features (bias,
    length signal, alphabetic ratio, stopword signal) — the scaled-
    down form of the fastText/classifier quality rung modern
    pipelines train (GPT-3's WebText classifier, FineWeb-Edu), and
    the third member of the in-SQL iterative family
    (pagerank_iter2, kmeans_lloyd2).

    Cross-engine determinism is by CONSTRUCTION rather than by
    tolerance:

    * the sigmoid is the RATIONAL fast form 0.5 + z / (2·(1 + |z|))
      — multiply/divide/abs only, so both engines compute bit-equal
      IEEE doubles (libm EXP is only ~1-ulp-correct and NOT
      bit-portable, which would compound across iterations);
    * every aggregate boundary quantizes with trunc-toward-zero into
      e6 integers (trunc of the same double is identical under both
      engines' rules, unlike ROUND's half-up vs half-even split) and
      sums exactly in BIGINT;
    * weight updates divide by n once and FLOOR (again rule-free).

    Output: one row per feature with the weight after each iteration
    (e6 units) and the training accuracy of the final weights — the
    numbers a filter review reads (which signals the classifier
    leans on, and whether it beats the base rate).  lr = 1 on [0,1]
    features.  Scale shape: per iteration ONE full-scan aggregate
    producing a 4-number gradient (classic batch GD on Spark: map-
    side partial sums, 4-value reduce, broadcast the weight row
    back); iterations are a fixed-depth CTE chain, no driver loop."""
    tr = d.trunc_num
    feats = _logreg_feat_exprs(d)
    fcols = ", ".join(f"{expr} AS f{j}" for j, (_, expr) in
                      enumerate(feats))

    def grad(src: str, s_expr: str) -> str:
        terms = ", ".join(
            f"CAST(SUM({tr(f'(y - {s_expr}) * f{j} * 1000000.0')}) "
            f"AS BIGINT) AS g{j}" for j in range(len(feats)))
        return f"SELECT {terms} FROM {src}"

    zdot = " + ".join(f"w.w{j} * f.f{j}" for j in range(len(feats)))
    sig = "0.5 + z / (2.0 * (1.0 + ABS(z)))"
    if d.name == "spark":
        # one row source exploded 4 ways: the UNION ALL form stamps
        # the whole w1/wf/acc derivation chain once PER FEATURE into
        # the plan (4x three corpus aggregates before AQE gets a say);
        # identical rows, same order-insensitive hash
        names = ", ".join(d.str_lit(name) for name, _ in feats)
        w1arr = ", ".join(f"w1.w{j}" for j in range(len(feats)))
        wfarr = ", ".join(f"wf.w{j}" for j in range(len(feats)))
        out_rows = (
            f"SELECT element_at(array({names}), j + 1) AS feature,\n"
            f"       element_at(array({w1arr}), j + 1) AS w_iter1_e6,\n"
            f"       element_at(array({wfarr}), j + 1) AS w_iter2_e6,\n"
            f"       a.acc_e4\n"
            f"FROM w1 CROSS JOIN wf CROSS JOIN acc a\n"
            f"LATERAL VIEW explode(sequence(0, {len(feats) - 1})) AS j")
    else:
        out_rows = "\n        UNION ALL ".join(
            f"SELECT {d.str_lit(name)} AS feature, w1.w{j} AS w_iter1_e6, "
            f"wf.w{j} AS w_iter2_e6, a.acc_e4 "
            f"FROM w1 CROSS JOIN wf CROSS JOIN acc a"
            for j, (name, _) in enumerate(feats))
    w1cols = ", ".join(
        f"CAST(FLOOR(1.0 * g.g{j} / n.c) AS BIGINT) AS w{j}"
        for j in range(len(feats)))
    w2cols = ", ".join(
        f"CAST(w.w{j} + FLOOR(1.0 * g.g{j} / n.c) AS BIGINT) AS w{j}"
        for j in range(len(feats)))
    feats_cte = (f"feats AS (SELECT * FROM {feats_view})" if feats_view
                 else f"""feats AS (
            SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                   {fcols}
            FROM {doc_table}
        )""")
    return f"""
        WITH {feats_cte},
        n AS (SELECT COUNT(*) AS c FROM feats),
        g1 AS ({grad('feats', '0.5')}),
        w1 AS (SELECT {w1cols} FROM g1 g CROSS JOIN n),
        p1 AS (
            SELECT f.*, ({zdot}) / 1000000.0 AS z
            FROM feats f CROSS JOIN w1 w
        ),
        p1s AS (SELECT *, {sig} AS s FROM p1),
        g2 AS ({grad('p1s', 's')}),
        wf AS (SELECT {w2cols}
               FROM g2 g CROSS JOIN w1 w CROSS JOIN n),
        z2 AS (
            SELECT f.y, ({zdot}) / 1000000.0 AS z
            FROM feats f CROSS JOIN wf w
        ),
        acc AS (
            SELECT CAST({tr('10000.0 * SUM(CASE WHEN (z > 0) = '
                            '(y > 0.5) THEN 1 ELSE 0 END) / COUNT(*)')}
                   AS BIGINT) AS acc_e4
            FROM z2
        )
        {out_rows}
    """


def q_shuffle_run_audit(d: S.Dialect, seed: str = "shuf1") -> str:
    """Shuffle-quality audit of the seeded training order: per
    source, how many maximal same-source RUNS the q_seeded_shuffle
    order contains vs the expectation under a uniform random
    permutation — the check a training run does before trusting a
    shuffle (source clumping in the order correlates gradient noise;
    a buggy or insufficiently-mixed shuffle shows actual_runs well
    below expected).

    runs(s) = n_s − (# adjacent position pairs both from s), and
    E[runs(s)] = n_s · (N − n_s + 1) / N exactly (each of the n_s
    docs starts a run unless preceded by an s-doc: the preceding-
    position doc is from s with probability (n_s − 1)/(N − 1),
    summed over arrangements gives the closed form).  ratio ≈ 1 for
    a healthy shuffle, < 1 when clumped, with integer counts and a
    single exact division per source.

    Scale shape: adjacency is a POSITION EQUI-JOIN (b.position =
    a.position + 1 — hash-partitioned, no corpus-wide window or LAG
    anywhere), and the audit aggregates to |sources| rows.  The
    position itself comes from the banded two-phase numbering the
    shuffle already pays for (Spark side); the oracle rides the
    textbook global ROW_NUMBER derivation, so the hash match
    re-proves the two-phase numbering through one more consumer."""
    shuffle = (q_seeded_shuffle(d, seed=seed) if d.name == "spark"
               else q_seeded_shuffle_oracle(d, seed=seed))
    return f"""
        WITH ordered AS (
            SELECT p.doc_id, p.position, dd.source
            FROM ({shuffle}) p
            JOIN documents dd ON dd.doc_id = p.doc_id
        ),
        adj AS (
            SELECT a.source, COUNT(*) AS same_adj
            FROM ordered a
            JOIN ordered b ON b.position = a.position + 1
                          AND b.source = a.source
            GROUP BY a.source
        ),
        totals AS (
            SELECT source, COUNT(*) AS n_docs FROM ordered
            GROUP BY source
        ),
        corpus AS (SELECT COUNT(*) AS n FROM ordered)
        SELECT t.source,
               CAST(t.n_docs AS BIGINT) AS n_docs,
               CAST(t.n_docs - COALESCE(a.same_adj, 0) AS BIGINT)
                   AS n_runs,
               ROUND(CAST(t.n_docs AS DOUBLE) * (c.n - t.n_docs + 1)
                     / c.n, 4) AS expected_runs,
               ROUND(CAST(t.n_docs - COALESCE(a.same_adj, 0) AS DOUBLE)
                     / (CAST(t.n_docs AS DOUBLE) * (c.n - t.n_docs + 1)
                        / c.n), 4) AS run_ratio
        FROM totals t
        LEFT JOIN adj a ON a.source = t.source
        CROSS JOIN corpus c
    """


def q_lang_id_confusion(d: S.Dialect,
                        doc_table: str = "documents") -> str:
    """Confusion matrix of the heuristic language identifier against
    the corpus's ground-truth ``lang`` labels: per (actual,
    predicted) cell counts plus per-actual-language recall — the
    evaluation face of ``q_lang_id`` (a filter as load-bearing as
    lang-ID ships with its measured error profile, not a vibe).
    Scale shape: the lang_id scalar rides the scan; ONE
    partial-aggregatable groupBy on the (actual, predicted) pair —
    |langs|² rows out of the shuffle."""
    pred = S.lang_id("text")
    return f"""
        WITH scored AS (
            SELECT lang AS actual, {pred} AS predicted
            FROM {doc_table}
        ),
        cells AS (
            SELECT actual, predicted, COUNT(*) AS n
            FROM scored GROUP BY actual, predicted
        ),
        totals AS (
            SELECT actual, SUM(n) AS n_actual FROM cells
            GROUP BY actual
        )
        SELECT c.actual, c.predicted,
               CAST(c.n AS BIGINT) AS n,
               CAST(t.n_actual AS BIGINT) AS n_actual,
               ROUND(CAST(c.n AS DOUBLE) / t.n_actual, 4) AS cell_share,
               CAST(CASE WHEN c.actual = c.predicted THEN 1 ELSE 0 END
                    AS INT) AS is_correct
        FROM cells c JOIN totals t ON t.actual = c.actual
    """


# Per-language stopword lists for the v2 identifier: high-frequency
# function words (public corpus-linguistics knowledge; the fastText /
# langid.py "closed-class words carry the language" principle scaled
# to an in-SQL table).  prio = LANG_MARKERS order, the shared
# tiebreak convention.  ASCII-only so the literals render identically
# in both engines' parsers.
LANG_STOPWORDS: tuple[tuple[str, int, tuple[str, ...]], ...] = (
    ("en", 0, ("the", "and", "of", "to", "in", "is", "it", "that",
               "for", "with", "was", "this", "have", "not", "are",
               "from")),
    ("de", 1, ("der", "die", "und", "das", "ist", "nicht", "mit",
               "ein", "eine", "den", "sich", "auch", "auf", "dem",
               "des", "einer")),
    ("fr", 2, ("le", "la", "et", "les", "des", "est", "une", "dans",
               "pour", "que", "qui", "pas", "sur", "avec", "plus",
               "son")),
    ("es", 3, ("el", "los", "que", "para", "una", "las", "por",
               "con", "del", "se", "como", "pero", "sus", "al",
               "lo", "este")),
)


def _stopword_values() -> str:
    rows = []
    for lang, prio, words in LANG_STOPWORDS:
        rows.extend(f"('{lang}', '{w}', {prio})" for w in words)
    return ", ".join(rows)


def lang_id_v2_decode(code: str) -> str:
    """CASE decoding a packed argmax code back to its language tag
    (prio = 7 - code % 16; see q_lang_id_v2's packing)."""
    whens = " ".join(
        f"WHEN {7 - prio} THEN '{lang}'"
        for lang, prio, _ in LANG_STOPWORDS)
    return f"CASE ({code}) % 16 {whens} ELSE 'und' END"


def q_lang_id_v2(d: S.Dialect, doc_table: str = "documents") -> str:
    """Language ID, second rung: stopword-table scoring with a
    charclass fallback — built because ``q_lang_id_confusion``
    honestly measured the 4-marker-word v1 heuristic collapsing to
    'en' on text that matches NO marker (its CASE's ELSE branch).

    Per document: explode tokens once, count hits against the
    broadcast per-language stopword table, and take the argmax packed
    into ONE comparable integer (hits * 1024 + distinct_hits * 16 +
    (7 - prio)) so the winner decodes without a second join; ties
    break by distinct stopwords hit, then LANG_MARKERS order — the
    v1 convention.  Two fallbacks v1 lacks: majority-non-ASCII text
    (wrong-script content — the charclass_profile signal) reads
    'other', and text hitting NO stopword in any language reads 'und'
    instead of defaulting to 'en'.

    Packing bounds: distinct_hits <= 16 (list size) so the *16 term
    stays under 1024, prio < 8 stays under 16 — strictly ordered by
    (hits, distinct, -prio) as BIGINT.

    Scale shape: ONE token explode + equi-join against the ~64-row
    inline stopword table (broadcast), ONE (doc_id, lang) aggregate,
    ONE doc-keyed argmax aggregate, and a doc_id-keyed left join back
    to the map-only charclass scan.  No corpus-sized state, no
    windows."""
    non_ascii = (f"(LENGTH(text) - LENGTH("
                 f"{d.regexp_replace_all('text', '[^ -~]', '')}))")
    return f"""
        WITH tok AS (
            SELECT doc_id, {d.explode_tokens('text')} AS tk
            FROM {doc_table}
        ),
        sw AS (
            SELECT * FROM (VALUES {_stopword_values()})
                AS t(lang, word, prio)
        ),
        hits AS (
            SELECT t.doc_id, s.lang, s.prio,
                   COUNT(*) AS n_hits,
                   COUNT(DISTINCT t.tk) AS n_distinct
            FROM tok t JOIN sw s ON s.word = t.tk
            GROUP BY t.doc_id, s.lang, s.prio
        ),
        best AS (
            SELECT doc_id,
                   MAX(n_hits * 1024 + n_distinct * 16 + (7 - prio))
                       AS code
            FROM hits GROUP BY doc_id
        ),
        cc AS (
            SELECT doc_id,
                   CAST(LENGTH(text) AS BIGINT) AS n_c,
                   CAST({non_ascii} AS BIGINT) AS n_non_ascii
            FROM {doc_table}
        )
        SELECT c.doc_id,
               CASE WHEN c.n_non_ascii * 2 > c.n_c THEN 'other'
                    WHEN b.code IS NULL THEN 'und'
                    ELSE {lang_id_v2_decode('b.code')}
               END AS lang_pred
        FROM cc c LEFT JOIN best b ON b.doc_id = c.doc_id
    """


def q_lang_id_confusion_v2(d: S.Dialect,
                           doc_table: str = "documents") -> str:
    """The v2 identifier's measured confusion matrix — same cells /
    recall shape as ``q_lang_id_confusion`` so the two rungs compare
    row-for-row.  Scale shape: the v2 prediction subquery (see
    q_lang_id_v2) joined doc-keyed to the label scan, then ONE
    (actual, predicted) aggregate — |langs|² rows out."""
    return f"""
        WITH pred AS ({q_lang_id_v2(d, doc_table)}),
        scored AS (
            SELECT dd.lang AS actual, p.lang_pred AS predicted
            FROM {doc_table} dd JOIN pred p ON p.doc_id = dd.doc_id
        ),
        cells AS (
            SELECT actual, predicted, COUNT(*) AS n
            FROM scored GROUP BY actual, predicted
        ),
        totals AS (
            SELECT actual, SUM(n) AS n_actual FROM cells
            GROUP BY actual
        )
        SELECT c.actual, c.predicted,
               CAST(c.n AS BIGINT) AS n,
               CAST(t.n_actual AS BIGINT) AS n_actual,
               ROUND(CAST(c.n AS DOUBLE) / t.n_actual, 4) AS cell_share,
               CAST(CASE WHEN c.actual = c.predicted THEN 1 ELSE 0 END
                    AS INT) AS is_correct
        FROM cells c JOIN totals t ON t.actual = c.actual
    """


def q_charclass_profile(d: S.Dialect,
                        doc_table: str = "documents") -> str:
    """Per-source character-class profile: shares of ASCII letters,
    digits, whitespace, other printable ASCII (punctuation), and
    non-ASCII bytes-as-chars — the cheap garbage detector that
    catches mojibake, binary spills, and wrong-script content before
    any tokenizer sees them (a spike in non_ascii_share or
    punct_share is the classic symptom).  Complements quality_score's
    single alpha ratio with the full decomposition.

    Parity: classes are literal ASCII ranges only ([a-zA-Z], [0-9],
    the printable range ' '..'~' and its complement) — identical
    under Java regex and RE2; counts are LENGTH deltas after class
    removal (exact integers), shares are single divisions ROUNDed
    to 4.  Scale shape: map-only scalars + ONE groupBy(source)."""
    def n_removed(cls: str) -> str:
        return (f"(LENGTH(text) - LENGTH("
                f"{d.regexp_replace_all('text', cls, '')}))")

    alpha = n_removed("[a-zA-Z]")
    digit = n_removed("[0-9]")
    space = n_removed("[ ]")
    non_ascii = n_removed("[^ -~]")
    return f"""
        WITH counts AS (
            SELECT source,
                   CAST(LENGTH(text) AS BIGINT) AS n_c,
                   CAST({alpha} AS BIGINT) AS n_alpha,
                   CAST({digit} AS BIGINT) AS n_digit,
                   CAST({space} AS BIGINT) AS n_space,
                   CAST({non_ascii} AS BIGINT) AS n_non_ascii
            FROM {doc_table}
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_c) AS BIGINT) AS n_chars,
               ROUND(CAST(SUM(n_alpha) AS DOUBLE)
                     / GREATEST(SUM(n_c), 1), 4) AS alpha_share,
               ROUND(CAST(SUM(n_digit) AS DOUBLE)
                     / GREATEST(SUM(n_c), 1), 4) AS digit_share,
               ROUND(CAST(SUM(n_space) AS DOUBLE)
                     / GREATEST(SUM(n_c), 1), 4) AS space_share,
               ROUND(CAST(SUM(n_c - n_alpha - n_digit - n_space
                              - n_non_ascii) AS DOUBLE)
                     / GREATEST(SUM(n_c), 1), 4) AS punct_share,
               ROUND(CAST(SUM(n_non_ascii) AS DOUBLE)
                     / GREATEST(SUM(n_c), 1), 4) AS non_ascii_share
        FROM counts
        GROUP BY source
    """


def q_length_calibration(d: S.Dialect,
                         doc_table: str = "documents") -> str:
    """Per-source document-LENGTH calibration: p10/p50/p90 character
    counts per source — the decision table behind per-source length
    filters (a fixed global minimum over-filters naturally-short
    sources; the FineWeb-style practice calibrates the cut per
    source, exactly as q_quality_calibration does for quality).

    Same integer percentile definition as the quality twin (smallest
    value with cum ≥ ⌈q·n⌉); lengths are already exact integers so
    no quantization step.  Scale shape: docs aggregate FIRST to
    (source, n_chars) cells — bounded by the corpus's length domain,
    not its row count — and the windows ride that aggregate."""
    return f"""
        WITH cells AS (
            SELECT source, n_chars, COUNT(*) AS c
            FROM {doc_table} GROUP BY source, n_chars
        ),
        cum AS (
            SELECT source, n_chars,
                   SUM(c) OVER (PARTITION BY source
                                ORDER BY n_chars) AS cc,
                   SUM(c) OVER (PARTITION BY source) AS n
            FROM cells
        )
        SELECT source,
               CAST(MAX(n) AS BIGINT) AS n_docs,
               CAST(MIN(CASE WHEN cc * 10 >= n THEN n_chars END)
                    AS BIGINT) AS p10_chars,
               CAST(MIN(CASE WHEN cc * 2 >= n THEN n_chars END)
                    AS BIGINT) AS p50_chars,
               CAST(MIN(CASE WHEN cc * 10 >= n * 9 THEN n_chars END)
                    AS BIGINT) AS p90_chars
        FROM cum GROUP BY source
    """
