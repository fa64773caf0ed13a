"""Corpus-wide suffix ranking by distributed prefix doubling — the
index behind exact-substring training-data dedup (Lee et al., 2022,
"Deduplicating Training Data Makes Language Models Better", which
builds a suffix array over the whole corpus to find long repeated
spans).  Single-node suffix-array construction dies at lake scale;
the published distributed answer is prefix doubling (Flick & Aluru,
SC'15): rank all suffixes by their first token, then repeatedly
re-rank by the TUPLE of block ranks (rank of first 2^k tokens, rank
of next 2^k, ...) — after logarithmically many rounds ranks are
final.  Two r12 round-shape choices (guide §2.4 "remove shuffles",
§1.2 "the distributed algorithm"):

* **Pairing is a ``lead`` window, not a self-join.**  Positions are
  contiguous per document (posexplode), so "the rank k tokens later"
  is ``lead(r, k) OVER (PARTITION BY doc ORDER BY pos)`` — one
  exchange by doc instead of the r11 corpus self-join's two
  (id, pos)-keyed exchanges plus sorts per round.
* **Rounds quadruple, not double.**  Ranking by the 4-tuple
  (r(pos), r(pos+k), r(pos+2k), r(pos+3k)) extends coverage 4× per
  round (Flick & Aluru's doubling generalizes to any arity: tuple
  order of block ranks IS the order of the concatenated truncation,
  shorter-prefix-first, with beyond-end as -1), so a corpus of max
  document length L needs ⌈log₄ L⌉ corpus-wide shuffle rounds
  instead of ⌈log₂ L⌉ — the extra lead offsets ride the SAME window
  and the wider sort key is noise next to a whole round's exchange.

The corpus-wide dense rank is the scale hazard: ``Window.orderBy``
with no partition key serializes the corpus through ONE task.  It is
implemented here as the two-phase range-partitioned form instead
(``dense_rank_scalable``): ``repartitionByRange`` of the table itself
(a total order across partitions with equal keys co-located) →
per-partition DENSE rank + a partition-count-sized distinct-count
offset table collected to the driver.  Result is independent of the
partition count (test-pinned) and never moves the corpus through one
task — nor through a distinct pass or a rank-attach join (the r11
form paid both per doubling round).

Ranks are integers throughout, so the output is bit-identical across
engines — the DuckDB oracle (plans/oracle_queries.q_suffix_ranks)
derives the same ranks the OPPOSITE way, by sorting the materialized
suffix token-lists directly, which only a toy corpus can afford.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def dense_rank_scalable(df: DataFrame, cols: list[str],
                        out: str = "dr",
                        num_partitions: int | None = None,
                        with_count: bool = False,
                        first_col_ubound: int | None = None):
    """DENSE_RANK() OVER (ORDER BY cols) without the single-partition
    global window: rank the DISTINCT key tuples via range partitioning
    (equal tuples co-locate; partitions are globally ordered), a local
    row_number per partition, and a driver-side cumulative offset —
    one row per PARTITION crosses the driver, never data.

    Returns ``df`` with an ``out`` BIGINT column — or, with
    ``with_count``, the tuple ``(df, n_distinct)``: the distinct-key
    count is already on the driver as Σ partition sizes, so callers
    that iterate to a rank fixed point (``suffix_ranks``) get their
    convergence test for free instead of paying a distinct+count job
    per round.  NULL key semantics follow Spark's default NULLS FIRST
    ascending order.

    The rank is computed ON the fact table itself (r12, guide §2.4):
    range-partition the full table, take ``dense_rank`` per partition,
    add the per-partition distinct-count offsets.  The previous form
    ranked ``df.select(cols).distinct()`` and equi-joined the ranks
    back — one distinct exchange plus a fact-grain sort-merge join
    (two more exchanges) per call that this shape simply does not
    have; the fact table now crosses the network exactly once, and
    equal keys still co-locate under range partitioning so the
    per-partition dense rank is globally correct.  The output is
    eagerly checkpointed INSIDE: the range exchange picks its bounds
    by SAMPLING, re-sampled on every recomputation — two actions over
    un-pinned lineage (the offset collect and any downstream job)
    could see DIFFERENT partition boundaries, silently corrupting the
    global rank (observed at 270 k keys; invisible at toy sizes where
    both samplings land the same bounds).  Callers therefore must NOT
    re-checkpoint the result.

    ``first_col_ubound``: when ``cols[0]`` is a non-NULL integer key
    in ``[0, first_col_ubound]`` (the prefix-doubling rounds: ranks
    are dense, so the previous round's distinct count IS the bound),
    partition by the deterministic value bucket
    ``floor(key·B / (bound+1))`` instead of sampled range bounds —
    monotone in the key, so cumulative bucket offsets still yield the
    global rank, equal keys still co-locate, and the range sampler's
    extra pass over the input (one whole job per call, guide §2.4)
    plus its re-sample hazard disappear.  B defaults to 4 buckets per
    shuffle partition (``spark.graft.rank.bucketsPerPartition``):
    more buckets spread the hash more evenly across tasks (guide
    §2.5), but the per-round offset literal and plan grow with B —
    measured at sf0.01 the loop runs 3.8 s at 1×, 4.1 s at 4×, 5.4 s
    at 16× per-partition buckets, so the local default stays small
    and a wide cluster raises the conf.
    """
    if first_col_ubound is not None:
        sess = df.sparkSession
        mult = int(sess.conf.get("spark.graft.rank.bucketsPerPartition",
                                 "4"))
        b = mult * int(sess.conf.get("spark.sql.shuffle.partitions",
                                     "32"))
        d = df.withColumn("__pid", F.expr(
            f"(CAST(`{cols[0]}` AS BIGINT) * {b}) "
            f"DIV {first_col_ubound + 1}"))
    elif num_partitions:
        d = df.repartitionByRange(num_partitions, *cols) \
            .withColumn("__pid", F.spark_partition_id())
    else:
        d = df.repartitionByRange(*cols) \
            .withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*cols)
    d = d.withColumn("__lr", F.dense_rank().over(w))
    # r13 measured NEGATIVE twice (guide §1.3), kept eager: (1) a
    # MEMORY_AND_DISK persist on the bucketed path (offsets agg as the
    # only materializing action — one job/round instead of two) keeps
    # full lineage, and Catalyst re-analysis of the growing ladder
    # tree cost +15-25 % wall across the suffix family (final-plan
    # Exchange mentions 0 → 76); (2) localCheckpoint(eager=False) — no
    # sample hazard on the bucketed path and lineage truncates — saved
    # the separate checkpoint job but still measured +3-5 % on
    # interleaved B/A/B/A pairs (suffix_ranks 2.61 vs 2.75 s,
    # repeated_spans_scalable 4.78 vs 4.85-5.17 s at sf0.01): locally
    # the eager checkpoint job is fully parallel and the offsets read
    # of stored blocks is nearly free, so there is no sequential-job
    # saving to collect.  Eager also stays the SAFE shape for the
    # sampled-range path (re-sampled bounds make un-pinned double
    # actions silently corrupting).
    d = d.localCheckpoint(eager=True)
    sizes = {r["__pid"]: r["n"] for r in
             d.groupBy("__pid").agg(F.max("__lr").alias("n")).collect()}
    # cumulative offsets as an ARRAY literal indexed by partition id
    # (both partitioning paths yield contiguous ids from 0): a literal
    # MAP lookup is a per-row LINEAR scan of the key array, an array
    # element_at is O(1)
    n_slots = (max(sizes) + 1) if sizes else 0
    arr, acc = [], 0
    for pid in range(n_slots):
        arr.append(acc)
        acc += sizes.get(pid, 0)
    off = F.array(*[F.lit(x) for x in arr]) if arr else F.array(F.lit(0))
    ranked = d.withColumn(
        out, (F.col("__lr")
              + F.element_at(off, F.col("__pid").cast("int") + 1))
        .cast("long")).drop("__pid", "__lr")
    return (ranked, acc) if with_count else ranked


def suffix_ranks(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 max_rounds: int = 40,
                 prefix_cap: int | None = None) -> DataFrame:
    """Dense rank of every token-level suffix of every document under
    corpus-wide lexicographic order (element-wise on tokens, shorter-
    prefix-first — exactly SQL's list comparison, reproduced by
    ranking a beyond-end position as -1, below every real rank).

    Identical suffixes in different documents share a rank — that is
    the useful signal (they ARE the repeated spans exact-substring
    dedup hunts).  The loop therefore cannot stop at "all ranks
    distinct" alone, and a "no new classes this round" shortcut is
    UNSOUND — refinement can pause for a round and resume at a larger
    shift (observed on the sf0.1 corpus: the shortcut under-split 527
    classes) — so it runs until the covered prefix provably exceeds
    the longest document (shift k ≥ max tokens ⇒ coverage 2k beyond
    every suffix), with the all-distinct early exit kept.

    ``prefix_cap`` (a power of two) stops the doubling once the
    covered prefix reaches the cap, yielding dense ranks of the
    CAP-TRUNCATED suffixes — the document-length-independent form the
    capped ExactSubstr profile consumes (prefix doubling covers
    exactly 2^j tokens after j rounds, so a power-of-two cap is an
    exact truncation, and suffixes already distinct within a shorter
    prefix keep the identical order).  The all-distinct early exit
    stays valid under the cap: lexicographic order is fixed by the
    first differing token.

    Returns (id_col, pos, suffix_rank); pos is the 0-based token
    offset.  Cost: ⌈log₂ min(max-repeat-length, cap)⌉ rounds of (one
    equi-join on (doc, pos+2^k) + one scalable dense rank).
    """
    levels, _ = suffix_rank_levels(docs, id_col=id_col,
                                   text_col=text_col,
                                   max_rounds=max_rounds,
                                   prefix_cap=prefix_cap)
    r = levels[-1][1]
    return r.select(id_col, F.col("pos").cast("int").alias("pos"),
                    F.col("r").cast("long").alias("suffix_rank"))


def _round_multiplier(k: int, bound: int | None) -> int:
    """Coverage multiplier for the round at shift ``k``: quadruple,
    except fall back to doubling when 4k would overshoot a
    power-of-two ``bound`` (the prefix cap) — doubling can always
    land exactly on it."""
    if bound is not None and k * 4 > bound:
        return 2
    return 4


def suffix_rank_levels(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_rounds: int = 40,
                       prefix_cap: int | None = None
                       ) -> tuple[list[tuple[int, DataFrame]], int]:
    """The prefix-doubling ladder itself: every intermediate rank
    table, not just the final one.  Returns ``(levels, max_len)``
    where ``levels[j] = (coverage, DF(id_col, pos, r[, w1, w2]))``
    ranks each suffix by its first ``coverage`` tokens (shorter-prefix
    first, exactly SQL list order) — the last level is the
    fully-discriminating rank :func:`suffix_ranks` returns.  Coverages
    quadruple per round (doubling only when a power-of-two
    ``prefix_cap`` forces an exact landing).

    Keeping the ladder is what makes EXACT rank-neighbor LCPs
    computable WITHOUT materializing suffix slices
    (:func:`lcp_from_levels`): the ladder is the radix-decomposition
    index, one checkpointed corpus-grain table per level — O(N log L)
    storage, the published suffix-array recipe (Manber-Myers rank
    tables).  Each level is eagerly checkpointed, so consumers replay
    nothing.  Non-final levels additionally carry ``w1``/``w2`` — the
    same level's rank at pos+coverage and pos+2·coverage.  They cost
    nothing: the NEXT round's checkpoint materializes exactly those
    lead columns as its sort key, so the widened level is a projection
    of a table that already exists — and they are what lets the LCP
    loop extract a base-4 digit (0–3 matching blocks) with ONE join
    per side per level instead of three sequential probes."""
    if prefix_cap is not None and prefix_cap & (prefix_cap - 1):
        raise ValueError("prefix_cap must be a power of two")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), " +"),
                     lambda t: t != ""))
        .alias("pos", "tok"))
    # dense_rank_scalable checkpoints its output internally — these
    # per-level tables are plain projections over pinned partitions,
    # so no further eager materialization per round (r12: the loop
    # previously paid one extra checkpoint job per round re-writing
    # the same rows minus two columns)
    r, n_distinct = dense_rank_scalable(toks, ["tok"], out="r",
                                        with_count=True)
    r = r.select(id_col, "pos", "r")
    levels: list[tuple[int, DataFrame]] = [(1, r)]
    # doc-length stats over the round-0 checkpoint (NOT the raw
    # explode: same rows, but the scan+split work is already paid)
    stats = r.groupBy(id_col).count() \
        .agg(F.max("count").alias("mx"), F.sum("count").alias("n")) \
        .collect()[0]
    max_len, n_total = stats.mx or 0, stats.n or 0
    if prefix_cap is not None:
        max_len = min(max_len, prefix_cap)
    k = 1
    for _ in range(max_rounds):
        if n_distinct >= n_total or k >= max_len:
            break
        m = _round_multiplier(k, prefix_cap)
        # "rank k·j tokens later" is a lead over the per-doc position
        # order — positions are contiguous, so this replaces the r11
        # (id, pos)=(id, pos+k) self-join (two corpus exchanges +
        # sorts) with one doc-keyed exchange; beyond-end stays -1,
        # below every real rank, exactly SQL's shorter-list-first
        w = Window.partitionBy(id_col).orderBy("pos")
        block_cols = [
            F.coalesce(F.lead("r", j * k).over(w), F.lit(-1))
            .alias(f"r{j + 1}") for j in range(1, m)]
        paired = r.select(id_col, "pos", "r", *block_cols)
        # ranks from the previous round are dense in [1, n_distinct]:
        # deterministic value-bucket partitioning, no sampling job
        cols = ["r"] + [f"r{j + 1}" for j in range(1, m)]
        r2, n_distinct = dense_rank_scalable(paired, cols,
                                             out="nr", with_count=True,
                                             first_col_ubound=n_distinct)
        # the round's checkpoint holds (pos, r, r2, r3, ...) — widen
        # the PREVIOUS level with its own rank at pos+k / pos+2k for
        # the LCP loop's single-join digit extraction (free: same
        # materialized table, different projection)
        if m == 4:
            levels[-1] = (k, r2.select(
                id_col, "pos", "r",
                F.col("r2").alias("w1"), F.col("r3").alias("w2")))
        r = r2.select(id_col, "pos", F.col("nr").alias("r"))
        k *= m
        levels.append((k, r))
    return levels, max_len


def lcp_from_levels(pairs: DataFrame,
                    levels: list[tuple[int, DataFrame]],
                    id_col: str = "doc_id",
                    out: str = "lcp") -> DataFrame:
    """Exact token LCP for suffix-position pairs via mixed-radix
    decomposition over the rank ladder — ZERO suffix materialization.

    ``pairs`` carries (da, pa, db, pb): two suffix positions per row.
    For each level coverage c (descending), the digit — how many
    consecutive c-token blocks match, 0‥3 under quadrupled rounds —
    comes from ONE join per side against the widened level table
    (r, w1, w2 = the level's rank at pos, pos+c, pos+2c): block i
    matches iff both positions exist and the i-th ranks are equal;
    positions and the accumulator advance by digit·c.  A truncation
    equality at the document tail implies full remaining equality, so
    the final clamp to min(remaining lengths) is exact.  Correctness:
    processing levels top-down leaves the remaining LCP below 4c when
    level 4c is done, so at level c at most 3 blocks can match
    (greedy mixed-radix extraction is exact); the all-distinct early
    exit bounds every LCP below the last coverage, whose digit is
    therefore at most 1 (the clamped identical-tail case).

    Cost: 2 pair-grain equi-joins per level (⌈log₂ L⌉ levels); the
    pair table is checkpoint-truncated every
    ``LCP_LEVELS_PER_CHECKPOINT`` levels — without truncation the
    accumulated CASE-WHEN position expressions substitute into each
    next level's join condition and Catalyst's analysis blows up
    super-linearly in the level count (measured: 10 unchecked levels
    never finished planning at 51 k pairs).  Truncating every level
    kept planning linear but serialized one materialized job per
    level, and in LOCAL mode each eager materialization carries a
    10-30 s data-independent floor (SCALING.md round 7); batching 2
    levels per checkpoint (round 8) halves the sequential job count
    for the same hashes — the CASE-WHEN depth between checkpoints is
    1, far below the blowup regime.  The checkpoint is pair-grain,
    i.e. tiny next to the corpus.  Returns ``pairs`` + BIGINT
    ``out``."""
    # AQE history: round 7 measured 290 s -> 124 s with AQE OFF for
    # this loop on a 51 k-pair ladder — against the r7 rank tables.
    # Re-measured in round 12 AFTER the rank-on-fact-table rewrite
    # (fewer, cheaper per-level joins): AQE ON now wins at BOTH
    # scales — sf0.01 repeated_span_profile 12.8-13.8 s (off) ->
    # 7.4-9.3 s (on); sf0.1 (the 51 k-pair case) 21-30 s (off) ->
    # 17.2-17.3 s (on), AQE's partition coalescing shrinking each
    # level's tiny pair-grain shuffles below the fixed task overhead.
    # The r7 setting was left behind by the shapes it was tuned
    # against.
    return _lcp_loop(pairs, levels, id_col, out)


# Levels folded between checkpoint truncations in the LCP loop: the
# join-condition expression depth between checkpoints grows linearly
# with this, and Catalyst planning blows up super-linearly somewhere
# below 10 — 2 halves the sequential job count (the local-mode wall
# driver) while staying far from the planning cliff.
LCP_LEVELS_PER_CHECKPOINT = 2


def _lcp_loop(pairs: DataFrame, levels: list[tuple[int, DataFrame]],
              id_col: str, out: str,
              levels_per_ckpt: int = LCP_LEVELS_PER_CHECKPOINT
              ) -> DataFrame:
    # remaining suffix lengths, derived from the level-1 table (it
    # holds every (doc, pos)): len = n_tok - pos
    base = levels[0][1]
    lens = base.groupBy(id_col).agg(
        (F.max("pos") + 1).alias("__ntok"))
    cur = (pairs
           .join(lens.select(F.col(id_col).alias("da"),
                             F.col("__ntok").alias("__la")), "da")
           .join(lens.select(F.col(id_col).alias("db"),
                             F.col("__ntok").alias("__lb")), "db")
           .withColumn("__acc", F.lit(0).cast("long"))
           .withColumn("__ia", F.col("pa").cast("long"))
           .withColumn("__ib", F.col("pb").cast("long")))
    for i, (cov, rdf) in enumerate(reversed(levels)):
        widened = "w1" in rdf.columns
        probe = ["r", "w1", "w2"] if widened else ["r"]
        ra = rdf.select(F.col(id_col).alias("__rda"),
                        F.col("pos").alias("__rpa"),
                        *[F.col(c).alias(f"__a_{c}") for c in probe])
        rb = rdf.select(F.col(id_col).alias("__rdb"),
                        F.col("pos").alias("__rpb"),
                        *[F.col(c).alias(f"__b_{c}") for c in probe])
        cur = (cur
               .join(ra, (F.col("da") == F.col("__rda"))
                     & (F.col("__ia") == F.col("__rpa")), "left")
               .join(rb, (F.col("db") == F.col("__rdb"))
                     & (F.col("__ib") == F.col("__rpb")), "left"))
        # digit = number of consecutively matching cov-blocks (each
        # test: both ranks exist AND equal — a missing position means
        # the suffix ended, exactly the old single-probe semantics)
        hit = None
        adv = F.lit(0).cast("long")
        for c in probe:
            eq = (F.col(f"__a_{c}").isNotNull()
                  & F.col(f"__b_{c}").isNotNull()
                  & (F.col(f"__a_{c}") == F.col(f"__b_{c}")))
            hit = eq if hit is None else (hit & eq)
            adv = adv + F.when(hit, F.lit(cov)).otherwise(F.lit(0))
        cur = (cur
               .withColumn("__acc", F.col("__acc") + adv)
               .withColumn("__ia", F.col("__ia") + adv)
               .withColumn("__ib", F.col("__ib") + adv)
               .drop("__rda", "__rpa", "__rdb", "__rpb",
                     *[f"__{s}_{c}" for s in ("a", "b") for c in probe]))
        if (i + 1) % levels_per_ckpt == 0 or i == len(levels) - 1:
            cur = cur.localCheckpoint(eager=True)
    return (cur.withColumn(
        out, F.least(F.col("__acc"),
                     F.col("__la") - F.col("pa"),
                     F.col("__lb") - F.col("pb")).cast("long"))
        .drop("__acc", "__ia", "__ib", "__la", "__lb"))


def repeated_span_profile(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          min_len: int = 8) -> DataFrame:
    """EXACT longest-repeated-span profile with ZERO suffix
    materialization — the lake-scale form of the ExactSubstr signal
    (Lee et al. 2022): per position, the longest span starting there
    that also occurs elsewhere in the corpus, reported where
    >= ``min_len`` tokens.

    Suffix-array identity: that length is max(LCP with the
    rank-predecessor suffix, LCP with the rank-successor, full
    remaining length when the whole suffix repeats).  Here the ranks
    come from the prefix-doubling ladder (:func:`suffix_rank_levels`)
    and BOTH neighbor LCPs from binary decomposition over the same
    ladder (:func:`lcp_from_levels`) — no suffix slice is ever built,
    so the DATA cost is O(N log L) rows end to end, independent of
    document length (the materialized-slice form the oracle runs is
    O(Σ per-doc L²/2)).

    Honest local-mode caveat (SCALING.md round 7): the form runs
    ~2·log₂ L sequential materialized jobs, and in local[32] each
    eager materialization carries a 10-30 s floor unrelated to data
    volume — so at fixture scale the materialized and CAPPED forms
    are faster, and the production recommendation for the CUT remains
    the capped profile (identical cut output).  This form is the
    EXACT-rep_len option: its per-level cost is flat in document
    length, which pays off only where per-job overhead amortizes
    (real clusters, very long documents).

    Returns (id_col, pos INT, rep_len INT) — identical rows to the
    ``repeated_spans`` registry query and its DuckDB direct-sort
    oracle (hash-matched as ``repeated_spans_scalable``)."""
    levels, _ = suffix_rank_levels(docs, id_col=id_col,
                                   text_col=text_col)
    final = levels[-1][1]
    cls = (final.groupBy("r")
           .agg(F.count("*").alias("class_n"),
                F.min(F.struct(F.col(id_col), F.col("pos")))
                .alias("rep"))
           .localCheckpoint(eager=True))
    lo = cls.select(F.col("r").alias("r_lo"),
                    F.col("rep")[id_col].alias("da"),
                    F.col("rep")["pos"].alias("pa"))
    hi = cls.select((F.col("r") - 1).alias("r_lo"),
                    F.col("rep")[id_col].alias("db"),
                    F.col("rep")["pos"].alias("pb"))
    pairs = lo.join(hi, "r_lo")        # adjacent rank classes
    lcps = lcp_from_levels(pairs, levels, id_col=id_col, out="lcp")
    per_class = (lcps.select(F.col("r_lo").alias("r"), "lcp")
                 .unionByName(lcps.select(
                     (F.col("r_lo") + 1).alias("r"), "lcp"))
                 .groupBy("r").agg(F.max("lcp").alias("adj_lcp")))
    lens = (levels[0][1].groupBy(id_col)
            .agg((F.max("pos") + 1).alias("__ntok")))
    out = (final
           .join(cls.select("r", "class_n"), "r")
           .join(per_class, "r", "left")
           .join(lens, id_col)
           .withColumn("rep_len", F.greatest(
               F.coalesce(F.col("adj_lcp"), F.lit(0)),
               F.when(F.col("class_n") >= 2,
                      F.col("__ntok") - F.col("pos"))
               .otherwise(F.lit(0))))
           .where(F.col("rep_len") >= min_len))
    return out.select(id_col, F.col("pos").cast("int").alias("pos"),
                      F.col("rep_len").cast("int").alias("rep_len"))
