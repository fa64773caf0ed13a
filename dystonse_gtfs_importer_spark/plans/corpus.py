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

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import sql_shared as S
from ..operators.dedup import (
    dedup_keep_canonical,
    grouped_split,
    minhash_lsh_pairs,
)


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
                 embedding_threshold: float = 0.92,
                 exactsubstr_min_len: int | None = None) -> DataFrame:
    """The full cleaning pass. Returns surviving documents with
    annotation columns; order of operations mirrors production
    pipelines (cheap exact dedup before quadratic-ish near-dup, then
    optional shift-robust winnowing and semantic embedding tiers).
    ``exactsubstr_min_len`` additionally excises cross-document
    repeated SPANS of at least that many tokens from surviving
    non-owner documents (operators/dedup.exactsubstr_excise, the
    capped Lee-et-al cut) BEFORE annotation, so token counts and
    quality gates see the post-cut text."""
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
    if exactsubstr_min_len is not None:
        from ..operators.dedup import exactsubstr_excise

        step2 = exactsubstr_excise(step2,
                                   min_len=exactsubstr_min_len)
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


# ---------------------------------------------------------------------------
# Training-set preparation: DSIR weighting + leakage-safe split +
# weight-ordered budget selection (round 5, second batch)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256


def dsir_weight(docs: DataFrame, is_target: F.Column,
                text_col: str = "text", id_col: str = "doc_id",
                buckets: int = DSIR_BUCKETS,
                n_tok_col: str | None = None) -> DataFrame:
    """DataFrame form of hashed-unigram importance resampling (DSIR,
    Xie et al. 2023) — annotates ``docs`` with ``dsir_weight_e4``
    (and, if ``n_tok_col`` is given, the token count).

    Same math as ``functions/sampling_sql.q_dsir_weights`` (parity
    pinned in test_corpus): word unigrams hash into a FIXED
    ``buckets``-wide feature space, the add-one-smoothed target/
    background log-ratio table is corpus-size-independent →
    broadcast, and each document's weight is the integer dot product
    of its per-bucket counts with the once-rounded integer 1e-4
    log-ratios — BIGINT-exact under any accumulation order, so
    weights reproduce bit-identically across retries/partitionings.

    Fact-scan discipline: the corpus is tokenized ONCE — the
    per-(doc, bucket) count table (persisted, ≤ docs×buckets rows)
    feeds BOTH the ratio-table derivation (re-aggregation, no second
    corpus pass) and the scoring dot product; the final join back to
    ``docs`` reads no text.

    ``is_target`` is any boolean Column over ``docs`` (a lang label, a
    source allowlist, a classifier verdict...); NULL counts as
    background, matching the SQL form's CASE."""
    from pyspark.storagelevel import StorageLevel

    b = int(buckets)
    # explode+WHERE, not the filter() HOF: array lambdas fall out of
    # whole-stage codegen (~1.6x slower on the 500 k-doc replica)
    toks = (docs
            .select(F.col(id_col),
                    is_target.cast("boolean").alias("_tgt"),
                    F.expr(S.SPARK.explode_tokens(text_col))
                    .alias("tok"))
            .where(F.col("tok") != "")
            .withColumn("bucket", F.expr(
                f"CAST(conv(substring(md5(tok), 1, 8), 16, 10) "
                f"AS BIGINT) % {b}")))
    # _tgt is constant per document, so grouping by it costs nothing
    dbc = (toks.groupBy(id_col, "_tgt", "bucket")
           .agg(F.count("*").alias("n"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    counts = dbc.groupBy("bucket").agg(
        F.sum(F.when(F.col("_tgt"), F.col("n")).otherwise(0)).alias("c_t"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(F.col("n"))).alias("c_b"))
    tot = counts.agg(F.sum("c_t").alias("t_tot"),
                     F.sum("c_b").alias("g_tot"))
    # CAST AS DOUBLE before the smoothing arithmetic: Spark types the
    # bare `c_t + 1.0` as DECIMAL and the division as decimal(38,6),
    # quantizing the ratio to 6 decimals before LN — DuckDB evaluates
    # the same text as pure IEEE double, so lr_e4 could diverge by a
    # whole unit on background-skewed buckets
    ratio = (counts.crossJoin(F.broadcast(tot))
             .select("bucket", F.expr(
                 f"CAST(ROUND(LN(((CAST(c_t AS DOUBLE) + 1.0) "
                 f"* (g_tot + {b})) "
                 f"/ ((CAST(c_b AS DOUBLE) + 1.0) "
                 f"* (t_tot + {b}))) * 1e4) AS BIGINT)"
             ).alias("lr_e4")))
    scored = (dbc.join(F.broadcast(ratio), "bucket")
              .groupBy(id_col)
              .agg(F.sum(F.col("n") * F.col("lr_e4")).alias("_w"),
                   F.sum("n").alias("_nt")))
    out = (docs.join(scored, id_col, "left")
           .withColumn("dsir_weight_e4",
                       F.coalesce(F.col("_w"), F.lit(0)).cast("long")))
    if n_tok_col is not None:
        out = out.withColumn(
            n_tok_col, F.coalesce(F.col("_nt"), F.lit(0)).cast("long"))
    return out.drop("_w", "_nt")


def prepare_training_set(docs: DataFrame, target_lang: str = "en",
                         token_budget: int | None = None,
                         split_seed: str = "split1",
                         embeddings: DataFrame | None = None,
                         **clean_kwargs) -> DataFrame:
    """The full selection flow downstream of cleaning — what a
    pretraining run consumes:

    1. ``clean_corpus`` (exact dedup → near-dup tiers → annotation →
       quality gate);
    2. DSIR importance weights against the ``target_lang`` corpus;
    3. leakage-safe train/valid/test split, atomic per exact-
       normalized fingerprint family (near-dups were already removed
       in step 1, so the remaining families are the exact-dup
       survivors);
    4. optional per-source token budget, filled best-DSIR-first
       (``kept`` marks the selected set; the budget applies to the
       TRAIN split only — eval sets stay complete).

    Steps 2-4 add one fixed-size broadcast join, one map-only hash
    split, and one per-(source, split) window over budget-ranked
    survivors — nothing quadratic, nothing collected.  If one
    (source, split) cell could outgrow a partition, swap the window
    for the score-band prefix-sum decomposition of
    ``sampling_sql.q_quality_budget_select_scale`` (same trick keyed
    by ``dsir_weight_e4`` bands)."""
    cleaned = clean_corpus(docs, embeddings=embeddings, **clean_kwargs)
    weighted = dsir_weight(cleaned, F.col("lang") == target_lang)
    fam = F.expr(
        "md5(trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', ''), ' +', ' ')))")
    split = grouped_split(weighted.withColumn("_fam", fam), "_fam",
                          seed=split_seed).drop("_fam")
    if token_budget is None:
        return split.withColumn("kept", F.lit(1))
    from pyspark.sql.window import Window

    w = (Window.partitionBy("source", "split")
         .orderBy(F.col("dsir_weight_e4").desc(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    return split.withColumn(
        "kept",
        F.when(F.col("split") != "train", F.lit(1))
         .when(cum <= F.lit(token_budget), F.lit(1))
         .otherwise(F.lit(0)))


def selection_report(selected: DataFrame) -> dict:
    """Accounting of a ``prepare_training_set`` run (driver-sized
    scalars): per split — documents seen/kept, tokens kept, and the
    kept-set DSIR weight range.  One aggregate job."""
    rows = (selected.groupBy("split").agg(
        F.count("*").alias("docs"),
        F.sum("kept").alias("docs_kept"),
        F.sum(F.when(F.col("kept") == 1, F.col("n_tokens"))
              .otherwise(0)).alias("tokens_kept"),
        F.min(F.when(F.col("kept") == 1, F.col("dsir_weight_e4")))
        .alias("w_min_e4"),
        F.max(F.when(F.col("kept") == 1, F.col("dsir_weight_e4")))
        .alias("w_max_e4")).collect())
    return {r.split: {
        "docs": r.docs,
        "docs_kept": int(r.docs_kept),
        "tokens_kept": int(r.tokens_kept),
        "dsir_weight_e4_range": (
            None if r.w_min_e4 is None
            else (int(r.w_min_e4), int(r.w_max_e4))),
    } for r in rows}


def source_kl(docs: DataFrame, group_col: str = "source",
              text_col: str = "text") -> DataFrame:
    """Per-group unigram KL(group ‖ corpus) — the distribution-shift
    screen run before mixing corpora into a training set.  DataFrame
    form of ``functions/sampling_sql.q_source_kl_divergence`` (same
    integer micro-nat contract; parity pinned in test_corpus).

    Fact-scan discipline: the corpus is tokenized ONCE — the persisted
    ``(group, tok)`` count table feeds the group totals, the token
    totals, the grand total, AND the log-ratio cells (the SQL
    rendering's CTEs would each re-tokenize under Spark inlining).
    Everything after the one fact shuffle is vocabulary-sized; the
    group-level and grand totals broadcast.  ``LN`` is rounded once
    per (group, tok) cell to integer micro-nats, so the final reduce
    is BIGINT-exact under any accumulation order."""
    from pyspark.storagelevel import StorageLevel

    # explode+WHERE, not the filter() HOF: array lambdas fall out of
    # whole-stage codegen (~1.6x slower on the 500 k-doc replica)
    toks = (docs.select(
        F.col(group_col).alias("grp"),
        F.expr(S.SPARK.explode_tokens(text_col)).alias("tok"))
        .where(F.col("tok") != ""))
    sw = (toks.groupBy("grp", "tok").agg(F.count("*").alias("c"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    s_tot = sw.groupBy("grp").agg(F.sum("c").alias("n_s"),
                                  F.count("*").alias("vocab_s"))
    w_tot = sw.groupBy("tok").agg(F.sum("c").alias("c_w"))
    g_tot = sw.agg(F.sum("c").alias("n_g"))
    lnr = (sw.join(F.broadcast(s_tot), "grp")
           .join(w_tot, "tok")
           .crossJoin(F.broadcast(g_tot))
           .select("grp", "n_s", "vocab_s", "c", F.expr(
               "CAST(ROUND(LN((CAST(c AS DOUBLE) * n_g)"
               " / (CAST(n_s AS DOUBLE) * c_w)) * 1e6) AS BIGINT)"
           ).alias("ln_e6")))
    return (lnr.groupBy("grp", "n_s", "vocab_s")
            .agg(F.sum(F.col("c") * F.col("ln_e6")).alias("s_e6"))
            .select(F.col("grp").alias(group_col),
                    F.col("n_s").cast("long").alias("n_tok"),
                    F.col("vocab_s").cast("long").alias("vocab"),
                    F.expr("CAST(ROUND(CAST(s_e6 AS DOUBLE) / n_s)"
                           " AS BIGINT)").alias("kl_e6")))


# ---------------------------------------------------------------------------
# shard preparation: seeded shuffle -> token-budget shards -> atomic
# manifest (the step between selection and the training loader)
# ---------------------------------------------------------------------------

SHARD_TOKENS_DEFAULT = 2_000
_POS_BAND = 65_536  # positions per prefix-sum band (tiny offsets table)


def shard_assignments(docs: DataFrame,
                      shard_tokens: int = SHARD_TOKENS_DEFAULT,
                      seed: str = "shuf1",
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """``docs`` plus (position, n_tokens, shard_id): every document
    gets a seeded-shuffle position (q_seeded_shuffle's banded
    two-phase numbering — no corpus-wide window), then contiguous
    ~``shard_tokens``-token shards in position order.

    The running token total over positions is the SECOND two-phase
    prefix sum: positions are contiguous integers, so fixed-width
    position bands are order-aligned by construction; cum =
    within-band running sum + the band's offset from a
    |corpus|/65536-row totals table (broadcast back).  A document's
    shard is the budget-bucket of its starting offset — deterministic
    and identical for ANY input partitioning, which is what makes the
    manifest fingerprints replayable.

    100 TB shape: one md5-bucket shuffle (positions), one doc_id join,
    one band shuffle; the offsets tables are corpus/65536-sized.  No
    single-partition window touches corpus-scale data."""
    import uuid

    from pyspark.sql.window import Window

    from ..functions import sampling_sql as SAMP

    spark = docs.sparkSession
    view = f"__shard_docs_{uuid.uuid4().hex[:12]}"
    docs.select(F.col(id_col).alias("doc_id")).createOrReplaceTempView(view)
    pos = spark.sql(SAMP.q_seeded_shuffle(S.SPARK, seed=seed,
                                          doc_table=view))
    spark.catalog.dropTempView(view)
    sized = docs.withColumn(
        "n_tokens",
        F.expr(f"size(filter(split(lower({text_col}), ' +'), "
               f"t -> t <> ''))").cast("long"))
    joined = (sized.join(pos, sized[id_col] == pos["doc_id"], "inner")
              .drop(pos["doc_id"])
              .withColumn("band", F.expr(f"position DIV {_POS_BAND}")))
    w_in = (Window.partitionBy("band").orderBy("position")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_off = (Window.orderBy("band")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (joined.groupBy("band")
               .agg(F.sum("n_tokens").alias("band_tokens"))
               .withColumn("off", F.coalesce(
                   F.sum("band_tokens").over(w_off), F.lit(0)))
               .select("band", "off"))
    return (joined
            .withColumn("cum_in_band", F.sum("n_tokens").over(w_in))
            .join(F.broadcast(offsets), "band")
            .withColumn("cum_tokens",
                        (F.col("off") + F.col("cum_in_band")).cast("long"))
            .withColumn("shard_id",
                        F.expr(f"(cum_tokens - n_tokens) DIV {shard_tokens}")
                        .cast("long"))
            .drop("band", "cum_in_band", "off"))


def shard_stats(assigned: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per shard: document count, token count, and an order-insensitive
    content fingerprint (sum of 32-bit md5 prefixes of doc_id#text —
    commutative, so identical under any partitioning / replay)."""
    fp = F.expr(
        f"CAST(CONV(SUBSTRING(MD5(CONCAT(CAST({id_col} AS STRING), "
        f"'#', {text_col})), 1, 8), 16, 10) AS BIGINT)")
    return (assigned.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(fp).cast("long").alias("content_fp")))


MAX_INLINE_SHARDS = 100_000  # manifest-inline shard-table ceiling


def prepare_shards(docs: DataFrame, out_root: str,
                   shard_tokens: int = SHARD_TOKENS_DEFAULT,
                   seed: str = "shuf1", batch_id: int | None = 1,
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   max_inline_shards: int = MAX_INLINE_SHARDS) -> dict:
    """The CLI-reachable shard writer: seeded shuffle -> token-budget
    shard assignment -> snapshot-atomic publish (SnapshotStore), with
    per-shard token counts and content fingerprints recorded ON the
    manifest so a training loader can verify and budget shards without
    opening data files.

    Deterministic end to end: the manifest's shard table is a pure
    function of (corpus, seed, shard_tokens) — identical across input
    partition counts and across replays (same ``batch_id`` re-commits
    are no-ops; a fresh run reproduces byte-identical fingerprints).
    Returns the accounting dict (shard table + totals + whether this
    call committed).

    SCALE GUARD: the shard table has total_tokens / shard_tokens
    rows — at 100 TB with a small budget that is far beyond what a
    JSON manifest (or the driver) should hold, so above
    ``max_inline_shards`` the table goes to a PARQUET SIDE-TABLE
    under ``<root>/shard_stats/`` and the manifest records only its
    path + the totals (computed by one tiny aggregate — nothing
    shard-table-sized ever reaches the driver).  Production shard
    budgets are 1e8-1e9 tokens, which keeps even exabyte corpora
    inline; the guard exists for small-budget runs.  A replay with
    the committed ``batch_id`` is detected BEFORE the side-table
    write, so retries leave no orphans."""
    from ..sources.snapshot import SnapshotStore

    store = SnapshotStore(out_root, ["shard_id"])
    if batch_id is not None and batch_id == store.last_batch_id():
        m = store.manifest()  # extra keys live at manifest top level
        return {"committed": False,
                "n_shards": m.get("n_shards"),
                "total_docs": m.get("total_docs"),
                "total_tokens": m.get("total_tokens"),
                **({"shards": m["shards"]} if "shards" in m else
                   {"shards_path": m.get("shards_path")})}

    # stats and the write both consume the assignment pipeline —
    # persist so the shuffle + prefix-sum chain runs once, not twice
    # (deterministic either way, but 2x the work at scale)
    assigned = shard_assignments(docs, shard_tokens=shard_tokens,
                                 seed=seed, id_col=id_col,
                                 text_col=text_col).persist()
    try:
        stats_df = shard_stats(assigned, id_col, text_col)
        tot = stats_df.agg(
            F.count("*").alias("n"), F.sum("n_docs").alias("d"),
            F.sum("n_tokens").alias("t")).collect()[0]
        totals = {"n_shards": int(tot["n"] or 0),
                  "total_docs": int(tot["d"] or 0),
                  "total_tokens": int(tot["t"] or 0)}
        extra = {"seed": seed, "shard_tokens": shard_tokens, **totals}
        result: dict = {**totals}
        if totals["n_shards"] <= max_inline_shards:
            shard_table = [
                {"shard_id": s, "n_docs": d, "n_tokens": t,
                 "content_fp": f}
                for s, d, t, f in sorted(
                    (r["shard_id"], r["n_docs"], r["n_tokens"],
                     r["content_fp"]) for r in stats_df.collect())]
            extra["shards"] = shard_table
            result["shards"] = shard_table
        else:
            side = f"shard_stats/b{batch_id}"
            # no global sort / single-task funnel: the side table is
            # shard-table-sized by definition; readers sort on read
            (stats_df.write.mode("overwrite")
             .parquet(str(Path(out_root) / side)))
            extra["shards_path"] = side
            result["shards_path"] = side
        committed = store.commit(assigned, batch_id=batch_id,
                                 extra=extra)
    finally:
        assigned.unpersist()
    return {"committed": committed, **result}


def apply_mixture(docs: DataFrame, budget: int,
                  epoch_cap_e6: int | None = None,
                  seed: str = "mix1",
                  id_col: str = "doc_id", text_col: str = "text",
                  id_stride: int = 10**12,
                  quality_weighted: bool = False) -> DataFrame:
    """Materialize a `q_mixture_weights` solve: each source repeated
    ``floor(epochs)`` whole times plus a deterministic hash-Bernoulli
    document slice for the fractional epoch — the resample step
    between the mixture solver and :func:`prepare_shards`.

    Fractional epochs select documents whose seeded-md5 32-bit prefix
    falls below ``frac * 2^32 / 1e6`` (integer threshold, map-only,
    retry-safe) — token-accurate in expectation at document grain,
    the standard DSIR/temperature resampling granularity.  Each
    repeat gets a fresh unique id (``doc_id + epoch * id_stride``,
    ``id_stride`` above the corpus id range) so the downstream
    seeded-shuffle machinery keeps distinct positions per copy; the
    ``epoch`` column preserves lineage.

    ``quality_weighted=True`` runs the COMPOSED solve instead
    (q_quality_weighted_mixture, round 10): rates come from each
    source's quality-ELIGIBLE token mass, and the resample draws only
    from documents scoring at or above the calibration's global
    median — the quality-weighted pretraining mixture built from the
    two individually-verified pieces.

    Scale shape: ONE corpus scan for the solver's per-source
    aggregate, then a broadcast join of the |sources|-row rate table
    and a map-only explode/filter — no corpus shuffle at all (the
    quality gate adds one scalar predicate against a one-row
    broadcast cutpoint, still map-only)."""
    import uuid

    from ..functions import sampling_sql as SAMP

    if epoch_cap_e6 is None:
        epoch_cap_e6 = SAMP.MIX_EPOCH_CAP_E6
    spark = docs.sparkSession
    view = f"__mix_docs_{uuid.uuid4().hex[:12]}"
    docs.select(F.col(id_col).alias("doc_id"), F.col("source"),
                F.col(text_col).alias("text")) \
        .createOrReplaceTempView(view)
    solver = (SAMP.q_quality_weighted_mixture if quality_weighted
              else SAMP.q_mixture_weights)
    # ONE solve: the |sources|-row result collects once; the rate
    # table rebuilds from those rows (broadcast-sized by definition)
    # and — quality-weighted — the gate cutpoint rides the solver's
    # own gp50_e4 column instead of a second corpus scan
    mix_rows = spark.sql(solver(
        S.SPARK, budget=budget, epoch_cap_e6=epoch_cap_e6,
        doc_table=view)).collect()
    spark.catalog.dropTempView(view)
    if quality_weighted and mix_rows:
        q = SAMP.S.quality_score(text_col, S.SPARK)
        gcut = mix_rows[0].gp50_e4
        docs = docs.where(
            F.expr(f"CAST(ROUND({q} * 10000) AS BIGINT)") >= gcut)
    rates = spark.createDataFrame(
        [(r.source, r.epochs_e6 // 1_000_000,
          (r.epochs_e6 % 1_000_000) * 4294967296 // 1_000_000)
         for r in mix_rows],
        "source string, _full long, _thr long")
    u32 = (f"CAST(CONV(SUBSTRING(MD5(CONCAT('{seed}#', "
           f"CAST({id_col} AS STRING))), 1, 8), 16, 10) AS BIGINT)")
    return (docs.join(F.broadcast(rates), ["source"])
            .select(*docs.columns, "_full", "_thr",
                    F.expr("explode(sequence(0, _full))").alias("epoch"))
            .where((F.col("epoch") < F.col("_full"))
                   | (F.expr(u32) < F.col("_thr")))
            .withColumn(id_col,
                        (F.col(id_col)
                         + F.col("epoch") * F.lit(id_stride))
                        .cast("long"))
            .drop("_full", "_thr"))


def corpus_diff(old: DataFrame, new: DataFrame,
                id_col: str = "doc_id", text_col: str = "text",
                source_col: str = "source") -> DataFrame:
    """Snapshot diff of two corpus tables, summarized per (source,
    status in added/removed/changed/unchanged) with doc and token
    counts — the DataFrame twin of the `q_corpus_diff` oracle
    fixture (same join + comparison semantics; the oracle simulates
    its v2 in-query so the driver witnesses all four statuses).

    One FULL OUTER equi-join on the id (co-partitioned corpus
    shuffle), direct text inequality, then a (sources x 4)-row
    aggregate."""
    a = old.select(F.col(id_col).alias("doc_id"),
                   F.col(source_col).alias("src_a"),
                   F.col(text_col).alias("text_a"))
    b = new.select(F.col(id_col).alias("doc_id"),
                   F.col(source_col).alias("src_b"),
                   F.col(text_col).alias("text_b"))
    diff = (a.join(b, ["doc_id"], "full_outer")
            .select(
                F.coalesce("src_b", "src_a").alias("source"),
                F.when(F.col("text_a").isNull(), "added")
                .when(F.col("text_b").isNull(), "removed")
                .when(F.col("text_a") != F.col("text_b"), "changed")
                .otherwise("unchanged").alias("status"),
                F.coalesce("text_b", "text_a").alias("txt")))
    return (diff.groupBy("source", "status")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.expr("sum(size(filter(split(lower(txt), ' +'), "
                        "t -> t <> '')))").cast("long")
                 .alias("n_tokens")))
