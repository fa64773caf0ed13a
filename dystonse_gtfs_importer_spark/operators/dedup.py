"""Dedup operators as DataFrame→DataFrame functions.

Thin wrappers that run the dialect-rendered templates from
functions.dedup_sql over temp views — one implementation, provably
oracle-identical (the DuckDB twin renders from the same template).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import dedup_sql as D
from ..functions import sql_shared as S


def _run(df: DataFrame, sql_template, view: str = "documents") -> DataFrame:
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(sql_template(S.SPARK))


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: (content_hash, canonical_doc,
    n_copies)."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias("canonical_doc"),
                 F.count("*").alias("n_copies")))


def dedup_keep_canonical(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Drop exact duplicates, keeping the min-id row per content hash —
    the apply-side of exact_dedup (one hash shuffle)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (docs.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """MinHash+LSH candidate pairs with signature-agreement estimate."""
    return _run(docs, D.q_minhash_lsh_pairs)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """16-bit SimHash fingerprints per document."""
    return _run(docs, D.q_simhash)


def simhash_near_pairs(docs: DataFrame, banded: bool = True) -> DataFrame:
    """Near-duplicate pairs at hamming distance <= 3.  Default is the
    banded scale path (band equi-join, lossless by pigeonhole);
    ``banded=False`` runs the quadratic oracle form."""
    return _run(docs, D.q_simhash_near_pairs_banded if banded
                else D.q_simhash_near_pairs)


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact token-set Jaccard pairs >= threshold."""
    return _run(docs, lambda d: D.q_ngram_jaccard_pairs(d, threshold))


# Above this corpus size the exact PPJoin sweep rung is refused:
# the sweep is a PLANNING read, and on dense-duplicate corpora the
# exact rung's TRUE pair set grows ~n² (SCALING.md measures 183 s vs
# the banded rung's 44 s at sf0.1) — pointing it at a lake by
# accident must fail loudly, not run for a week.  Mirrors the
# table-profile approx-above-threshold default.
SWEEP_EXACT_MAX_DOCS = 1_000_000


def dedup_threshold_sweep(docs: DataFrame, exact: bool = False,
                          max_exact_docs: int = SWEEP_EXACT_MAX_DOCS,
                          ) -> DataFrame:
    """Threshold-sweep planner face with the lake guard (round 10,
    VERDICT r9 #5): the default rung is the banded MinHash ESTIMATE
    (linear-ish, q_dedup_threshold_sweep_lsh — what the CLI
    ``corpus plan-dedup`` rides); ``exact=True`` requests the exact
    PPJoin rung and is honored only while the corpus row count is at
    most ``max_exact_docs`` — above that the call AUTO-DOWNGRADES to
    the banded rung (planner doctrine: sweep on the estimate, pay
    exact once at the committed threshold).  The guard's count() is a
    FULL count job in the general case: cheap on a bare parquet scan
    (footer statistics), but a ``docs`` built over filters/joins runs
    its whole upstream plan here and — when the guard downgrades —
    again inside the sweep.  Callers with an expensive upstream should
    cache ``docs`` (or pass the known row count's rung explicitly via
    ``exact=False``) before invoking a planning sweep."""
    if exact and docs.select("doc_id").count() <= max_exact_docs:
        return _run(docs, D.q_dedup_threshold_sweep)
    return _run(docs, D.q_dedup_threshold_sweep_lsh)


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Per-document winnowing (rolling k-gram) fingerprint counts."""
    return _run(docs, D.q_winnow_fingerprint_stats)


def winnow_near_pairs(docs: DataFrame, min_shared: int = 3) -> DataFrame:
    """Pairs sharing >= min_shared winnowing fingerprints (inverted-
    index equi-join, no all-pairs scan)."""
    return _run(docs, lambda d: D.q_winnow_near_pairs(d, min_shared))


def grouped_split(df: DataFrame, cluster_col: str,
                  weights: tuple[int, ...] = (80, 10, 10),
                  names: tuple[str, ...] = ("train", "valid", "test"),
                  seed: str = "split1") -> DataFrame:
    """Leakage-safe split: the whole cluster — near-dup family
    (graph.connected_components), normalized-fingerprint family, URL
    host, repo, author, whatever groups correlated content — gets ONE
    seeded-hash draw, so correlated documents can never straddle a
    split boundary (the eval-contamination guard).

    Map-only: split = bucket of md5(seed # cluster) — no shuffle, no
    state, reproducible across runs and engines.  The SQL twin over
    exact-normalized families is
    functions/sampling_sql.py::q_leakage_safe_split (driver-verified
    as ``leakage_safe_split``)."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = sum(weights)
    h = (f"pmod(CAST(conv(substring(md5(concat('{seed}#', "
         f"CAST({cluster_col} AS STRING))), 1, 12), 16, 10) AS BIGINT), "
         f"{total})")
    expr, lo = None, 0
    for w, name in zip(weights, names):
        lo += w
        cond = F.expr(h) < F.lit(lo)
        expr = F.when(cond, name) if expr is None \
            else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise(names[-1]))


def exactsubstr_excise(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       min_len: int = 8,
                       prefix_cap: int = 16) -> DataFrame:
    """ExactSubstr span excision as a PIPELINE stage: returns ``docs``
    with cross-document repeated spans (>= ``min_len`` tokens) cut
    out of every non-owner document's ``text_col``, plus
    ``n_spans_cut`` / ``n_tokens_cut`` accounting columns (0 for
    untouched documents).

    Composition of the registered primitives: the cap-truncated
    suffix-rank profile (document-length-independent, O(corpus·cap)
    — the cut is IDENTICAL to the uncapped operator's, see
    oracle_queries._exactsubstr_cut_capped_spark) feeding the shared
    ownership/interval-union/excision tail with ``emit='text'``.
    Matching and ownership run on LOWERCASED tokens (dedup identity),
    but the kept tokens are read from a case-preserving array at the
    same positions (the ' +' split is case-blind), so untouched spans
    keep their original casing; the rewritten text is the kept tokens
    rejoined with single spaces (whitespace runs collapse).  Run this
    BEFORE annotation so token counts and quality scores see the
    post-cut text (plans/corpus.clean_corpus does).

    Lee et al. 2022 §4 anchor; the keeper rule (lowest-doc_id owner
    keeps all its occurrences) matches ``q_span_dedup``."""
    import uuid

    from ..plans.oracle_queries import _suffix_profile_spark_ctes
    from .suffix import suffix_ranks

    spark = docs.sparkSession
    # Per-call view names: concurrent / repeated excisions in one
    # session must not clobber each other's views mid-build, and the
    # views are dropped below once the plans referencing them are
    # analyzed (spark.sql resolves views eagerly at call time).
    tag = uuid.uuid4().hex[:12]
    v_docs, v_sr, v_prof = (f"__esx_docs_{tag}", f"__esx_sr_{tag}",
                            f"__esx_prof_{tag}")
    docs.createOrReplaceTempView(v_docs)
    suffix_ranks(docs, id_col=id_col, text_col=text_col,
                 prefix_cap=prefix_cap) \
        .createOrReplaceTempView(v_sr)
    prof = spark.sql(f"""
        WITH {_suffix_profile_spark_ctes(min_len=min_len,
                                         cap=prefix_cap,
                                         doc_table=v_docs,
                                         sr_table=v_sr)}
        SELECT doc_id, pos, rep_len FROM prof
    """).localCheckpoint(eager=True)
    prof.createOrReplaceTempView(v_prof)
    cut = spark.sql(f"""
        WITH ta AS (
            SELECT {id_col} AS doc_id,
                   filter(split(lower({text_col}), ' +'),
                          t -> t <> '') AS ta,
                   filter(split({text_col}, ' +'),
                          t -> t <> '') AS ta_orig
            FROM {v_docs}
        ),
        prof AS (SELECT * FROM {v_prof}),
        {D.exactsubstr_cut_tail(S.SPARK, min_len=min_len,
                                emit='text', keep_array='ta_orig')}
    """).select(F.col("doc_id").alias("__cut_id"),
                F.col("kept_text"),
                F.col("n_removed").alias("n_tokens_cut"),
                F.col("n_regions").alias("n_spans_cut"))
    for v in (v_docs, v_sr, v_prof):
        spark.catalog.dropTempView(v)
    return (docs.join(cut, docs[id_col] == F.col("__cut_id"), "left")
            .withColumn(text_col, F.coalesce("kept_text",
                                             F.col(text_col)))
            .withColumn("n_spans_cut",
                        F.coalesce("n_spans_cut", F.lit(0))
                        .cast("long"))
            .withColumn("n_tokens_cut",
                        F.coalesce("n_tokens_cut", F.lit(0))
                        .cast("long"))
            .drop("__cut_id", "kept_text"))
