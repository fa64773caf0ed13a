"""Corpus-wide suffix ranking by distributed prefix doubling — the
index behind exact-substring training-data dedup (Lee et al., 2022,
"Deduplicating Training Data Makes Language Models Better", which
builds a suffix array over the whole corpus to find long repeated
spans).  Single-node suffix-array construction dies at lake scale;
the published distributed answer is prefix doubling (Flick & Aluru,
SC'15): rank all suffixes by their first token, then repeatedly
re-rank by the PAIR (rank of first 2^k tokens, rank of next 2^k) —
after ⌈log₂ L⌉ rounds ranks are final.  Every round is DataFrame ops:
one self-join on shifted positions and one corpus-wide dense rank.

The corpus-wide dense rank is the scale hazard: ``Window.orderBy``
with no partition key serializes the corpus through ONE task.  It is
implemented here as the two-phase range-partitioned form instead
(``dense_rank_scalable``): distinct keys → ``repartitionByRange`` (a
total order across partitions with equal keys co-located) → per-
partition local rank + a partition-count-sized offset table collected
to the driver.  Result is independent of the partition count
(test-pinned) and never moves the corpus through one task.

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
                        with_count: bool = False):
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
    """
    d = df.select(*cols).distinct()
    if num_partitions:
        d = d.repartitionByRange(num_partitions, *cols)
    else:
        d = d.repartitionByRange(*cols)
    d = (d.sortWithinPartitions(*cols)
         .withColumn("__pid", F.spark_partition_id()))
    w = Window.partitionBy("__pid").orderBy(*cols)
    # PIN the ranked partitions before anything consumes them twice:
    # repartitionByRange picks its bounds by SAMPLING, re-sampled on
    # every recomputation — without the checkpoint the offset collect
    # and the later join would each recompute the lineage and could
    # see DIFFERENT partition boundaries, silently corrupting the
    # global rank (observed at 270 k keys; invisible at toy sizes
    # where both samplings land the same bounds)
    d = d.withColumn("__lr", F.row_number().over(w)) \
        .localCheckpoint(eager=True)
    sizes = {r["__pid"]: r["n"] for r in
             d.groupBy("__pid").agg(F.max("__lr").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    ranked = d.select(
        *cols, (F.col("__lr") + off[F.col("__pid")]).cast("long").alias(out))
    # eqNullSafe, not bare column equality: a NULL key tuple WAS
    # ranked (NULLS FIRST), but a null-unsafe equi-join would hand
    # its source rows a NULL rank instead of the rank it earned
    cond = None
    for c in cols:
        term = df[c].eqNullSafe(ranked[c])
        cond = term if cond is None else cond & term
    joined = df.join(ranked, cond, "left").drop(*[ranked[c] for c in cols])
    return (joined, acc) if with_count else joined


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
    if prefix_cap is not None and prefix_cap & (prefix_cap - 1):
        raise ValueError("prefix_cap must be a power of two")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), " +"),
                     lambda t: t != ""))
        .alias("pos", "tok"))
    r, n_distinct = dense_rank_scalable(toks, ["tok"], out="r",
                                        with_count=True)
    r = r.select(id_col, "pos", "r").localCheckpoint(eager=True)
    stats = toks.groupBy(id_col).count() \
        .agg(F.max("count").alias("mx"), F.sum("count").alias("n")) \
        .collect()[0]
    max_len, n_total = stats.mx or 0, stats.n or 0
    if prefix_cap is not None:
        max_len = min(max_len, prefix_cap)
    k = 1
    for _ in range(max_rounds):
        if n_distinct >= n_total or k >= max_len:
            break
        nxt = r.select(F.col(id_col).alias("__id2"),
                       (F.col("pos") - k).alias("__p2"),
                       F.col("r").alias("r2"))
        paired = (r.join(nxt, (F.col(id_col) == F.col("__id2"))
                         & (F.col("pos") == F.col("__p2")), "left")
                  .select(id_col, "pos", "r",
                          F.coalesce("r2", F.lit(-1)).alias("r2")))
        r2, n_distinct = dense_rank_scalable(paired, ["r", "r2"],
                                             out="nr", with_count=True)
        r = (r2.select(id_col, "pos", F.col("nr").alias("r"))
             .localCheckpoint(eager=True))
        k *= 2
    return r.select(id_col, F.col("pos").cast("int").alias("pos"),
                    F.col("r").cast("long").alias("suffix_rank"))
