"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
vocabulary-induction step a training-data pipeline runs before token
counting and shard packing.

The Spark shape exploits BPE's two-scale structure: the CORPUS is
touched exactly once (word → count aggregation); every merge round
then runs on the word-count table, which is vocabulary-sized (10⁶-10⁸
rows for web corpora — a DataFrame, but orders of magnitude below the
corpus).  Per round: one adjacent-pair aggregation (JVM arrays_zip
over the symbol arrays, weighted by word count), a 1-row collect of
the argmax pair (driver-side by design, like the reference's U2
greedy — the result is a scalar), and an Arrow-batched merge-apply
over the symbol arrays.  Lineage is truncated with localCheckpoint
every few rounds (the graph.py iterative pattern) so n_merges rounds
don't accumulate an n_merges-deep plan.

Determinism: the argmax pair breaks ties by (count DESC, pair ASC),
so the merge sequence is a pure function of the corpus.  Parity with
a reference single-process BPE implementation is pinned in
tests/test_bpe.py.

Reference anchor: LLM-pipeline extension (SURVEY.md LLM ops) — the
reference engine has no tokenizer tier; text ops follow the
dedup/sampling families' conventions.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

END_MARK = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: lowercase whitespace words → counts.  The only
    corpus-scale stage of training; everything after runs on this
    vocabulary-sized table."""
    return (docs.select(F.explode(F.split(F.lower(F.col(text_col)),
                                          " +")).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w").agg(F.count("*").alias("cnt")))


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word → array of single characters + the end-of-word marker."""
    return words.select(
        "cnt",
        F.concat(F.split(F.col("w"), ""),
                 F.array(F.lit(END_MARK))).alias("syms"))


def _top_pair(syms: DataFrame) -> tuple[str, str, int] | None:
    """Most frequent adjacent symbol pair, weighted by word count.
    Ties break (count DESC, a ASC, b ASC) — deterministic.

    The argmax is a single-row MIN over ``struct(-c, a, b)`` (struct
    ordering is field-by-field, so smallest −c = largest count, then
    a ASC, b ASC — exactly the ORDER BY it replaces): the final pick
    folds into the pair aggregation as a map-side-partial aggregate
    instead of a separate TakeOrdered pass over the grouped pairs
    (r13, guide §1.2 — one less pass per merge round)."""
    n = F.size("syms")
    row = (syms.where(n >= 2)
           .select("cnt", F.explode(F.arrays_zip(
               F.slice("syms", 1, n - 1).alias("a"),
               F.slice("syms", 2, n - 1).alias("b"))).alias("p"))
           .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
           .agg(F.sum("cnt").alias("c"))
           .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                               F.col("a"), F.col("b"))).alias("m"))
           .collect()[0]["m"])
    if row is None:
        return None
    return (row.a, row.b, -row.nc)


def _apply_merge(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b —
    the BPE merge semantics (in 'aaa' with merge (a,a), the LEFT pair
    merges).

    Runs as a JVM ``aggregate`` fold (r13, guide §4.1 built-ins over
    UDFs — the pandas UDF paid a Python worker round-trip per merge
    round, stacking up to ``checkpoint_every`` ArrowEvalPython nodes
    in every round's plan).  The fold is equivalent to the indexed
    while-loop: it merges each adjacent pair whose LEFT element was
    not consumed by a previous merge, and a freshly merged token
    ``a+b`` can never equal ``a`` (``b`` is non-empty), so a merged
    output is never re-merged as a left element — pinned against the
    Python form in tests/test_bpe.py."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    merged = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(lab)))
        .otherwise(F.concat(acc, F.array(x))))
    return syms.select("cnt", merged.alias("syms"))


def bpe_train(docs: DataFrame, n_merges: int,
              text_col: str = "text",
              checkpoint_every: int = 8) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    order.  Stops early when no adjacent pair remains."""
    syms = _initial_symbols(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = _top_pair(syms)
        if top is None:
            break
        a, b, _ = top
        merges.append((a, b))
        syms = _apply_merge(syms, a, b)
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint()
    return merges


def bpe_segment_expr(merges: list[tuple[str, str]]):
    """Encoder for learned merges, as a pandas UDF usable on the full
    corpus: word → BPE token array.  Applies the merge list in
    training order (standard BPE encoding)."""

    @pandas_udf(ArrayType(StringType()))
    def encode_udf(words: pd.Series) -> pd.Series:
        def enc(w):
            seq = list(w) + [END_MARK]
            for a, b in merges:
                out = []
                i = 0
                while i < len(seq):
                    if (i + 1 < len(seq)
                            and seq[i] == a and seq[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            return seq

        return words.map(enc)

    return encode_udf


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text") -> DataFrame:
    """Corpus token histogram under a learned BPE vocabulary: one
    corpus pass for word counts, then the (small) word table is
    encoded and the counts re-aggregated per BPE token."""
    enc = bpe_segment_expr(merges)
    wc = word_counts(docs, text_col)
    return (wc.select("cnt", F.explode(enc("w")).alias("token"))
            .groupBy("token").agg(F.sum("cnt").alias("cnt")))
