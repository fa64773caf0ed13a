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
    Ties break (count DESC, a ASC, b ASC) — deterministic."""
    n = F.size("syms")
    pairs = (syms.where(n >= 2)
             .select("cnt", F.explode(F.arrays_zip(
                 F.slice("syms", 1, n - 1).alias("a"),
                 F.slice("syms", 2, n - 1).alias("b"))).alias("p"))
             .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
             .agg(F.sum("cnt").alias("c"))
             .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
             .limit(1).collect())
    if not pairs:
        return None
    r = pairs[0]
    return (r.a, r.b, r.c)


def _apply_merge(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b —
    the BPE merge semantics (in 'aaa' with merge (a,a), the LEFT pair
    merges).  Arrow-batched; runs on the vocabulary table, not the
    corpus, so the Python hop is off the fact path."""

    @pandas_udf(ArrayType(StringType()))
    def merge_udf(col: pd.Series) -> pd.Series:
        ab = a + b

        def m(seq):
            out = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq)
                        and seq[i] == a and seq[i + 1] == b):
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        return col.map(m)

    return syms.select("cnt", merge_udf("syms").alias("syms"))


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
