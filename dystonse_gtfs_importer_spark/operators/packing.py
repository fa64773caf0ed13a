"""Training-sequence packing: assign whole documents to fixed-length
token sequences so the padding budget measured by
``functions/decontam_sql.q_packing_efficiency`` is actually recovered.

The packer is next-fit-decreasing within bounded position bands:

* **band-parallel** — bands are ``band_docs``-wide slices of the
  seeded-md5 dense position (`q_seeded_shuffle`'s banded two-phase
  numbering), so every band holds EXACTLY ``band_docs`` documents
  for ANY id distribution and at 100 TB every band packs
  independently (one md5-bucket shuffle for the position, one band
  shuffle, then one bounded Arrow batch per band; parallelism =
  |corpus| / band_docs, no cross-band state, no corpus-wide window);
* **deterministic** — (n_tokens DESC, doc_id ASC) walk order and
  integer-only state, so the result is a pure function of the corpus
  and is hash-verified cross-engine against the sequential
  recursive-CTE derivation ``q_sequence_pack`` (DuckDB);
* **boundary-respecting** — documents are never split unless longer
  than the context; oversize documents chain ``ceil(n/ctx)``
  dedicated sequences (the only split case).

Guarantee (tests): per band, packed sequence count <= the naive
one-doc-per-sequence policy's count (the planner's baseline), and
every document's tokens are fully assigned exactly once.

The per-band walk is genuinely sequential (bin-packing state), which
is exactly the per-partition imperative case ``applyInPandas`` exists
for; everything before it (tokenize, count, band) is JVM-side SQL.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.decontam_sql import (
    SEQ_PACK_BAND,
    SEQ_PACK_CTX,
    SEQ_PACK_SEED,
)

_PACK_SCHEMA = ("doc_id bigint, band bigint, n_tokens bigint, "
                "start_seq bigint, start_off bigint, "
                "n_seqs_spanned bigint")


def _nfd_walk(pdf: pd.DataFrame, ctx: int) -> pd.DataFrame:
    """One band's next-fit-decreasing walk (integer state only)."""
    pdf = pdf.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True])
    out = []
    seq, fill = -1, ctx + 1  # no open sequence yet
    for doc_id, band, n in zip(pdf["doc_id"], pdf["band"],
                               pdf["n_tokens"]):
        n = int(n)
        if fill + n <= ctx:
            out.append((int(doc_id), int(band), n, seq, fill, 1))
            fill += n
        else:
            start = seq + 1
            seq = start + (n - 1) // ctx
            fill = ((n - 1) % ctx) + 1
            out.append((int(doc_id), int(band), n, start, 0,
                        (n - 1) // ctx + 1))
    return pd.DataFrame(out, columns=["doc_id", "band", "n_tokens",
                                      "start_seq", "start_off",
                                      "n_seqs_spanned"])


def _banded_sizes(docs: DataFrame, band_docs: int, id_col: str,
                  text_col: str, seed: str) -> DataFrame:
    """(doc_id, n_tokens, band) for packable (n_tokens > 0)
    documents: band = seeded-md5 dense position DIV band_docs
    (`q_seeded_shuffle`'s banded two-phase numbering — one md5-bucket
    shuffle, no corpus-wide window), so band population is EXACTLY
    ``band_docs`` for ANY id distribution: one hot id range or
    hash-sparse ids can no longer pile an unbounded Arrow batch onto
    a single band walk (the round-9 change away from raw
    ``doc_id DIV band_docs``)."""
    import uuid

    from ..functions import sampling_sql as SAMP
    from ..functions import sql_shared as S

    spark = docs.sparkSession
    view = f"__pack_docs_{uuid.uuid4().hex[:12]}"
    docs.select(F.col(id_col).cast("long").alias("doc_id")) \
        .createOrReplaceTempView(view)
    pos = spark.sql(SAMP.q_seeded_shuffle(S.SPARK, seed=seed,
                                          doc_table=view))
    spark.catalog.dropTempView(view)
    sized = (docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(f"size(filter(split(lower({text_col}), ' +'), "
               f"t -> t <> ''))").cast("long").alias("n_tokens"))
        .where(F.col("n_tokens") > 0))
    return (sized.join(pos, ["doc_id"])
            .withColumn("band",
                        F.expr(f"position DIV {band_docs}")
                        .cast("long"))
            .drop("position"))


def pack_sequences(docs: DataFrame, ctx: int = SEQ_PACK_CTX,
                   band_docs: int = SEQ_PACK_BAND,
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   seed: str = SEQ_PACK_SEED) -> DataFrame:
    """Per document: (doc_id, band, n_tokens, start_seq, start_off,
    n_seqs_spanned) — see module docstring.  Zero-token documents are
    excluded (nothing to pack).

    .. versionchanged:: round-9
       Seeded-position banding (see :func:`_banded_sizes`)."""
    banded = _banded_sizes(docs, band_docs, id_col, text_col, seed)
    return banded.groupBy("band").applyInPandas(
        lambda pdf: _nfd_walk(pdf, ctx), _PACK_SCHEMA)


def _ffd_walk(pdf: pd.DataFrame, ctx: int, max_open: int
              ) -> pd.DataFrame:
    """One band's first-fit-decreasing walk with a bounded open-bin
    list (integer state only — see ``q_sequence_pack_ffd`` for the
    rule set; this is the band-parallel twin the driver hash gate
    pins against that sequential reference)."""
    pdf = pdf.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True])
    out = []
    bins: list[list[int]] = []   # [seq, fill], open order (seq asc)
    next_seq = 0
    for doc_id, band, n in zip(pdf["doc_id"], pdf["band"],
                               pdf["n_tokens"]):
        n = int(n)
        idx = next((i for i, b in enumerate(bins)
                    if b[1] + n <= ctx), None)
        if idx is not None:
            out.append((int(doc_id), int(band), n,
                        bins[idx][0], bins[idx][1], 1))
            bins[idx][1] += n
        else:
            spans = (n - 1) // ctx + 1
            out.append((int(doc_id), int(band), n, next_seq, 0, spans))
            bins.append([next_seq + spans - 1, ((n - 1) % ctx) + 1])
            next_seq += spans
            if len(bins) > max_open:
                mx = max(b[1] for b in bins)
                ci = next(i for i, b in enumerate(bins) if b[1] == mx)
                bins.pop(ci)
    return pd.DataFrame(out, columns=["doc_id", "band", "n_tokens",
                                      "start_seq", "start_off",
                                      "n_seqs_spanned"])


def pack_sequences_ffd(docs: DataFrame, ctx: int = SEQ_PACK_CTX,
                       band_docs: int = SEQ_PACK_BAND,
                       max_open: int | None = None,
                       id_col: str = "doc_id",
                       text_col: str = "text",
                       seed: str = SEQ_PACK_SEED) -> DataFrame:
    """First-fit-decreasing packer with a bounded open-bin list
    (default ``FFD_MAX_OPEN`` = 16): same output schema, banding,
    and determinism as :func:`pack_sequences`, but each document
    goes into the LOWEST-numbered open sequence it fits instead of
    only the newest — recovering strictly more padding on real size
    mixes (pinned vs NFD in tests; occupancy delta in SCALING.md).
    Per-band walk is O(band_docs x max_open) integer work."""
    from ..functions.decontam_sql import FFD_MAX_OPEN

    if max_open is None:
        max_open = FFD_MAX_OPEN
    banded = _banded_sizes(docs, band_docs, id_col, text_col, seed)
    return banded.groupBy("band").applyInPandas(
        lambda pdf: _ffd_walk(pdf, ctx, max_open), _PACK_SCHEMA)


def _chunk_contrib_expr(ctx: int) -> str:
    """SQL CASE for the tokens a placement contributes to spanned
    sequence ``j`` — ONE definition for fill, emit, and loss-mask so
    the accounting cannot drift.  Relies on the walk invariant
    start_off == 0 for any multi-span placement (property-tested in
    tests/test_late_round9_properties.py)."""
    spanned = "n_seqs_spanned"
    return (f"CASE WHEN j < {spanned} - 1 THEN {ctx} "
            f"WHEN {spanned} = 1 THEN n_tokens "
            f"ELSE n_tokens - ({spanned} - 1) * {ctx} END")


def sequence_fill(packed: DataFrame, ctx: int = SEQ_PACK_CTX
                  ) -> DataFrame:
    """Per (band, seq): documents touching it, fill tokens, padding —
    the loader-facing occupancy table (what a training run actually
    pays).  Expands each placement over its spanned sequences: ctx to
    every spanned sequence except the last (remainder), the whole
    length for unsplit docs.  Map-only explode + one (band, seq)
    aggregate; hash-verified against the recursive-CTE reference
    (``q_sequence_fill``)."""
    spanned = "n_seqs_spanned"
    contrib = _chunk_contrib_expr(ctx)
    return (packed
            .select("band", "start_seq", "n_tokens", spanned,
                    F.expr(f"explode(sequence(0, {spanned} - 1))")
                    .alias("j"))
            .select("band",
                    (F.col("start_seq") + F.col("j")).cast("long")
                    .alias("seq"),
                    F.expr(contrib).cast("long").alias("contrib"))
            .groupBy("band", "seq")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("contrib").cast("long").alias("fill_tokens"))
            .withColumn("pad_tokens",
                        (F.lit(ctx) - F.col("fill_tokens")).cast("long")))


def emit_sequences(docs: DataFrame, packed: DataFrame,
                   ctx: int = SEQ_PACK_CTX,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Materialized training sequences from the packer's placements:
    per (band, seq) the token stream (kept tokens, single-spaced,
    lowercased — the packer's token identity) and the boundary
    metadata ``doc_id:offset:len`` per chunk, ';'-joined in offset
    order.  Everything JVM-side: a doc-keyed join back to the token
    arrays, a map-only chunk explode with expression-length slices,
    and one (band, seq) aggregate with an in-memory offset sort —
    no window, no Python.  Hash-verified against the sequential
    recursive-CTE reference ``q_sequence_emit``."""
    ta = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(f"filter(split(lower({text_col}), ' +'), "
               f"t -> t <> '')").alias("ta"))
    spanned = "n_seqs_spanned"
    chunk_len = _chunk_contrib_expr(ctx)
    chunks = (packed.join(ta, "doc_id")
              .select("band", "start_seq", "start_off", "n_tokens",
                      "doc_id", "ta", spanned,
                      F.expr(f"explode(sequence(0, {spanned} - 1))")
                      .alias("j"))
              .select(
                  "band",
                  (F.col("start_seq") + F.col("j")).cast("long")
                  .alias("seq"),
                  "doc_id",
                  F.expr("CASE WHEN j = 0 THEN start_off ELSE 0 END")
                  .cast("long").alias("off"),
                  F.expr(chunk_len).cast("long").alias("chunk_len"),
                  F.expr(f"array_join(slice(ta, j * {ctx} + 1, "
                         f"{chunk_len}), ' ')").alias("chunk_text")))
    return (chunks.groupBy("band", "seq").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("chunk_len").cast("long").alias("fill_tokens"),
        F.expr("array_join(transform(array_sort(collect_list("
               "struct(off AS o, chunk_text AS v))), x -> x.v), ' ')")
        .alias("seq_text"),
        F.expr("array_join(transform(array_sort(collect_list("
               "struct(off AS o, concat(CAST(doc_id AS STRING), ':', "
               "CAST(off AS STRING), ':', CAST(chunk_len AS STRING)) "
               "AS v))), x -> x.v), ';')").alias("spans")))


def packed_band_stats(packed: DataFrame, ctx: int = SEQ_PACK_CTX
                      ) -> DataFrame:
    """Per band: sequences produced, tokens packed, padding tokens —
    the accounting that closes the loop with the planner's
    one-doc-per-sequence baseline (`q_packing_efficiency`)."""
    return (packed.groupBy("band").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.max(F.col("start_seq") + F.col("n_seqs_spanned")))
        .alias("n_seqs"))
        .withColumn("padding_tokens",
                    F.col("n_seqs") * ctx - F.col("total_tokens")))


_BATCH_SCHEMA = ("doc_id bigint, band bigint, n_tokens bigint, "
                 "batch bigint, pos bigint")


def _batch_walk(pdf: pd.DataFrame, max_tokens: int, max_seqs: int
                ) -> pd.DataFrame:
    """One band's dynamic-batching walk (integer state only — see
    ``functions/decontam_sql.q_batch_schedule`` for the rule set;
    this is the band-parallel twin the driver hash gate pins against
    that sequential reference)."""
    pdf = pdf.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True])
    out = []
    batch, cnt, mx = -1, 0, 0
    for doc_id, band, n in zip(pdf["doc_id"], pdf["band"],
                               pdf["n_tokens"]):
        n = int(n)
        if batch >= 0 and (cnt + 1) * mx <= max_tokens \
                and cnt + 1 <= max_seqs:
            out.append((int(doc_id), int(band), n, batch, cnt))
            cnt += 1
        else:
            batch += 1
            out.append((int(doc_id), int(band), n, batch, 0))
            cnt, mx = 1, n
    return pd.DataFrame(out, columns=["doc_id", "band", "n_tokens",
                                      "batch", "pos"])


def schedule_batches(docs: DataFrame, max_tokens: int | None = None,
                     max_seqs: int | None = None,
                     band_docs: int = SEQ_PACK_BAND,
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     seed: str = SEQ_PACK_SEED) -> DataFrame:
    """Dynamic batching (batch-by-size): per document (doc_id, band,
    n_tokens, batch, pos) under a padded-cost budget — the loader-
    side alternative to the packer for boundary-preserving losses;
    see ``q_batch_schedule`` for the deterministic rule set.  Same
    seeded-position banding, walk order, and scale shape as
    :func:`pack_sequences`."""
    from ..functions.decontam_sql import (
        BATCH_MAX_SEQS,
        BATCH_MAX_TOKENS,
    )

    if max_tokens is None:
        max_tokens = BATCH_MAX_TOKENS
    if max_seqs is None:
        max_seqs = BATCH_MAX_SEQS
    banded = _banded_sizes(docs, band_docs, id_col, text_col, seed)
    return banded.groupBy("band").applyInPandas(
        lambda pdf: _batch_walk(pdf, max_tokens, max_seqs),
        _BATCH_SCHEMA)


def batch_stats(scheduled: DataFrame) -> DataFrame:
    """Per (band, batch): rows, batch max length, real tokens, padded
    cost (rows × max length — what the accelerator computes), and
    padding waste.  One (band, batch) aggregate over the scheduler's
    output."""
    return (scheduled.groupBy("band", "batch").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.max("n_tokens").cast("long").alias("max_len"),
        F.sum("n_tokens").cast("long").alias("real_tokens"))
        .withColumn("padded_cost",
                    (F.col("n_rows") * F.col("max_len")).cast("long"))
        .withColumn("pad_tokens",
                    (F.col("padded_cost") - F.col("real_tokens"))
                    .cast("long")))


def sequence_loss_mask(packed: DataFrame, flags: DataFrame,
                       ctx: int = SEQ_PACK_CTX) -> DataFrame:
    """Loss-mask propagation through the packer: per (band, seq), how
    many of its fill tokens belong to MASKED documents (flags:
    ``(doc_id, masked)``) — the table a training loader reads to zero
    the loss on packed-for-context tokens while attending over them.
    Masking documents AFTER packing (rather than dropping them
    before) preserves sequence layout and context windows; the cost
    is exactly the ``masked_tokens`` column.

    Scale shape: the same map-only chunk explode as
    :func:`sequence_fill` plus ONE doc-keyed broadcast-able join of
    the flag table and one (band, seq) aggregate — no window, no
    Python.  Hash-verified against the sequential recursive-CTE
    reference (``q_sequence_loss_mask``)."""
    spanned = "n_seqs_spanned"
    contrib = _chunk_contrib_expr(ctx)
    return (packed
            .join(flags.select(F.col("doc_id").cast("long")
                               .alias("doc_id"),
                               F.col("masked").cast("long")
                               .alias("masked")), "doc_id", "left")
            .withColumn("masked", F.coalesce(F.col("masked"),
                                             F.lit(0).cast("long")))
            .select("band", "start_seq", "n_tokens", spanned, "masked",
                    F.expr(f"explode(sequence(0, {spanned} - 1))")
                    .alias("j"))
            .select("band",
                    (F.col("start_seq") + F.col("j")).cast("long")
                    .alias("seq"),
                    "masked",
                    F.expr(contrib).cast("long").alias("contrib"))
            .groupBy("band", "seq")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("masked").cast("long").alias("n_masked_docs"),
                 F.sum("contrib").cast("long").alias("fill_tokens"),
                 F.sum(F.col("masked") * F.col("contrib")).cast("long")
                 .alias("masked_tokens"))
            .withColumn("kept_tokens",
                        (F.col("fill_tokens") - F.col("masked_tokens"))
                        .cast("long")))
