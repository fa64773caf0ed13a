"""Distributed k-means over embedding columns — the corpus-curation
clustering operator (domain discovery, data-mixing strata, SemDeDup
bucket refinement).  The reference engine has no counterpart; the
IVF-Flat path in :mod:`operators.similarity` stops after one Lloyd
pass (its centroids are an index artifact, not a clustering).

100 TB shape:

* **Assignment is map-only.** The k centers collapse into ONE row
  (``collect_list(struct(cell, cent, cnorm2))``) broadcast against the
  point scan; per point an ``array_min(transform(...))`` projection
  computes the L2 argmin JVM-side (d² = |x|² − 2x·c + |c|², struct
  ordering gives the deterministic lowest-(d², cell) tie-break).  No
  shuffle, no window, no Python.  For large k·dim an Arrow-batched
  numpy path (``assign='udf'``) does the same argmin as one matmul
  per batch — still map-only.
* **The update is one shuffle** at (cell, dim) grain: posexplode →
  partially-aggregated avg, k×dim rows out of the exchange, with the
  per-cell inertia and count folded into the same aggregate (guarded
  to the dim-0 slice) so the pass stays single.
* **Iterations truncate lineage** via ``localCheckpoint`` on the
  k-row centers frame — without it every Lloyd round replays all
  prior rounds (the classic iterative-Spark failure).
* **k-means|| init** (Bahmani et al., VLDB'12): ``rounds`` corpus
  passes sample candidates with probability min(1, ℓ·d²/φ) using a
  seeded integer hash (reproducible, no RNG state); candidates are
  weighted by attraction counts and reduced to k centers by greedy
  weighted k-means++ on the driver — bounded ≤ 1+ℓ·rounds rows, the
  sanctioned vocab-sized collect.

Determinism: every choice (seeding, sampling, tie-breaks) derives
from ids and integer hashes, so reruns and test fixtures are stable;
float layout is the only engine-order sensitivity, which the oracle
twin (functions/ann_sql.py::q_kmeans_lloyd2) pins by rounding.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
       "CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
NORM2 = ("aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * "
         "CAST(v AS DOUBLE))")


def _points(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("pid"),
        F.expr(f"transform({vec_col}, v -> CAST(v AS DOUBLE))")
        .alias("vec"),
        F.expr(NORM2.format(a=vec_col)).alias("vnorm2"))


def _pack_centers(centers: DataFrame):
    """k rows → one broadcastable row: array<struct<cell,cent,cnorm2>>."""
    return F.broadcast(centers.select(
        "cell", "cent", F.expr(NORM2.format(a="cent")).alias("cnorm2"))
        .groupBy().agg(F.collect_list(
            F.struct("cell", "cent", "cnorm2")).alias("cents")))


_ARGMIN = """array_min(transform(cents, c ->
    struct(vnorm2 - 2D * {dot} + c.cnorm2 AS d2, c.cell AS cell)))"""


def lloyd_assign(points: DataFrame, centers: DataFrame,
                 assign: str = "join") -> DataFrame:
    """(pid, vec, vnorm2) × centers → + (cell, d2).  ``join`` is the
    JVM map-only argmin; ``udf`` collects the k×dim centers to the
    driver and runs a numpy matmul argmin per Arrow batch (same
    result, faster when k·dim is large)."""
    if assign == "join":
        pick = _ARGMIN.format(dot=DOT.format(a="vec", b="c.cent"))
        return (points.crossJoin(_pack_centers(centers))
                .withColumn("_m", F.expr(pick))
                .select("pid", "vec", "vnorm2",
                        F.col("_m.cell").alias("cell"),
                        F.col("_m.d2").alias("d2")))
    if assign != "udf":
        raise ValueError(f"unknown assign mode {assign!r}")

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rows = sorted(centers.select("cell", "cent").collect(),
                  key=lambda r: r.cell)
    cells = np.array([r.cell for r in rows], dtype=np.int64)
    cmat = np.array([r.cent for r in rows], dtype=np.float64)
    cn2 = (cmat * cmat).sum(axis=1)

    @pandas_udf("array<double>")
    def nearest(vecs):
        x = np.array(vecs.tolist(), dtype=np.float64)
        d2 = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cmat.T) + cn2
        j = np.argmin(d2, axis=1)          # first (lowest cell) on ties
        picked = d2[np.arange(len(j)), j]
        return pd.Series([[float(c), float(v)]
                          for c, v in zip(cells[j], picked)])

    return (points.withColumn("_m", nearest("vec"))
            .select("pid", "vec", "vnorm2",
                    F.col("_m")[0].cast("long").alias("cell"),
                    F.col("_m")[1].alias("d2")))


def _recompute(assigned: DataFrame) -> DataFrame:
    """One shuffle: (cell, pos) means + per-cell n/inertia (folded into
    the dim-0 slice of the same aggregate) → k rows."""
    by_dim = (assigned
              .select("cell", "d2", F.posexplode("vec").alias("pos", "val"))
              .groupBy("cell", "pos")
              .agg(F.avg("val").alias("m"),
                   F.sum(F.when(F.col("pos") == 0, F.col("d2")))
                   .alias("in0"),
                   F.count(F.when(F.col("pos") == 0, F.lit(1)))
                   .alias("n0")))
    return (by_dim.groupBy("cell")
            .agg(F.expr("transform(array_sort(collect_list(struct(pos, m)))"
                        ", x -> x.m)").alias("cent"),
                 F.max("in0").alias("inertia"),
                 F.max("n0").alias("n")))


def _hash01(col, salt: int):
    """Deterministic uniform [0,1) from an id — xxhash64, no RNG."""
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1 << 40))
            / float(1 << 40))


def _greedy_weighted_kmeanspp(cands: list, k: int) -> list:
    """Reduce weighted candidates (driver-side, ≤ 1+ℓ·rounds rows) to
    k centers: start from the heaviest, then repeatedly take the
    candidate with maximal weight·d²-to-chosen (deterministic greedy
    k-means++; ties broken by id)."""
    import numpy as np

    ids = [c["pid"] for c in cands]
    w = np.array([c["w"] for c in cands], dtype=np.float64)
    x = np.array([c["vec"] for c in cands], dtype=np.float64)
    order = np.lexsort((ids, -w))
    chosen = [int(order[0])]
    d2 = ((x - x[chosen[0]]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(cands)):
        score = w * d2
        score[chosen] = -1.0
        best = int(max(range(len(cands)),
                       key=lambda i: (score[i], -ids[i])))
        chosen.append(best)
        d2 = np.minimum(d2, ((x - x[best]) ** 2).sum(axis=1))
    return [x[i].tolist() for i in chosen]


def kmeans_init(points: DataFrame, k: int, init: str = "k-means||",
                rounds: int = 3, oversample: float | None = None,
                seed: int = 0x5EED, assign: str = "join") -> DataFrame:
    """Initial centers as a (cell, cent) DataFrame."""
    if init == "lowest-id":
        from pyspark.sql.window import Window

        w = Window.orderBy("pid")
        return (points.orderBy("pid").limit(k)
                .withColumn("cell", F.row_number().over(w) - 1)
                .select("cell", F.col("vec").alias("cent")))
    if init != "k-means||":
        raise ValueError(f"unknown init {init!r}")

    ell = oversample if oversample is not None else 2.0 * k
    first = (points.orderBy("pid").limit(1)
             .select(F.lit(0).alias("cell"), F.col("vec").alias("cent")))
    cand = first.localCheckpoint(eager=True)
    for r in range(rounds):
        a = lloyd_assign(points, cand, assign=assign)
        phi = a.agg(F.sum("d2")).first()[0] or 0.0
        if phi <= 0.0:          # all mass on existing candidates
            break
        picked = (a.where(_hash01(F.col("pid"), seed + r)
                          < F.least(F.lit(1.0),
                                    F.lit(ell) * F.col("d2") / F.lit(phi)))
                  .select(F.lit(-1).alias("cell"),
                          F.col("vec").alias("cent")))
        cand = cand.unionByName(picked).dropDuplicates(["cent"]) \
            .localCheckpoint(eager=True)

    # weight candidates by attraction, reduce driver-side.  Re-key the
    # candidate set 0..m-1 (it is m ≤ 1+ℓ·rounds rows — the window
    # sort is on that tiny frame, not the corpus).
    from pyspark.sql.window import Window

    cand = (cand.withColumn(
        "cell", F.row_number().over(Window.orderBy("cent")) - 1)
        .select(F.col("cell").cast("long"), "cent"))
    attracted = lloyd_assign(points, cand, assign=assign) \
        .groupBy("cell").agg(F.count("*").alias("w"))
    rows = (cand.join(attracted, "cell", "left")
            .select("cell", "cent", F.coalesce("w", F.lit(0)).alias("w"))
            .collect())
    centers = _greedy_weighted_kmeanspp(
        [{"pid": r.cell, "vec": r.cent, "w": r.w} for r in rows], k)
    return points.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "cell: bigint, cent: array<double>")


def kmeans(df: DataFrame, k: int, id_col: str = "vec_id",
           vec_col: str = "embedding", max_iter: int = 20,
           tol: float = 1e-4, init: str = "k-means||",
           rounds: int = 3, assign: str = "join",
           seed: int = 0x5EED) -> dict:
    """Lloyd's algorithm to convergence.  Returns
    ``{"centers": DF(cell, cent, n, inertia), "assignments":
    DF(pid, cell, d2), "history": [inertia per iteration],
    "iterations": int}``.

    ``tol`` stops when the relative inertia improvement drops below
    it; ``max_iter`` bounds the pass count either way.  Empty cells
    keep their previous center (deterministic; no reseeding RNG)."""
    pts = _points(df, id_col, vec_col)
    centers = kmeans_init(pts, k, init=init, rounds=rounds,
                          seed=seed, assign=assign)
    history: list[float] = []
    stats = None
    for _ in range(max_iter):
        assigned = lloyd_assign(pts, centers, assign=assign)
        stats = _recompute(assigned)
        # empty cells: carry the previous center forward
        stats = (centers.join(stats, "cell", "left")
                 .select("cell",
                         F.coalesce(stats["cent"], centers["cent"])
                         .alias("cent"),
                         F.coalesce("inertia", F.lit(0.0))
                         .alias("inertia"),
                         F.coalesce("n", F.lit(0)).alias("n"))
                 ).localCheckpoint(eager=True)
        inertia = stats.agg(F.sum("inertia")).first()[0] or 0.0
        centers = stats.select("cell", "cent")
        history.append(float(inertia))
        if len(history) >= 2 and history[-2] > 0 \
                and (history[-2] - history[-1]) < tol * history[-2]:
            break
    return {
        "centers": stats,
        "assignments": lloyd_assign(pts, centers, assign=assign)
        .select("pid", "cell", "d2"),
        "history": history,
        "iterations": len(history),
    }


def kmeans_minibatch(df: DataFrame, k: int, id_col: str = "vec_id",
                     vec_col: str = "embedding", batch_frac: float = 0.1,
                     max_iter: int = 20, tol: float = 1e-3,
                     init: str = "k-means||", rounds: int = 2,
                     assign: str = "join", seed: int = 0x5EED) -> dict:
    """Mini-batch k-means (Sculley, WWW'10): each round assigns only a
    deterministic seeded-hash sample of the corpus (``batch_frac``)
    and blends the batch means into the centers with the standard
    per-center learning rate η_c = b_n / (n_seen + b_n).

    This is the 100 TB iteration-cost knob: a full-batch Lloyd round
    scans the whole corpus per iteration; here each round touches
    batch_frac of it, and the final full assignment is the only
    corpus-wide pass after convergence.  Sampling is a pure function
    of (id, iteration) — reruns are identical, and over iterations
    every stratum of the corpus is revisited under a fresh hash salt.

    Stops when the summed squared center movement drops below ``tol``
    (batch inertia is too noisy to gate on).  Returns the same shape
    as :func:`kmeans` with ``history`` = center movement per round.
    """
    pts = _points(df, id_col, vec_col)
    centers = kmeans_init(pts, k, init=init, rounds=rounds,
                          seed=seed, assign=assign)
    centers = centers.withColumn("n_seen", F.lit(0).cast("long")) \
        .localCheckpoint(eager=True)
    history: list[float] = []
    for it in range(max_iter):
        batch = pts.where(_hash01(F.col("pid"), seed * 31 + it)
                          < F.lit(batch_frac))
        bstats = _recompute(lloyd_assign(batch, centers, assign=assign)) \
            .select("cell", F.col("cent").alias("b_cent"),
                    F.col("n").alias("b_n"))
        moved = ("aggregate(zip_with(cent, new_cent, (o, n) -> "
                 "(o - n) * (o - n)), 0D, (acc, v) -> acc + v)")
        upd = (centers.join(bstats, "cell", "left")
               .withColumn("new_cent", F.when(
                   F.col("b_n").isNotNull(),
                   F.expr("zip_with(cent, b_cent, (o, m) -> o + "
                          "(CAST(b_n AS DOUBLE) / (n_seen + b_n)) "
                          "* (m - o))")).otherwise(F.col("cent")))
               .withColumn("movement", F.expr(moved))
               .select("cell", F.col("new_cent").alias("cent"),
                       (F.col("n_seen")
                        + F.coalesce("b_n", F.lit(0))).alias("n_seen"),
                       "movement")
               ).localCheckpoint(eager=True)
        move = upd.agg(F.sum("movement")).first()[0] or 0.0
        centers = upd.select("cell", "cent", "n_seen")
        history.append(float(move))
        if move < tol:
            break
    final = lloyd_assign(pts, centers.select("cell", "cent"),
                         assign=assign)
    stats = _recompute(final)
    stats = (centers.select("cell", "cent").join(stats, "cell", "left")
             .select("cell",
                     F.coalesce(stats["cent"], centers["cent"])
                     .alias("cent"),
                     F.coalesce("inertia", F.lit(0.0)).alias("inertia"),
                     F.coalesce("n", F.lit(0)).alias("n")))
    return {
        "centers": stats,
        "assignments": final.select("pid", "cell", "d2"),
        "history": history,
        "iterations": len(history),
    }
