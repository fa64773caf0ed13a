"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring what a 100 TB training-data pipeline needs:

* ``cosine_topk`` — exact brute force: broadcast the (small) query
  set against the full corpus scan.  All arithmetic is JVM-side
  (``zip_with`` + ``aggregate`` higher-order functions compiled by
  Catalyst) — no Python in the hot path.  Cost: O(|Q| × |corpus|),
  one scan, no shuffle of the corpus.
* ``lsh_topk`` — approximate: random-hyperplane LSH buckets the
  corpus (sign-bit sketches of deterministic pseudo-random planes),
  candidates come only from colliding buckets across L tables, then
  exact re-ranking of candidates.  Corpus-side cost becomes
  O(candidates) per query; the bucket join shuffles only
  (bucket_key, id) pairs.
* ``ivf_topk`` — inverted-file variant: k-means-lite centroids
  (sampled seeds, one Lloyd pass), probe the ``nprobe`` nearest
  cells — the classic IVF-Flat trade-off, expressed as two
  broadcast joins.

Determinism: hyperplanes/centroid seeds derive from hash-mixed
integer sequences, not RNG state, so results are stable across runs
and engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
NORM = "SQRT(aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def _cosine(a: str, b: str) -> F.Column:
    return F.expr(
        f"{DOT.format(a=a, b=b)} / ({NORM.format(a=a)} * {NORM.format(a=b)})")


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                ) -> DataFrame:
    """Exact top-k by cosine: one broadcast nested-loop of queries
    against the corpus scan, ranked per query.

    Output: (query_id, cand_id, cosine, rk).
    """
    from pyspark.sql.window import Window

    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("cand_id"),
                      F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(_cosine("q_vec", "c_vec"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "cand_id", "cosine", "rk")
    )


def _hyperplane(dim: int, plane: int, table: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane via integer
    hash mixing (splitmix64-style) — reproducible everywhere."""
    vals = []
    for i in range(dim):
        z = (plane * 0x9E3779B97F4A7C15 + table * 0xBF58476D1CE4E5B9
             + i * 0x94D049BB133111EB) & ((1 << 64) - 1)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
        z ^= z >> 31
        vals.append((z / float(1 << 64)) * 2.0 - 1.0)
    return vals


def _sketch_expr(vec_col: str, dim: int, n_planes: int, table: int) -> F.Column:
    """Sign-bit sketch: bit p set iff dot(vec, plane_p) > 0."""
    bits = []
    for p in range(n_planes):
        plane = _hyperplane(dim, p, table)
        arr = "array(" + ",".join(f"{v}D" for v in plane) + ")"
        dot = DOT.format(a=vec_col, b=arr)
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return F.expr("(" + " + ".join(bits) + ")")


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_planes: int = 12, n_tables: int = 4
             ) -> DataFrame:
    """Approximate top-k: candidates share a random-hyperplane bucket
    in at least one of ``n_tables`` tables; exact cosine re-ranks.

    At 100 TB the corpus sketching is a map-only pass; the candidate
    join shuffles (bucket, id) pairs — fraction ~2^-n_planes of the
    cross product per table.
    """
    from pyspark.sql.window import Window

    c = corpus.select(F.col(id_col).alias("cand_id"),
                      F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))

    c_buckets = []
    q_buckets = []
    for t in range(n_tables):
        sk = _sketch_expr("c_vec", dim, n_planes, t)
        c_buckets.append(c.select("cand_id", "c_vec",
                                  F.lit(t).alias("tbl"), sk.alias("bucket")))
        skq = _sketch_expr("q_vec", dim, n_planes, t)
        q_buckets.append(q.select("query_id", "q_vec",
                                  F.lit(t).alias("tbl"), skq.alias("bucket")))
    cb = c_buckets[0]
    for x in c_buckets[1:]:
        cb = cb.unionByName(x)
    qb = q_buckets[0]
    for x in q_buckets[1:]:
        qb = qb.unionByName(x)

    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "q_vec", "cand_id", "c_vec")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cand.withColumn("cosine", F.round(_cosine("q_vec", "c_vec"), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("query_id", "cand_id", "cosine", "rk"))


def cosine_near_dup(corpus: DataFrame, threshold: float = 0.92,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int = 64, n_planes: int = 8, n_tables: int = 4,
                    exact: bool = False) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    threshold).

    Scale path (default): candidates must share a random-hyperplane
    LSH bucket in >= 1 of ``n_tables`` tables — sketching is map-only,
    the bucket self-join shuffles (table, bucket, id) pairs, and the
    exact cosine threshold re-checks every candidate.  High-cosine
    pairs collide with probability (1-θ/π)^planes per table, so
    recall is tunable via n_planes/n_tables.  ``exact=True`` runs the
    quadratic oracle form (functions/ann_sql.py::q_cosine_near_dup_pairs
    is its dual-dialect twin)."""
    c = corpus.select(F.col(id_col).alias("vec_a"),
                      F.col(vec_col).alias("a_vec"))
    c2 = corpus.select(F.col(id_col).alias("vec_b"),
                       F.col(vec_col).alias("b_vec"))
    if exact:
        cand = c.crossJoin(c2).where(F.col("vec_a") < F.col("vec_b"))
    else:
        sides = []
        for alias_id, alias_vec in (("vec_a", "a_vec"), ("vec_b", "b_vec")):
            side = corpus.select(F.col(id_col).alias(alias_id),
                                 F.col(vec_col).alias(alias_vec))
            buckets = None
            for t in range(n_tables):
                sk = _sketch_expr(alias_vec, dim, n_planes, t)
                b = side.select(alias_id, alias_vec,
                                F.lit(t).alias("tbl"), sk.alias("bucket"))
                buckets = b if buckets is None else buckets.unionByName(b)
            sides.append(buckets)
        cand = (sides[0].join(sides[1], ["tbl", "bucket"])
                .where(F.col("vec_a") < F.col("vec_b"))
                .select("vec_a", "a_vec", "vec_b", "b_vec")
                .dropDuplicates(["vec_a", "vec_b"]))
    return (cand.withColumn("cosine",
                            F.round(_cosine("a_vec", "b_vec"), 6))
            .where(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "cosine"))


def _nearest_cell(side: DataFrame, key: str, vec: str,
                  centroids: DataFrame, n: int = 1) -> DataFrame:
    """Rank broadcast centroids per row by dot product; keep the top
    ``n`` cells.  Tie-break on cell id (matches scanning cells in
    order and keeping the first strict maximum)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.desc("cell_score"), F.asc("cell"))
    return (side.crossJoin(F.broadcast(centroids))
            .withColumn("cell_score", F.expr(DOT.format(a=vec, b="cent")))
            .withColumn("pr", F.row_number().over(w))
            .where(F.col("pr") <= n)
            .drop("cent", "cell_score", "pr"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_cells: int = 16, nprobe: int = 4) -> DataFrame:
    """IVF-Flat: assign corpus vectors to their nearest centroid
    (deterministically seeded from the first ``n_cells`` corpus rows by
    id, refined by one Lloyd mean pass), probe the ``nprobe`` closest
    cells per query, exact-rank the probed subset.

    Fully distributed: seeds and refined centroids stay DataFrames
    (n_cells rows, broadcast into the assignment joins) — no driver
    ``collect`` anywhere, unlike literal-embedding variants whose plans
    grow with n_cells × dim.  The dual-dialect twin
    (functions/ann_sql.py::q_ann_ivf_topk) is the driver-verified form.
    """
    from pyspark.sql.window import Window

    c = corpus.select(F.col(id_col).alias("cand_id"),
                      F.col(vec_col).alias("c_vec"))

    # seeds: the n_cells lowest-id vectors (deterministic, tiny)
    w_seed = Window.orderBy("cand_id")
    seeds = (c.orderBy("cand_id").limit(n_cells)
             .withColumn("cell", F.row_number().over(w_seed) - 1)
             .select("cell", F.expr("transform(c_vec, v -> CAST(v AS DOUBLE))")
                     .alias("cent")))

    assigned = _nearest_cell(c, "cand_id", "c_vec", seeds)

    # one Lloyd pass: per-cell element-wise mean → refined centroids
    refined = (
        assigned.select("cell", F.posexplode("c_vec").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("cell")
        .agg(F.expr("transform(array_sort(collect_list(struct(pos, m))), "
                    "x -> x.m)").alias("cent")))

    assigned = _nearest_cell(c, "cand_id", "c_vec", refined)

    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    probed = _nearest_cell(q, "query_id", "q_vec", refined, n=nprobe) \
        .select("query_id", "q_vec", "cell")

    cand = (assigned.join(F.broadcast(probed), "cell")
            .where(F.col("query_id") != F.col("cand_id")))
    scored = cand.withColumn("cosine", F.round(_cosine("q_vec", "c_vec"), 6))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (scored.withColumn("rk", F.row_number().over(w2))
            .where(F.col("rk") <= k)
            .select("query_id", "cand_id", "cosine", "rk"))
