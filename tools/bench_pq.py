#!/usr/bin/env python3
"""PQ scale bench: codes, flat ADC, and IVF-PQ wall-time plus the
recall audit at growing vector-corpus sizes, so the flat-vs-IVF
crossover SCALING.md describes is measured, not guessed.

Usage: python3 tools/bench_pq.py — prints one JSON line (BENCH_PQ).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DIRS = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": str(Path(__file__).resolve().parent.parent / ".bench_sf1"),
}


def main() -> None:
    from dystonse_gtfs_importer_spark.functions import ann_sql as A
    from dystonse_gtfs_importer_spark.functions import sql_shared as S
    from dystonse_gtfs_importer_spark.session import (
        configure_for_oracle,
        get_spark,
    )

    spark = get_spark(app_name="bench-pq")
    configure_for_oracle(spark)
    out: dict = {"metric": "pq_bench", "m": A.PQ_M, "k_cb": A.PQ_K,
                 "unit": "sec", "scales": {}}
    for sf, d in DIRS.items():
        p = Path(d) / "embeddings.parquet"
        if not p.exists():
            continue
        spark.read.parquet(str(p)).createOrReplaceTempView("embeddings")
        row: dict = {"n_vectors": spark.table("embeddings").count()}
        for name, sql in (("codes", A.q_pq_codes(S.SPARK)),
                          ("adc_flat", A.q_ann_pq_topk(S.SPARK)),
                          ("adc_flat_packed",
                           A.q_ann_pq_topk_packed(S.SPARK)),
                          ("ivfpq", A.q_ann_ivfpq_topk(S.SPARK))):
            t = time.time()
            n = spark.sql(sql).count()
            row[name] = {"total_s": round(time.time() - t, 3),
                         "rows": n}
        # scoring-only A/B over MATERIALIZED codes + LUT (the
        # production shape: the index exists; what does one query
        # batch cost?).  Exploded: (sub, code) equi-join + per-pair
        # aggregate.  Packed: array codes x broadcast LUT arrays, one
        # in-expression integer fold per pair.
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        codes = (spark.sql(A.q_pq_codes(S.SPARK))
                 .select("vec_id", "sub", "code").cache())
        lut = spark.sql(A.q_pq_lut(S.SPARK)).cache()
        codes.count(), lut.count()
        k_top = A.K
        w = Window.partitionBy("query_id").orderBy(
            F.asc("adist_e6"), F.asc("cand_id"))
        t = time.time()
        exploded = (codes.join(
            lut, (lut.sub == codes.sub) & (lut.cell == codes.code)
            & (lut.query_id != codes.vec_id))
            .groupBy("query_id", F.col("vec_id").alias("cand_id"))
            .agg(F.sum("pdist_e6").alias("adist_e6"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k_top))
        n_e = exploded.count()
        row["score_only_exploded"] = {
            "total_s": round(time.time() - t, 3), "rows": n_e}
        cvec = codes.groupBy("vec_id").agg(F.expr(
            "transform(array_sort(collect_list(struct(sub AS o, "
            "code AS v))), x -> x.v)").alias("cvec"))
        # positional array made dense BY CONSTRUCTION (all M*K slots
        # left-joined; an empty codebook cell would otherwise
        # misalign every later position — same fix as
        # q_ann_pq_topk_packed; a MAP lookup measured 2.4x slower,
        # GetMapValue is a linear key scan)
        slots = (spark.range(A.PQ_M).selectExpr("id AS sub")
                 .crossJoin(spark.range(A.PQ_K).selectExpr("id AS cell")))
        lutd = (lut.select("query_id").distinct().crossJoin(slots)
                .join(lut, ["query_id", "sub", "cell"], "left"))
        lvec = lutd.groupBy("query_id").agg(F.expr(
            f"transform(array_sort(collect_list(struct("
            f"sub * {A.PQ_K} + cell AS o, pdist_e6 AS v))), "
            "x -> x.v)").alias("lvec"))
        t = time.time()
        packed = (cvec.crossJoin(F.broadcast(lvec))
                  .where(F.col("query_id") != F.col("vec_id"))
                  .select("query_id",
                          F.col("vec_id").alias("cand_id"),
                          F.expr(" + ".join(
                              f"lvec[{m} * {A.PQ_K} + cvec[{m}]]"
                              for m in range(A.PQ_M)))
                          .alias("adist_e6"))
                  .withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") <= k_top))
        n_p = packed.count()
        row["score_only_packed"] = {
            "total_s": round(time.time() - t, 3), "rows": n_p}
        codes.unpersist(), lut.unpersist()

        rec = spark.sql(A.q_pq_recall(S.SPARK)).collect()
        for variant in ("pq_flat", "ivfpq"):
            hits = sum(r.n_hit for r in rec if r.variant == variant)
            k_eval = sum(r.k_eval for r in rec if r.variant == variant)
            row[f"recall_{variant}_e4"] = (10000 * hits // k_eval
                                           if k_eval else None)
        out["scales"][sf] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
