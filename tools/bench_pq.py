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
