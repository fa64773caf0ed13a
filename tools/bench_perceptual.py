#!/usr/bin/env python3
"""Perceptual-dedup benchmark: fingerprint throughput and near-pair /
keeper walls for the image family, at sf0.1 (2 k vectors) and the 10x
gen_scale replica when present (20 k vectors, planted families grown
to 20 members -> 190 k true near pairs).

Median-of-3 per stage (the bench.py doctrine).  Prints one JSON line
(the BENCH_* convention) -> BENCH_PERCEPTUAL.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPEATS = 3


def median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> int:
    from dystonse_gtfs_importer_spark.operators import perceptual as P
    from dystonse_gtfs_importer_spark.session import (
        configure_for_oracle, get_spark,
    )

    spark = get_spark(app_name="bench-perceptual")
    configure_for_oracle(spark)

    dirs = {"sf0.1": "/root/testdata/sf0.1"}
    replica = Path(__file__).resolve().parent.parent / ".bench_sf1"
    if (replica / "embeddings.parquet").exists():
        dirs["sf1_replica"] = str(replica)

    results: dict[str, dict] = {}
    for label, sf_dir in dirs.items():
        stages = {
            "fingerprint": lambda d=sf_dir: P.image_dhash_query(spark, d),
            "near_pairs": lambda d=sf_dir: P.image_near_pairs_query(
                spark, d),
            "dedup_keep": lambda d=sf_dir: P.image_dedup_keep_query(
                spark, d),
            # round-12 additions: spectral audio fingerprint (real
            # rFFT per window through the WAV codec) and order-aware
            # video shingle pairs (lead + inverted index + islands)
            "audio_spectral": lambda d=sf_dir:
                P.audio_spectral_hash_query(spark, d),
            "video_shingles": lambda d=sf_dir:
                P.video_shingle_pairs_query(spark, d),
            "image_recall_audit": lambda d=sf_dir:
                P.image_dedup_recall_query(spark, d),
        }
        row: dict = {}
        n_vec = spark.read.parquet(
            f"{sf_dir}/embeddings.parquet").count()
        row["n_vectors"] = n_vec
        for stage, build in stages.items():
            build().count()  # untimed warmup (plan compile + codegen)
            walls = []
            n = 0
            for _ in range(REPEATS):
                t0 = time.time()
                n = build().count()
                walls.append(round(time.time() - t0, 2))
            med = median(walls)
            row[stage] = {"wall_s": med, "walls_s": walls, "rows": n}
            if stage == "fingerprint" and med > 0:
                row[stage]["images_per_s"] = round(n_vec / med)
            print(f"# {label}/{stage}: {row[stage]}", file=sys.stderr)
        results[label] = row

    print(json.dumps({"metric": "perceptual_dedup_walls",
                      "unit": "sec", "method": f"median_of_{REPEATS}",
                      "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
