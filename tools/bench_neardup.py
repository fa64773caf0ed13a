#!/usr/bin/env python3
"""Near-dup operator family at scale: Spark vs DuckDB, same algorithm.

The headline bench (bench.py) covers relational queries; the 100 TB
risk for an LLM-data pipeline lives in the near-duplicate detectors.
This harness runs the four banded/bucketed scale forms —
minhash_lsh_pairs, ngram_jaccard (PPJoin prefix), simhash banded,
cosine_near_dup_lsh — at each given scale dir, on BOTH engines from
the same dual-dialect template (identical candidate-generation
algorithm, so the ratio measures the engine, not the plan), and
reports wall seconds + emitted pair counts (the growth signal: pairs
should grow ~linearly with corpus size for replica-scaled data, not
quadratically).

The quadratic reference forms the correctness gate hash-matches at
sf0.01 are deliberately NOT run here: at 500 k documents they imply
~1.25e11 candidate pairs before filtering — the thing the banded
forms exist to avoid.

The corpora come from tools/gen_neardup_corpus.py — constant 10 %
dup rate at growing document count (the realistic growth mode).
Replica dirs (.bench_sf1/.bench_sf10) are intentionally NOT the
default: text-identical replicas inflate near-dup output
quadratically (see gen_neardup_corpus docstring).

Usage: python3 tools/bench_neardup.py [corpus_dir ...]
  (default: .bench_nd1x .bench_nd10x .bench_nd100x)
Prints one JSON object; SCALING.md stores the table.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def templates():
    from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
    from dystonse_gtfs_importer_spark.functions import dedup_sql as D
    from dystonse_gtfs_importer_spark.plans.oracle_queries import (
        q_sparse_cosine_pairs,
    )

    return {
        "minhash_lsh_pairs": D.q_minhash_lsh_pairs,
        "ngram_jaccard_prefix": D.q_ngram_jaccard_prefix,
        # round-5 inverted-index TF-cosine: candidates = per-term df²
        # under the df<=100 stop-term cap — linear here because the
        # suffixed nd vocabulary keeps df tiny
        "sparse_cosine_pairs": q_sparse_cosine_pairs,
        # the 60-bit width: the 16-bit oracle form emits ~1.1% of ALL
        # pairs by random collision — quadratic output at corpus scale
        "simhash64_near_pairs_banded": D.q_simhash64_near_pairs_banded,
        # 12 planes (4096 buckets) holds bucket occupancy ~constant up
        # to the 200 k-vector corpus; the 4-plane oracle default (16
        # buckets) makes candidates quadratic past ~10 k vectors
        "cosine_near_dup_lsh":
            lambda d: ANN.q_cosine_near_dup_lsh(d, n_planes=12),
    }


def main() -> int:
    import duckdb

    from dystonse_gtfs_importer_spark.functions import sql_shared as S
    from dystonse_gtfs_importer_spark.session import (
        configure_for_oracle, get_spark,
    )

    root = Path(__file__).resolve().parent.parent
    sf_dirs = sys.argv[1:] or [str(root / ".bench_nd1x"),
                               str(root / ".bench_nd10x"),
                               str(root / ".bench_nd100x")]
    spark = get_spark(app_name="bench-neardup")
    configure_for_oracle(spark)

    out: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        label = Path(sf_dir).name.lstrip(".")
        con = duckdb.connect()
        # nd corpora carry only the tables the family reads
        for t in TABLES:
            f = Path(sf_dir) / f"{t}.parquet"
            if not f.exists():
                continue
            spark.read.parquet(str(f)).createOrReplaceTempView(t)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")
        row: dict[str, dict] = {}
        # untimed warmup on the smallest query keeps session/footer
        # costs out of the first timed line
        spark.sql("SELECT COUNT(*) FROM documents").collect()
        con.execute("SELECT COUNT(*) FROM documents").fetchall()
        for name, tpl in templates().items():
            # COUNT-wrap both engines: the metric is detection cost,
            # not driver-side materialization of the pair list
            r: dict = {}
            try:
                t0 = time.time()
                r["pairs"] = spark.sql(
                    f"SELECT COUNT(*) AS n FROM ({tpl(S.SPARK)}) t"
                ).collect()[0].n
                r["spark_s"] = round(time.time() - t0, 3)
            except Exception as e:  # record, keep benching
                r["spark_err"] = str(e)[:200]
            print(f"# {label} {name}: spark {r.get('spark_s')}s "
                  f"{r.get('pairs')} pairs", file=sys.stderr)
            try:
                t0 = time.time()
                r["duck_pairs"] = con.execute(
                    f"SELECT COUNT(*) FROM ({tpl(S.DUCKDB)}) t"
                ).fetchone()[0]
                r["duck_s"] = round(time.time() - t0, 3)
            except Exception as e:
                r["duck_err"] = str(e)[:200]
            print(f"# {label} {name}: duck {r.get('duck_s')}s "
                  f"{r.get('duck_pairs')} pairs", file=sys.stderr)
            row[name] = r
        out[label] = row
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
