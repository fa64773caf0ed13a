#!/usr/bin/env python3
"""Interleaved same-session A/B for the r13 headline changes
(guide §1.2/§1.4): stop_pair_counts pre-partition hint and the
lang_id conditional spread.  Both variants are built in ONE session
and timed alternately (A,B,A,B,...) through the noop sink, so host
drift hits both arms equally.

Usage: python3 tools/ab_r13_headline.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, df):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    noop(df)
    dt = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    return dt


def main() -> int:
    from dystonse_gtfs_importer_spark.session import get_spark, configure_for_oracle
    from dystonse_gtfs_importer_spark.sources import testdata
    from dystonse_gtfs_importer_spark.plans import oracle_queries as oq
    from dystonse_gtfs_importer_spark.functions import sql_shared as S

    testdata.MEMOIZE_VIEWS = True
    spark = get_spark(app_name="ab_r13_headline")
    configure_for_oracle(spark)
    oq.register_views(spark, SF_DIR)

    # --- stop_pair_counts: new (with REPARTITION hint) vs old (hint stripped;
    # a plain projection CTE inlines, restoring the r12 plan exactly)
    sql_new = oq.q_stop_pair_counts(S.SPARK)
    sql_old = sql_new.replace("/*+ REPARTITION(l_orderkey) */", "")
    assert sql_old != sql_new

    # --- lang_id: spread variant (repartitioned source view) vs plain SQL.
    # Kept as the recorded-negative probe: the spread wins on the
    # computation (noop) but loses on the bench's build+count metric,
    # where count() prunes the map-only projection.
    docs = spark.table("documents").select("doc_id", "text")
    docs.repartition(spark.sparkContext.defaultParallelism) \
        .createOrReplaceTempView("__lang_id_docs")
    lang_sql = oq.q_lang_id(S.SPARK)

    def lang_new():
        return spark.sql(lang_sql.replace("FROM documents",
                                          "FROM __lang_id_docs"))

    def lang_old():
        return spark.sql(lang_sql)

    # warmup
    noop(spark.sql(sql_new)); noop(spark.sql(sql_old))
    noop(lang_new()); noop(lang_old())

    res: dict[str, list[float]] = {"spc_new": [], "spc_old": [],
                                   "lang_new": [], "lang_old": []}
    for r in range(REPS):
        res["spc_new"].append(timed(spark, "spc_new", spark.sql(sql_new)))
        res["spc_old"].append(timed(spark, "spc_old", spark.sql(sql_old)))
        res["lang_new"].append(timed(spark, "lang_new", lang_new()))
        res["lang_old"].append(timed(spark, "lang_old", lang_old()))

    for k, v in res.items():
        print(f"{k:10s} median={statistics.median(v):.3f}  runs="
              + " ".join(f"{x:.3f}" for x in v))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
