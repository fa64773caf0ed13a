"""Salting operators: results must equal the unsalted plans on
skewed data, with the salt visible in the physical grouping."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + long tail
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).cast("double").alias("v"))
    tail = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"))
    return hot.unionByName(tail).cache()


class TestSaltedAggregate:
    def test_matches_plain_groupby(self, skewed):
        from dystonse_gtfs_importer_spark.operators.skew import salted_aggregate

        expect = {(r.k): (r.n, r.total) for r in
                  skewed.groupBy("k").agg(
                      F.count("*").alias("n"),
                      F.sum("v").alias("total")).collect()}
        got = {(r.k): (r.n, r.total) for r in
               salted_aggregate(skewed, ["k"], {
                   "n": (F.count("*"), F.sum("n")),
                   "total": (F.sum("v"), F.sum("total")),
               }, salt=8).collect()}
        assert got == expect


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, skewed):
        from dystonse_gtfs_importer_spark.operators.skew import salted_join

        dim = spark.createDataFrame(
            [("HOT", "hot-dim")] + [(f"t{i}", f"d{i}") for i in range(50)],
            "k string, label string")
        plain = skewed.join(dim, "k").groupBy("k", "label").count()
        salted = salted_join(skewed, dim, ["k"], salt=8) \
            .groupBy("k", "label").count()
        a = {(r.k, r.label): r["count"] for r in plain.collect()}
        b = {(r.k, r.label): r["count"] for r in salted.collect()}
        assert a == b

    def test_left_join_preserves_unmatched(self, spark, skewed):
        from dystonse_gtfs_importer_spark.operators.skew import salted_join

        dim = spark.createDataFrame([("HOT", "x")], "k string, label string")
        out = salted_join(skewed, dim, ["k"], salt=4, how="left")
        assert out.count() == skewed.count()
        assert out.where(F.col("label").isNull()).count() == 1000


class TestAqeSkewJoin:
    def test_aqe_splits_skewed_partition(self, spark):
        """The first line of defense at 100 TB is AQE itself: on a
        90 %-hot join key, OptimizeSkewedJoin must split the oversized
        shuffle partition (SortMergeJoin(skew=true) + an AQEShuffleRead
        marked skewed) with NO code changes — manual salting
        (operators/skew.py) is the fallback for aggregations and for
        engines/joins AQE does not cover."""
        saved = {k: spark.conf.get(k, None) for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )}
        try:
            # thresholds scaled down so local[32] data qualifies as skewed
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes", "16KB")
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            fact = spark.range(500_000).select(
                F.when(F.col("id") % 10 < 9, F.lit(7))
                .otherwise(F.col("id") % 1000).alias("k"),
                F.col("id").alias("payload"))
            dim = spark.range(0, 1000).repartition(4).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            j = fact.join(dim, "k")
            assert len(j.collect()) == 500_000
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan, plan
            assert "skewed" in plan, plan   # the AQEShuffleRead marker
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
