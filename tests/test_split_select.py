"""Leakage-safe grouped split + budgeted quality selection tests:
cluster atomicity (incl. composition with connected-components
near-dup families), determinism, map-only plan shape, and the greedy
budget-selection invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def clustered(spark):
    # 60 docs in 20 clusters of 3
    rows = [(i, i // 3) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id: bigint, cluster: bigint")


class TestGroupedSplit:
    def test_cluster_atomicity_and_coverage(self, spark, clustered):
        from dystonse_gtfs_importer_spark.operators.dedup import (
            grouped_split,
        )

        out = grouped_split(clustered, "cluster").collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r.cluster, set()).add(r.split)
        assert all(len(s) == 1 for s in by_cluster.values())
        assert {r.split for r in out} <= {"train", "valid", "test"}
        # with 80/10/10 weights the bulk must land in train
        n_train = sum(r.split == "train" for r in out)
        assert n_train > len(out) // 2

    def test_deterministic_and_seed_sensitive(self, spark, clustered):
        from dystonse_gtfs_importer_spark.operators.dedup import (
            grouped_split,
        )

        a = sorted((r.doc_id, r.split)
                   for r in grouped_split(clustered, "cluster").collect())
        b = sorted((r.doc_id, r.split)
                   for r in grouped_split(clustered, "cluster").collect())
        assert a == b
        c = sorted((r.doc_id, r.split) for r in grouped_split(
            clustered, "cluster", seed="other").collect())
        assert a != c

    def test_map_only_plan(self, spark, clustered):
        from dystonse_gtfs_importer_spark.operators.dedup import (
            grouped_split,
        )

        plan = grouped_split(clustered, "cluster") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_weights_must_align(self, spark, clustered):
        from dystonse_gtfs_importer_spark.operators.dedup import (
            grouped_split,
        )

        with pytest.raises(ValueError):
            grouped_split(clustered, "cluster", weights=(90, 10),
                          names=("a", "b", "c"))

    def test_composes_with_near_dup_components(self, spark):
        """The real pipeline: near-dup edges → connected components →
        whole families into one split."""
        from dystonse_gtfs_importer_spark.operators.dedup import (
            grouped_split,
        )
        from dystonse_gtfs_importer_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (8, 9)],
            "u: bigint, v: bigint")
        comp = connected_components(edges)       # (node, component)
        out = grouped_split(comp, "component").collect()
        fam = {}
        for r in out:
            fam.setdefault(r.component, set()).add(r.split)
        assert all(len(s) == 1 for s in fam.values())
        # 0-1-2 are one family: identical splits
        node_split = {r.node: r.split for r in out}
        assert node_split[0] == node_split[1] == node_split[2]


class TestQualityBudgetSelect:
    @pytest.fixture(scope="class")
    def selected(self, spark, sf_correct):
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as Q,
        )
        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            register_views,
        )
        from dystonse_gtfs_importer_spark.session import (
            configure_for_oracle,
        )

        configure_for_oracle(spark)
        register_views(spark, sf_correct)
        return spark.sql(Q.q_quality_budget_select_scale(S.SPARK)) \
            .collect()

    def test_budget_respected_per_source(self, selected):
        from dystonse_gtfs_importer_spark.functions.sampling_sql import (
            QUALITY_BUDGET_TOKENS,
        )

        kept_tokens = {}
        for r in selected:
            if r.kept:
                kept_tokens[r.source] = kept_tokens.get(r.source, 0) \
                    + r.n_tokens
        assert kept_tokens, "selection kept nothing"
        assert all(v <= QUALITY_BUDGET_TOKENS
                   for v in kept_tokens.values())

    def test_greedy_best_quality_first(self, selected):
        """No dropped doc outranks a kept doc within its source."""
        for source in {r.source for r in selected}:
            rows = [r for r in selected if r.source == source]
            kept = [(r.q_micros, -r.doc_id) for r in rows if r.kept]
            drop = [(r.q_micros, -r.doc_id) for r in rows if not r.kept]
            if kept and drop:
                assert min(kept) > max(drop)

    def test_selection_nonempty_and_partial(self, selected):
        kept = sum(r.kept for r in selected)
        assert 0 < kept < len(selected)
