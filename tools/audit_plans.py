#!/usr/bin/env python3
"""Blanket scale audit of EVERY registry query's optimized plan: flag
(a) cross joins where no side is provably tiny (constant relation,
LIMIT, one-row aggregate, scalar-joined scalars, or an explicit
broadcast hint) and (b) globally-partitioned Window nodes whose input
is not an aggregate — the two shapes that stop scaling at 100 TB.

The per-query plan-shape tests (tests/test_plan_shape.py) pin the
shapes of specific operators; this audit is the complement: nothing
in the registry can regress into a scale-hostile plan without either
fixing it or consciously whitelisting it here.

tests/test_plan_audit.py asserts flags == WHITELIST exactly.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"

# Known-acceptable flags, each with its justification:
WHITELIST: dict[str, tuple[str, ...]] = {
    # textbook single-window derivations whose banded scale twin is
    # separately registered and cross-verified
    "equidepth_histogram": ("global-window",),
    "histogram_quantiles": ("global-window", "global-window"),
    # IVF-family centroid/seed cross joins: the joined side is a
    # grouped aggregate whose key domain is the seed index of a
    # LIMIT-{8} table, so it holds <= IVF_CELLS rows by construction
    # — bounded in fact, but the structural prover cannot see a
    # grouping key's domain through an aggregate.  Plan-shape tests
    # pin the all-broadcast physical form (test_plan_shape.py).
    "ann_ivf_topk": ("cross-join", "cross-join"),
    "ann_ivfpq_topk": ("cross-join", "cross-join"),
    "ann_recall": ("cross-join",) * 8,
    "pq_recall": ("cross-join", "cross-join"),
    # kmeans_lloyd2: same pattern — the k-centroid table is grouped
    # on the bounded seed id
    "kmeans_lloyd2": ("cross-join", "cross-join"),
}


def _nodes(n, out):
    out.append(n)
    kids = n.children()
    for i in range(kids.length()):
        _nodes(kids.apply(i), out)
    return out


def _is_bounded(n) -> bool:
    """True if the subtree's row count is provably bounded by a
    constant, STRUCTURALLY (no substring matching over the whole
    plan string — a corpus-sized side containing a nested LIMIT
    subquery must NOT pass): constant relations, LIMITs, one-row
    aggregates, generators over bounded input, and compositions of
    bounded inputs."""
    nm = n.nodeName()
    head = str(n).split("\n")[0]
    if head.startswith("OneRowRelation") or nm in ("LocalRelation",
                                                   "OneRowRelation"):
        return True
    if nm in ("GlobalLimit", "LocalLimit"):
        return True
    if nm == "Aggregate":
        try:
            if n.groupingExpressions().length() == 0:
                return True
        except Exception:
            pass
        # grouped aggregate over bounded input stays bounded
        kids = n.children()
        return kids.length() == 1 and _is_bounded(kids.apply(0))
    if nm in ("Join",):
        kids = n.children()
        return all(_is_bounded(kids.apply(i))
                   for i in range(kids.length()))
    if nm in ("Project", "Filter", "SubqueryAlias", "Sort", "Window",
              "Generate", "Expand", "Distinct", "Union"):
        # Generate over a constant array is bounded by the array size
        kids = n.children()
        return kids.length() >= 1 and all(
            _is_bounded(kids.apply(i)) for i in range(kids.length()))
    return False


def _cross_join_ok(n) -> bool:
    head = str(n).split("\n")[0]
    if "strategy=broadcast" in head:
        # explicit broadcast hint: the replicated side is declared
        # dimension-sized (the skew-salting pattern)
        return True
    kids = n.children()
    return any(_is_bounded(kids.apply(i))
               for i in range(kids.length()))


def audit(spark, queries) -> dict[str, list[str]]:
    report: dict[str, list[str]] = {}
    for name, fn in queries.items():
        try:
            df = fn(spark, SF_DIR)
            root = df._jdf.queryExecution().optimizedPlan()
        except Exception as e:  # pragma: no cover - registry breakage
            report[name] = [f"ERROR:{type(e).__name__}"]
            continue
        flags = []
        for n in _nodes(root, []):
            nm = n.nodeName()
            if nm == "Join" and "Cross" in str(n.joinType()):
                if not _cross_join_ok(n):
                    flags.append("cross-join")
            elif nm == "Window":
                try:
                    psize = n.partitionSpec().length()
                except Exception:
                    psize = -1
                if psize == 0:
                    sub = [x.nodeName() for x in _nodes(n, [])[1:]]
                    if not ("Aggregate" in sub or "GlobalLimit" in sub
                            or "LocalRelation" in sub):
                        flags.append("global-window")
        if flags:
            report[name] = flags
    return report


def main() -> int:
    from __spark_entry__ import queries
    from dystonse_gtfs_importer_spark.session import (
        configure_for_oracle,
        get_spark,
    )

    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    configure_for_oracle(spark)
    report = audit(spark, queries())
    bad = {k: v for k, v in report.items()
           if tuple(v) != WHITELIST.get(k, ())}
    for k, v in sorted(report.items()):
        mark = "WHITELISTED" if k in WHITELIST and tuple(v) == \
            WHITELIST[k] else "FLAG"
        print(f"{mark:12s} {k}: {v}")
    print(f"audited {len(queries())} queries, "
          f"{len(report)} with notes, {len(bad)} unexplained")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
