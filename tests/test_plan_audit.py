"""Blanket plan audit over the ENTIRE registry: no query may contain
a cross join without a provably-tiny side or a globally-partitioned
window over non-aggregated input, except the two whitelisted textbook
derivations whose banded scale twins are separately registered.  The
per-operator plan-shape tests pin specific shapes; this is the
complement that stops scale-hostile plans hiding in unpinned
queries."""

from __future__ import annotations

import os

import pytest


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_PLAN_AUDIT", "") != "1",
    reason="multi-minute whole-registry Catalyst pass (~200-270 s, the "
           "single slowest test in the suite and the 93% stall that "
           "overran the round-12 VERIFY budget); the identical audit "
           "runs standalone as tools/audit_plans.py, which the round "
           "attestation executes and records — set "
           "SPARK_GRAFT_PLAN_AUDIT=1 to run it in-suite too")
def test_registry_plans_scale_clean(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from __spark_entry__ import queries
    from dystonse_gtfs_importer_spark.session import configure_for_oracle
    from tools.audit_plans import WHITELIST, audit

    configure_for_oracle(spark)
    report = audit(spark, queries())
    assert {k: tuple(v) for k, v in report.items()} == WHITELIST
