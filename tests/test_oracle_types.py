"""Static output-type lint over every registered oracle.

Two classes of column type silently break the driver's correctness
gate even when every VALUE agrees (round-5 reds, both fixed in
round 6):

* DuckDB widens integer SUMs to HUGEINT, which pandas renders as
  float64 while Spark stays int64 — the hashes diverge
  (histogram_quantiles).
* LIST/array cells reach pandas as ndarrays, which the driver's
  sort-based canonicalizer cannot factorize — the row errors out
  (posting_lists).

This lint binds every oracle against the sf0.001 schema and asserts
no output column is HUGEINT, LIST, or STRUCT.  DuckDB-only: no Spark
session, runs in seconds.  (The Spark side can't leak these — Spark
has no 128-bit integer, and array outputs would fail the same lint
here because the shared dialect templates render both sides.)
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

BANNED = ("HUGEINT", "[]", "LIST", "STRUCT", "MAP")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _oracles():
    from __spark_entry__ import oracle_sql

    return sorted(oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracles(),
                         ids=[n for n, _ in _oracles()])
def test_oracle_emits_driver_hashable_types(con, name, sql):
    rel = con.sql(sql)
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if any(b in str(t).upper() for b in BANNED)]
    assert not bad, (
        f"{name} emits driver-unhashable column types {bad}: CAST "
        f"integer aggregates to BIGINT and render arrays as ordered "
        f"CSV strings (Dialect.ordered_list_csv)")
