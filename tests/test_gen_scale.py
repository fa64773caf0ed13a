"""tools/gen_scale.py invariants: replicas preserve join selectivity —
every FK resolves, and per-key fan-out matches the source exactly."""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.1"


def test_replica_fk_integrity_and_fanout(tmp_path):
    out = tmp_path / "scaled"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_scale.py"), "2",
         str(out)], check=True, capture_output=True)
    con = duckdb.connect()
    li, part, supp, orders, cust = (
        f"'{out}/lineitem.parquet'", f"'{out}/part.parquet'",
        f"'{out}/supplier.parquet'", f"'{out}/orders.parquet'",
        f"'{out}/customer.parquet'")
    # zero dangling FKs after replication
    for fk, dim, pk in (("l_partkey", part, "p_partkey"),
                        ("l_suppkey", supp, "s_suppkey"),
                        ("l_orderkey", orders, "o_orderkey")):
        dangling = con.execute(
            f"SELECT COUNT(*) FROM {li} l WHERE NOT EXISTS "
            f"(SELECT 1 FROM {dim} d WHERE d.{pk} = l.{fk})"
        ).fetchone()[0]
        assert dangling == 0, f"{fk}: {dangling} dangling rows"
    dangling = con.execute(
        f"SELECT COUNT(*) FROM {orders} o WHERE NOT EXISTS "
        f"(SELECT 1 FROM {cust} c WHERE c.c_custkey = o.o_custkey)"
    ).fetchone()[0]
    assert dangling == 0
    # per-key fan-out unchanged: the hottest part key sees exactly the
    # source's row count, not K times it
    src_max, rep_max = (con.execute(
        f"SELECT MAX(n) FROM (SELECT COUNT(*) AS n FROM {t} "
        f"GROUP BY l_partkey)").fetchone()[0]
        for t in (f"'{SRC}/lineitem.parquet'", li))
    assert rep_max == src_max
    # and total volume scales by K
    src_n, rep_n = (con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
                    for t in (f"'{SRC}/lineitem.parquet'", li))
    assert rep_n == 2 * src_n
