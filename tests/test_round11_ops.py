"""Round-11 operator tests: decontamination recall audit and URL
canonicalization dedup (the perceptual dHash family is covered in
test_perceptual.py)."""

from __future__ import annotations

import duckdb
import pytest

from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
from dystonse_gtfs_importer_spark.functions import sql_shared as S


@pytest.fixture(scope="module")
def duck(sf_correct):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_correct}/{t}.parquet'")
    return con


class TestDecontamRecallAudit:
    def test_subset_invariant_and_bounds(self, duck):
        """LSH-flagged must be a subset of exactly-flagged (same
        threshold on a candidate subset), so n_hit == n_lsh <= n_exact
        and recall_e4 in [0, 10000] — at EVERY threshold."""
        rows = duck.execute(
            ANN.q_embedding_decontam_recall(S.DUCKDB)).fetchall()
        assert len(rows) == 3
        for (t_e2, n_exact, n_lsh, n_hit, recall_e4, lsh_subset) in rows:
            assert lsh_subset == 1
            assert n_hit == n_lsh <= n_exact
            assert 0 <= recall_e4 <= 10000
            assert recall_e4 == (n_hit * 10000) // max(n_exact, 1)

    def test_lsh_flags_match_registered_decision(self, duck):
        """The audit's approximate leg is the registered
        q_embedding_decontamination VERBATIM: its n_lsh at the
        production threshold equals the registered query's row
        count."""
        row = [r for r in duck.execute(
            ANN.q_embedding_decontam_recall(S.DUCKDB)).fetchall()
            if r[0] == 35][0]
        n_reg = duck.execute(
            f"SELECT COUNT(*) FROM "
            f"({ANN.q_embedding_decontamination(S.DUCKDB)})"
        ).fetchone()[0]
        assert row[2] == n_reg

    def test_recall_is_not_trivially_perfect(self, duck):
        """The fixture's near-random embeddings are LSH's worst case:
        the audit must MEASURE a real gap (recall < 100%), otherwise
        it isn't auditing anything."""
        rows = duck.execute(
            ANN.q_embedding_decontam_recall(S.DUCKDB)).fetchall()
        assert any(r[4] < 10000 for r in rows)
        assert all(r[1] > 0 for r in rows)
