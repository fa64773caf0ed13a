"""Prefix-filtered Jaccard join: lossless-ness of the PPJoin-style
candidate pruning on a SKEWED corpus (where the filter actually
prunes — the driver corpus is uniform, so the sf0.01 hash match alone
exercises little pruning) plus the size-order index-prefix branch."""

from __future__ import annotations

import duckdb
import pandas as pd

from dystonse_gtfs_importer_spark.functions import dedup_sql as D
from dystonse_gtfs_importer_spark.functions import sql_shared as S


def _both(spark, pdf: pd.DataFrame, template) -> tuple[list, list]:
    from dystonse_gtfs_importer_spark.session import configure_for_oracle

    configure_for_oracle(spark)
    spark.createDataFrame(pdf).createOrReplaceTempView("documents")
    s_rows = sorted(tuple(r) for r in spark.sql(template(S.SPARK)).collect())
    con = duckdb.connect()
    con.register("documents", pdf)
    d_rows = sorted(tuple(r) for r in con.execute(template(S.DUCKDB)).fetchall())
    return s_rows, d_rows


def _skewed_corpus() -> pd.DataFrame:
    # Zipf-ish: 'the of and' in nearly every doc, rare tokens define
    # identity; sizes vary so the asymmetric index prefix is exercised
    rows = []
    for i in range(30):
        rare = f"r{i} s{i} t{i}"
        rows.append((i, f"the of and {rare}", "s"))
        if i % 3 == 0:  # a true near-duplicate with one extra token
            rows.append((1000 + i, f"the of and {rare} x{i}", "s"))
    rows.append((2000, "the of and", "s"))          # tiny all-stopword doc
    rows.append((2001, "the of and is was were be been being by at on", "s"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "source"])


class TestPrefixJaccard:
    def test_prefix_equals_textbook_on_skewed_corpus(self, spark):
        pdf = _skewed_corpus()
        got_s, got_d = _both(spark, pdf, D.q_ngram_jaccard_prefix)
        assert got_s == got_d
        ref_s, ref_d = _both(spark, pdf, D.q_ngram_jaccard_pairs)
        assert ref_s == ref_d
        assert got_s == ref_s, (
            "prefix filtering dropped or invented pairs")
        # the near-duplicate construction really produced pairs
        assert any(a % 1000 == b % 1000 for a, b, _ in got_s)

    def test_threshold_sweep_stays_lossless(self, spark):
        pdf = _skewed_corpus()
        for t in (0.3, 0.7, 0.9):
            got_s, _ = _both(spark, pdf,
                             lambda d, t=t: D.q_ngram_jaccard_prefix(d, t))
            ref_s, _ = _both(spark, pdf,
                             lambda d, t=t: D.q_ngram_jaccard_pairs(d, t))
            assert got_s == ref_s, t


class TestSimhash64:
    """60-bit SimHash: band pigeonhole losslessness and exact integer
    bit extraction above the float-53-bit boundary (both engines)."""

    def _corpus(self) -> pd.DataFrame:
        rows = []
        for g in range(40):
            base = " ".join(f"w{g}t{j}" for j in range(24))
            rows.append((2 * g, base, "en", "s", len(base)))
            # near-dup partner: drop two trailing tokens
            near = " ".join(base.split()[:-2])
            rows.append((2 * g + 1, near, "en", "s", len(near)))
        return pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"])

    def test_banded_matches_quadratic_both_engines(self, spark):
        pdf = self._corpus()
        sq, dq = _both(spark, pdf, D.q_simhash64_near_pairs)
        sb, db = _both(spark, pdf, D.q_simhash64_near_pairs_banded)
        assert sq == dq == sb == db
        # every group's pair is found (identical-token-set margin is
        # large enough that dropping 2 of 24 tokens flips <= 3 bits
        # only sometimes; require the exact-dup structure instead)
        assert len(sq) >= 1
        # no cross-group coincidental pairs at 60 bits
        assert all(a // 2 == b // 2 for a, b, _ in sq)

    def test_fingerprint_uses_full_width(self, spark):
        from dystonse_gtfs_importer_spark.session import configure_for_oracle

        configure_for_oracle(spark)
        pdf = self._corpus()
        spark.createDataFrame(pdf).createOrReplaceTempView("documents")
        vals = [r.simhash for r in
                spark.sql(D.q_simhash64(S.SPARK)).collect()]
        assert all(0 <= v < (1 << 60) for v in vals)
        assert max(vals) >= (1 << 53), "high bits never set"
