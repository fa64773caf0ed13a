"""PII scan + Gopher repetition signals: semantic checks on crafted
documents (the cross-engine hash match is the driver's job; these pin
WHAT the expressions compute)."""

from __future__ import annotations

import pytest

from dystonse_gtfs_importer_spark.functions import pii_sql as PII
from dystonse_gtfs_importer_spark.functions import sql_shared as S

DOCS = [
    # (doc_id, text)
    (1, "contact me at jane.doe@example.com or +49 30 1234567 today"),
    (2, "see https://example.com/a?b=c and http://foo.org then "
        "mail bob@foo.org"),
    (3, "server at 192.168.0.1 and 10.0.0.255 responded"),
    (4, "a perfectly clean sentence with no identifiers at all"),
    (5, "spam spam spam spam spam"),
    (6, "one two three four five six seven"),
    (7, ""),
]


@pytest.fixture(scope="module")
def results(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    df.createOrReplaceTempView("documents")
    pii = {r.doc_id: r for r in spark.sql(PII.q_pii_scan(S.SPARK)).collect()}
    rep = {r.doc_id: r
           for r in spark.sql(PII.q_repetition_signals(S.SPARK)).collect()}
    return pii, rep


class TestPiiScan:
    def test_counts_per_category(self, results):
        pii, _ = results
        assert (pii[1].n_email, pii[1].n_phone) == (1, 1)
        assert (pii[2].n_url, pii[2].n_email) == (2, 1)
        assert pii[3].n_ip == 2
        assert pii[4].n_pii == 0 and pii[4].is_clean == 1

    def test_email_inside_url_counts_once(self, results):
        # the URL stage swallows foo.org inside the link; only the
        # standalone bob@foo.org remains for the email stage
        pii, _ = results
        assert pii[2].n_pii == 3

    def test_redaction_is_observable_via_hash(self, spark, results):
        import hashlib
        pii, _ = results
        want = hashlib.md5(
            b"contact me at <EMAIL> or <PHONE> today").hexdigest()
        assert pii[1].redacted_hash == want


class TestRepetitionSignals:
    def test_all_same_token(self, results):
        _, rep = results
        r = rep[5]
        assert r.n_tokens == 5
        assert r.top_token_frac == 1.0
        assert r.dup_token_frac == pytest.approx(0.8)  # 5 - 1 distinct
        assert r.n_bigrams == 4
        assert r.top_bigram_frac == 1.0

    def test_all_distinct_tokens(self, results):
        _, rep = results
        r = rep[6]
        assert r.top_token_frac == pytest.approx(round(1 / 7, 4))
        assert r.dup_token_frac == 0.0
        assert r.dup_bigram_frac == 0.0

    def test_empty_document(self, results):
        _, rep = results
        r = rep[7]
        assert (r.n_tokens, r.n_bigrams) == (0, 0)
        assert r.top_token_frac == 0.0 and r.top_bigram_frac == 0.0
