"""JSONL ingest tests (sources/jsonl.py): good/bad split semantics,
malformed-line accounting, n_chars derivation, and the codegen plan
shape (no corrupt-column scan restriction, no Python)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

FIXTURE = "tests/data/documents.jsonl"


class TestJsonlIngest:
    @pytest.fixture(scope="class")
    def split(self, spark):
        from dystonse_gtfs_importer_spark.sources.jsonl import (
            read_documents_jsonl,
        )

        return read_documents_jsonl(spark, FIXTURE)

    def test_good_bad_accounting(self, split):
        good, bad = split
        n_good, n_bad = good.count(), bad.count()
        with open(FIXTURE) as fh:
            total = sum(1 for _ in fh)
        assert n_bad == 2
        assert n_good + n_bad == total      # no line silently dropped

    def test_bad_lines_verbatim(self, split):
        _good, bad = split
        lines = {r.raw_line for r in bad.collect()}
        assert "not json at all" in lines
        assert any(line.startswith('{"doc_id": 9000') for line in lines)

    def test_good_rows_parse_correctly(self, split):
        good, _bad = split
        rows = {r.doc_id: r for r in good.collect()}
        assert len(rows) == 120
        with open(FIXTURE) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                assert rows[rec["doc_id"]].text == rec["text"]
                assert rows[rec["doc_id"]].lang == rec["lang"]

    def test_n_chars_derived_when_absent(self, spark, tmp_path):
        from dystonse_gtfs_importer_spark.sources.jsonl import (
            read_documents_jsonl,
        )

        p = tmp_path / "nochars.jsonl"
        p.write_text('{"doc_id": 1, "text": "abcde", "lang": "en", '
                     '"source": "s"}\n')
        good, bad = read_documents_jsonl(spark, str(p))
        row = good.first()
        assert row.n_chars == 5 and bad.count() == 0

    def test_plan_is_jvm_codegen(self, split):
        good, _bad = split
        plan = good._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan

    def test_filter_pushes_into_good_side(self, split):
        good, _bad = split
        out = good.where(F.col("lang") == "de")
        assert out.count() == 40
