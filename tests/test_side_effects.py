"""S21 ping, ST6 retry, C19 URL codec, C22 data-URL — the four §2
items the reference implements outside its data path
(importer/mod.rs:268-292, batched_statements.rs:59-96,
monitor/mod.rs:25-27, monitor/mod.rs:1260-1261)."""

from __future__ import annotations

import base64
import urllib.parse

import pytest

from dystonse_gtfs_importer_spark.functions import sql_shared as S
from dystonse_gtfs_importer_spark.sources.store import retry_with_backoff
from dystonse_gtfs_importer_spark.streaming.import_stream import Pinger


class TestPinger:
    def test_rate_limited_to_once_per_interval(self):
        calls: list[str] = []
        t = [0.0]
        p = Pinger("http://example.invalid/ping", min_interval_s=60,
                   http_get=calls.append, clock=lambda: t[0])
        assert p.ping() is True          # first always fires
        assert p.ping() is False         # same instant: suppressed
        t[0] = 59.9
        assert p.ping() is False
        t[0] = 60.0
        assert p.ping() is True
        assert calls == ["http://example.invalid/ping"] * 2

    def test_http_failure_is_swallowed(self):
        def boom(_url: str) -> None:
            raise OSError("network down")

        p = Pinger("http://example.invalid/ping", http_get=boom,
                   clock=lambda: 0.0)
        assert p.ping() is True  # does not raise, counts as fired


class TestRetryWithBackoff:
    def test_succeeds_after_transient_failures(self):
        sleeps: list[float] = []
        attempts = [0]

        def flaky():
            attempts[0] += 1
            if attempts[0] < 3:
                raise RuntimeError("deadlock 1213")
            return "ok"

        out = retry_with_backoff(flaky, retries=5, base_sleep_s=5,
                                 sleep=sleeps.append)
        assert out == "ok"
        assert attempts[0] == 3
        assert sleeps == [5, 5]  # Fibonacci: 1,1,2,3,5 × base

    def test_fibonacci_backoff_sequence(self):
        sleeps: list[float] = []

        def always_fails():
            raise RuntimeError("nope")

        with pytest.raises(RuntimeError):
            retry_with_backoff(always_fails, retries=5, base_sleep_s=1,
                               sleep=sleeps.append)
        assert sleeps == [1, 1, 2, 3, 5]

    def test_non_retryable_raises_immediately(self):
        attempts = [0]

        def fails():
            attempts[0] += 1
            raise ValueError("schema mismatch")

        with pytest.raises(ValueError):
            retry_with_backoff(
                fails, retries=5,
                retryable=lambda e: isinstance(e, RuntimeError),
                sleep=lambda s: None)
        assert attempts[0] == 1


class TestUrlCodec:
    def test_roundtrip_and_python_parity(self, spark):
        vals = ["Hauptbahnhof Nord", "a/b?c=d&e", "Ümlaut+straße", "plain"]
        rows = spark.createDataFrame([(v,) for v in vals], "s string") \
            .selectExpr(f"{S.url_encode('s')} AS enc", "s").collect()
        for r in rows:
            # Spark url_encode is form-encoding: space → '+'
            assert r.enc == urllib.parse.quote_plus(r.s)
        dec = spark.createDataFrame([(urllib.parse.quote_plus(v),)
                                     for v in vals], "e string") \
            .selectExpr(f"{S.url_decode('e')} AS dec").collect()
        assert [r.dec for r in dec] == vals


class TestDataUrl:
    def test_matches_python_base64(self, spark):
        payload = bytes(range(256)) * 5  # >76 bytes → would MIME-wrap
        df = spark.createDataFrame([(payload,)], "content binary")
        expr = S.data_url("'image/png'", "content")
        got = df.selectExpr(f"{expr} AS u").first().u
        want = "data:image/png;base64," + \
            base64.b64encode(payload).decode()
        assert got == want
