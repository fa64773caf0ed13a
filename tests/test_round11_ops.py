"""Round-11 operator tests: decontamination recall audit and URL
canonicalization dedup (the perceptual dHash family is covered in
test_perceptual.py)."""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import duckdb
import pytest

from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
from dystonse_gtfs_importer_spark.functions import pii_sql as PII
from dystonse_gtfs_importer_spark.functions import sql_shared as S


def canon_py(url: str) -> str:
    """Independent urllib-based twin of pii_sql.url_canon_ctes — used
    to cross-check the SQL canonicalizer derivation-independently."""
    sp = urlsplit(url)
    scheme = sp.scheme.lower()
    hostport = sp.netloc.lower()
    if scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[:-4]
    if scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[:-3]
    path = sp.path
    path = "" if path in ("", "/") else re.sub("/+$", "", path)
    params = [t for t in sp.query.split("&")
              if t and not t.startswith(PII.TRACKING_PREFIX)
              and not any(t.startswith(p + "=")
                          for p in PII.TRACKING_PARAMS)]
    q = "&".join(sorted(params))
    return scheme + "://" + hostport + path + (("?" + q) if q else "")


def _canon_sql(con, urls: list[str]) -> list[str]:
    vals = ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
    rows = con.execute(f"""
        WITH urls(doc_id, url) AS (VALUES {vals}),
        {PII.url_canon_ctes(S.DUCKDB)}
        SELECT url_canon FROM canon ORDER BY doc_id
    """).fetchall()
    return [r[0] for r in rows]


EDGE_URLS = [
    "HTTP://Example.COM:80/a/b/?utm_source=x&id=1",
    "https://example.com/",
    "https://example.com:443",
    "https://example.com/p?fbclid=1",
    "https://example.com/p?b=2&a=1",
    "https://example.com:8080/p",
    "ftp://Example.com/x",
    "https://example.com/p#frag",
    "https://example.com/p?utm_campaign=x&gclid=2",
    "https://Sub.Example.com/A/B?ref_src=tw&z=9&a=0#x",
]


class TestMediaDedupCli:
    def test_image_media_dedup_cli(self, spark, tmp_path, capsys):
        """`corpus media-dedup` end to end: a media parquet with a
        planted near-dup image loses the duplicate, keeps the rest,
        and prints the accounting line."""
        import json as _json

        from dystonse_gtfs_importer_spark.cli import main
        from dystonse_gtfs_importer_spark.operators import (
            perceptual as P,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import encode_png

        base = P.synth_grid(6)
        edit = base.copy()
        edit[4, 4] = (int(edit[4, 4]) + 128) % 256
        rows = [(10, bytearray(encode_png(base))),
                (11, bytearray(encode_png(edit))),
                (12, bytearray(encode_png(P.synth_grid(33))))]
        media_path = tmp_path / "media.parquet"
        spark.createDataFrame(rows, "media_id long, payload binary") \
            .write.parquet(str(media_path))
        rc = main(["-s", "x", "--dir", str(tmp_path), "corpus",
                   "media-dedup", "--media", str(media_path),
                   "--modality", "image",
                   "--out", str(tmp_path / "keep.parquet")],
                  spark=spark)
        assert rc == 0
        acct = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert acct["n_media"] == 3 and acct["n_keepers"] == 2 \
            and acct["n_dropped"] == 1
        kept = sorted(r.media_id for r in spark.read.parquet(
            str(tmp_path / "keep.parquet")).collect())
        assert kept == [10, 12]

    def test_undecodable_media_survive_as_singleton_keepers(
            self, spark, tmp_path, capsys):
        """Uniform keeper semantics across modalities (round-12
        ADVICE): an image payload that fails to decode never
        fingerprints, but it must still survive as a singleton keeper
        (like the video leg) and be counted in n_undecodable."""
        import json as _json

        from dystonse_gtfs_importer_spark.cli import main
        from dystonse_gtfs_importer_spark.operators import (
            perceptual as P,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import encode_png

        base = P.synth_grid(6)
        edit = base.copy()
        edit[4, 4] = (int(edit[4, 4]) + 128) % 256
        rows = [(10, bytearray(encode_png(base))),
                (11, bytearray(encode_png(edit))),
                (12, bytearray(b"definitely not a PNG"))]
        media_path = tmp_path / "media2.parquet"
        spark.createDataFrame(rows, "media_id long, payload binary") \
            .write.parquet(str(media_path))
        rc = main(["-s", "x", "--dir", str(tmp_path), "corpus",
                   "media-dedup", "--media", str(media_path),
                   "--modality", "image",
                   "--out", str(tmp_path / "keep2.parquet")],
                  spark=spark)
        assert rc == 0
        acct = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert acct["n_media"] == 3 and acct["n_keepers"] == 2 \
            and acct["n_dropped"] == 1 and acct["n_undecodable"] == 1
        kept = sorted(r.media_id for r in spark.read.parquet(
            str(tmp_path / "keep2.parquet")).collect())
        assert kept == [10, 12]

    def test_video_media_dedup_cli(self, spark, tmp_path, capsys):
        import json as _json

        from dystonse_gtfs_importer_spark.cli import main
        from dystonse_gtfs_importer_spark.functions.dedup_sql import (
            VHASH_FRAMES,
        )
        from dystonse_gtfs_importer_spark.operators import (
            perceptual as P,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import encode_png

        fr = [bytearray(encode_png(P.synth_video_frame(2, f)))
              for f in range(VHASH_FRAMES)]
        recut = list(reversed(fr))
        other = [bytearray(encode_png(P.synth_video_frame(77, f)))
                 for f in range(VHASH_FRAMES)]
        media_path = tmp_path / "vids.parquet"
        spark.createDataFrame(
            [(1, fr), (2, recut), (3, other)],
            "media_id long, frames array<binary>") \
            .write.parquet(str(media_path))
        rc = main(["-s", "x", "--dir", str(tmp_path), "corpus",
                   "media-dedup", "--media", str(media_path),
                   "--modality", "video",
                   "--out", str(tmp_path / "vkeep.parquet")],
                  spark=spark)
        assert rc == 0
        acct = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert acct["n_keepers"] == 2 and acct["n_dropped"] == 1
        kept = sorted(r.media_id for r in spark.read.parquet(
            str(tmp_path / "vkeep.parquet")).collect())
        assert kept == [1, 3]


class TestUrlCanon:
    def test_edge_cases_match_urllib(self):
        con = duckdb.connect()
        got = _canon_sql(con, EDGE_URLS)
        want = [canon_py(u) for u in EDGE_URLS]
        assert got == want

    def test_pinned_expectations(self):
        """A few hand-written expectations so a joint bug in both
        derivations can't hide."""
        con = duckdb.connect()
        got = _canon_sql(con, EDGE_URLS[:6])
        assert got == [
            "http://example.com/a/b?id=1",
            "https://example.com",
            "https://example.com",
            "https://example.com/p",
            "https://example.com/p?a=1&b=2",
            "https://example.com:8080/p",
        ]

    def test_spark_edge_cases_match(self, spark):
        sql_urls = ", ".join(f"({i}, '{u}')"
                             for i, u in enumerate(EDGE_URLS))
        df = spark.sql(f"""
            WITH urls AS (
                SELECT col1 AS doc_id, col2 AS url
                FROM VALUES {sql_urls}
            ),
            {PII.url_canon_ctes(S.SPARK)}
            SELECT url_canon FROM canon ORDER BY doc_id
        """)
        got = [r.url_canon for r in df.collect()]
        assert got == [canon_py(u) for u in EDGE_URLS]

    def test_synth_family_matches_urllib(self, duck):
        """Every synthetic messy URL of the registry fixture must
        canonicalize identically under the SQL chain and the urllib
        twin — 500 rows of derivation independence."""
        rows = duck.execute(f"""
            WITH urls AS (
                SELECT doc_id, {PII.synth_url_expr(S.DUCKDB)} AS url
                FROM documents
            ),
            {PII.url_canon_ctes(S.DUCKDB)}
            SELECT url, url_canon FROM canon
        """).fetchall()
        assert len(rows) == 500
        for url, url_canon in rows:
            assert url_canon == canon_py(url), url

    def test_host_split_atomic_per_host(self, duck):
        """Every document of one canonical host gets ONE split — the
        case-noisy raw spellings (SRC3 vs src3) cannot straddle."""
        rows = duck.execute(PII.q_url_host_split(S.DUCKDB)).fetchall()
        assert len(rows) == 500
        per_host: dict[str, set] = {}
        for _doc, host, split in rows:
            assert host and host == host.lower()
            per_host.setdefault(host, set()).add(split)
        assert len(per_host) == 20
        assert all(len(s) == 1 for s in per_host.values())
        splits = {s for v in per_host.values() for s in v}
        assert splits <= {"train", "valid", "test"} and "train" in splits

    def test_dedup_collapses_planted_variants(self, duck):
        """The registry query must find real collapses (n_variants >
        1) AND keep the unique-path rows singleton."""
        rows = duck.execute(
            PII.q_url_canonical_dedup(S.DUCKDB)).fetchall()
        assert sum(1 for r in rows if r[3] > 1) >= 20
        singles = [r for r in rows if "/docs/u" in r[0]]
        assert singles and all(r[2] == 1 for r in singles)
        # keeper is the min doc_id; n_dups >= n_variants always
        assert all(r[2] >= r[3] >= 1 for r in rows)


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

    def test_tables_sweep_monotone_and_subset(self, duck):
        """More LSH tables can only ADD candidates (a union of
        bucketings), so flagged counts and recall are monotone
        non-decreasing in table count, subsets throughout."""
        rows = duck.execute(
            ANN.q_embedding_decontam_recall_tables(S.DUCKDB)).fetchall()
        rows.sort()
        assert [r[0] for r in rows] == [2, 4, 8]
        assert len({r[1] for r in rows}) == 1      # one exact truth
        for (a, b) in zip(rows, rows[1:]):
            assert b[2] >= a[2] and b[4] >= a[4]
        for r in rows:
            assert r[3] == r[2] <= r[1] and 0 <= r[4] <= 10000

    def test_recall_is_not_trivially_perfect(self, duck):
        """The fixture's near-random embeddings are LSH's worst case:
        the audit must MEASURE a real gap (recall < 100%), otherwise
        it isn't auditing anything."""
        rows = duck.execute(
            ANN.q_embedding_decontam_recall(S.DUCKDB)).fetchall()
        assert any(r[4] < 10000 for r in rows)
        assert all(r[1] > 0 for r in rows)


class TestMediaDedupCliRound12:
    """Round-12 CLI faces: spectral audio fingerprints and order-aware
    video shingles through `corpus media-dedup`."""

    def test_order_aware_video_keeps_reversed_recut(
            self, spark, tmp_path, capsys):
        """--order-aware: a reversed re-cut shares all stills but no
        order-2 shingles, so BOTH videos survive (vs the containment
        default, which merges them — pinned by
        test_video_media_dedup_cli)."""
        import json as _json

        from dystonse_gtfs_importer_spark.cli import main
        from dystonse_gtfs_importer_spark.functions.dedup_sql import (
            VHASH_FRAMES,
        )
        from dystonse_gtfs_importer_spark.operators import (
            perceptual as P,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import encode_png

        fr = [bytearray(encode_png(P.synth_video_frame(2, f)))
              for f in range(VHASH_FRAMES)]
        recut = list(reversed(fr))
        dup = list(fr)
        media_path = tmp_path / "vids12.parquet"
        spark.createDataFrame(
            [(1, fr), (2, recut), (3, dup)],
            "media_id long, frames array<binary>") \
            .write.parquet(str(media_path))
        rc = main(["-s", "x", "--dir", str(tmp_path), "corpus",
                   "media-dedup", "--media", str(media_path),
                   "--modality", "video", "--order-aware",
                   "--out", str(tmp_path / "vkeep12.parquet")],
                  spark=spark)
        assert rc == 0
        acct = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert acct["mode"] == "shingle"
        # the true aligned duplicate (3) merges with 1; the reversed
        # re-cut (2) survives
        kept = sorted(r.media_id for r in spark.read.parquet(
            str(tmp_path / "vkeep12.parquet")).collect())
        assert kept == [1, 2]

    def test_spectral_audio_catches_pitch_change(
            self, spark, tmp_path, capsys):
        """Default audio fingerprint is spectral: a clip and its
        DC-perturbed family twin merge; with --audio-fingerprint
        energy the same pair ALSO merges (envelope sees DC), but a
        pitch-flipped twin only merges under energy (which is blind
        to it) — spectral correctly keeps it apart only if distant.
        Here we pin the spectral grouping of the planted family."""
        import json as _json
        import numpy as np

        from dystonse_gtfs_importer_spark.cli import main
        from dystonse_gtfs_importer_spark.operators import (
            perceptual as P,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import encode_wav

        def clip(vec_id, flip=False):
            dc, amp, tone = P.synth_spectral_params(vec_id)
            if flip:
                tone = np.where(tone == 2, 4, 2)
            ints = P._spectral_samples(dc, amp, tone)
            return bytearray(encode_wav(
                (ints / 32767.0).astype(np.float32)))

        rows = [(10, clip(0)), (11, clip(1)),      # planted family
                (12, clip(0, flip=True)),          # pitch flip of 10
                (13, clip(8))]                     # unrelated
        media_path = tmp_path / "aud12.parquet"
        spark.createDataFrame(rows, "media_id long, payload binary") \
            .write.parquet(str(media_path))
        rc = main(["-s", "x", "--dir", str(tmp_path), "corpus",
                   "media-dedup", "--media", str(media_path),
                   "--modality", "audio",
                   "--out", str(tmp_path / "akeep12.parquet")],
                  spark=spark)
        assert rc == 0
        acct = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert acct["mode"] == "spectral"
        kept = sorted(r.media_id for r in spark.read.parquet(
            str(tmp_path / "akeep12.parquet")).collect())
        # family twin 11 merges into 10; the PITCH FLIP 12 survives
        # (spectral sees it as different content); unrelated 13 stays
        assert kept == [10, 12, 13]

    def test_energy_mode_merges_the_pitch_flip(
            self, spark, tmp_path, capsys):
        """--audio-fingerprint energy: the pitch-blind envelope hash
        sees the flipped clip as an EXACT twin and drops it — the
        behavioral difference the spectral default fixes."""
        import json as _json
        import numpy as np

        from dystonse_gtfs_importer_spark.cli import main
        from dystonse_gtfs_importer_spark.operators import (
            perceptual as P,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import encode_wav

        def clip(vec_id, flip=False):
            dc, amp, tone = P.synth_spectral_params(vec_id)
            if flip:
                tone = np.where(tone == 2, 4, 2)
            ints = P._spectral_samples(dc, amp, tone)
            return bytearray(encode_wav(
                (ints / 32767.0).astype(np.float32)))

        rows = [(10, clip(0)), (12, clip(0, flip=True))]
        media_path = tmp_path / "aud12e.parquet"
        spark.createDataFrame(rows, "media_id long, payload binary") \
            .write.parquet(str(media_path))
        rc = main(["-s", "x", "--dir", str(tmp_path), "corpus",
                   "media-dedup", "--media", str(media_path),
                   "--modality", "audio",
                   "--audio-fingerprint", "energy",
                   "--out", str(tmp_path / "akeep12e.parquet")],
                  spark=spark)
        assert rc == 0
        acct = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert acct["mode"] == "energy"
        kept = sorted(r.media_id for r in spark.read.parquet(
            str(tmp_path / "akeep12e.parquet")).collect())
        assert kept == [10]
