"""Perceptual image dedup (dHash): codec-pipeline fingerprints,
planted near-duplicate detection, banding losslessness, and the
no-all-pairs plan pin."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from dystonse_gtfs_importer_spark.functions import dedup_sql as D
from dystonse_gtfs_importer_spark.functions import sql_shared as S
from dystonse_gtfs_importer_spark.operators import perceptual as P
from dystonse_gtfs_importer_spark.operators.media_codecs import encode_png


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class TestDhashKernel:
    def test_identical_images_hash_equal(self):
        img = P.synth_grid(7)
        assert P.dhash_64grid(img) == P.dhash_64grid(img.copy())

    def test_one_pixel_edit_is_near(self):
        """The planted-near-duplicate property: one perturbed pixel
        flips at most two gradient comparisons."""
        img = P.synth_grid(11)
        edited = img.copy()
        edited[3, 4] = (int(edited[3, 4]) + 128) % 256
        assert _hamming(P.dhash_64grid(img), P.dhash_64grid(edited)) <= 2

    def test_unrelated_images_are_far(self):
        h1 = P.dhash_64grid(P.synth_grid(0))
        h2 = P.dhash_64grid(P.synth_grid(3))  # different family
        assert _hamming(h1, h2) > 10

    def test_resample_invariance(self):
        """dHash is computed on the 9x8 resample, so an upscaled copy
        of the same image fingerprints identically — the property that
        makes the hash perceptual rather than byte-exact."""
        img = P.synth_grid(5)
        # nearest-neighbor 4x upscale: every source pixel becomes 4x4
        big = np.repeat(np.repeat(img, 4, axis=0), 4, axis=1)
        assert P.dhash_64grid(img) == P.dhash_64grid(big)

    def test_jpeg_reencode_stays_near(self):
        """The perceptual promise through a LOSSY codec: a smooth
        image re-encoded as quality-85 JPEG keeps (nearly) the same
        gradient signs, so the JPEG copy dedups against the PNG
        original.  Smooth content — JPEG of an 8x9 noise grid would
        legitimately scramble the fine gradients."""
        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            encode_jpeg,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs import (
            decode_image,
        )

        y, x = np.mgrid[0:32, 0:32]
        smooth = ((y * 4 + x * 3) % 256).astype(np.uint8)[:, :, None]
        h_png = P.dhash_64grid(smooth)
        jpg = encode_jpeg(np.repeat(smooth, 3, axis=2), quality=85)
        h_jpg = P.dhash_64grid(decode_image(jpg))
        assert _hamming(h_png, h_jpg) <= 3

    def test_rgb_luma_path(self):
        """3-channel images go through integer Rec.601 luma; a gray
        RGB image must hash like its single-channel twin."""
        gray = P.synth_grid(9)
        rgb = np.stack([gray, gray, gray], axis=2)
        assert P.dhash_64grid(rgb) == P.dhash_64grid(gray)

    def test_sign_bit_clear(self):
        for v in range(16):
            assert 0 <= P.dhash_64grid(P.synth_grid(v)) < (1 << D.DHASH_BITS)


class TestPipeline:
    def test_fingerprints_match_sql_grid(self, spark, sf_smoke):
        """The full codec path (PNG encode -> decode -> resample ->
        dHash) reproduces the pure-SQL grid derivation integer for
        integer — same comparison the driver's oracle gate runs."""
        import duckdb

        got = {(r.media_id, r.dhash)
               for r in P.image_dhash_query(spark, sf_smoke).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_smoke}/embeddings.parquet'")
        ref = {tuple(t)
               for t in con.execute(D.q_image_dhash(S.DUCKDB)).fetchall()}
        assert got == ref and len(got) > 0

    def test_corrupt_payload_dropped_not_fatal(self, spark):
        rows = [(1, bytearray(encode_png(P.synth_grid(1)))),
                (2, bytearray(b"not a png at all")),
                (3, bytearray(b""))]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        out = P.dhash_fingerprints(media).collect()
        assert [r.media_id for r in out] == [1]

    def test_planted_near_dup_detected_unrelated_not(self, spark):
        """Planted fixture: a re-encoded one-pixel edit of an image is
        found by the banded join; an unrelated image is not."""
        base = P.synth_grid(2)
        edit = base.copy()
        edit[5, 2] = (int(edit[5, 2]) + 128) % 256
        other = P.synth_grid(21)  # unrelated family
        media = spark.createDataFrame(
            [(10, bytearray(encode_png(base))),
             (11, bytearray(encode_png(edit))),
             (12, bytearray(encode_png(other)))],
            "media_id long, payload binary")
        pairs = {(r.media_a, r.media_b)
                 for r in P.image_near_pairs_banded(
                     P.dhash_fingerprints(media)).collect()}
        assert pairs == {(10, 11)}

    def test_banding_is_lossless_vs_quadratic(self, spark):
        """Randomized: banded pairs == brute-force pairs on clustered
        random fingerprints (seeds of near groups + noise)."""
        rng = np.random.default_rng(42)
        fps = []
        mid = 0
        for _ in range(30):
            seed = int(rng.integers(0, 1 << D.DHASH_BITS))
            for _ in range(int(rng.integers(1, 4))):
                h = seed
                for _f in range(int(rng.integers(0, 3))):
                    h ^= 1 << int(rng.integers(0, D.DHASH_BITS))
                fps.append((mid, h))
                mid += 1
        brute = {(a, b, _hamming(ha, hb))
                 for i, (a, ha) in enumerate(fps)
                 for b, hb in fps[i + 1:]
                 if _hamming(ha, hb) <= 3}
        fp_df = spark.createDataFrame(fps, "media_id long, dhash long")
        banded = {(r.media_a, r.media_b, r.hamming)
                  for r in P.image_near_pairs_banded(fp_df).collect()}
        assert banded == brute and len(brute) > 0

    def test_max_hamming_above_band_guarantee_rejected(self, spark):
        fp_df = spark.createDataFrame([(1, 5)], "media_id long, dhash long")
        with pytest.raises(ValueError):
            P.image_near_pairs_banded(fp_df, max_hamming=D.DHASH_BANDS)


class TestKeeperRule:
    def test_keeper_invariants_on_fixture(self, spark, sf_smoke):
        """Exactly one keeper per cluster, the keeper is the cluster's
        min id, cluster_size counts its members, and the synthetic
        family structure (odd/even group pairs) shows up as size-2
        clusters."""
        rows = P.image_dedup_keep_query(spark, sf_smoke).collect()
        assert len(rows) == 500
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for cid, members in by_cluster.items():
            ids = [m.media_id for m in members]
            assert cid == min(ids)
            assert sum(m.is_keeper for m in members) == 1
            assert all(m.cluster_size == len(members) for m in members)
        # sf0.001: 500 singleton groups pair up into 250 families
        assert sorted(len(m) for m in by_cluster.values()) == [2] * 250


class TestAudioEhash:
    def test_one_segment_edit_is_near_unrelated_far(self):
        amps = P.synth_amplitudes(4)
        base = np.repeat(amps * 100, P.EHASH_SEG_LEN) / 32767.0
        edited = amps.copy()
        edited[30] = (edited[30] + 128) % 256
        edit = np.repeat(edited * 100, P.EHASH_SEG_LEN) / 32767.0
        other = np.repeat(P.synth_amplitudes(9) * 100,
                          P.EHASH_SEG_LEN) / 32767.0

        def h(s):
            from dystonse_gtfs_importer_spark.operators.media_codecs \
                import decode_wav, encode_wav

            return P.ehash_of_samples(
                decode_wav(encode_wav(s.astype(np.float32)))[0])

        assert _hamming(h(base), h(edit)) <= 2
        assert _hamming(h(base), h(other)) > 10

    def test_stereo_mono_mix_invariant(self):
        """A stereo clip with the same signal on both channels mono-
        mixes to doubled energies — gradient signs, and therefore the
        hash, unchanged."""
        amps = P.synth_amplitudes(7) * 100
        mono = np.repeat(amps, P.EHASH_SEG_LEN) / 32767.0
        stereo = np.stack([mono, mono], axis=1)
        assert (P.ehash_of_samples(mono.astype(np.float32))
                == P.ehash_of_samples(stereo.astype(np.float32)))

    def test_fingerprints_match_sql_grid(self, spark, sf_smoke):
        import duckdb

        got = {(r.media_id, r.ehash)
               for r in P.audio_ehash_query(spark, sf_smoke).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_smoke}/embeddings.parquet'")
        ref = {tuple(t)
               for t in con.execute(D.q_audio_ehash(S.DUCKDB)).fetchall()}
        assert got == ref and len(got) > 0

    def test_corrupt_wav_dropped_not_fatal(self, spark):
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import encode_wav

        good = encode_wav(
            (np.repeat(P.synth_amplitudes(1) * 100, P.EHASH_SEG_LEN)
             / 32767.0).astype(np.float32))
        media = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"RIFFjunk"))],
            "media_id long, payload binary")
        out = P.ehash_fingerprints(media).collect()
        assert [r.media_id for r in out] == [1]


class TestVideoFamily:
    def test_family_shares_three_of_four_frames(self, spark, sf_smoke):
        """Odd-parity members replace exactly one frame, so family
        pairs land at n_common == 3 — and nothing else pairs."""
        pairs = P.video_near_pairs_query(spark, sf_smoke).collect()
        assert len(pairs) == 250
        assert all(r.n_common == 3 for r in pairs)
        assert all(r.media_b - r.media_a == 1 and r.media_a % 2 == 0
                   for r in pairs)

    def test_frame_hashes_match_sql_grid(self, spark, sf_smoke):
        import duckdb

        got = {(r.media_id, r.frame_idx, r.dhash)
               for r in P.video_frame_dhash_query(
                   spark, sf_smoke).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_smoke}/embeddings.parquet'")
        ref = {tuple(t) for t in con.execute(
            D.q_video_frame_dhash(S.DUCKDB)).fetchall()}
        assert got == ref and len(got) == 2000

    def test_corrupt_frame_drops_only_that_frame(self, spark):
        frames = [bytearray(encode_png(P.synth_video_frame(0, f)))
                  for f in range(D.VHASH_FRAMES)]
        frames[2] = bytearray(b"garbage")
        media = spark.createDataFrame(
            [(5, frames)], "media_id long, frames array<binary>")
        rows = P.video_frame_dhash(media).collect()
        assert sorted(r.frame_idx for r in rows) == [0, 1, 3]

    def test_reordered_frames_still_pair(self, spark):
        """Containment on the frame-hash SET is order-invariant: a
        re-cut of the same stills pairs at full n_common."""
        fr = [bytearray(encode_png(P.synth_video_frame(2, f)))
              for f in range(D.VHASH_FRAMES)]
        media = spark.createDataFrame(
            [(1, fr), (2, list(reversed(fr)))],
            "media_id long, frames array<binary>")
        pairs = P.video_near_pairs(P.video_frame_dhash(media)).collect()
        assert [(r.media_a, r.media_b, r.n_common) for r in pairs] \
            == [(1, 2, D.VHASH_FRAMES)]


class TestWebdatasetIntegration:
    def test_tar_shard_to_near_dup_pair(self, spark, tmp_path):
        """The lake-ingest wiring end to end: a WebDataset tar shard
        of real PNGs -> read_webdataset samples -> payload column ->
        codec dHash -> banded near-pairs finds the planted edit."""
        import io
        import tarfile

        from dystonse_gtfs_importer_spark.sources.webdataset import (
            read_webdataset,
        )

        base = P.synth_grid(3)
        edit = base.copy()
        edit[1, 6] = (int(edit[1, 6]) + 128) % 256
        other = P.synth_grid(40)
        shard = tmp_path / "shard-000.tar"
        with tarfile.open(shard, "w") as tf:
            for key, img in (("000000", base), ("000001", edit),
                             ("000002", other)):
                payload = encode_png(img)
                ti = tarfile.TarInfo(f"{key}.png")
                ti.size = len(payload)
                tf.addfile(ti, io.BytesIO(payload))
        samples = read_webdataset(spark, str(tmp_path))
        media = samples.select(
            F.element_at("payloads", 1).alias("payload"),
            F.col("sample_key").cast("long").alias("media_id"))
        pairs = {(r.media_a, r.media_b)
                 for r in P.image_near_pairs_banded(
                     P.dhash_fingerprints(media)).collect()}
        assert pairs == {(0, 1)}


class TestPlanShape:
    def test_no_cartesian_in_banded_plan(self, spark, sf_smoke):
        """The near-pair join must be a hash equi-join on (band, bv) —
        never an all-pairs product (the scale contract)."""
        df = P.image_near_pairs_query(spark, sf_smoke)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Cartesian" not in plan
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in executed
        assert "BroadcastNestedLoopJoin" not in executed

    def test_fingerprints_are_map_only(self, spark, sf_smoke):
        """Fingerprinting shuffles nothing: payload bytes stay inside
        one map-only Arrow pass."""
        df = P.image_dhash_query(spark, sf_smoke)
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in executed


class TestDistortionRecall:
    """Round-12 robustness audit: REAL distortions through the codecs,
    recall at the shipping hamming <= 3 threshold.  Values are
    deterministic (MD5 grids, integer pipelines) so they are PINNED —
    any kernel or codec change that moves recall must show up here."""

    def test_sql_class_recall_table(self, spark, sf_smoke):
        rows = {r.distortion: r for r in
                P.image_dedup_recall_query(spark, sf_smoke).collect()}
        assert set(rows) == set(D.RECALL_CLASSES)
        # integer-factor upscale is provably identity end to end
        up = rows["resize_up2"]
        assert (up.n_planted, up.n_recalled, up.recall_e4,
                up.mean_hamming_e2) == (250, 250, 10000, 0)
        # brightness clip flips only comparisons where BOTH pixels
        # saturate: near-total recall
        assert rows["bright_up"].recall_e4 == 10000
        assert rows["bright_down"].recall_e4 == 9960
        # 6x7 downscale of a WHITE-NOISE grid destroys the gradient
        # structure (adversarial lower bound; photos are smooth)
        assert rows["resize_down"].recall_e4 == 0
        assert rows["resize_down"].mean_hamming_e2 == 3220

    def test_jpeg_recall_pinned(self, spark, sf_smoke):
        """True JPEG re-encode (float DCT path, no SQL oracle): the
        rows-only registry entry's exact values, pinned here."""
        rows = {r.distortion: r for r in
                P.image_dedup_recall_jpeg_query(spark, sf_smoke)
                .collect()}
        q85, q50 = rows["jpeg_q85"], rows["jpeg_q50"]
        assert (q85.n_planted, q85.n_recalled, q85.recall_e4,
                q85.mean_hamming_e2) == (250, 222, 8880, 167)
        assert (q50.n_planted, q50.n_recalled, q50.recall_e4,
                q50.mean_hamming_e2) == (250, 56, 2240, 535)

    def test_recall_rows_are_map_only(self, spark, sf_smoke):
        """The per-pair hamming pass shuffles nothing — payloads and
        hashes stay inside one Arrow kernel; only the tiny per-class
        aggregate exchanges."""
        rows = P.distortion_recall_rows(spark, sf_smoke,
                                        D.RECALL_CLASSES)
        executed = rows._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in executed


class TestSpectralHash:
    """sHash (round 12): real rFFT band energies at the integer-exact
    bins, vs eHash's time-domain envelope — including the pitch-change
    fixture the envelope PROVABLY cannot see."""

    @staticmethod
    def _through_codec(dc, amp, tone):
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import decode_wav, encode_wav

        ints = P._spectral_samples(dc, amp, tone)
        samples, _ = decode_wav(encode_wav(
            (ints / 32767.0).astype(np.float32)))
        return samples

    def test_pitch_change_blinds_ehash_not_shash(self):
        """The planted pitch flip (every segment's tone bin 2 <-> 4,
        same DC and amplitude): with DC >= amplitude the per-segment
        L1 envelope is 8*DC*STEP for EITHER tone, so eHash of the two
        clips is IDENTICAL — while the spectral hash moves whole band
        columns (hamming 32 on family 0, far past the <= 3
        threshold).  This is the re-pitched/re-synthesized near-dup
        case that motivated the upgrade (VERDICT r11 #3)."""
        dc, amp, tone = P.synth_spectral_params(0)
        flipped = np.where(tone == 2, 4, 2)
        s_orig = self._through_codec(dc, amp, tone)
        s_flip = self._through_codec(dc, amp, flipped)
        # the envelope really is blind: exact per-segment L1 equality
        i_o = np.round(s_orig * 32768).astype(np.int64)
        i_f = np.round(s_flip * 32768).astype(np.int64)
        seg = D.SPEC_SEG_LEN
        assert (np.abs(i_o).reshape(-1, seg).sum(1)
                == np.abs(i_f).reshape(-1, seg).sum(1)).all()
        assert P.ehash_of_samples(s_orig) == P.ehash_of_samples(s_flip)
        h = _hamming(P.spectral_hash_of_samples(s_orig),
                     P.spectral_hash_of_samples(s_flip))
        assert h == 32

    def test_planted_family_within_two_bits(self):
        """Odd parity perturbs ONE segment's DC -> only that segment's
        B0 moves -> at most 2 bits flip."""
        for fam in range(25):
            a = self._through_codec(*P.synth_spectral_params(2 * fam))
            b = self._through_codec(
                *P.synth_spectral_params(2 * fam + 1))
            assert _hamming(P.spectral_hash_of_samples(a),
                            P.spectral_hash_of_samples(b)) <= 2

    def test_unrelated_clips_far(self):
        hs = [P.spectral_hash_of_samples(
            self._through_codec(*P.synth_spectral_params(2 * f)))
            for f in range(12)]
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                assert _hamming(hs[i], hs[j]) > 3

    def test_rfft_band_energy_is_integer_exact(self):
        """The cross-engine contract: numpy's float rFFT at bins
        0/2/4 reproduces the integer DFT algebra bit-for-bit on
        arbitrary int16 windows (twiddles in {±1, ±i},
        |X|^2 < 2^53)."""
        rng = np.random.RandomState(12)
        for _ in range(500):
            s = rng.randint(-32768, 32768, D.SPEC_SEG_LEN)
            X = np.fft.rfft(s.astype(np.float64))
            E = X.real ** 2 + X.imag ** 2
            e0 = float(s.sum()) ** 2
            re2 = s[0] - s[2] + s[4] - s[6]
            im2 = -(s[1] - s[3] + s[5] - s[7])
            e2 = float(re2) ** 2 + float(im2) ** 2
            e4 = float((s * (-1) ** np.arange(8)).sum()) ** 2
            assert E[0] == e0 and E[2] == e2 and E[4] == e4

    def test_fingerprints_are_map_only(self, spark, sf_smoke):
        df = P.audio_spectral_hash_query(spark, sf_smoke)
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in executed


class TestVideoShinglePairs:
    """Order-aware video near-dup (round 12): shingles separate a
    same-stills re-order from a true aligned near-dup."""

    @staticmethod
    def _video_df(spark, rows):
        from dystonse_gtfs_importer_spark.operators.media_codecs \
            import encode_png

        data = [(mid, [bytearray(encode_png(f)) for f in frames])
                for mid, frames in rows]
        return spark.createDataFrame(
            data, "media_id long, frames array<binary>")

    def test_reordered_video_separates_the_operators(self, spark):
        """The planted re-ordered-frames fixture (VERDICT r11 #4
        'done' criterion): a REVERSED video shares all 4 stills with
        its source — the order-insensitive containment operator pairs
        them — but shares ZERO order-2 shingles, so the order-aware
        operator stays silent."""
        from dystonse_gtfs_importer_spark.functions.dedup_sql import (
            VHASH_FRAMES,
        )

        frames = [P.synth_video_frame(2, f) for f in range(VHASH_FRAMES)]
        media = self._video_df(spark, [
            (1, frames), (2, list(reversed(frames)))])
        fp = P.video_frame_dhash(media)
        contain = {(r.media_a, r.media_b)
                   for r in P.video_near_pairs(fp).collect()}
        assert contain == {(1, 2)}
        assert P.video_shingle_pairs(fp).count() == 0

    def test_recut_with_aligned_run_pairs_with_evidence(self, spark):
        """A re-cut that keeps frames 1..3 contiguous (rotation
        [1,2,3,0]) shares two consecutive shingles -> one pair with
        n_common_shingles=2 and longest_run=3 (the aligned-run
        evidence)."""
        from dystonse_gtfs_importer_spark.functions.dedup_sql import (
            VHASH_FRAMES,
        )

        frames = [P.synth_video_frame(4, f) for f in range(VHASH_FRAMES)]
        rot = frames[1:] + frames[:1]
        media = self._video_df(spark, [(1, frames), (2, rot)])
        rows = P.video_shingle_pairs(
            P.video_frame_dhash(media)).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.media_a, r.media_b) == (1, 2)
        assert r.n_common_shingles == 2 and r.longest_run == 3

    def test_identical_videos_full_run(self, spark):
        from dystonse_gtfs_importer_spark.functions.dedup_sql import (
            VHASH_FRAMES,
        )

        frames = [P.synth_video_frame(6, f) for f in range(VHASH_FRAMES)]
        rows = P.video_shingle_pairs(P.video_frame_dhash(
            self._video_df(spark, [(1, frames), (2, frames)]))).collect()
        assert len(rows) == 1
        assert rows[0].n_common_shingles == VHASH_FRAMES - 1
        assert rows[0].longest_run == VHASH_FRAMES

    def test_no_cartesian_in_shingle_plan(self, spark, sf_smoke):
        df = P.video_shingle_pairs_query(spark, sf_smoke)
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in executed


class TestIterativeCcOracle:
    """Round-12 oracle-side machinery (VERDICT r11 #5): the unrolled
    min-label-propagation CC fragment that replaced the recursive
    ``reach`` CTE (quadratic working set on near-cliques)."""

    @staticmethod
    def _run(con, rounds=None):
        kw = {} if rounds is None else {"rounds": rounds}
        sql = f"""
        WITH
        edges AS MATERIALIZED (
            SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        nodes AS MATERIALIZED (SELECT i AS node FROM range(3000) t(i)),
        {D.cc_iterative_ctes(**kw)}
        SELECT COUNT(*) FILTER (WHERE cluster_id = 0) AS at_min,
               COUNT(*) FILTER (WHERE cluster_id IS NULL) AS nulls,
               COUNT(*) AS n
        FROM comp
        """
        return con.execute(sql).fetchone()

    def test_path_graph_converges_within_default_rounds(self):
        """A 3000-node PATH is the adversarial case for plain
        propagation (diameter 2999); pointer jumping closes it within
        the default 24 rounds (2^24 >> 3000)."""
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE e AS "
                    "SELECT i AS u, i + 1 AS v FROM range(2999) t(i)")
        at_min, nulls, n = self._run(con)
        assert (at_min, nulls, n) == (3000, 0, 3000)

    def test_sentinel_fires_loud_on_non_convergence(self):
        """If the round budget can't converge the graph, every
        cluster_id comes back NULL — a loud cross-engine mismatch,
        never a silently half-propagated labeling."""
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE e AS "
                    "SELECT i AS u, i + 1 AS v FROM range(2999) t(i)")
        at_min, nulls, n = self._run(con, rounds=4)
        assert nulls == n == 3000
