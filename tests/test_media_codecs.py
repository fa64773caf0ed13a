"""Real (pure-stdlib) PNG/WAV decode feeding the multimodal pipeline.

The decoders must handle genuine bytes — fixtures are real PNG files
(every filter type exercised via the round-trip) and real 16-bit PCM
WAVs — and the registered feature decoders must produce pixel-/
sample-derived vectors through the distributed ``mapInPandas`` path,
proving the executor-side registry snapshot ships with the task.
"""

from __future__ import annotations

import numpy as np
import pytest

from dystonse_gtfs_importer_spark.operators import media_codecs as MC


def _gradient_rgb(h=12, w=10):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 20
    img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 15
    img[:, :, 2] = 7
    return img


class TestPngCodec:
    def test_roundtrip_rgb(self):
        img = _gradient_rgb()
        assert np.array_equal(MC.decode_png(MC.encode_png(img)), img)

    def test_roundtrip_gray_and_rgba(self):
        gray = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3)[:, :, None]
        assert np.array_equal(MC.decode_png(MC.encode_png(gray)), gray)
        rgba = np.dstack([_gradient_rgb(8, 8),
                          np.full((8, 8), 200, np.uint8)])
        assert np.array_equal(MC.decode_png(MC.encode_png(rgba)), rgba)

    def test_all_filter_types_unfilter(self):
        """Hand-build one scanline per PNG filter (None/Sub/Up/Average/
        Paeth) and check the decoder reconstructs the reference image
        a filter-0 encoding of the same pixels yields."""
        import struct
        import zlib

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
        # reference decode via filter-0 encoder
        ref = MC.decode_png(MC.encode_png(img))

        # re-encode with filters 0..4, one per scanline
        def filt(y, ftype):
            line = img[y].reshape(-1).astype(np.int32)
            prev = (img[y - 1].reshape(-1).astype(np.int32)
                    if y > 0 else np.zeros_like(line))
            ch = 3
            out = np.empty_like(line)
            for x in range(line.size):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                out[x] = (line[x] - pred) & 0xFF
            return bytes([ftype]) + out.astype(np.uint8).tobytes()

        scan = b"".join(filt(y, y % 5) for y in range(5))

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        payload = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2,
                                                0, 0, 0))
                   + chunk(b"IDAT", zlib.compress(scan))
                   + chunk(b"IEND", b""))
        assert np.array_equal(MC.decode_png(payload), ref)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            MC.decode_png(b"not a png at all")

    def test_resize_nearest(self):
        img = _gradient_rgb(12, 10)
        out = MC.resize_nearest(img, 5, 6)
        assert out.shape == (6, 5, 3)
        # corner pixels map to source corners under nearest-neighbor
        assert np.array_equal(out[0, 0], img[0, 0])


class TestWavCodec:
    def test_roundtrip_16bit_stereo(self):
        t = np.linspace(0, 1, 800, endpoint=False)
        wave = np.stack([np.sin(2 * np.pi * 440 * t),
                         0.25 * np.sin(2 * np.pi * 220 * t)], axis=1)
        samples, rate = MC.decode_wav(MC.encode_wav(wave.astype(np.float32),
                                                    rate=8000))
        assert rate == 8000 and samples.shape == (800, 2)
        assert np.abs(samples - wave).max() < 1e-4  # 16-bit quantization

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            MC.decode_wav(b"RIFFxxxxJUNK")


class TestRealDecodersInPipeline:
    def test_extract_features_with_stdlib_decoders(self, spark):
        """End-to-end: real PNG/WAV payloads through the distributed
        mapInPandas kernel with the stdlib decoders registered — the
        feature vectors must be pixel-/sample-derived (not the hash
        fake), and undecodable rows must drop."""
        from dystonse_gtfs_importer_spark.operators import multimodal as MM

        dark = MC.encode_png(np.zeros((16, 16, 3), dtype=np.uint8))
        light = MC.encode_png(np.full((16, 16, 3), 255, dtype=np.uint8))
        tone = MC.encode_wav(
            np.sin(2 * np.pi * 440 * np.linspace(0, 1, 1600))
            .astype(np.float32), rate=1600)
        rows = [
            (1, "image", dark, "image/png", 16, 16, None),
            (2, "image", light, "image/png", 16, 16, None),
            (3, "audio", tone, "audio/wav", None, None, 1000),
            (4, "image", b"corrupt", "image/png", 8, 8, None),
        ]
        media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        MC.install_stdlib_decoders(dim=16)
        try:
            got = {r.media_id: r
                   for r in MM.extract_features(media, dim=16).collect()}
        finally:
            MM._DECODERS.clear()
        assert set(got) == {1, 2, 3}  # corrupt PNG dropped, not fatal
        # all-black image: all luminance mass in bin 0
        assert got[1].feature[0] == pytest.approx(1.0)
        assert all(f == 0.0 for f in got[1].feature[1:])
        # all-white image: all mass in the last bin
        assert got[2].feature[-1] == pytest.approx(1.0)
        # full-scale sine: every segment RMS near 1/sqrt(2)
        for f in got[3].feature:
            assert f == pytest.approx(0.707, abs=0.05)

    def test_resize_images_real_png(self, spark):
        from dystonse_gtfs_importer_spark.operators import multimodal as MM

        src = _gradient_rgb(12, 10)
        media = spark.createDataFrame(
            [(1, "image", MC.encode_png(src), "image/png", 10, 12, None),
             (2, "image", b"not-png", "image/jpeg", 9, 9, None)],
            MM.MEDIA_SCHEMA)
        got = {r.media_id: r
               for r in MM.resize_images(media, 5, 6).collect()}
        out = MC.decode_png(bytes(got[1].payload))
        assert out.shape == (6, 5, 3)
        assert np.array_equal(out, MC.resize_nearest(src, 5, 6))
        assert got[1].width == 5 and got[1].height == 6
        # undecodable payload passes through unchanged, metadata stamped
        assert bytes(got[2].payload) == b"not-png"
        assert got[2].width == 5 and got[2].height == 6


class TestJpegCodec:
    def _psnr(self, a, b):
        err = (a.astype(float) - b.astype(float)) ** 2
        return 10 * np.log10(255.0 ** 2 / max(err.mean(), 1e-9))

    def test_roundtrip_rgb_non_multiple_of_8(self):
        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.default_rng(5)
        base = np.linspace(0, 255, 29)[None, :] * np.ones((21, 1))
        img = np.clip(np.stack([base, base[::-1],
                                np.full((21, 29), 100.0)], axis=-1)
                      + rng.normal(0, 4, (21, 29, 3)),
                      0, 255).astype(np.uint8)
        data = encode_jpeg(img, quality=90)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        back = decode_jpeg(data)
        assert back.shape == img.shape
        assert self._psnr(back, img) > 30.0

    def test_roundtrip_grayscale(self):
        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.default_rng(6)
        g = np.clip(rng.normal(128, 30, (16, 16)), 0, 255).astype(np.uint8)
        back = decode_jpeg(encode_jpeg(g, quality=95))
        assert back.shape == (16, 16, 1)
        assert self._psnr(back[..., 0], g) > 32.0

    def test_restart_markers_roundtrip(self):
        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.default_rng(7)
        img = np.clip(rng.normal(128, 40, (33, 41, 3)),
                      0, 255).astype(np.uint8)
        plain = decode_jpeg(encode_jpeg(img, quality=85))
        for ri in (1, 3, 7):
            with_rst = decode_jpeg(
                encode_jpeg(img, quality=85, restart_interval=ri))
            assert np.array_equal(plain, with_rst), ri

    def test_quality_monotone(self):
        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.default_rng(8)
        img = np.clip(rng.normal(128, 30, (24, 24, 3)),
                      0, 255).astype(np.uint8)
        p = [self._psnr(decode_jpeg(encode_jpeg(img, quality=q)), img)
             for q in (20, 60, 95)]
        assert p[0] < p[1] < p[2]

    def test_rejects_progressive_and_subsampled(self):
        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.default_rng(9)
        img = np.clip(rng.normal(128, 30, (16, 16, 3)),
                      0, 255).astype(np.uint8)
        data = bytearray(encode_jpeg(img))
        sof = data.find(b"\xff\xc0")
        prog = bytes(data[:sof + 1]) + b"\xc2" + bytes(data[sof + 2:])
        with pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg(prog)
        sub = bytearray(data)
        sub[sof + 11] = 0x22  # Y sampling 2x2
        with pytest.raises(ValueError, match="subsampled"):
            decode_jpeg(bytes(sub))

    def test_rejects_garbage(self):
        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            decode_jpeg,
        )

        with pytest.raises(ValueError):
            decode_jpeg(b"\x00\x01\x02")

    def test_image_sniffing_dispatch(self):
        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            encode_jpeg,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs import (
            decode_image, encode_png, png_feature_decoder,
        )

        rng = np.random.default_rng(10)
        img = np.clip(rng.normal(128, 30, (12, 12, 3)),
                      0, 255).astype(np.uint8)
        assert decode_image(encode_png(img)).shape == (12, 12, 3)
        assert decode_image(encode_jpeg(img)).shape == (12, 12, 3)
        with pytest.raises(ValueError, match="container"):
            decode_image(b"GIF89a....")
        # the image feature kernel accepts both containers
        f_png = png_feature_decoder(encode_png(img), "image")
        f_jpg = png_feature_decoder(encode_jpeg(img, quality=95), "image")
        assert f_png.shape == f_jpg.shape == (16,)
        assert float(np.abs(f_png - f_jpg).max()) < 0.1


class TestCodecFuzz:
    """Garbage and bit-flipped media bytes must terminate with an
    exception (the kernels map any raise to drop-row) — never hang or
    return out-of-contract shapes."""

    def test_jpeg_bitflip_fuzz(self):
        import random

        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.default_rng(11)
        img = np.clip(rng.normal(128, 40, (16, 24, 3)),
                      0, 255).astype(np.uint8)
        base = bytearray(encode_jpeg(img, quality=80))
        r = random.Random(11)
        for _ in range(150):
            mutated = bytearray(base)
            for _ in range(r.randint(1, 4)):
                mutated[r.randrange(2, len(mutated))] ^= 1 << r.randrange(8)
            try:
                out = decode_jpeg(bytes(mutated))
                assert out.dtype == np.uint8 and out.ndim == 3
            except Exception:
                pass  # any raise is in-contract

    def test_random_bytes_all_decoders(self):
        import random

        from dystonse_gtfs_importer_spark.operators.jpeg_codec import (
            decode_jpeg,
        )
        from dystonse_gtfs_importer_spark.operators.media_codecs import (
            decode_image, decode_png, decode_wav,
        )

        r = random.Random(12)
        for n in (0, 1, 3, 10, 100, 1000):
            blob = bytes(r.randrange(256) for _ in range(n))
            for fn in (decode_jpeg, decode_png, decode_wav,
                       decode_image):
                try:
                    fn(b"\xff\xd8" + blob if fn is decode_jpeg else blob)
                except Exception:
                    pass


class TestPerceptualNearDup:
    """aHash + banded hamming join: near-copies pair up, unrelated
    images don't, and banding loses nothing vs brute-force hamming."""

    def test_phash_near_dup_end_to_end(self, spark):
        import numpy as np

        from dystonse_gtfs_importer_spark.operators.media_codecs import (
            encode_png,
        )
        from dystonse_gtfs_importer_spark.operators.multimodal import (
            MEDIA_SCHEMA, ahash64, perceptual_hashes, phash_near_dup,
        )

        rng = np.random.default_rng(11)
        imgs = {}
        for g in range(4):
            base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
            near = base.copy()
            near[3, 4, 0] = np.uint8((int(near[3, 4, 0]) + 2) % 256)
            imgs[10 * g] = base
            imgs[10 * g + 1] = near
        rows = [(mid, "image", encode_png(img), "image/png",
                 24, 24, None) for mid, img in imgs.items()]
        rows.append((99, "image", b"not-a-png", "image/png", 8, 8, None))
        rows.append((98, "audio", b"wav", "audio/wav", None, None, 100))
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)

        hashes = perceptual_hashes(media).cache()
        got_h = {r.media_id: r.phash for r in hashes.collect()}
        assert set(got_h) == set(imgs)        # corrupt + audio dropped
        # kernel agrees with the local reference implementation
        assert got_h[0] == ahash64(imgs[0])

        pairs = {(r.media_a, r.media_b): r.hamming
                 for r in phash_near_dup(hashes, max_hamming=3).collect()}
        expected = {(10 * g, 10 * g + 1) for g in range(4)}
        # brute-force hamming over the fixture = banding ground truth
        ids = sorted(got_h)
        m64 = (1 << 64) - 1  # hashes are signed 64-bit two's-complement
        brute = {(a, b): bin((got_h[a] ^ got_h[b]) & m64).count("1")
                 for i, a in enumerate(ids) for b in ids[i + 1:]
                 if bin((got_h[a] ^ got_h[b]) & m64).count("1") <= 3}
        assert set(pairs) == set(brute) >= expected
        assert all(pairs[p] == brute[p] for p in pairs)
