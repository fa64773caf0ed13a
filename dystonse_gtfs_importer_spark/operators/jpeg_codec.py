"""Pure-Python baseline JPEG codec (stdlib + numpy, no image libs).

Extends the de-stubbed media modalities (PNG/WAV in
:mod:`.media_codecs`) with the other ubiquitous image container: a
baseline sequential JFIF encoder/decoder — standard Annex-K
quantization and Huffman tables, 4:4:4 (no subsampling) or grayscale,
DC differentials, ZRL/EOB run-length AC coding, byte stuffing, and
restart markers on read.  Progressive (SOF2) and subsampled streams
are rejected with a clear ``ValueError`` that the multimodal kernels
map to drop-row.

Like the PNG/WAV codecs this runs inside Arrow-batched
``mapInPandas`` kernels (operators/multimodal.py); a production
cluster would register a libjpeg-turbo-backed callable with the same
signature and keep the surrounding plan unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position i -> raster index (ISO/IEC 10918-1 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1/K.2 quantization tables (raster order)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 Huffman specs: (bits per code length 1..16, symbol values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


def _canonical_codes(bits: list[int], values: list[int]) -> dict:
    """symbol -> (code, length) for canonical JPEG Huffman tables."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict:
    """(length, code) -> symbol."""
    return {(length, code): sym
            for sym, (code, length) in
            _canonical_codes(bits, values).items()}


_DCT = None


def _dct_matrix() -> np.ndarray:
    global _DCT
    if _DCT is None:
        n = np.arange(8)
        c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
        c *= np.sqrt(2.0 / 8.0)
        c[0] /= np.sqrt(2.0)
        _DCT = c
    return _DCT


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0], axis=-1)


def _blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)),
                    mode="edge")
    return (padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3),
            bh, bw)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3|1) uint8 -> baseline JFIF bytes (4:4:4 / grayscale).

    ``restart_interval`` > 0 emits a DRI marker and RSTn every that
    many MCUs (DC predictors reset) — the resync feature decoders
    need on corrupt streams."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg needs 1 or 3 channels")
    planes = ([_rgb_to_ycbcr(img[..., :3])[..., i] for i in range(3)]
              if nc == 3 else [img[..., 0].astype(np.float64)])
    q_lum = _scaled_quant(QUANT_LUM, quality)
    q_chrom = _scaled_quant(QUANT_CHROM, quality)
    quants = [q_lum] + [q_chrom] * (len(planes) - 1)
    dc_tabs = [_canonical_codes(*DC_LUM)] + \
        [_canonical_codes(*DC_CHROM)] * (len(planes) - 1)
    ac_tabs = [_canonical_codes(*AC_LUM)] + \
        [_canonical_codes(*AC_CHROM)] * (len(planes) - 1)

    d = _dct_matrix()
    comp_blocks = []
    bh = bw = 0
    for plane, q in zip(planes, quants):
        blocks, bh, bw = _blocks(plane)
        coefs = np.einsum("ij,abjk,lk->abil", d, blocks - 128.0, d)
        quantized = np.round(coefs / q.reshape(8, 8)).astype(np.int64)
        comp_blocks.append(quantized.reshape(bh, bw, 64)[
            :, :, ZIGZAG])
    bits = _BitWriter()
    preds = [0] * len(planes)
    scan_parts: list[bytes] = []
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                scan_parts.append(bits.flush())
                scan_parts.append(bytes((0xFF, 0xD0 + (rst & 7))))
                rst += 1
                bits = _BitWriter()
                preds = [0] * len(planes)
            mcu += 1
            for ci, zz in enumerate(comp_blocks):
                blk = zz[by, bx]
                diff = int(blk[0]) - preds[ci]
                preds[ci] = int(blk[0])
                s = _category(diff)
                code, length = dc_tabs[ci][s]
                bits.write(code, length)
                if s:
                    v = diff if diff >= 0 else diff + (1 << s) - 1
                    bits.write(v, s)
                run = 0
                last_nz = max((i for i in range(1, 64) if blk[i]),
                              default=0)
                for i in range(1, last_nz + 1):
                    v = int(blk[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tabs[ci][0xF0]  # ZRL
                        bits.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_tabs[ci][(run << 4) | s]
                    bits.write(code, length)
                    bits.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, length = ac_tabs[ci][0x00]  # EOB
                    bits.write(code, length)
    scan_parts.append(bits.flush())
    scan = b"".join(scan_parts)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + \
        bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + bytes((0, 0))
    dqt = bytearray()
    dqt += bytes([0x00]) + bytes(int(x) for x in q_lum[ZIGZAG])
    if len(planes) == 3:
        dqt += bytes([0x01]) + bytes(int(x) for x in q_chrom[ZIGZAG])
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(planes)))
    for ci in range(len(planes)):
        sof += bytes((ci + 1, 0x11, 0 if ci == 0 else 1))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytearray()
    specs = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if len(planes) == 3:
        specs += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tc, (tbits, tvals) in specs:
        dht += bytes([tc]) + bytes(tbits) + bytes(tvals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes((ci + 1, 0x00 if ci == 0 else 0x11))
    sos += bytes((0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan + b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0xff{nxt:02x} inside scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Discard pad bits, consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] == 0xFF and \
                0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, channels) uint8 (3 or 1)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + length]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8,
                                            64, p + 1)
                quants[tq] = tbl
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                if samp != 0x11 and nc != 1:
                    raise ValueError(
                        "subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xff{marker:02x})")
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan_tabs = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(payload, pos + length, frame, quants,
                                huff, scan_tabs, restart)
        pos += length
    raise ValueError("no SOS marker found")


def _decode_scan(data: bytes, pos: int, frame, quants, huff,
                 scan_tabs, restart) -> np.ndarray:
    h, w, comps = frame
    bh, bw = -(-h // 8), -(-w // 8)
    d = _dct_matrix()
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64)
              for _ in comps]
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart and mcu and mcu % restart == 0:
                reader.sync_restart()
                preds = [0] * len(comps)
            mcu += 1
            for ci, (cid, tq) in enumerate(comps):
                dc_t = huff[(0, scan_tabs[cid][0])]
                ac_t = huff[(1, scan_tabs[cid][1])]
                zz = np.zeros(64, dtype=np.int64)
                try:
                    s = _huff_decode(reader, dc_t)
                    diff = _extend(reader.bits(s), s) if s else 0
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.bits(s), s)
                        k += 1
                except _RestartMarker:
                    raise ValueError(
                        "restart marker mid-block (corrupt scan)")
                blk = np.zeros(64, dtype=np.float64)
                blk[ZIGZAG] = zz * quants[tq][ZIGZAG]
                blk = blk.reshape(8, 8)
                pix = d.T @ blk @ d + 128.0
                planes[ci][by * 8:by * 8 + 8,
                           bx * 8:bx * 8 + 8] = pix
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        out = planes[0]
        return np.clip(np.round(out), 0, 255).astype(np.uint8)[..., None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
