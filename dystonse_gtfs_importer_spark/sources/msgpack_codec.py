"""Minimal pure-stdlib MessagePack codec (the subset serde emits).

The reference persists its ``DelayStatistics`` artifacts with
``rmp_serde`` (``/root/reference/src/main.rs:406-416``,
``analyser/curves.rs:43``); this codec provides the byte-level layer
for the bridge in :mod:`.msgpack_bridge` without any third-party
dependency.  Supported types cover everything serde's data model needs
here: nil, bool, all int widths, float32/float64, str, bin, array,
map.  Ext types are not produced by serde derive and are rejected.

Canonical packing rules (what :func:`packb` emits):

* ints use the smallest representation (fixint → int8/16/32/64 or
  uint8/16/32/64);
* ``Float32`` instances pack as float32 (0xca), plain floats as
  float64 (0xcb) — serde distinguishes ``f32``/``f64`` statically, so
  the writer must too;
* str/bytes/array/map use the smallest length header.

These match rmp's own canonical choices, so byte-for-byte golden
tests against the documented reference layout are meaningful.
"""

from __future__ import annotations

import struct
from typing import Any


class Float32(float):
    """Marker type: pack this value as msgpack float32 (0xca)."""

    __slots__ = ()


def packb(obj: Any) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, Float32):
        out.append(0xCA)
        out += struct.pack(">f", float(obj))
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for v in obj:
            _pack(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"cannot msgpack-encode {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v <= 0x7F:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 < v <= 0xFF:
        out += bytes((0xCC, v))
    elif 0 < v <= 0xFFFF:
        out.append(0xCD)
        out += struct.pack(">H", v)
    elif 0 < v <= 0xFFFFFFFF:
        out.append(0xCE)
        out += struct.pack(">I", v)
    elif 0 < v <= 0xFFFFFFFFFFFFFFFF:
        out.append(0xCF)
        out += struct.pack(">Q", v)
    elif -0x80 <= v < 0:
        out.append(0xD0)
        out += struct.pack(">b", v)
    elif -0x8000 <= v < 0:
        out.append(0xD1)
        out += struct.pack(">h", v)
    elif -0x80000000 <= v < 0:
        out.append(0xD2)
        out += struct.pack(">i", v)
    elif -0x8000000000000000 <= v < 0:
        out.append(0xD3)
        out += struct.pack(">q", v)
    else:
        raise OverflowError(f"int out of msgpack range: {v}")


def unpackb(data: bytes) -> Any:
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"{len(data) - pos} trailing bytes after value")
    return obj


def _unpack(mv: memoryview, pos: int) -> tuple[Any, int]:
    b = mv[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(mv, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(mv, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return str(mv[pos:pos + n], "utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        w = {0xC4: 1, 0xC5: 2, 0xC6: 4}[b]
        n = int.from_bytes(mv[pos:pos + w], "big")
        pos += w
        return bytes(mv[pos:pos + n]), pos + n
    if b == 0xCA:
        return struct.unpack(">f", mv[pos:pos + 4])[0], pos + 4
    if b == 0xCB:
        return struct.unpack(">d", mv[pos:pos + 8])[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint8/16/32/64
        w = 1 << (b - 0xCC)
        return int.from_bytes(mv[pos:pos + w], "big"), pos + w
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int8/16/32/64
        w = 1 << (b - 0xD0)
        return int.from_bytes(mv[pos:pos + w], "big", signed=True), pos + w
    if b in (0xD9, 0xDA, 0xDB):  # str8/16/32
        w = {0xD9: 1, 0xDA: 2, 0xDB: 4}[b]
        n = int.from_bytes(mv[pos:pos + w], "big")
        pos += w
        return str(mv[pos:pos + n], "utf-8"), pos + n
    if b in (0xDC, 0xDD):  # array16/32
        w = 2 if b == 0xDC else 4
        n = int.from_bytes(mv[pos:pos + w], "big")
        return _unpack_array(mv, pos + w, n)
    if b in (0xDE, 0xDF):  # map16/32
        w = 2 if b == 0xDE else 4
        n = int.from_bytes(mv[pos:pos + w], "big")
        return _unpack_map(mv, pos + w, n)
    raise ValueError(f"unsupported msgpack byte 0x{b:02x} at {pos - 1}")


def _unpack_array(mv: memoryview, pos: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, pos = _unpack(mv, pos)
        out.append(v)
    return out, pos


class FrozenMap(dict):
    """Hashable dict for msgpack maps that appear as map KEYS.

    rmp-serde's named mode (``to_vec_named``, the default in 1.x)
    serializes a struct used as a ``HashMap`` key — e.g. the
    reference's ``CurveSetKey`` (route_variant_data.rs:12-17) — as a
    msgpack map in key position.  Python dicts are unhashable, so the
    decoder wraps them in this subclass; the bridge's struct reader
    treats it like any named struct (it is a ``dict``)."""

    def __hash__(self) -> int:  # type: ignore[override]
        return hash(tuple(sorted(
            (k, _hashable(v) if isinstance(v, (list, dict)) else v)
            for k, v in self.items())))

    def _blocked(self, *a, **kw):
        raise TypeError("FrozenMap is immutable")

    __setitem__ = __delitem__ = update = pop = clear = _blocked


def _hashable(v: Any) -> Any:
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return FrozenMap(v)
    return v


def _unpack_map(mv: memoryview, pos: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, pos = _unpack(mv, pos)
        v, pos = _unpack(mv, pos)
        out[_hashable(k)] = v
    return out, pos
