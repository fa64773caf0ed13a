"""GTFS-RT feed source (S2): binary protobuf files → flat event rows.

The reference decodes ``FeedMessage`` with prost
(/root/reference/src/importer/per_schedule_importer.rs:96-149) and
walks entity → trip_update → stop_time_update.  Here the file bytes
arrive through Spark's ``binaryFile`` source and a minimal pure-Python
protobuf *wire-format* reader (no generated classes, no external
deps) extracts exactly the leaves the pipeline consumes — run inside
``mapInPandas`` so decoding scales with partitions, not the driver.

Field numbers from the public gtfs-realtime.proto:

    FeedMessage.header(1).timestamp(3)
    FeedMessage.entity(2) → FeedEntity.trip_update(3)
    TripUpdate.trip(1)    → TripDescriptor.trip_id(1), route_id(5),
                            start_time(2), start_date(3)
    TripUpdate.stop_time_update(2)
        → StopTimeUpdate.stop_sequence(1), stop_id(4),
          arrival(2) / departure(3) → StopTimeEvent.delay(1)

Zip-wrapped feeds (the reference reads the first zip member,
per_schedule_importer.rs:99-106 / C21) are handled transparently.
"""

from __future__ import annotations

import io
import struct
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import RT_EVENTS

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, int | bytes]]:
    """Yield (field_number, wire_type, value) over one message's bytes."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wt == _WT_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == _WT_I64:
            val = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wt == _WT_I32:
            val = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _zigzag(v: int) -> int:
    # sint fields are not used by the leaves we read; int32 delay is a
    # plain varint that must be re-interpreted as two's complement
    return v - (1 << 64) if v >= (1 << 63) else v


def _event_delay(buf: bytes) -> int | None:
    for f, _wt, v in iter_fields(buf):
        if f == 1:  # StopTimeEvent.delay (int32)
            v = _zigzag(v)
            if v >= (1 << 31):
                v -= 1 << 32
            return v
    return None


def decode_feed_message(data: bytes, feed_file: str) -> list[dict]:
    """One FeedMessage → flat RT_EVENTS rows (C21 zip unwrap included)."""
    if data[:2] == b"PK":
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = zf.namelist()
            if not names:
                return []
            data = zf.read(names[0])

    header_ts = None
    rows: list[dict] = []
    entities: list[bytes] = []
    for f, _wt, v in iter_fields(data):
        if f == 1:  # header
            for hf, _hwt, hv in iter_fields(v):
                if hf == 3:
                    header_ts = hv
        elif f == 2:  # entity
            entities.append(v)
    if header_ts is None:
        # reference skips files without a header timestamp
        return []

    for ent in entities:
        trip_update = None
        for f, _wt, v in iter_fields(ent):
            if f == 3:
                trip_update = v
        if trip_update is None:
            continue
        trip_id = route_id = start_date = start_time = None
        stus: list[bytes] = []
        for f, _wt, v in iter_fields(trip_update):
            if f == 1:  # TripDescriptor
                for tf, _twt, tv in iter_fields(v):
                    if tf == 1:
                        trip_id = tv.decode()
                    elif tf == 2:
                        start_time = tv.decode()
                    elif tf == 3:
                        start_date = tv.decode()
                    elif tf == 5:
                        route_id = tv.decode()
            elif f == 2:  # stop_time_update
                stus.append(v)
        if trip_id is None:
            continue
        for stu in stus:
            stop_sequence = stop_id = arr = dep = None
            for f, _wt, v in iter_fields(stu):
                if f == 1:
                    stop_sequence = v
                elif f == 4:
                    stop_id = v.decode()
                elif f == 2:
                    arr = _event_delay(v)
                elif f == 3:
                    dep = _event_delay(v)
            rows.append({
                "feed_file": feed_file,
                "header_timestamp": header_ts,
                "trip_id": trip_id,
                "route_id": route_id,
                "start_date": start_date,
                "start_time": start_time,
                "stop_sequence": stop_sequence,
                "stop_id": stop_id,
                "arrival_delay": arr,
                "departure_delay": dep,
            })
    return rows


def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (path, content) rows → RT_EVENTS rows."""
    cols = [f.name for f in RT_EVENTS.fields]
    for pdf in batches:
        rows: list[dict] = []
        for path_, content in zip(pdf["path"], pdf["content"]):
            name = path_.rsplit("/", 1)[-1]
            try:
                rows.extend(decode_feed_message(bytes(content), name))
            except Exception:
                # failed/ corrupt file: the reference moves it to a
                # failed dir and continues (importer/mod.rs:524-548)
                continue
        yield pd.DataFrame(rows, columns=cols)


def read_gtfs_rt(spark: SparkSession, path: str,
                 pattern: str = "*.pb") -> DataFrame:
    """Directory of .pb / .zip GTFS-RT dumps → RT_EVENTS DataFrame.

    ``binaryFile`` keeps each feed file one row; decoding happens in
    executors via mapInPandas (Arrow-batched), so a 100 TB backlog of
    feed dumps parallelizes by file count.
    """
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select("path", "content")
    )
    return binary.mapInPandas(decode_partition, RT_EVENTS)


# -- encoder (test fixtures only) -----------------------------------------

def _tag(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _WT_LEN) + _varint(len(payload)) + payload


def encode_feed_message(header_ts: int | None,
                        trip_updates: list[dict]) -> bytes:
    """Build FeedMessage bytes for tests: each trip_update dict has
    trip_id, route_id, start_date, start_time, and stop_time_updates =
    [(stop_sequence, stop_id, arrival_delay|None, departure_delay|None)]."""
    msg = b""
    if header_ts is not None:
        msg += _len_field(1, _len_field(1, b"2.0")  # gtfs_realtime_version
                          + _tag(3, _WT_VARINT) + _varint(header_ts))
    for i, tu in enumerate(trip_updates):
        td = _len_field(1, tu["trip_id"].encode())
        if tu.get("start_time"):
            td += _len_field(2, tu["start_time"].encode())
        if tu.get("start_date"):
            td += _len_field(3, tu["start_date"].encode())
        if tu.get("route_id"):
            td += _len_field(5, tu["route_id"].encode())
        body = _len_field(1, td)
        for seq, stop_id, arr, dep in tu.get("stop_time_updates", []):
            stu = _tag(1, _WT_VARINT) + _varint(seq)
            if arr is not None:
                stu += _len_field(2, _tag(1, _WT_VARINT) + _varint(arr))
            if dep is not None:
                stu += _len_field(3, _tag(1, _WT_VARINT) + _varint(dep))
            stu += _len_field(4, stop_id.encode())
            body += _len_field(2, stu)
        ent = _len_field(1, f"e{i}".encode()) + _len_field(3, body)
        msg += _len_field(2, ent)
    return msg
