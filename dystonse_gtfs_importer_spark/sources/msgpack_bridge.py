"""MessagePack bridge for the reference's ``DelayStatistics`` artifact.

The reference serializes its statistics tree with serde + rmp_serde
0.14 into a single ``.exp`` file (``analyser/curves.rs:43`` writes
``all_curves``; ``main.rs:406-416`` loads it).  This module reads such
a file into the engine's three curve parquet tables and writes one
back, so a running reference deployment can hand its statistics to
this engine (and vice versa) without re-analysing.

Layout (field order from the Rust struct declarations; rmp-serde 0.14
serializes structs positionally as arrays and enum variants as
``[variant_index, [fields...]]``):

* ``DelayStatistics { specific, general }``
  (``types/delay_statistics.rs:12-15``)
* ``RouteData { route_id, variants }`` (``types/route_data.rs:14-17``)
* ``RouteVariantData { stop_ids, curve_sets, general_delay }``
  with ``curve_sets: EventPair<HashMap<CurveSetKey, CurveSetData>>``
  and ``general_delay: EventPair<HashMap<u32, CurveData>>``
  (``types/route_variant_data.rs:19-23``)
* ``CurveSetKey { start_stop_index, end_stop_index, time_slot }``
  (``types/route_variant_data.rs:12-17``)
* ``EventPair { arrival, departure }`` (``types/event_type.rs:45-48``)
* ``CurveData { curve, precision_type, sample_size }`` /
  ``CurveSetData { curve_set, precision_type, sample_size }``
  (``types/curve_data.rs:13-17,46-50``)
* ``DefaultCurves { all_default_curves: HashMap<DefaultCurveKey,
  CurveData> }`` keyed by ``{ route_type, route_section, time_slot,
  event_type }`` (``types/default_curves.rs:23-34``)
* ``TimeSlot { id, min_weekday, max_weekday, min_hour, max_hour }``
  (``description`` is ``#[serde(skip)]``; ``types/time_slots.rs:15-24``)
* ``IrregularDynamicCurve { points: Vec<Tup { x, y }> }`` (f32 pairs)
  and ``CurveSet { curves: Vec<(f32, IrregularDynamicCurve)> }`` from
  the public dystonse-curves crate
* ``RouteType`` (gtfs-structures) serializes as the numeric GTFS
  route-type code; chrono ``Weekday`` as its Display string ("Mon").

Reading is lenient where serde itself is: structs are accepted both
positionally (arrays) and named (maps), unit enum variants as bare
ints, names, ``[idx, []]`` tuples, or ``{name: ...}`` maps — covering
the encodings rmp-serde produced across versions.  Writing emits the
canonical rmp-serde-0.14 compact layout above, and sorts every map by
key so output bytes are deterministic (Rust HashMap order is not).

Scale note: the artifact is by design a SINGLE file the reference
loads fully into memory, and the curve tables are schedule-bounded
(≤ millions of rows, KB each — sources/store.py layout note), so the
driver-side materialization here is inherent to the format, not a
distributed-operator shortcut; the parquet tables remain the engine's
native, partition-prunable representation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .msgpack_codec import Float32, packb, unpackb

# serde variant indices (declaration order in the reference sources)
_WEEKDAYS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
_ROUTE_SECTIONS = ("beginning", "middle", "end")   # RouteSection 0/1/2
_EVENT_TYPES = ("arrival", "departure")            # EventType 0/1
_PRECISIONS = ("Unknown", "Specific", "FallbackSpecific", "SemiSpecific",
               "General", "FallbackGeneral", "SuperGeneral")  # mod.rs:64-72

# engine-side event_type ints (EventType::to_int, event_type.rs:17-22)
_ET_ARRIVAL, _ET_DEPARTURE = 1, 2

# gtfs-structures RouteType <-> numeric GTFS code, declaration order
_ROUTE_TYPE_CODES = (0, 1, 2, 3, 4, 5, 6, 7, 200, 1100, 1500)

# engine time-slot id the reference's slotless general_delay maps to
_DEFAULT_SLOT = 12  # sql_shared.TIME_SLOT_DEFAULT_ID

# PrecisionType variant index == PrecisionType::to_int (mod.rs:64-85)
PRECISION_SPECIFIC = 1
PRECISION_SEMI_SPECIFIC = 3
PRECISION_GENERAL = 4


Points = list[tuple[float, float]]


@dataclass
class CurveData:
    points: Points
    precision_type: int
    sample_size: int


@dataclass
class CurveSetData:
    curves: list[tuple[float, Points]]  # (focus initial delay, curve)
    precision_type: int
    sample_size: int


@dataclass
class VariantData:
    stop_ids: list[str] = field(default_factory=list)
    # {event_type int: {(start, end, slot_id): CurveSetData}}
    curve_sets: dict[int, dict[tuple[int, int, int], CurveSetData]] = \
        field(default_factory=lambda: {_ET_ARRIVAL: {}, _ET_DEPARTURE: {}})
    # {event_type int: {stop_index: CurveData}}
    general_delay: dict[int, dict[int, CurveData]] = \
        field(default_factory=lambda: {_ET_ARRIVAL: {}, _ET_DEPARTURE: {}})


@dataclass
class DelayStatistics:
    # {route_id: {route_variant: VariantData}}
    specific: dict[str, dict[int, VariantData]] = field(default_factory=dict)
    # {(route_type_code, section_str, slot_id, event_type int): CurveData}
    default: dict[tuple[int, str, int, int], CurveData] = \
        field(default_factory=dict)


# ---------------------------------------------------------------------------
# encode (canonical rmp-serde 0.14 layout)
# ---------------------------------------------------------------------------

def _time_slot_struct(slot_id: int) -> list:
    from ..functions.sql_shared import TIME_SLOT_DEFAULT_ID, TIME_SLOTS

    if slot_id == TIME_SLOT_DEFAULT_ID:
        # TimeSlot::DEFAULT, time_slots.rs:116-123
        return [slot_id, "Mon", "Sun", 0, 24]
    for sid, wlo, whi, hlo, hhi in TIME_SLOTS:
        if sid == slot_id:
            return [sid, _WEEKDAYS[wlo], _WEEKDAYS[whi], hlo, hhi]
    raise ValueError(f"unknown time slot id {slot_id}")


def _unit_variant(idx: int) -> tuple:
    # tuple (not list) so enum-encoded values stay hashable inside
    # struct-typed map keys; packb encodes both as msgpack arrays
    return (idx, ())


def _curve(points: Points) -> list:
    return [[[Float32(x), Float32(y)] for x, y in points]]


def _curve_data(cd: CurveData) -> list:
    return [_curve(cd.points), _unit_variant(cd.precision_type),
            cd.sample_size]


def _event_pair(build, variant: VariantData, attr: str) -> list:
    return [build(getattr(variant, attr)[_ET_ARRIVAL]),
            build(getattr(variant, attr)[_ET_DEPARTURE])]


def delay_statistics_to_obj(ds: DelayStatistics) -> Any:
    """The serde data model of a DelayStatistics (pre-msgpack)."""

    def curve_sets_map(m: dict) -> dict:
        out = {}
        for (s, e, slot), csd in sorted(m.items()):
            key = (s, e, tuple(_time_slot_struct(slot)))
            out[key] = [
                [[[Float32(focus), _curve(points)]
                  for focus, points in csd.curves]],
                _unit_variant(csd.precision_type),
                csd.sample_size,
            ]
        return out

    def general_map(m: dict) -> dict:
        return {idx: _curve_data(cd) for idx, cd in sorted(m.items())}

    specific = {}
    for route_id in sorted(ds.specific):
        variants = {}
        for var_id in sorted(ds.specific[route_id]):
            v = ds.specific[route_id][var_id]
            variants[var_id] = [
                list(v.stop_ids),
                _event_pair(curve_sets_map, v, "curve_sets"),
                _event_pair(general_map, v, "general_delay"),
            ]
        specific[route_id] = [route_id, variants]

    default = {}
    for (rt, section, slot, et), cd in sorted(ds.default.items()):
        key = (rt,
               tuple(_unit_variant(_ROUTE_SECTIONS.index(section))),
               tuple(_time_slot_struct(slot)),
               tuple(_unit_variant(et - 1)))
        default[key] = _curve_data(cd)
    return [specific, [default]]


def dumps(ds: DelayStatistics) -> bytes:
    return packb(delay_statistics_to_obj(ds))


# ---------------------------------------------------------------------------
# decode (lenient: positional or named structs, any enum encoding)
# ---------------------------------------------------------------------------

def _fields(v: Any, names: list[str]) -> list:
    if isinstance(v, (list, tuple)):
        if len(v) < len(names):
            raise ValueError(f"struct needs {names}, got {len(v)} fields")
        return list(v[: len(names)])
    if isinstance(v, dict):
        return [v[n] for n in names]
    raise ValueError(f"expected struct (array/map), got {type(v).__name__}")


def _variant_index(v: Any, names: tuple[str, ...] | None = None) -> int:
    if isinstance(v, bool):
        raise ValueError("bool is not an enum variant")
    if isinstance(v, int):
        return v
    if isinstance(v, str) and names is not None:
        low = v.lower()
        # exact name first — a prefix pass alone would resolve e.g.
        # 'FallbackGeneral' to FallbackSpecific ('fal...' matches the
        # earlier name); the prefix leniency exists for abbreviated
        # weekday forms only
        for i, n in enumerate(names):
            if low == n.lower():
                return i
        for i, n in enumerate(names):
            if low.startswith(n.lower()[:3]):
                return i
        raise ValueError(f"unknown variant {v!r} (expected one of {names})")
    if isinstance(v, (list, tuple)) and v:
        return _variant_index(v[0], names)
    if isinstance(v, dict) and len(v) == 1 and names is not None:
        return _variant_index(next(iter(v)), names)
    raise ValueError(f"cannot read enum variant from {v!r}")


def _slot_id(v: Any) -> int:
    return int(_fields(v, ["id"])[0])


def _points(v: Any) -> Points:
    (pts,) = _fields(v, ["points"])
    return [tuple(float(c) for c in _fields(p, ["x", "y"])) for p in pts]


def _read_curve_data(v: Any) -> CurveData:
    curve, precision, sample = _fields(
        v, ["curve", "precision_type", "sample_size"])
    return CurveData(_points(curve), _variant_index(precision, _PRECISIONS),
                     int(sample))


def _route_type_code(v: Any) -> int:
    if isinstance(v, int) and not isinstance(v, bool):
        return v  # gtfs-structures numeric representation
    idx = _variant_index(v)
    # derive-style [idx, [payload]] leniency: Other carries its code
    if (isinstance(v, (list, tuple)) and len(v) > 1
            and isinstance(v[1], (list, tuple)) and v[1]):
        return int(v[1][0])
    if idx < len(_ROUTE_TYPE_CODES):
        return _ROUTE_TYPE_CODES[idx]
    raise ValueError(f"cannot read RouteType from {v!r}")


def loads(data: bytes) -> DelayStatistics:
    obj = unpackb(data)
    # the reference's `analyser default-curves` writes a BARE
    # DefaultCurves as default_curves.exp (default_curves.rs:270) —
    # a one-field struct [map] — while all_curves.exp is the
    # two-field DelayStatistics [specific, general]; accept both
    # (main.rs:296-316 merges the two files at load time)
    if isinstance(obj, (list, tuple)) and len(obj) == 1:
        specific_m, general = {}, obj
    elif isinstance(obj, dict) and set(obj) == {"all_default_curves"}:
        specific_m, general = {}, obj
    else:
        specific_m, general = _fields(obj, ["specific", "general"])
    ds = DelayStatistics()

    for route_id, rd in specific_m.items():
        _, variants = _fields(rd, ["route_id", "variants"])
        vmap: dict[int, VariantData] = {}
        for var_id, vd in variants.items():
            stop_ids, curve_sets, general_delay = _fields(
                vd, ["stop_ids", "curve_sets", "general_delay"])
            out = VariantData(stop_ids=[str(s) for s in stop_ids])
            cs_pair = _fields(curve_sets, ["arrival", "departure"])
            for et, cs in ((_ET_ARRIVAL, cs_pair[0]),
                           (_ET_DEPARTURE, cs_pair[1])):
                for key, csd in cs.items():
                    s, e, slot = _fields(
                        key, ["start_stop_index", "end_stop_index",
                              "time_slot"])
                    curve_set, precision, sample = _fields(
                        csd, ["curve_set", "precision_type", "sample_size"])
                    (curves,) = _fields(curve_set, ["curves"])
                    out.curve_sets[et][(int(s), int(e), _slot_id(slot))] = \
                        CurveSetData(
                            [(float(f), _points(c))
                             for f, c in (_fields(fc, ["0", "1"])
                                          if isinstance(fc, dict) else fc
                                          for fc in curves)],
                            _variant_index(precision, _PRECISIONS),
                            int(sample))
            gd_pair = _fields(general_delay, ["arrival", "departure"])
            for et, gd in ((_ET_ARRIVAL, gd_pair[0]),
                           (_ET_DEPARTURE, gd_pair[1])):
                for idx, cd in gd.items():
                    out.general_delay[et][int(idx)] = _read_curve_data(cd)
            vmap[int(var_id)] = out
        ds.specific[str(route_id)] = vmap

    (default_m,) = _fields(general, ["all_default_curves"])
    for key, cd in default_m.items():
        rt, section, slot, et = _fields(
            key, ["route_type", "route_section", "time_slot", "event_type"])
        ds.default[(
            _route_type_code(rt),
            _ROUTE_SECTIONS[_variant_index(section, _ROUTE_SECTIONS)],
            _slot_id(slot),
            _variant_index(et, _EVENT_TYPES) + 1,
        )] = _read_curve_data(cd)
    return ds


# ---------------------------------------------------------------------------
# Spark table conversion (schemas match plans/analyse_gtfs.py builders)
# ---------------------------------------------------------------------------

def stats_to_tables(spark, ds: DelayStatistics) -> dict:
    """DelayStatistics → the engine's curve DataFrames (plus the
    ``stop_ids`` side table parquet has no other home for)."""
    import pyspark.sql.types as T

    from ..schemas import CURVE_TYPE

    def curve_rows(points: Points) -> list:
        return [(float(x), float(y)) for x, y in points]

    general_rows, specific_rows, stop_rows, default_rows = [], [], [], []
    for route_id, variants in ds.specific.items():
        for var_id, v in variants.items():
            for i, sid in enumerate(v.stop_ids):
                stop_rows.append((route_id, var_id, i, sid))
            for et, m in v.general_delay.items():
                for stop_index, cd in m.items():
                    # the reference's general_delay is effectively
                    # DEFAULT-slot data (specific_curves.rs:362-368
                    # overwrites one key per slot iteration) and the
                    # predict ladder's rung 3 joins slot 12 — write it
                    # there so imported statistics actually serve
                    # SemiSpecific predictions
                    general_rows.append(
                        (route_id, var_id, et, _DEFAULT_SLOT,
                         stop_index, curve_rows(cd.points),
                         cd.sample_size, cd.precision_type))
            for et, m in v.curve_sets.items():
                for (s, e, slot), csd in m.items():
                    for focus, points in csd.curves:
                        specific_rows.append(
                            (route_id, var_id, et, slot, s, e, focus,
                             curve_rows(points), csd.sample_size,
                             csd.precision_type))
    for (rt, section, slot, et), cd in ds.default.items():
        default_rows.append((rt, section, slot, et,
                             curve_rows(cd.points), cd.sample_size,
                             cd.precision_type))

    def schema(fields):
        return T.StructType([T.StructField(n, t) for n, t in fields])

    long, byte, integer, flt, s = (T.LongType(), T.ByteType(),
                                   T.IntegerType(), T.FloatType(),
                                   T.StringType())
    return {
        "general": spark.createDataFrame(general_rows, schema([
            ("route_id", s), ("route_variant", long),
            ("event_type", byte), ("time_slot", byte),
            ("stop_index", integer), ("curve", CURVE_TYPE),
            ("sample_size", long), ("precision_type", byte)])),
        "specific": spark.createDataFrame(specific_rows, schema([
            ("route_id", s), ("route_variant", long),
            ("event_type", byte), ("time_slot", byte),
            ("start_stop_index", integer), ("end_stop_index", integer),
            ("focus", flt), ("curve", CURVE_TYPE),
            ("sample_size", long), ("precision_type", byte)])),
        "default": spark.createDataFrame(default_rows, schema([
            ("route_type", integer), ("route_section", s),
            ("time_slot", byte), ("event_type", byte),
            ("curve", CURVE_TYPE), ("sample_size", long),
            ("precision_type", byte)])),
        "stop_ids": spark.createDataFrame(stop_rows, schema([
            ("route_id", s), ("route_variant", long),
            ("stop_index", integer), ("stop_id", s)])),
    }


def tables_to_stats(tables: dict) -> DelayStatistics:
    """The engine's curve DataFrames → a DelayStatistics tree.

    Missing columns get the reference's defaults: precision_type
    Specific/SemiSpecific/General per table, empty stop_ids.  Rows of
    the ``default`` table with NULL dimensions (the engine's fallback
    rungs) have no reference representation and are skipped — the
    reference stores fallback VALUES under fully-specified keys
    (default_curves.rs:225-238), which the non-NULL rows already are.
    """
    ds = DelayStatistics()

    def variant(route_id: str, var_id: int) -> VariantData:
        return ds.specific.setdefault(str(route_id), {}).setdefault(
            int(var_id), VariantData())

    def precision(row, default: int) -> int:
        p = getattr(row, "precision_type", None)
        return default if p is None else int(p)

    if "general" in tables:
        for r in tables["general"].toLocalIterator():
            # the engine's general table carries one row per time slot
            # (1-11 + DEFAULT); the reference tree has ONE general
            # curve per stop — take the DEFAULT-slot row explicitly
            # (NULL tolerated for bridge-imported tables), never
            # whichever slot happens to iterate last
            slot = getattr(r, "time_slot", None)
            if slot is not None and int(slot) != _DEFAULT_SLOT:
                continue
            v = variant(r.route_id, r.route_variant)
            v.general_delay[int(r.event_type)][int(r.stop_index)] = \
                CurveData([(p.x, p.y) for p in r.curve],
                          precision(r, PRECISION_SEMI_SPECIFIC),
                          int(r.sample_size))
    if "specific" in tables:
        df = tables["specific"]
        for r in df.toLocalIterator():
            v = variant(r.route_id, r.route_variant)
            key = (int(r.start_stop_index), int(r.end_stop_index),
                   int(r.time_slot))
            csd = v.curve_sets[int(r.event_type)].setdefault(
                key, CurveSetData([], precision(r, PRECISION_SPECIFIC),
                                  int(r.sample_size)))
            csd.curves.append(
                (float(r.focus), [(p.x, p.y) for p in r.curve]))
        for side in (_ET_ARRIVAL, _ET_DEPARTURE):
            for variants in ds.specific.values():
                for v in variants.values():
                    for csd in v.curve_sets[side].values():
                        csd.curves.sort(key=lambda fc: fc[0])
    if "stop_ids" in tables:
        for r in tables["stop_ids"].toLocalIterator():
            v = variant(r.route_id, r.route_variant)
            need = int(r.stop_index) + 1
            if len(v.stop_ids) < need:
                v.stop_ids.extend([""] * (need - len(v.stop_ids)))
            v.stop_ids[int(r.stop_index)] = r.stop_id
    if "default" in tables:
        for r in tables["default"].toLocalIterator():
            if (r.route_type is None or r.route_section is None
                    or r.time_slot is None or r.event_type is None):
                continue  # engine-side fallback rung, see docstring
            ds.default[(int(r.route_type), r.route_section,
                        int(r.time_slot), int(r.event_type))] = \
                CurveData([(p.x, p.y) for p in r.curve],
                          precision(r, PRECISION_GENERAL),
                          int(r.sample_size))
    return ds


# ---------------------------------------------------------------------------
# JSON twin (SerdeFormat::Json — the reference's ONLY unit test,
# types/mod.rs:108-124, is a DelayStatistics JSON round-trip)
# ---------------------------------------------------------------------------

def dumps_json(ds: DelayStatistics) -> str:
    """serde_json rendering of the tree: named structs, unit enum
    variants as name strings, integer map keys stringified.

    Faithful limitation: serde_json cannot serialize maps with STRUCT
    keys ("key must be a string"), so a tree with non-empty
    ``curve_sets`` or default curves fails in the reference's Json
    mode too — we raise the same way instead of inventing an
    incompatible encoding.  MessagePack (:func:`dumps`) is the format
    that round-trips everything.
    """
    import json

    def curve(points: Points) -> dict:
        return {"points": [{"x": x, "y": y} for x, y in points]}

    def curve_data(cd: CurveData) -> dict:
        return {"curve": curve(cd.points),
                "precision_type": _PRECISION_NAMES[cd.precision_type],
                "sample_size": cd.sample_size}

    if ds.default:
        raise ValueError(
            "serde_json cannot serialize DefaultCurves: the map key "
            "DefaultCurveKey is a struct ('key must be a string'); "
            "use the MessagePack form for non-empty default curves")
    specific = {}
    for route_id in sorted(ds.specific):
        variants = {}
        for var_id in sorted(ds.specific[route_id]):
            v = ds.specific[route_id][var_id]
            if v.curve_sets[_ET_ARRIVAL] or v.curve_sets[_ET_DEPARTURE]:
                raise ValueError(
                    "serde_json cannot serialize curve_sets: the map "
                    "key CurveSetKey is a struct ('key must be a "
                    "string'); use the MessagePack form")
            variants[str(var_id)] = {
                "stop_ids": list(v.stop_ids),
                "curve_sets": {"arrival": {}, "departure": {}},
                "general_delay": {
                    side: {str(i): curve_data(cd)
                           for i, cd in sorted(m.items())}
                    for side, m in (("arrival",
                                     v.general_delay[_ET_ARRIVAL]),
                                    ("departure",
                                     v.general_delay[_ET_DEPARTURE]))},
            }
        specific[route_id] = {"route_id": route_id,
                              "variants": variants}
    return json.dumps(
        {"specific": specific,
         "general": {"all_default_curves": {}}},
        indent=1, sort_keys=True)


_PRECISION_NAMES = ["Unknown", "Specific", "FallbackSpecific",
                    "SemiSpecific", "General", "FallbackGeneral",
                    "SuperGeneral"]


def loads_json(text: str) -> DelayStatistics:
    import json

    obj = json.loads(text)
    ds = DelayStatistics()

    def read_cd(v: dict) -> CurveData:
        pts = [(float(p["x"]), float(p["y"]))
               for p in v["curve"]["points"]]
        return CurveData(pts, _variant_index(v["precision_type"],
                                             tuple(_PRECISION_NAMES)),
                         int(v["sample_size"]))

    for route_id, rd in obj.get("specific", {}).items():
        vmap = {}
        for var_id, vd in rd["variants"].items():
            out = VariantData(stop_ids=list(vd["stop_ids"]))
            gd = vd.get("general_delay", {})
            for et, side in ((_ET_ARRIVAL, "arrival"),
                             (_ET_DEPARTURE, "departure")):
                for idx, cd in gd.get(side, {}).items():
                    out.general_delay[et][int(idx)] = read_cd(cd)
            vmap[int(var_id)] = out
        ds.specific[str(route_id)] = vmap
    return ds


# ---------------------------------------------------------------------------
# file surface
# ---------------------------------------------------------------------------

def import_exp(spark, exp_path: str) -> dict:
    """Read a reference-format ``.exp`` file into curve DataFrames."""
    with open(exp_path, "rb") as f:
        return stats_to_tables(spark, loads(f.read()))


def export_exp(tables: dict, exp_path: str) -> None:
    """Write curve DataFrames as a reference-format ``.exp`` file."""
    with open(exp_path, "wb") as f:
        f.write(dumps(tables_to_stats(tables)))
