"""MessagePack bridge (S16/S17 artifact parity): codec round-trips,
a byte-level golden fixture following the reference's documented field
order (types/types.md:13-27, delay_statistics.rs:12-15), lenient
named-mode reading, and Spark-table round-trips."""

from __future__ import annotations

import struct

import pytest

from dystonse_gtfs_importer_spark.sources import msgpack_bridge as B
from dystonse_gtfs_importer_spark.sources.msgpack_codec import (
    Float32, packb, unpackb,
)


def f32(v: float) -> bytes:
    return b"\xca" + struct.pack(">f", v)


class TestCodec:
    def test_scalar_widths_roundtrip(self):
        vals = [None, True, False, 0, 1, 127, 128, 255, 256, 65535,
                65536, 2**32 - 1, 2**32, 2**63 - 1, -1, -32, -33, -128,
                -129, -32768, -32769, -(2**31), -(2**31) - 1, -(2**63),
                0.5, -1.25, "", "x", "å" * 40, "y" * 70000,
                b"", b"\x00\xff", list(range(20)), {"k": [1, {2: 3}]}]
        assert unpackb(packb(vals)) == vals

    def test_float32_marker(self):
        assert packb(Float32(1.25)) == f32(1.25)
        assert unpackb(f32(1.25)) == 1.25

    def test_canonical_headers(self):
        assert packb(5) == b"\x05"
        assert packb(-3) == b"\xfd"
        assert packb(200) == b"\xcc\xc8"
        assert packb("abc") == b"\xa3abc"
        assert packb([1, 2]) == b"\x92\x01\x02"
        assert packb({1: 2}) == b"\x81\x01\x02"

    def test_trailing_bytes_rejected(self):
        with pytest.raises(ValueError, match="trailing"):
            unpackb(b"\x01\x02")

    def test_ext_rejected(self):
        with pytest.raises(ValueError, match="unsupported"):
            unpackb(b"\xd4\x01\x00")  # fixext1

    def test_array_keys_become_tuples(self):
        data = packb({(1, (2, ())): "v"})
        assert unpackb(data) == {(1, (2, ())): "v"}


def _one_default_stats() -> B.DelayStatistics:
    ds = B.DelayStatistics()
    ds.default[(3, "beginning", 12, 2)] = B.CurveData(
        [(-12.0, 0.0), (12.0, 1.0)], 4, 10)
    return ds


class TestGoldenLayout:
    """Byte-for-byte fixture spelled out from the reference struct
    declarations — the documented rmp-serde 0.14 compact layout."""

    def test_default_curve_bytes(self):
        expected = (
            b"\x92"            # DelayStatistics [specific, general]
            b"\x80"            # specific: empty map
            b"\x91"            # DefaultCurves [all_default_curves]
            b"\x81"            # one entry
            b"\x94"            # DefaultCurveKey [rt, section, slot, et]
            b"\x03"            # RouteType::Bus as GTFS code 3
            b"\x92\x00\x90"    # RouteSection::Beginning [0, []]
            b"\x95\x0c\xa3Mon\xa3Sun\x00\x18"  # TimeSlot::DEFAULT
            b"\x92\x01\x90"    # EventType::Departure [1, []]
            b"\x93"            # CurveData [curve, precision, sample]
            b"\x91\x92"        # IrregularDynamicCurve [points x2]
            b"\x92" + f32(-12.0) + f32(0.0) +
            b"\x92" + f32(12.0) + f32(1.0) +
            b"\x92\x04\x90"    # PrecisionType::General [4, []]
            b"\x0a"            # sample_size 10
        )
        assert B.dumps(_one_default_stats()) == expected

    def test_golden_parses_back(self):
        assert B.loads(B.dumps(_one_default_stats())) == \
            _one_default_stats()

    def test_named_mode_and_enum_leniency(self):
        """serde can also emit named structs (maps) and other crates'
        enum encodings (bare ints, variant-name strings); the reader
        accepts them all."""
        obj = [
            {},  # specific
            {"all_default_curves": {
                ((3, ()),  # RouteType as derive-style [idx, []]
                 "Middle",  # RouteSection as a name
                 (5, "Mon", "Fri", 14, 16),
                 "departure"): {
                    "curve": {"points": [
                        {"x": -6.0, "y": 0.0}, {"x": 6.0, "y": 1.0}]},
                    "precision_type": 4,
                    "sample_size": 3,
                }}},
        ]
        ds = B.loads(packb(obj))
        assert list(ds.default) == [(3, "middle", 5, 2)]
        assert ds.default[(3, "middle", 5, 2)].points == \
            [(-6.0, 0.0), (6.0, 1.0)]

    def test_route_type_other_payload(self):
        obj = [{}, [{((11, (715,)),  # RouteType::Other(715)
                      (2, ()), (12, "Mon", "Sun", 0, 24), (0, ())):
                     [[[ ]], (4, ()), 1]}]]
        ds = B.loads(packb(obj))
        assert list(ds.default) == [(715, "end", 12, 1)]

    def test_full_tree_roundtrip(self):
        ds = B.DelayStatistics()
        v = B.VariantData(stop_ids=["a", "b", "c"])
        v.general_delay[1][0] = B.CurveData([(-12.0, 0.0), (24.0, 1.0)],
                                            3, 40)
        v.general_delay[2][2] = B.CurveData([(0.0, 0.0), (6.0, 1.0)],
                                            3, 25)
        v.curve_sets[2][(0, 2, 5)] = B.CurveSetData(
            [(-24.0, [(-36.0, 0.0), (0.0, 0.5), (48.0, 1.0)]),
             (0.0, [(-12.0, 0.0), (12.0, 1.0)])], 1, 77)
        ds.specific["R1"] = {4: v}
        ds.default[(3, "middle", 5, 1)] = B.CurveData(
            [(-60.0, 0.0), (60.0, 1.0)], 4, 123)
        assert B.loads(B.dumps(ds)) == ds

    def test_unknown_slot_id_raises(self):
        ds = B.DelayStatistics()
        ds.default[(3, "middle", 99, 1)] = B.CurveData([(0.0, 1.0)], 4, 1)
        with pytest.raises(ValueError, match="time slot"):
            B.dumps(ds)


class TestSparkTables:
    @pytest.fixture()
    def stats(self):
        ds = B.DelayStatistics()
        v = B.VariantData(stop_ids=["s0", "s1", "s2"])
        v.general_delay[1][1] = B.CurveData([(-12.0, 0.0), (24.0, 1.0)],
                                            3, 40)
        v.curve_sets[2][(0, 2, 5)] = B.CurveSetData(
            [(-24.0, [(-36.0, 0.0), (48.0, 1.0)]),
             (0.0, [(-12.0, 0.0), (12.0, 1.0)])], 1, 77)
        w = B.VariantData(stop_ids=["x0", "x1"])
        w.general_delay[2][0] = B.CurveData([(0.0, 0.0), (12.0, 1.0)],
                                            3, 21)
        ds.specific["R1"] = {4: v}
        ds.specific["R2"] = {7: w}
        ds.default[(3, "middle", 5, 1)] = B.CurveData(
            [(-60.0, 0.0), (60.0, 1.0)], 4, 123)
        ds.default[(0, "end", 12, 2)] = B.CurveData(
            [(-6.0, 0.0), (6.0, 1.0)], 5, 9)
        return ds

    def test_tables_roundtrip(self, spark, stats):
        tables = B.stats_to_tables(spark, stats)
        assert B.tables_to_stats(tables) == stats

    def test_null_dim_default_rows_skipped(self, spark, stats):
        import pyspark.sql.functions as F

        tables = B.stats_to_tables(spark, stats)
        padded = tables["default"].unionByName(
            tables["default"].limit(1)
            .withColumn("route_section",
                        F.lit(None).cast("string")))
        tables["default"] = padded
        assert B.tables_to_stats(tables) == stats

    def test_file_roundtrip_via_parquet(self, spark, stats, tmp_path):
        """load → parquet tables (the engine's native S16 sink) →
        save → load is lossless."""
        from dystonse_gtfs_importer_spark.sources.store import (
            read_curve_tables, write_curve_tables,
        )

        exp1 = tmp_path / "all_curves.exp"
        exp1.write_bytes(B.dumps(stats))
        tables = B.import_exp(spark, str(exp1))
        write_curve_tables(tables, str(tmp_path / "stats"))
        back = read_curve_tables(spark, str(tmp_path / "stats"))
        # stop_ids rides along as a fourth table
        back["stop_ids"] = spark.read.parquet(
            str(tmp_path / "stats" / "stop_ids"))
        exp2 = tmp_path / "roundtrip.exp"
        B.export_exp(back, str(exp2))
        assert B.loads(exp2.read_bytes()) == stats
        # deterministic writer: identical trees → identical bytes
        assert exp2.read_bytes() == exp1.read_bytes()


class TestCli:
    def test_import_export_exp_roundtrip(self, spark, tmp_path):
        from dystonse_gtfs_importer_spark.cli import main

        ds = B.DelayStatistics()
        v = B.VariantData(stop_ids=["s0", "s1"])
        v.general_delay[1][0] = B.CurveData([(-12.0, 0.0), (24.0, 1.0)],
                                            3, 40)
        ds.specific["R1"] = {4: v}
        ds.default[(3, "middle", 5, 1)] = B.CurveData(
            [(-60.0, 0.0), (60.0, 1.0)], 4, 123)
        src = tmp_path / "all_curves.exp"
        src.write_bytes(B.dumps(ds))
        lake = tmp_path / "lake"
        assert main(["-s", "vbn", "--dir", str(lake), "analyse",
                     "import-exp", str(src)], spark=spark) == 0
        out = tmp_path / "back.exp"
        assert main(["-s", "vbn", "--dir", str(lake), "analyse",
                     "export-exp", str(out)], spark=spark) == 0
        assert out.read_bytes() == src.read_bytes()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:
    _scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**64 - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=40), st.binary(max_size=40))
    _values = st.recursive(
        _scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=6),
            st.dictionaries(st.one_of(st.integers(-100, 100),
                                      st.text(max_size=8)),
                            kids, max_size=6)),
        max_leaves=25)

    class TestCodecProperties:
        @given(_values)
        @settings(max_examples=300, deadline=None)
        def test_roundtrip_identity(self, v):
            assert unpackb(packb(v)) == v

        @given(st.floats(allow_nan=False, allow_infinity=False,
                         width=32))
        @settings(max_examples=200, deadline=None)
        def test_float32_exact(self, f):
            assert unpackb(packb(Float32(f))) == f


class TestPipelineIntegration:
    def test_export_real_analyse_tables(self, spark, tmp_path):
        """The bridge must accept the engine's ACTUAL analyse output
        (general has a non-NULL time_slot column and no precision
        column; specific lacks precision; default carries NULL-dim
        fallback rungs) — export it, parse it back, re-export
        byte-identically."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from gtfs_fixtures import build_rt_events, build_schedule, \
            write_gtfs_dir

        from dystonse_gtfs_importer_spark.plans.analyse_gtfs import (
            default_curves, general_delay_curves, prepare_dbitems,
            stop_pair_curve_sets,
        )
        from dystonse_gtfs_importer_spark.plans.import_etl import (
            build_records, latest_wins_merge,
        )
        from dystonse_gtfs_importer_spark.schemas import RT_EVENTS
        from dystonse_gtfs_importer_spark.sources.gtfs import (
            read_gtfs, variant_stops,
        )

        d = tmp_path / "gtfs"
        d.mkdir()
        write_gtfs_dir(build_schedule(), d)
        sched = read_gtfs(spark, str(d))
        rt = spark.createDataFrame(build_rt_events(build_schedule()),
                                   RT_EVENTS)
        records = latest_wins_merge(build_records(
            rt, sched["trips"], sched["stop_times"], "test", "sched"))
        vstops = variant_stops(sched["trips"], sched["stop_times"])
        items = prepare_dbitems(records, vstops)
        tables = {
            "general": general_delay_curves(items),
            "specific": stop_pair_curve_sets(items),
            "default": default_curves(items, sched["routes"]),
        }
        exp = tmp_path / "all_curves.exp"
        B.export_exp(tables, str(exp))
        ds = B.loads(exp.read_bytes())
        assert ds.specific and ds.default
        # every imported curve is a valid CDF shape
        for variants in ds.specific.values():
            for v in variants.values():
                for m in (v.general_delay[1], v.general_delay[2]):
                    for cd in m.values():
                        ys = [y for _, y in cd.points]
                        assert ys == sorted(ys) and ys[0] == 0.0 \
                            and ys[-1] == 1.0
        back = tmp_path / "back.exp"
        back.write_bytes(B.dumps(ds))
        assert back.read_bytes() == exp.read_bytes()


class TestBareDefaultCurves:
    def test_bare_default_curves_artifact_parses(self):
        """`analyser default-curves` writes a bare DefaultCurves
        (default_curves.rs:270) — a one-field struct — which the
        reference's loader then merges with all_curves.exp
        (main.rs:296-316).  The bridge accepts it directly."""
        cd = [[[ (Float32(-12.0), Float32(0.0)),
                 (Float32(12.0), Float32(1.0)) ]], (4, ()), 7]
        bare = packb([{(3, (0, ()), (12, "Mon", "Sun", 0, 24),
                        (1, ())): cd}])
        ds = B.loads(bare)
        assert ds.specific == {}
        assert list(ds.default) == [(3, "beginning", 12, 2)]
        # named-mode bare form too
        ds2 = B.loads(packb({"all_default_curves": {}}))
        assert ds2 == B.DelayStatistics()


class TestJsonTwin:
    """SerdeFormat::Json — the reference's only unit test is a
    DelayStatistics JSON round-trip (types/mod.rs:108-124); its
    fixture is absent from the repo, so the format contract here is
    serde_json semantics: named structs, stringified int keys, and
    the real serde_json failure on struct-keyed maps."""

    def test_general_delay_roundtrip(self):
        ds = B.DelayStatistics()
        v = B.VariantData(stop_ids=["a", "b"])
        v.general_delay[1][0] = B.CurveData([(-12.0, 0.0), (24.0, 1.0)],
                                            3, 40)
        v.general_delay[2][1] = B.CurveData([(0.0, 0.0), (6.0, 1.0)],
                                            3, 9)
        ds.specific["R1"] = {4: v}
        text = B.dumps_json(ds)
        assert '"SemiSpecific"' in text and '"R1"' in text
        assert B.loads_json(text) == ds
        # deterministic writer
        assert B.dumps_json(B.loads_json(text)) == text

    def test_struct_keyed_maps_fail_like_serde_json(self):
        ds = B.DelayStatistics()
        ds.default[(3, "middle", 5, 1)] = B.CurveData([(0.0, 1.0)], 4, 1)
        with pytest.raises(ValueError, match="key must be a string"):
            B.dumps_json(ds)
        ds2 = B.DelayStatistics()
        v = B.VariantData()
        v.curve_sets[1][(0, 1, 5)] = B.CurveSetData([], 1, 1)
        ds2.specific["R"] = {1: v}
        with pytest.raises(ValueError, match="key must be a string"):
            B.dumps_json(ds2)


class TestReviewFixes:
    def test_imported_general_rows_land_on_default_slot(self, spark):
        """Imported general_delay must carry time_slot 12 so the
        predict ladder's SemiSpecific rung (which joins slot 12)
        actually sees reference statistics."""
        ds = B.DelayStatistics()
        v = B.VariantData(stop_ids=["s0"])
        v.general_delay[1][0] = B.CurveData([(-12.0, 0.0), (12.0, 1.0)],
                                            3, 20)
        ds.specific["R1"] = {4: v}
        g = B.stats_to_tables(spark, ds)["general"]
        assert [int(r.time_slot) for r in g.collect()] == [12]

    def test_export_takes_default_slot_not_iteration_order(self, spark):
        """An engine-produced general table has one row per slot; the
        export must select the DEFAULT-slot row explicitly."""
        import pyspark.sql.types as T

        from dystonse_gtfs_importer_spark.schemas import CURVE_TYPE

        schema = T.StructType([
            T.StructField("route_id", T.StringType()),
            T.StructField("route_variant", T.LongType()),
            T.StructField("event_type", T.ByteType()),
            T.StructField("time_slot", T.ByteType()),
            T.StructField("stop_index", T.IntegerType()),
            T.StructField("curve", CURVE_TYPE),
            T.StructField("sample_size", T.LongType()),
        ])
        rows = [("R1", 4, 1, slot, 0,
                 [(-12.0, 0.0), (float(slot), 1.0)], 10 + slot)
                for slot in (3, 12, 5)]  # DEFAULT not last
        g = spark.createDataFrame(rows, schema).repartition(3)
        ds = B.tables_to_stats({"general": g})
        cd = ds.specific["R1"][4].general_delay[1][0]
        assert cd.points[1][0] == 12.0 and cd.sample_size == 22

    def test_json_fallback_general_precision_roundtrip(self):
        ds = B.DelayStatistics()
        v = B.VariantData()
        v.general_delay[1][0] = B.CurveData(
            [(-6.0, 0.0), (6.0, 1.0)], 5, 4)  # FallbackGeneral
        ds.specific["R"] = {1: v}
        text = B.dumps_json(ds)
        assert '"FallbackGeneral"' in text
        assert B.loads_json(text) == ds


class TestCurveSetKeyVariants:
    """CurveSetKey / TimeSlot encodings across rmp-serde eras.

    The reference pins rmp-serde 0.14.3 (Cargo.toml:40), whose
    ``to_vec`` writes structs positionally and enums derive-style —
    the golden layout TestGoldenLayout pins byte-for-byte.  Building
    the reference binary to produce artifacts end-to-end is not
    possible in this sandbox (no network: cargo cannot fetch the
    dependency graph), so this class pins the leniency matrix for the
    OTHER encodings real-world artifacts can carry instead:

    | layer          | 0.14 to_vec (golden) | to_vec_named / 1.x     |
    |----------------|----------------------|------------------------|
    | struct         | array, field order   | map, field names       |
    | CurveSetKey    | array as map KEY     | map as map KEY         |
    | TimeSlot       | array, skip-field    | map, named fields      |
    | unit variant   | [idx, []]            | name string / bare int |
    | Weekday        | "Mon" (chrono str)   | "mon"/"Monday" forms   |
    """

    def _expect(self):
        v = B.VariantData(stop_ids=["a", "b"])
        v.curve_sets[B._ET_DEPARTURE][(0, 1, 5)] = B.CurveSetData(
            [(-12.0, [(-24.0, 0.0), (24.0, 1.0)])],
            B.PRECISION_SPECIFIC, 9)
        return v

    def test_named_mode_artifact_parses(self):
        """rmp-serde named mode: every struct a map, CurveSetKey a map
        in key position (hashable via the codec's FrozenMap), unit
        variants as name strings."""
        from dystonse_gtfs_importer_spark.sources.msgpack_codec import (
            FrozenMap,
        )

        key = FrozenMap({
            "start_stop_index": 0, "end_stop_index": 1,
            "time_slot": {"id": 5, "min_weekday": "mon",
                          "max_weekday": "fri",
                          "min_hour": 14, "max_hour": 16},
        })
        obj = {
            "specific": {"R9": {
                "route_id": "R9",
                "variants": {7: {
                    "stop_ids": ["a", "b"],
                    "curve_sets": {
                        "arrival": {},
                        "departure": {key: {
                            "curve_set": {"curves": [
                                [-12.0, {"points": [
                                    {"x": -24.0, "y": 0.0},
                                    {"x": 24.0, "y": 1.0}]}],
                            ]},
                            "precision_type": "Specific",
                            "sample_size": 9,
                        }},
                    },
                    "general_delay": {"arrival": {}, "departure": {}},
                }},
            }},
            "general": {"all_default_curves": {}},
        }
        ds = B.loads(packb(obj))
        exp = B.DelayStatistics()
        exp.specific["R9"] = {7: self._expect()}
        assert ds == exp

    def test_positional_key_with_named_time_slot(self):
        """Mixed encoding: array CurveSetKey whose TimeSlot field is a
        map (what a partial named-mode upgrade emits)."""
        from dystonse_gtfs_importer_spark.sources.msgpack_codec import (
            FrozenMap,
        )

        key = (0, 1, FrozenMap({"id": 5, "min_weekday": "Monday",
                                "max_weekday": "Friday",
                                "min_hour": 14, "max_hour": 16}))
        obj = [
            {"R9": ["R9", {7: [["a", "b"],
                               [{}, {key: [[[[-12.0, [[[-24.0, 0.0],
                                                       [24.0, 1.0]]]]]],
                                     (1, ()), 9]}],
                               [{}, {}]]}]},
            [{}],
        ]
        ds = B.loads(packb(obj))
        exp = B.DelayStatistics()
        exp.specific["R9"] = {7: self._expect()}
        assert ds == exp

    def test_slot_weekday_forms_ignored_for_id(self):
        """The engine keys slots by id alone (the weekday/hour window
        is the id's definition, time_slots.rs:27-114), so any weekday
        spelling — short, long, lowercase, bare int — must not affect
        parsing."""
        for wd in ("Mon", "mon", "Monday", 0):
            obj = [{}, [{((3, ()), (1, ()), (5, wd, wd, 14, 16),
                          (1, ())): [[[]], (4, ()), 1]}]]
            ds = B.loads(packb(obj))
            assert list(ds.default) == [(3, "middle", 5, 2)]

    def test_frozen_map_immutable_and_roundtrips(self):
        from dystonse_gtfs_importer_spark.sources.msgpack_codec import (
            FrozenMap, unpackb,
        )

        fm = FrozenMap({"a": 1, "b": [1, 2]})
        with pytest.raises(TypeError):
            fm["c"] = 3
        assert hash(fm) == hash(FrozenMap({"b": [1, 2], "a": 1}))
        blob = packb({fm: "x"})
        back = unpackb(blob)
        assert isinstance(next(iter(back)), dict)
        assert back == {fm: "x"}
