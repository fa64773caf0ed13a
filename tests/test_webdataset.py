"""WebDataset tar-shard source (sources/webdataset.py): member
extraction, sample assembly, and corrupt-input accounting."""

from __future__ import annotations

import io
import tarfile

import pytest


def _make_shard(path, members):
    with tarfile.open(path, "w") as tf:
        for name, payload in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))


@pytest.fixture()
def shard_dir(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    _make_shard(d / "s0.tar", [
        ("000001.jpg", b"JPGDATA1"),
        ("000001.json", b'{"label": 1}'),
        ("000001.seg.png", b"SEGPNG"),
        ("000002.txt", b"caption two"),
        ("noext", b"keyless"),
    ])
    _make_shard(d / "s1.tar", [
        ("sub/000003.jpg", b"JPGDATA3"),
        ("sub/000003.txt", b"caption three"),
    ])
    (d / "bad.tar").write_bytes(b"this is not a tar at all")
    return str(d)


class TestTarMembers:
    def test_members_and_keys(self, spark, shard_dir):
        from dystonse_gtfs_importer_spark.sources.webdataset import (
            read_tar_members,
        )

        rows = read_tar_members(spark, shard_dir).collect()
        good = {r.member: r for r in rows if r.error is None}
        assert good["000001.seg.png"].sample_key == "000001"
        assert good["000001.seg.png"].ext == "seg.png"
        assert good["sub/000003.jpg"].sample_key == "sub/000003"
        assert good["noext"].ext == ""
        assert good["000001.jpg"].payload == b"JPGDATA1"
        assert good["000001.jpg"].n_bytes == 8

    def test_corrupt_shard_accounted(self, spark, shard_dir):
        from dystonse_gtfs_importer_spark.sources.webdataset import (
            read_tar_members,
        )

        rows = read_tar_members(spark, shard_dir).collect()
        bad = [r for r in rows if r.error is not None]
        assert len(bad) == 1 and "bad.tar" in bad[0].shard
        assert bad[0].error.startswith("shard:")
        # corrupt shard must not suppress the healthy ones
        assert len([r for r in rows if r.error is None]) == 7

    def test_extraction_is_map_only(self, spark, shard_dir):
        from dystonse_gtfs_importer_spark.sources.webdataset import (
            read_tar_members,
        )

        plan = read_tar_members(spark, shard_dir) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


class TestSampleAssembly:
    def test_samples_grouped_and_sorted(self, spark, shard_dir):
        from dystonse_gtfs_importer_spark.sources.webdataset import (
            read_webdataset,
        )

        rows = {r.sample_key: r for r in
                read_webdataset(spark, shard_dir).collect()}
        s1 = rows["000001"]
        assert s1.exts == ["jpg", "json", "seg.png"]  # ext-sorted
        assert s1.payloads[0] == b"JPGDATA1"
        assert s1.n_bytes == 8 + 12 + 6
        assert rows["sub/000003"].exts == ["jpg", "txt"]
        assert len(rows) == 4  # 000001, 000002, noext, sub/000003
