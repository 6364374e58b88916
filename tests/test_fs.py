"""Storage abstraction (core/fs.py): the lake's metadata plane — listing,
commit renames, manifests, retention — must route through LakeFS, so a
non-POSIX store only supplies one object. RecordingFS proves the routing
by intercepting every interface call during real lifecycle operations."""

import os

import pytest
from pyspark.sql import functions as F

from rottnest_spark.core.fs import LocalFS, RecordingFS
from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.indices.exact import ExactIndex


def test_localfs_glob_and_list(tmp_path):
    fs = LocalFS()
    d = tmp_path / "x"
    fs.makedirs(str(d / "sub"))
    fs.write_text(str(d / "a.json"), "{}")
    fs.write_text(str(d / "sub" / "b.parquet"), "")
    assert fs.glob(str(d / "*.json")) == [str(d / "a.json")]
    assert fs.glob(str(d / "*.missing")) == []
    assert fs.list_files(str(d)) == [
        str(d / "a.json"),
        str(d / "sub" / "b.parquet"),
    ]
    fs.rename(str(d / "a.json"), str(d / "c.json"))
    assert fs.exists(str(d / "c.json")) and not fs.exists(str(d / "a.json"))
    assert fs.read_text(str(d / "c.json")) == "{}"
    fs.remove(str(d / "c.json"))
    fs.rmtree(str(d))
    assert not fs.exists(str(d))


@pytest.fixture()
def rec_lake(spark, tmp_path):
    fs = RecordingFS()
    df = spark.createDataFrame(
        [(i, f"v{i % 50}") for i in range(500)], "k bigint, v string"
    )
    data = str(tmp_path / "data")
    df.repartition(5).write.parquet(data)
    return ParquetLake(spark, data, str(tmp_path / "idx"), fs=fs), fs


def test_lifecycle_routes_through_fs(spark, rec_lake):
    """list → build → compact (commit protocol) → vacuum, all observable
    through the interface; results stay exact throughout."""
    lake, fs = rec_lake

    # listing goes through fs.list_files
    n0 = len(lake.files)
    assert n0 == 5
    assert fs.ops("list_files")

    idx = ExactIndex()
    lake.build_index(idx, "k")
    assert [r["v"] for r in lake.search(idx, "k", 123).collect()] == ["v23"]

    # commit protocol: manifest write + per-part rename + retire removes
    fs.calls.clear()
    new_files = lake.compact_files(target_rows=10**9)
    assert new_files
    man_writes = [
        c for c in fs.ops("write_text") if "_compactions" in c[1]
    ]
    assert man_writes, "compaction manifest must be written via fs"
    renames = fs.ops("rename")
    assert any(n in {c[2] for c in renames} for n in new_files)
    assert len(fs.ops("remove")) >= 5  # replaced originals deleted via fs

    # search result identical after the fs-routed swap
    assert [r["v"] for r in lake.search(idx, "k", 123).collect()] == ["v23"]

    # vacuum reclaims the now-stale entry through fs.rmtree
    fs.calls.clear()
    removed = lake.vacuum()
    assert removed
    assert fs.ops("rmtree")


def test_append_and_repair_route_through_fs(spark, rec_lake):
    lake, fs = rec_lake
    fs.calls.clear()
    added = lake.append(
        spark.createDataFrame([(1000, "new")], "k bigint, v string")
    )
    assert added and all(os.path.basename(a).startswith("appended_") for a in added)
    assert fs.ops("rename")
    assert lake.read().filter(F.col("k") == 1000).count() == 1

    # a stranded manifest whose new files never published → repair discards
    man_dir = os.path.join(lake.index_dir, "_compactions")
    fs.makedirs(man_dir)
    fs.write_text(
        os.path.join(man_dir, "deadbeef.json"),
        '{"new_files": ["/nonexistent/x.parquet"], "replaces": []}',
    )
    assert lake.repair_files() == []
    assert not fs.exists(os.path.join(man_dir, "deadbeef.json"))
