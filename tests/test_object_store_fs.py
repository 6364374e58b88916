"""Object-store conformance: the full lake lifecycle over FakeObjectStoreFS
— a store with NO atomic rename (copy+delete emulation), NO directories,
and conditional-PUT-only exclusive creates. Proves the rename-free
versioned-catalog claim beyond RecordingFS: every catalog commit happens
via create_exclusive, rename never touches the catalog directory, and the
flock fast path silently degrades to OCC-only mode (the fs is not a
LocalFS, so `_locked` must not try to open/flock at all)."""

import os

import pytest
from pyspark.sql import functions as F

from rottnest_spark.core.fs import FakeObjectStoreFS
from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.indices.exact import ExactIndex


@pytest.fixture()
def store_lake(spark, tmp_path):
    fs = FakeObjectStoreFS(root=str(tmp_path))
    df = spark.createDataFrame(
        [(i, f"v{i % 50}") for i in range(500)], "k bigint, v string"
    )
    data = str(tmp_path / "data")
    df.repartition(5).write.parquet(data)
    return ParquetLake(spark, data, str(tmp_path / "idx"), fs=fs), fs


def test_full_lifecycle_over_object_store(spark, store_lake):
    """build → search → compact (files + indices) → vacuum, end to end on
    object-store semantics, with results exact throughout."""
    lake, fs = store_lake

    assert len(lake.files) == 5

    idx = ExactIndex()
    lake.build_index(idx, "k")
    assert [r["v"] for r in lake.search(idx, "k", 123).collect()] == ["v23"]

    # catalog commits must be rename-free: only create_exclusive versions
    cat_renames = [c for c in fs.ops("rename") if "_catalog" in c[1]]
    assert not cat_renames, f"catalog used rename: {cat_renames}"
    cat_commits = [
        c for c in fs.ops("create_exclusive") if "_catalog" in c[1]
    ]
    assert cat_commits, "catalog versions must go through create_exclusive"

    # file compaction over a store whose rename is copy+delete
    new_files = lake.compact_files(target_rows=10**9)
    assert new_files
    assert [r["v"] for r in lake.search(idx, "k", 123).collect()] == ["v23"]

    # index compaction + vacuum complete over the fake store
    lake.compact_indices(idx, "k")
    assert [r["v"] for r in lake.search(idx, "k", 123).collect()] == ["v23"]
    removed = lake.vacuum()
    assert removed
    assert [r["v"] for r in lake.search(idx, "k", 123).collect()] == ["v23"]


def test_conditional_put_loses_race(tmp_path):
    """create_exclusive is the store's check-and-put: second writer gets
    FileExistsError (the OCC signal), first writer's bytes survive."""
    fs = FakeObjectStoreFS(root=str(tmp_path))
    p = str(tmp_path / "cat" / "v1.parquet")
    fs.create_exclusive(p, b"winner")
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, b"loser")
    assert fs.read_bytes(p) == b"winner"


def test_makedirs_is_a_noop_keys_create_prefixes(tmp_path):
    """Object stores have no directories: writes materialize prefixes."""
    fs = FakeObjectStoreFS(root=str(tmp_path))
    deep = str(tmp_path / "a" / "b" / "c.txt")
    fs.write_text(deep, "x")
    assert fs.read_text(deep) == "x"
    assert fs.list_files(str(tmp_path / "a")) == [deep]


def test_rename_is_copy_delete_not_atomic(tmp_path):
    fs = FakeObjectStoreFS(root=str(tmp_path))
    src = str(tmp_path / "s.txt")
    dst = str(tmp_path / "d" / "t.txt")
    fs.write_text(src, "data")
    fs.rename(src, dst)
    assert not fs.exists(src) and fs.read_text(dst) == "data"
    assert fs.ops("rename") == [("rename", src, dst)]


def test_list_lag_hides_recent_writes_but_reads_stay_strong(tmp_path):
    """Eventual-consistency probe: lag hides the newest keys from
    listings while exists/read remain read-after-write."""
    fs = FakeObjectStoreFS(root=str(tmp_path), list_lag=1)
    a, b = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    fs.write_text(a, "1")
    fs.write_text(b, "2")
    listed = fs.list_files(str(tmp_path))
    assert a in listed and b not in listed  # newest hidden from list
    assert fs.exists(b) and fs.read_text(b) == "2"  # reads strong
    fs.list_lag = 0
    assert b in fs.list_files(str(tmp_path))


def test_delta_lifecycle_over_object_store(spark, tmp_path):
    """Delta convert → append-commit → checkpoint, all through the fake
    store: the log writer's exclusive creates and checkpoint bytes never
    touch local-only os calls."""
    from rottnest_spark.sources.delta import delta_live_files
    from rottnest_spark.sources.delta_write import (
        delta_checkpoint,
        delta_commit_retry,
        delta_convert,
    )

    fs = FakeObjectStoreFS(root=str(tmp_path))
    table = str(tmp_path / "tbl")
    spark.range(100).withColumn("v", F.col("id") % 7).write.parquet(table)
    assert delta_convert(table, fs=fs) == 0

    extra = os.path.join(table, "part-extra.parquet")
    spark.range(100, 120).withColumn("v", F.col("id") % 7).coalesce(
        1
    ).write.parquet(str(tmp_path / "stage"))
    staged = [
        f
        for f in fs.list_files(str(tmp_path / "stage"))
        if f.endswith(".parquet")
    ]
    fs.rename(staged[0], extra)
    v = delta_commit_retry(table, add=[extra], fs=fs)
    assert v == 1
    live = delta_live_files(table, fs=fs)
    assert extra in live
    assert spark.read.parquet(*live).count() == 120

    cp = delta_checkpoint(table, fs=fs)
    assert cp == 1
    # every log mutation was a conditional PUT or a byte write via fs
    log_excl = [
        c for c in fs.ops("create_exclusive") if "_delta_log" in c[1]
    ]
    assert len(log_excl) >= 2  # commit 0 + commit 1
    assert [
        c for c in fs.ops("write_bytes") if c[1].endswith(".checkpoint.parquet")
    ]
    # and reads of the snapshot still work after the checkpoint
    assert sorted(delta_live_files(table, fs=fs)) == sorted(live)


def test_iceberg_lifecycle_over_object_store(spark, tmp_path):
    """Iceberg convert → append-commit → replay, all through the fake
    store: metadata JSON, manifest-list/manifest Avro, and the
    version-claim commit route through the FS seam (no local-only I/O)."""
    from rottnest_spark.sources.iceberg import iceberg_live_files
    from rottnest_spark.sources.iceberg_write import (
        iceberg_commit_retry,
        iceberg_convert,
    )

    fs = FakeObjectStoreFS(root=str(tmp_path))
    table = str(tmp_path / "tbl")
    spark.range(100).withColumn("v", F.col("id") % 7).write.parquet(table)
    iceberg_convert(table, fs=fs)
    assert len(iceberg_live_files(table, fs=fs)) > 0

    extra = os.path.join(table, "part-extra.parquet")
    spark.range(100, 120).withColumn("v", F.col("id") % 7).coalesce(
        1
    ).write.parquet(str(tmp_path / "stage"))
    staged = [
        f
        for f in fs.list_files(str(tmp_path / "stage"))
        if f.endswith(".parquet")
    ]
    fs.rename(staged[0], extra)
    iceberg_commit_retry(table, add=[extra], fs=fs)
    live = iceberg_live_files(table, fs=fs)
    assert extra in live
    assert spark.read.parquet(*live).count() == 120
    # the version-claim commits were conditional PUTs through the seam
    md_excl = [
        c
        for c in fs.ops("create_exclusive")
        if c[1].endswith(".metadata.json")
    ]
    assert len(md_excl) >= 2  # convert + append
    # manifests/manifest lists were written through fs, not local open()
    assert [c for c in fs.ops("write_bytes") if c[1].endswith(".avro")]


def test_mor_lifecycle_over_object_store(spark, tmp_path):
    """Merge-on-read over the fake store: DV delete → read applies →
    rewrite → vacuum reclaims, with every log/bin mutation through the
    FS seam (conditional PUT / byte write — no local-only os calls)."""
    from rottnest_spark.sources.delta import DeltaSnapshotLake, delta_live_dvs
    from rottnest_spark.sources.delta_write import (
        delta_convert,
        delta_delete_rows,
        delta_rewrite_deletes,
        delta_vacuum_table,
    )

    fs = FakeObjectStoreFS(root=str(tmp_path))
    table = str(tmp_path / "mor")
    spark.range(200).withColumn("v", F.col("id") % 7).write.parquet(table)
    delta_convert(table, fs=fs)
    lake = DeltaSnapshotLake(spark, table, str(tmp_path / "idx"), fs=fs)
    delta_delete_rows(spark, table, "id % 2 = 0", fs=fs)
    assert delta_live_dvs(table, fs=fs)
    got = sorted(r.id for r in lake.read().select("id").collect())
    assert got == list(range(1, 200, 2))
    delta_rewrite_deletes(spark, table, fs=fs)
    assert not delta_live_dvs(table, fs=fs)
    assert sorted(r.id for r in lake.read().select("id").collect()) == got
    gone = delta_vacuum_table(table, older_than_sec=0, fs=fs)
    assert gone  # replaced originals reclaimed through the seam
    assert sorted(r.id for r in lake.read().select("id").collect()) == got


def test_upsert_lifecycle_over_object_store(spark, tmp_path):
    """Equality-delete upsert over the fake store: sequence-numbered
    metadata commit via conditional PUT, read applies, rewrite
    materializes."""
    from rottnest_spark.sources.iceberg import IcebergSnapshotLake
    from rottnest_spark.sources.iceberg_write import (
        iceberg_convert,
        iceberg_rewrite_deletes,
        iceberg_upsert,
    )

    fs = FakeObjectStoreFS(root=str(tmp_path))
    table = str(tmp_path / "ups")
    spark.range(100).withColumn("v", F.lit(0.0)).write.parquet(table)
    iceberg_convert(table, fs=fs)
    changes = spark.createDataFrame(
        [(i, 9.0) for i in range(10)] + [(500, 9.0)], "id long, v double"
    )
    iceberg_upsert(spark, changes, table, ["id"], fs=fs)
    lake = IcebergSnapshotLake(spark, table, str(tmp_path / "idx"), fs=fs)
    got = {r.id: r.v for r in lake.read().collect()}
    assert len(got) == 101 and got[500] == 9.0
    assert all(got[i] == 9.0 for i in range(10))
    assert all(got[i] == 0.0 for i in range(10, 100))
    iceberg_rewrite_deletes(spark, table, fs=fs)
    got2 = {r.id: r.v for r in lake.read().collect()}
    assert got2 == got
    # metadata version claims were conditional PUTs through the seam
    claims = [
        c
        for c in fs.ops("create_exclusive")
        if c[1].endswith(".metadata.json")
    ]
    assert len(claims) >= 3  # convert + upsert + rewrite


def test_change_cursor_over_object_store(spark, tmp_path):
    """The feed cursor's checkpoint and the feed's log replay both route
    through the FS seam — consumable over a no-rename store."""
    from rottnest_spark.sources.changes import DeltaChangesCursor
    from rottnest_spark.sources.delta_write import (
        delta_convert,
        delta_delete_rows,
    )

    fs = FakeObjectStoreFS(root=str(tmp_path))
    table = str(tmp_path / "feedtbl")
    spark.range(100).withColumn("v", F.col("id") % 5).write.parquet(table)
    delta_convert(table, fs=fs)
    delta_delete_rows(spark, table, "id % 4 = 0", fs=fs)
    cur = DeltaChangesCursor(
        spark, table, str(tmp_path / "ckpt"), fs=fs
    )
    feed, latest = cur.poll()
    rows = feed.select("_commit_version", "_change_type", "id").collect()
    mirror: set = set()
    for v in sorted({r._commit_version for r in rows}):
        dels = {r.id for r in rows if r._commit_version == v and r._change_type == "delete"}
        ins = {r.id for r in rows if r._commit_version == v and r._change_type == "insert"}
        mirror = (mirror - dels) | ins
    assert mirror == {i for i in range(100) if i % 4 != 0}
    cur.ack(latest)
    assert cur.poll()[0] is None
    # the checkpoint landed through the seam (write_text), not bare open
    assert fs.ops("write_text")
