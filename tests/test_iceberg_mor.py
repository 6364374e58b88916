"""Iceberg v2 merge-on-read: positional delete files written by
`iceberg_delete_rows` must be APPLIED by `IcebergSnapshotLake.read()`
(anti-join on file path + row position), refused by the index layer
(ghost-row safety), and compacted away by `iceberg_rewrite_deletes`.
Exceeds the reference, which refuses delete-bearing tables outright
(backends/iceberg.py:279-280)."""

import json
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.avro_lite import read_ocf
from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    iceberg_live_files,
    iceberg_live_files_and_deletes,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_convert,
    iceberg_delete_rows,
    iceberg_rewrite_deletes,
    iceberg_write,
)


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    out = str(tmp_path / "mor_table")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
        .repartition(3)
        .write.parquet(out)
    )
    iceberg_convert(out)
    return out


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_delete_rows_applies_on_read(spark, table):
    lake = IcebergSnapshotLake(spark, table, table + "_idx")
    before = _ids(lake.read())
    sid = iceberg_delete_rows(spark, table, F.col("doc_id") % 7 == 0)
    assert sid == 2
    after = _ids(lake.read())
    assert after == [i for i in before if i % 7 != 0]
    # data files untouched; one or more delete files committed
    data, dels = iceberg_live_files_and_deletes(table)
    assert len(data) == 3 and dels
    assert all(os.path.basename(f).startswith("delete-") for f in dels)


def test_delete_file_shape_and_metadata(spark, table):
    iceberg_delete_rows(spark, table, "doc_id < 10")
    _, dels = iceberg_live_files_and_deletes(table)
    pairs = spark.read.parquet(*dels)
    assert set(pairs.columns) == {"file_path", "pos"}
    n = pairs.count()
    assert n == 10
    # delete rows address live data files by absolute path
    data, _ = iceberg_live_files_and_deletes(table)
    refd = {r.file_path for r in pairs.select("file_path").distinct().collect()}
    assert refd <= set(data)
    # format-version bumps to 2 and the manifest list flags content=1
    metas = sorted(
        f
        for f in os.listdir(os.path.join(table, "metadata"))
        if f.endswith(".metadata.json")
    )
    md = json.loads(
        open(os.path.join(table, "metadata", metas[-1])).read()
    )
    assert md["format-version"] == 2
    snap = [
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    ][0]
    assert snap["summary"]["operation"] == "delete"
    _, ml = read_ocf(snap["manifest-list"])
    assert sorted(e["content"] for e in ml) == [0, 1]


def test_second_delete_excludes_prior_pairs(spark, table):
    iceberg_delete_rows(spark, table, "doc_id < 50")
    # overlapping predicate: rows < 50 are already deleted, only 50..99 new
    iceberg_delete_rows(spark, table, "doc_id < 100")
    _, dels = iceberg_live_files_and_deletes(table)
    pairs = spark.read.parquet(*dels)
    assert pairs.count() == 100  # no duplicated (path, pos) pairs
    assert pairs.distinct().count() == 100
    lake = IcebergSnapshotLake(spark, table, table + "_idx")
    assert _ids(lake.read()) == list(range(100, 300))


def test_noop_delete_keeps_snapshot(spark, table):
    sid1 = iceberg_delete_rows(spark, table, "doc_id < 5")
    sid2 = iceberg_delete_rows(spark, table, "doc_id < 5")  # all covered
    assert sid2 == sid1
    _, dels = iceberg_live_files_and_deletes(table)
    assert spark.read.parquet(*dels).count() == 5


def test_index_layer_refuses_mor_snapshot(spark, table):
    iceberg_delete_rows(spark, table, "doc_id = 1")
    lake = IcebergSnapshotLake(spark, table, table + "_idx")
    with pytest.raises(ValueError, match="positional delete"):
        _ = lake.files
    with pytest.raises(ValueError, match="positional delete"):
        iceberg_live_files(table)


def test_rewrite_deletes_restores_indexability(spark, table):
    lake = IcebergSnapshotLake(spark, table, table + "_idx")
    iceberg_delete_rows(spark, table, F.col("doc_id") % 3 == 0)
    expect = _ids(lake.read())
    sid = iceberg_rewrite_deletes(spark, table)
    assert sid == 3
    data, dels = iceberg_live_files_and_deletes(table)
    assert not dels
    assert _ids(lake.read()) == expect
    assert sorted(lake.files) == sorted(data)  # no longer refuses
    # every data file now physically lacks the deleted rows
    assert (
        spark.read.parquet(*data).filter(F.col("doc_id") % 3 == 0).count()
        == 0
    )


def test_rewrite_touches_only_affected_files(spark, table):
    data_before, _ = iceberg_live_files_and_deletes(table)
    # delete rows from exactly one file
    one = sorted(data_before)[0]
    some_id = spark.read.parquet(one).select(F.min("doc_id")).collect()[0][0]
    iceberg_delete_rows(spark, table, F.col("doc_id") == some_id)
    iceberg_rewrite_deletes(spark, table)
    data_after, _ = iceberg_live_files_and_deletes(table)
    kept = set(data_before) & set(data_after)
    assert len(kept) == 2  # the two untouched files keep their bytes
    assert one not in data_after


def test_rewrite_noop_without_deletes(spark, table):
    sid = iceberg_rewrite_deletes(spark, table)
    assert sid == 1  # current snapshot unchanged


def test_partitioned_mor_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "mor_part")
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
    )
    iceberg_write(df, out, partition_by=["lang"])
    lake = IcebergSnapshotLake(spark, out, out + "_idx")
    before = lake.read().groupBy("lang").count().collect()
    iceberg_delete_rows(spark, out, F.col("doc_id") % 2 == 0)
    got = _ids(lake.read())
    assert got and all(i % 2 == 1 for i in got)
    # partition columns still reconstruct after the anti-join
    after = {r.lang: r["count"] for r in lake.read().groupBy("lang").count().collect()}
    assert set(after) == {r.lang for r in before}
    # rewrite keeps the hive layout: files stay under lang=*/ dirs
    iceberg_rewrite_deletes(spark, out)
    data, dels = iceberg_live_files_and_deletes(out)
    assert not dels
    assert all("lang=" in f for f in data)
    assert _ids(lake.read()) == got


def test_history_liveness_ignores_deletes(spark, table):
    """Vacuum/history liveness must keep indexing data files of
    delete-bearing snapshots — deletes remove rows, not files."""
    from rottnest_spark.sources.iceberg import iceberg_history_files

    iceberg_delete_rows(spark, table, "doc_id = 2")
    files = iceberg_history_files(table, history_days=9999)
    assert len([f for f in files if "delete-" not in os.path.basename(f)]) == 3


def test_equality_deletes_refused(spark, table):
    """A snapshot whose delete manifest carries content=2 entries
    (equality deletes) must raise, not silently mis-read."""
    iceberg_delete_rows(spark, table, "doc_id = 1")
    # rewrite the delete manifest entry to claim an equality delete
    meta = os.path.join(table, "metadata")
    import glob as g

    from rottnest_spark.sources.avro_lite import write_ocf

    dm = sorted(g.glob(os.path.join(meta, "manifest-del-*.avro")))[-1]
    schema, entries = read_ocf(dm)
    for e in entries:
        e["data_file"]["content"] = 2
    write_ocf(dm, schema, entries)
    with pytest.raises(ValueError, match="equality delete"):
        iceberg_live_files_and_deletes(table)


def test_append_into_mor_table(spark, table):
    """Pure adds commute with merge-on-read state: appending to a
    delete-bearing table carries the delete files forward and the new
    rows are all visible."""
    from rottnest_spark.sources.writable import IcebergWritableLake

    iceberg_delete_rows(spark, table, "doc_id < 100")
    lake = IcebergWritableLake(spark, table, table + "_idx")
    extra = spark.range(10_000, 10_005).selectExpr(
        "id AS doc_id", "'xx' AS lang", "cast(1 as bigint) AS n_chars"
    )
    assert lake.append(extra)
    got = _ids(lake.read())
    assert got == list(range(100, 300)) + list(range(10_000, 10_005))
    _, dels = iceberg_live_files_and_deletes(table)
    assert dels  # deletes survived the append commit


def test_writable_dml_after_compacted_mor_history(spark, table, tmp_path):
    """Copy-on-write DML must work on a table whose HISTORY holds a
    merge-on-read episode (delete → rewrite): the liveness walk over old
    snapshots has to tolerate their delete files."""
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.sources.writable import IcebergWritableLake

    iceberg_delete_rows(spark, table, "doc_id % 5 = 0")
    iceberg_rewrite_deletes(spark, table)  # current snapshot is clean
    lake = IcebergWritableLake(spark, table, str(tmp_path / "wx"))
    lake.build_index(ExactIndex(), "doc_id")
    res = lake.delete_matching(ExactIndex(), "doc_id", 3)
    assert res["rewritten"] >= 1
    got = sorted(r.doc_id for r in lake.read().select("doc_id").collect())
    assert 3 not in got and all(i % 5 != 0 for i in got)


def test_orphan_delete_files_never_committed_as_data(spark, table, tmp_path):
    """Publish-before-commit crash window: an UNCOMMITTED delete-shaped
    parquet (or any unknown non-DML file) in data/ must never be swept
    into the log as a data file by a later DML's adds-diff."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.sources.writable import IcebergWritableLake

    # simulate iceberg_delete_rows crashing after the publish
    orphan_del = os.path.join(table, "delete-deadbeef.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": ["/nowhere.parquet"],
                "pos": pa.array([0], pa.int64()),
            }
        ),
        orphan_del,
    )
    # and an expire-crash leftover (uuid-hex name, unknown to the log)
    orphan_hex = os.path.join(table, "ab" * 16 + ".parquet")
    pq.write_table(pa.table({"doc_id": pa.array([999999], pa.int64())}), orphan_hex)

    lake = IcebergWritableLake(spark, table, str(tmp_path / "w"))
    lake.build_index(ExactIndex(), "doc_id")
    some = sorted(r.doc_id for r in lake.read().limit(1).collect())[0]
    lake.delete_matching(ExactIndex(), "doc_id", int(some))
    got = lake.read()
    assert "pos" not in got.columns  # the delete file never became data
    ids = {r.doc_id for r in got.select("doc_id").collect()}
    assert some not in ids and 999999 not in ids
    assert os.path.exists(orphan_del)  # left for vacuum, not committed


def test_delete_conflicts_with_concurrent_rewrite(spark, table, monkeypatch):
    """validateDataFilesExist analog: a row-level DELETE losing the
    version race to a compaction that removed its target files must
    raise, not commit positions addressing dead paths (a silent no-op
    delete)."""
    from rottnest_spark.sources import iceberg_write as iw

    real = iw._commit_snapshot
    state = {"raced": False}

    def racing(*args, **kwargs):
        # first commit attempt of the DELETE: let a concurrent rewrite
        # win this version (remove+re-add every data file), then lose
        if not state["raced"] and kwargs.get("added_deletes"):
            state["raced"] = True
            monkeypatch.undo()
            try:
                data, _ = iceberg_live_files_and_deletes(table)
                import shutil as _sh

                copies = []
                for f in data:
                    c = os.path.join(
                        os.path.dirname(f), f"copy{os.path.basename(f)}"
                    )
                    _sh.copyfile(f, c)
                    copies.append(c)
                from rottnest_spark.sources.iceberg_write import (
                    iceberg_commit,
                )

                iceberg_commit(table, add=copies, remove=sorted(data))
            finally:
                monkeypatch.setattr(iw, "_commit_snapshot", racing)
            raise FileExistsError("lost the race")
        return real(*args, **kwargs)

    monkeypatch.setattr(iw, "_commit_snapshot", racing)
    with pytest.raises(ValueError, match="computed from"):
        iceberg_delete_rows(spark, table, "doc_id < 5")
    monkeypatch.undo()
