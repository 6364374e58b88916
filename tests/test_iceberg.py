"""Iceberg snapshot backend: live-file resolution from metadata.json +
Avro manifest list/manifests, snapshot-consistent search, incremental build
on a new snapshot, delete-file refusal (reference backends/iceberg.py:52-493).

The fixture writes a spec-shaped v2 table by hand (no pyiceberg here): the
metadata records the table's ORIGINAL location (file:///warehouse/evt) while
the files live in tmp_path — exercising the path rebase every copied/mounted
table needs."""

import json
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.indices.substring import SubstringIndex
from rottnest_spark.sources.avro_lite import write_ocf
from rottnest_spark.sources.iceberg import IcebergSnapshotLake, iceberg_live_files

ORIG_LOC = "file:///warehouse/evt"

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}


def _mk_manifest(meta_dir, name, entries, codec="deflate"):
    path = os.path.join(meta_dir, name)
    recs = [
        {
            "status": status,
            "snapshot_id": 1,
            "data_file": {
                "content": content,
                "file_path": f"{ORIG_LOC}/data/{fname}",
                "file_format": "PARQUET",
                "record_count": 1,
                "file_size_in_bytes": 1,
            },
        }
        for status, fname, content in entries
    ]
    write_ocf(path, MANIFEST_SCHEMA, recs, codec=codec)
    return f"{ORIG_LOC}/metadata/{name}"


def _mk_manifest_list(meta_dir, name, manifest_uris, contents=None):
    path = os.path.join(meta_dir, name)
    contents = contents or [0] * len(manifest_uris)
    recs = [
        {
            "manifest_path": uri,
            "manifest_length": 1,
            "partition_spec_id": 0,
            "content": c,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": 1,
        }
        for uri, c in zip(manifest_uris, contents)
    ]
    write_ocf(path, MANIFEST_LIST_SCHEMA, recs)
    return f"{ORIG_LOC}/metadata/{name}"


def _write_metadata(meta_dir, version, snap_id, manifest_list_uri):
    md = {
        "format-version": 2,
        "location": ORIG_LOC,
        "current-snapshot-id": snap_id,
        "snapshots": [
            {"snapshot-id": snap_id, "manifest-list": manifest_list_uri}
        ],
    }
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(version))


@pytest.fixture()
def iceberg_table(spark, sf_dir, tmp_path):
    table = tmp_path / "itable"
    data = table / "data"
    meta = table / "metadata"
    data.mkdir(parents=True)
    meta.mkdir()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = {}
    for i, cond in enumerate(["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]):
        name = f"part-{i:05d}.parquet"
        docs.filter(cond).coalesce(1).write.parquet(str(table / f"_tmp{i}"))
        import glob as g
        import shutil

        src = g.glob(str(table / f"_tmp{i}" / "*.parquet"))[0]
        shutil.move(src, str(data / name))
        shutil.rmtree(str(table / f"_tmp{i}"))
        parts[i] = name
    # snapshot 2: part0 deleted (status=2), part1 existing, part2 added
    m1 = _mk_manifest(
        str(meta), "m1.avro", [(2, parts[0], 0), (0, parts[1], 0)]
    )
    m2 = _mk_manifest(str(meta), "m2.avro", [(1, parts[2], 0)])
    ml = _mk_manifest_list(str(meta), "snap-2.avro", [m1, m2])
    _write_metadata(str(meta), 2, 2, ml)
    return str(table), parts


def test_live_files_snapshot(spark, iceberg_table):
    table, parts = iceberg_table
    live = iceberg_live_files(table)
    names = {os.path.basename(f) for f in live}
    assert names == {parts[1], parts[2]}
    # deleted-in-snapshot file still physically present
    assert os.path.exists(os.path.join(table, "data", parts[0]))


def test_snapshot_consistent_search(spark, iceberg_table, tmp_path):
    table, parts = iceberg_table
    lake = IcebergSnapshotLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    q = "merge sort"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    live = [os.path.join(table, "data", parts[i]) for i in (1, 2)]
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(*live)
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .collect()
    )
    assert got == want and len(got) > 0
    assert all(d % 3 != 0 for d in got)  # snapshot-deleted rows never leak


def test_incremental_build_on_new_snapshot(spark, iceberg_table, tmp_path):
    table, parts = iceberg_table
    meta = os.path.join(table, "metadata")
    lake = IcebergSnapshotLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    assert lake.build_index(idx, "text")
    # snapshot 3 re-adds part0
    m3 = _mk_manifest(
        meta, "m3.avro", [(0, parts[1], 0), (0, parts[2], 0), (1, parts[0], 0)]
    )
    ml3 = _mk_manifest_list(meta, "snap-3.avro", [m3])
    _write_metadata(meta, 3, 3, ml3)
    created = lake.build_index(idx, "text")
    assert len(created) == 1  # only the snapshot delta got indexed
    q = "merge sort"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            *[os.path.join(table, "data", p) for p in parts.values()]
        )
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .collect()
    )
    assert got == want


def test_delete_manifest_refused(spark, iceberg_table):
    table, parts = iceberg_table
    meta = os.path.join(table, "metadata")
    m = _mk_manifest(meta, "mdel.avro", [(0, parts[1], 0)])
    ml = _mk_manifest_list(meta, "snap-4.avro", [m], contents=[1])
    _write_metadata(meta, 4, 4, ml)
    with pytest.raises(ValueError, match="delete"):
        iceberg_live_files(table)


def test_delete_data_file_refused(spark, iceberg_table):
    table, parts = iceberg_table
    meta = os.path.join(table, "metadata")
    # a position-delete data_file (content=1) inside a data manifest
    m = _mk_manifest(meta, "mdel2.avro", [(0, parts[1], 0), (1, "del.parquet", 1)])
    ml = _mk_manifest_list(meta, "snap-5.avro", [m])
    _write_metadata(meta, 5, 5, ml)
    with pytest.raises(ValueError, match="delete"):
        iceberg_live_files(table)


def test_empty_table_no_snapshot(spark, tmp_path):
    table = tmp_path / "empty"
    (table / "metadata").mkdir(parents=True)
    with open(table / "metadata" / "v1.metadata.json", "w") as fh:
        json.dump(
            {"format-version": 2, "location": ORIG_LOC,
             "current-snapshot-id": -1, "snapshots": []},
            fh,
        )
    assert iceberg_live_files(str(table)) == []


def test_history_aware_vacuum(spark, iceberg_table, tmp_path):
    """Indexes over files only reachable via time travel survive vacuum
    within the retention window and die outside it (reference
    backends/iceberg.py:307-384)."""
    import json

    from rottnest_spark.sources.iceberg import iceberg_history_files

    table, parts = iceberg_table
    meta = os.path.join(table, "metadata")
    lake = IcebergSnapshotLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    assert lake.build_index(idx, "text")  # covers parts 1+2 (snapshot 2)

    # snapshot 3 (one day later) replaces the data set with part0 only
    T2 = 1_700_000_000_000
    T3 = T2 + 86_400_000
    m3 = _mk_manifest(meta, "m3h.avro", [(1, parts[0], 0)])
    ml3 = _mk_manifest_list(meta, "snap-3h.avro", [m3])
    md = {
        "format-version": 2,
        "location": ORIG_LOC,
        "current-snapshot-id": 3,
        "snapshots": [
            {"snapshot-id": 2, "timestamp-ms": T2,
             "manifest-list": os.path.join(meta, "snap-2.avro")},
            {"snapshot-id": 3, "timestamp-ms": T3, "manifest-list": ml3},
        ],
    }
    with open(os.path.join(meta, "v3.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("3")

    hist = {os.path.basename(f)
            for f in iceberg_history_files(table, 2, now_ms=T3)}
    assert hist == {parts[0], parts[1], parts[2]}

    # within the window: the snapshot-2 index survives
    removed = lake.vacuum(history_days=2, now_ms=T3)
    assert removed == []
    assert lake.catalog.entries_for("substring", "text")

    # window shrunk below the snapshot age: the stale index is reclaimed
    removed = lake.vacuum(history_days=0.5, now_ms=T3)
    assert removed and not lake.catalog.entries_for("substring", "text")
