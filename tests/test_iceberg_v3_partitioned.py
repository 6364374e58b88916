"""Iceberg v3 puffin-DV DML on IDENTITY-PARTITIONED tables (round 9).

Round 8 closed the v3 write lifecycle (delete/upsert/append/rewrite as
puffin deletion vectors) for unpartitioned tables only; real v3 tables
are partitioned, so every entry point refused them. This file is the
partitioned twin of tests/test_iceberg_v3_dv.py's cycle: tables are
created hive-laid by `iceberg_write(partition_by=...)` (data files
physically LACK the partition columns — values live in the path and in
the manifests' r102 records), then driven through the full v3 DML
lifecycle. Contracts pinned:

- DELETE predicates on partition columns AND physical columns both
  match (the DML scan reconstructs partition columns the way read()
  does);
- manifest entries carry the spec-required r102 partition record for
  data files AND deletion vectors (a DV's partition matches its
  referenced data file's);
- UPSERT stages hive-laid (new files land in their `col=value/` dir)
  and keys may include partition columns;
- REWRITE keeps rewritten files inside their partition dir, preserving
  the layout the manifests derive values from;
- lineage: EXISTING (status-0) manifest entries keep the snapshot id
  that originally added them — only status-1 adds stamp the new one
  (the Iceberg manifest-entry contract external time-travel tooling
  reads).

Reference has nothing here (refuses all delete state,
reference backends/iceberg.py:279-280) — beyond-ref surface.
"""

import os

import pytest
from pyspark.sql import functions as F

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    _current_metadata,
    live_adds_from_metadata,
    snapshot_state_from_metadata,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_v3_append,
    iceberg_v3_delete_rows,
    iceberg_v3_rewrite_deletes,
    iceberg_v3_upsert,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _data(spark, n=120):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "concat('p', cast(id % 3 AS string)) AS lang",
        "id * 3 AS n_chars",
    )


@pytest.fixture()
def ptable(spark, tmp_path):
    out = str(tmp_path / "pt")
    iceberg_write(_data(spark), out, partition_by=["lang"])
    return out


def _rows(spark, table):
    lake = IcebergSnapshotLake(spark, table, table + "_ix")
    return {
        (r.doc_id, r.lang, r.n_chars)
        for r in lake.read().select("doc_id", "lang", "n_chars").collect()
    }


def _expect(spark, n=120, pred=None):
    df = _data(spark, n)
    if pred is not None:
        df = df.filter(pred)
    return {(r.doc_id, r.lang, r.n_chars) for r in df.collect()}


def test_delete_on_partition_column(spark, ptable):
    """The DELETE predicate references the partition column, which the
    data files physically lack — the DML scan must reconstruct it."""
    snap = iceberg_v3_delete_rows(spark, ptable, "lang = 'p1'")
    md = _current_metadata(ptable)
    assert md["format-version"] == 3
    assert md["current-snapshot-id"] == snap
    assert _rows(spark, ptable) == _expect(spark, pred="lang != 'p1'")


def test_delete_on_physical_column_and_manifest_partitions(spark, ptable):
    iceberg_v3_delete_rows(spark, ptable, "doc_id < 30")
    assert _rows(spark, ptable) == _expect(spark, pred="doc_id >= 30")
    # every manifest entry (data + DV) carries a typed r102 value
    md = _current_metadata(ptable)
    adds = live_adds_from_metadata(md, ptable)
    assert adds and all(
        v.get("lang") in {"p0", "p1", "p2"} for v in adds.values()
    )
    st = snapshot_state_from_metadata(md, ptable)
    assert st["dvs"]  # deletes landed as DVs, not parquet delete files


def test_upsert_partitioned(spark, ptable):
    """Change rows span partitions; updated keys tombstone in place and
    new files land hive-laid inside their partition dir."""
    changes = spark.createDataFrame(
        [(5, "p2", 5000), (200, "p0", 600)],
        "doc_id long, lang string, n_chars long",
    )
    iceberg_v3_upsert(spark, changes, ptable, ["doc_id"])
    want = _expect(spark, pred="doc_id != 5") | {
        (5, "p2", 5000),
        (200, "p0", 600),
    }
    assert _rows(spark, ptable) == want
    # the staged adds are hive-laid under data/lang=.../
    md = _current_metadata(ptable)
    st = snapshot_state_from_metadata(md, ptable)
    new = [p for p, s in st["data"].items() if s == max(st["data"].values())]
    assert new and all(f"{os.sep}lang=" in p for p in new)


def test_upsert_key_on_partition_column(spark, ptable):
    """Position-addressed DVs don't need physical key columns, so keys
    MAY include the partition column (equality deletes cannot)."""
    changes = spark.createDataFrame(
        [(0, "p0", 111)], "doc_id long, lang string, n_chars long"
    )
    iceberg_v3_upsert(spark, changes, ptable, ["doc_id", "lang"])
    assert _rows(spark, ptable) == _expect(spark, pred="doc_id != 0") | {
        (0, "p0", 111)
    }


def test_upsert_schema_drift_refuses(spark, ptable):
    """A change frame with renamed/missing columns would commit
    schema-drifted files that later scans surface as silent NULLs."""
    bad = spark.createDataFrame(
        [(1, "p1")], "doc_id long, lang string"  # n_chars missing
    )
    with pytest.raises(ValueError, match="missing"):
        iceberg_v3_upsert(spark, bad, ptable, ["doc_id"])
    bad2 = spark.createDataFrame(
        [(1, "p1", 3, 9)],
        "doc_id long, lang string, n_chars long, extra long",
    )
    with pytest.raises(ValueError, match="unexpected"):
        iceberg_v3_upsert(spark, bad2, ptable, ["doc_id"])


def test_append_partitioned(spark, ptable):
    iceberg_v3_delete_rows(spark, ptable, "doc_id < 10")
    new = spark.createDataFrame(
        [(500, 1500), (501, 1503)], "doc_id long, n_chars long"
    )
    stage = os.path.join(ptable, "data", "lang=p9")
    new.coalesce(1).write.mode("append").parquet(stage)
    files = [
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    ]
    iceberg_v3_append(ptable, files)
    want = (
        _expect(spark, pred="doc_id >= 10")
        | {(500, "p9", 1500), (501, "p9", 1503)}
    )
    assert _rows(spark, ptable) == want
    # appending outside the hive layout refuses loudly
    loose = os.path.join(ptable, "loose.parquet")
    import shutil

    shutil.copy(files[0], loose)
    with pytest.raises(ValueError, match="hive path segment"):
        iceberg_v3_append(ptable, [loose])


def test_rewrite_stays_inside_partition_dirs(spark, ptable):
    iceberg_v3_delete_rows(spark, ptable, "doc_id % 2 = 0")
    st = snapshot_state_from_metadata(_current_metadata(ptable), ptable)
    doomed_dirs = {os.path.dirname(r) for r in st["dvs"]}
    iceberg_v3_rewrite_deletes(spark, ptable)
    md = _current_metadata(ptable)
    st2 = snapshot_state_from_metadata(md, ptable)
    assert not st2["dvs"]
    assert _rows(spark, ptable) == _expect(spark, pred="doc_id % 2 = 1")
    # rewritten files landed back inside the partition dirs they replace
    new_files = [
        p for p, s in st2["data"].items() if s == max(st2["data"].values())
    ]
    assert new_files and {os.path.dirname(p) for p in new_files} <= doomed_dirs
    # top-K paths reopen (files refuses while DVs are live)
    lake = IcebergSnapshotLake(spark, ptable, ptable + "_ix2")
    assert len(lake.files) == len(st2["data"])


def test_lineage_existing_entries_keep_adding_snapshot(spark, ptable):
    """Status-0 (EXISTING) manifest entries keep the snapshot id that
    originally added the file; only status-1 adds stamp the new one."""
    from rottnest_spark.sources.avro_lite import read_ocf
    from rottnest_spark.sources.iceberg import _rebase

    md0 = _current_metadata(ptable)
    first_snap = md0["current-snapshot-id"]
    snap2 = iceberg_v3_delete_rows(spark, ptable, "doc_id < 5")
    md = _current_metadata(ptable)
    loc = md.get("location", "")
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    ml = _rebase(by_id[snap2]["manifest-list"], loc, ptable)
    _, mls = read_ocf(ml)
    statuses = {}
    for mle in mls:
        _, entries = read_ocf(_rebase(mle["manifest_path"], loc, ptable))
        for e in entries:
            statuses.setdefault(int(e["status"]), set()).add(
                int(e["snapshot_id"])
            )
    # existing data files point at the snapshot that added them...
    assert statuses.get(0) == {first_snap}
    # ...and this commit's DV adds point at the new snapshot
    assert statuses.get(1) == {snap2}


def test_full_lifecycle_read_after_every_step(spark, tmp_path):
    """delete → upsert → append → rewrite on one partitioned table,
    read-verified at each step — the round-8 unpartitioned cycle's twin."""
    t = str(tmp_path / "cycle")
    iceberg_write(_data(spark, 60), t, partition_by=["lang"])
    iceberg_v3_delete_rows(spark, t, "doc_id < 6")
    want = _expect(spark, 60, "doc_id >= 6")
    assert _rows(spark, t) == want

    changes = spark.createDataFrame(
        [(7, "p1", 7777), (100, "p2", 300)],
        "doc_id long, lang string, n_chars long",
    )
    iceberg_v3_upsert(spark, changes, t, ["doc_id"])
    want = {r for r in want if r[0] != 7} | {(7, "p1", 7777), (100, "p2", 300)}
    assert _rows(spark, t) == want

    extra = spark.createDataFrame([(400, 77)], "doc_id long, n_chars long")
    stage = os.path.join(t, "data", "lang=p0")
    extra.coalesce(1).write.mode("append").parquet(stage)
    files = sorted(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet") and "part-" in f
    )
    # the append stage dir also holds the ORIGINAL table files; append
    # only the newest (spark names are content-addressed per write)
    st = snapshot_state_from_metadata(_current_metadata(t), t)
    fresh = [f for f in files if f not in st["data"]]
    iceberg_v3_append(t, fresh)
    want |= {(400, "p0", 77)}
    assert _rows(spark, t) == want

    iceberg_v3_rewrite_deletes(spark, t)
    assert _rows(spark, t) == want
    st = snapshot_state_from_metadata(_current_metadata(t), t)
    assert not st["dvs"]


def _evolve_spec(t, fields):
    import json

    meta = os.path.join(t, "metadata")
    metas = sorted(f for f in os.listdir(meta) if f.endswith(".metadata.json"))
    md = json.loads(open(os.path.join(meta, metas[-1])).read())
    md["partition-spec"] = fields
    md["partition-specs"] = [{"spec-id": 0, "fields": fields}]
    md["default-spec-id"] = 0
    v = len(metas) + 10
    with open(os.path.join(meta, f"v{v}.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write(str(v))


def test_hand_evolved_transform_spec_on_unlaid_files(spark, tmp_path):
    """bucket[16] is EVALUABLE since round 10, so a hand-evolved bucket
    spec no longer refuses on sight — but this table's existing files
    were never bucket-laid, so no honest r102 value exists for them.
    DML must raise (hive-path derivation) rather than commit silent
    NULL partition values, which external readers would prune out of
    partition-filtered scans (wrong results). READS stay unaffected
    (the bucket's source column is physical in the data files)."""
    from rottnest_spark.sources.iceberg_write import (
        iceberg_commit,
        iceberg_write,
    )

    t = str(tmp_path / "bkt")
    iceberg_write(_data(spark, 30), t)
    _evolve_spec(
        t,
        [
            {
                "name": "doc_id_bucket",
                "transform": "bucket[16]",
                "source-id": 1,
                "field-id": 1000,
            }
        ],
    )

    assert _rows(spark, t) == _expect(spark, 30)  # reads unaffected
    with pytest.raises(ValueError, match="hive path segment"):
        iceberg_v3_delete_rows(spark, t, "doc_id < 5")
    import shutil

    st = snapshot_state_from_metadata(_current_metadata(t), t)
    extra = os.path.join(t, "extra.parquet")
    shutil.copy(sorted(st["data"])[0], extra)
    with pytest.raises(ValueError, match="hive path segment"):
        iceberg_commit(t, add=[extra])


def test_void_transform_still_refuses_writes_not_reads(spark, tmp_path):
    """`void` stays outside the evaluable transform set: every write
    path refuses loudly instead of dropping the declared field from the
    manifests; reads are unaffected."""
    from rottnest_spark.sources.iceberg_write import (
        iceberg_commit,
        iceberg_write,
    )

    t = str(tmp_path / "vd")
    iceberg_write(_data(spark, 30), t)
    _evolve_spec(
        t,
        [
            {
                "name": "doc_id_null",
                "transform": "void",
                "source-id": 1,
                "field-id": 1000,
            }
        ],
    )
    assert _rows(spark, t) == _expect(spark, 30)  # reads unaffected
    with pytest.raises(ValueError, match="unsupported partition transform"):
        iceberg_v3_delete_rows(spark, t, "doc_id < 5")
    st = snapshot_state_from_metadata(_current_metadata(t), t)
    import shutil

    extra = os.path.join(t, "extra.parquet")
    shutil.copy(sorted(st["data"])[0], extra)
    with pytest.raises(ValueError, match="unsupported partition transform"):
        iceberg_commit(t, add=[extra])
