"""Iceberg TIME TRAVEL (round 9): `IcebergSnapshotLake(snapshot_id=)` /
`(as_of_ms=)` pin a historical snapshot — the Iceberg twin of
DeltaSnapshotLake's `version_as_of`. The pin is applied at the metadata
seam (current-snapshot-id rewrite), so EVERY consumer follows it:
read() with merge-on-read state, identity-partition reconstruction,
search scope, schema resolution (the snapshot's recorded schema-id).

Contracts pinned:
- a pinned read reproduces exactly that snapshot's rows, before AND
  after later DML (v3 deletion-vector deletes included);
- as_of_ms resolves to the LATEST snapshot at-or-before the timestamp;
- searches over a pinned lake cover exactly the pinned file set;
- expired/unknown snapshot ids and pre-history timestamps refuse;
- partitioned tables reconstruct partition columns for the PINNED
  file set.
"""

import pytest
from pyspark.sql import functions as F

from rottnest_spark.sources.iceberg import IcebergSnapshotLake
from rottnest_spark.sources.iceberg_write import (
    iceberg_commit,
    iceberg_v3_delete_rows,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")

T0, T1, T2 = 1_700_000_000_000, 1_700_000_100_000, 1_700_000_200_000


def _data(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id",
        "concat('p', cast(id % 3 AS string)) AS lang",
        "id * 3 AS n_chars",
    )


@pytest.fixture()
def ttable(spark, tmp_path):
    """snap1 @T0: rows 0..49; snap2 @T1: +rows 50..79; snap3 @T2: DV
    delete of doc_id < 10."""
    import os

    out = str(tmp_path / "tt")
    iceberg_write(_data(spark, 0, 50), out, partition_by=["lang"])
    # restamp snap1's timestamp deterministically
    import json

    meta = os.path.join(out, "metadata")
    mfs = sorted(f for f in os.listdir(meta) if f.endswith(".metadata.json"))
    md = json.loads(open(os.path.join(meta, mfs[-1])).read())
    md["snapshots"][-1]["timestamp-ms"] = T0
    with open(os.path.join(meta, mfs[-1]), "w") as fh:
        json.dump(md, fh)

    stage = os.path.join(out, "data_more")
    _data(spark, 50, 80).coalesce(1).write.parquet(stage)
    files = [
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    ]
    # partitioned table: the append must be hive-laid; route through a
    # partitioned write into data/ instead
    import shutil

    shutil.rmtree(stage)
    stage2 = os.path.join(out, "_more")
    _data(spark, 50, 80).write.partitionBy("lang").parquet(stage2)
    adds = []
    for root, _dirs, fnames in os.walk(stage2):
        for fn in fnames:
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                rel = os.path.relpath(os.path.join(root, fn), stage2)
                dst = os.path.join(out, "data", rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(os.path.join(root, fn), dst)
                adds.append(dst)
    shutil.rmtree(stage2)
    snap2 = iceberg_commit(out, add=adds, timestamp_ms=T1)
    snap3 = iceberg_v3_delete_rows(
        spark, out, "doc_id < 10", timestamp_ms=T2
    )
    import json as _json

    md = _json.loads(
        open(
            os.path.join(
                meta,
                sorted(
                    f
                    for f in os.listdir(meta)
                    if f.endswith(".metadata.json")
                )[-1],
            )
        ).read()
    )
    snap_ids = [s["snapshot-id"] for s in md["snapshots"]]
    assert snap_ids[-1] == snap3 and snap2 in snap_ids
    return out, snap_ids


def _rows(lake):
    return {
        (r.doc_id, r.lang)
        for r in lake.read().select("doc_id", "lang").collect()
    }


def _want(lo, hi, pred=lambda i: True):
    return {(i, f"p{i % 3}") for i in range(lo, hi) if pred(i)}


def test_pin_by_snapshot_id(spark, ttable, tmp_path):
    out, snaps = ttable
    ix = str(tmp_path / "ix")
    assert _rows(IcebergSnapshotLake(spark, out, ix)) == _want(
        10, 80
    )  # current: post-delete
    assert _rows(
        IcebergSnapshotLake(spark, out, ix, snapshot_id=snaps[0])
    ) == _want(0, 50)
    assert _rows(
        IcebergSnapshotLake(spark, out, ix, snapshot_id=snaps[1])
    ) == _want(0, 80)
    # pin on the delete snapshot itself applies its DVs
    assert _rows(
        IcebergSnapshotLake(spark, out, ix, snapshot_id=snaps[2])
    ) == _want(10, 80)


def test_pin_by_timestamp(spark, ttable, tmp_path):
    out, _snaps = ttable
    ix = str(tmp_path / "ix")
    assert _rows(
        IcebergSnapshotLake(spark, out, ix, as_of_ms=T0)
    ) == _want(0, 50)
    assert _rows(
        IcebergSnapshotLake(spark, out, ix, as_of_ms=T1 + 50)
    ) == _want(0, 80)
    assert _rows(
        IcebergSnapshotLake(spark, out, ix, as_of_ms=T2 + 10**9)
    ) == _want(10, 80)


def test_pinned_search_covers_pinned_files(spark, ttable, tmp_path):
    from rottnest_spark.indices.exact import ExactIndex

    out, snaps = ttable
    lake1 = IcebergSnapshotLake(
        spark, out, str(tmp_path / "ix"), snapshot_id=snaps[1]
    )
    idx = ExactIndex()
    lake1.build_index(idx, "doc_id")
    got = sorted(
        r.doc_id for r in lake1.search(idx, "doc_id", 75).collect()
    )
    assert got == [75]  # row exists only in snap2's files
    # the same search pinned to snap1 finds nothing (row not yet added)
    lake0 = IcebergSnapshotLake(
        spark, out, str(tmp_path / "ix"), snapshot_id=snaps[0]
    )
    assert lake0.search(idx, "doc_id", 75).count() == 0


def test_refusals(spark, ttable, tmp_path):
    out, snaps = ttable
    ix = str(tmp_path / "ix")
    with pytest.raises(ValueError, match="not both"):
        IcebergSnapshotLake(
            spark, out, ix, snapshot_id=snaps[0], as_of_ms=T0
        )
    with pytest.raises(ValueError, match="snapshot log"):
        IcebergSnapshotLake(spark, out, ix, snapshot_id=999999).read()
    with pytest.raises(ValueError, match="no snapshot at or before"):
        IcebergSnapshotLake(spark, out, ix, as_of_ms=T0 - 10**6).read()


def test_pinned_partition_predicate(spark, ttable, tmp_path):
    """Partition reconstruction + pruning follow the pinned file set."""
    out, snaps = ttable
    lake = IcebergSnapshotLake(
        spark, out, str(tmp_path / "ix"), snapshot_id=snaps[0]
    )
    got = sorted(
        r.doc_id
        for r in lake.read().filter(F.col("lang") == "p1").collect()
    )
    assert got == [i for i in range(50) if i % 3 == 1]


def test_expired_snapshot_pin_raises_specific_error(spark, ttable, tmp_path):
    """Retention x time travel (round 10): after iceberg_expire_snapshots
    removes a snapshot (and deletes its exclusive files), pinning it must
    raise the SPECIFIC 'may have been expired' error from the metadata
    seam — never a generic missing-file trace from a late manifest read;
    as_of_ms before the earliest surviving snapshot likewise."""
    from rottnest_spark.sources.iceberg_write import iceberg_expire_snapshots

    out, snaps = ttable
    ix = str(tmp_path / "ix")
    deleted = iceberg_expire_snapshots(out, keep_last=1)
    assert deleted, "expiry removed nothing"
    with pytest.raises(ValueError, match="may have been expired"):
        IcebergSnapshotLake(spark, out, ix, snapshot_id=snaps[0]).read()
    with pytest.raises(ValueError, match="may have been expired"):
        IcebergSnapshotLake(spark, out, ix, snapshot_id=snaps[1]).read()
    # before-earliest as_of on the surviving log: the specific message
    with pytest.raises(ValueError, match="no snapshot at or before"):
        IcebergSnapshotLake(spark, out, ix, as_of_ms=T0).read()
    # the survivor still reads exactly
    assert _rows(
        IcebergSnapshotLake(spark, out, ix, snapshot_id=snaps[2])
    ) == _want(10, 80)


def test_pinned_vacuum_refuses(spark, ttable, tmp_path):
    """vacuum() on a pinned lake must refuse (round-10 advice fix): the
    pinned snapshot would define liveness, so index/catalog state for
    files added after the pin would be destroyed by a READER."""
    out, snaps = ttable
    lake = IcebergSnapshotLake(
        spark, out, str(tmp_path / "ix"), snapshot_id=snaps[0]
    )
    with pytest.raises(ValueError, match="time-travel-pinned"):
        lake.vacuum()
    with pytest.raises(ValueError, match="time-travel-pinned"):
        lake.vacuum(history_days=1.0)
    # unpinned vacuum on the same table still works
    IcebergSnapshotLake(spark, out, str(tmp_path / "ix")).vacuum()
