"""Delta-log snapshot backend: live-file replay, snapshot-consistent
search (removed-but-present files excluded), incremental build on commit."""

import json
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.indices.substring import SubstringIndex
from rottnest_spark.sources.delta import DeltaSnapshotLake, delta_live_files


def _commit(log_dir: str, version: int, adds=(), removes=()):
    lines = [
        json.dumps({"add": {"path": p, "dataChange": True}}) for p in adds
    ] + [json.dumps({"remove": {"path": p, "dataChange": True}}) for p in removes]
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


@pytest.fixture()
def delta_table(spark, sf_dir, tmp_path):
    table = tmp_path / "dtable"
    log = table / "_delta_log"
    log.mkdir(parents=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = {}
    for i, cond in enumerate(["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]):
        name = f"part-{i:05d}.parquet"
        docs.filter(cond).coalesce(1).write.parquet(str(table / f"_tmp{i}"))
        import glob as g
        import shutil

        src = g.glob(str(table / f"_tmp{i}" / "*.parquet"))[0]
        shutil.move(src, str(table / name))
        shutil.rmtree(str(table / f"_tmp{i}"))
        parts[i] = name
    # v0 adds parts 0,1 ; v1 adds part 2 and REMOVES part 0 (file stays!)
    _commit(str(log), 0, adds=[parts[0], parts[1]])
    _commit(str(log), 1, adds=[parts[2]], removes=[parts[0]])
    return str(table), parts


def test_live_files_replay(spark, delta_table):
    table, parts = delta_table
    live = delta_live_files(table)
    names = {os.path.basename(f) for f in live}
    assert names == {parts[1], parts[2]}
    assert os.path.exists(os.path.join(table, parts[0]))  # removed ≠ deleted


def test_snapshot_consistent_search(spark, delta_table, tmp_path):
    table, parts = delta_table
    lake = DeltaSnapshotLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    q = "merge sort"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    live = [os.path.join(table, parts[1]), os.path.join(table, parts[2])]
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(*live)
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .collect()
    )
    assert got == want and len(got) > 0
    # the removed file's rows (doc_id % 3 == 0) never leak into results
    assert all(d % 3 != 0 for d in got)


def test_multipart_checkpoint_with_last_checkpoint(spark, delta_table):
    """Multi-part checkpoint located via _last_checkpoint replaces the
    cleaned-up pre-checkpoint commits; replay must not miss its adds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table, parts = delta_table
    log = os.path.join(table, "_delta_log")
    # checkpoint at v1: live set {parts[1], parts[2]} split across 2 parts
    for i, p in enumerate([parts[1], parts[2]]):
        tbl = pa.table({"add": [{"path": p}]})
        pq.write_table(
            tbl,
            os.path.join(
                log, f"{1:020d}.checkpoint.{i + 1:010d}.{2:010d}.parquet"
            ),
        )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "parts": 2}, fh)
    # simulate log cleanup: pre-checkpoint JSON commits deleted
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    _commit(log, 2, adds=[parts[0]])
    names = {os.path.basename(f) for f in delta_live_files(table)}
    assert names == {parts[0], parts[1], parts[2]}


def test_missing_part_fails_loudly(spark, delta_table):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table, parts = delta_table
    log = os.path.join(table, "_delta_log")
    pq.write_table(
        pa.table({"add": [{"path": parts[1]}]}),
        os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "parts": 2}, fh)
    with pytest.raises(ValueError, match="missing"):
        delta_live_files(table)


def test_truncated_log_without_checkpoint_fails_loudly(spark, delta_table):
    table, _ = delta_table
    log = os.path.join(table, "_delta_log")
    os.remove(os.path.join(log, f"{0:020d}.json"))
    with pytest.raises(ValueError, match="commit 0"):
        delta_live_files(table)


def test_incremental_build_on_new_commit(spark, delta_table, tmp_path):
    table, parts = delta_table
    lake = DeltaSnapshotLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    assert lake.build_index(idx, "text")
    # new commit re-adds part 0 as a "new" file
    _commit(os.path.join(table, "_delta_log"), 2, adds=[parts[0]])
    created = lake.build_index(idx, "text")
    assert len(created) == 1  # only the delta was indexed
    q = "merge sort"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            *[os.path.join(table, p) for p in parts.values()]
        )
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .collect()
    )
    assert got == want


def test_version_as_of_time_travel(spark, delta_table, tmp_path):
    """versionAsOf pins the replay: v0 sees parts 0+1; searches over the
    pinned lake return that snapshot's rows exactly."""
    table, parts = delta_table
    v0 = {os.path.basename(f) for f in delta_live_files(table, 0)}
    assert v0 == {parts[0], parts[1]}

    lake0 = DeltaSnapshotLake(
        spark, table, str(tmp_path / "idx0"), version_as_of=0
    )
    idx = SubstringIndex()
    lake0.build_index(idx, "text")
    q = "merge sort"
    got = sorted(r["doc_id"] for r in lake0.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            *[os.path.join(table, parts[i]) for i in (0, 1)]
        )
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .collect()
    )
    assert got == want and any(d % 3 == 0 for d in got)

    with pytest.raises(ValueError, match="exceeds the log"):
        delta_live_files(table, 9)
