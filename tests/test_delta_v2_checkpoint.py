"""Delta V2 SPEC CHECKPOINTS (PROTOCOL.md 'V2 Spec Checkpoints',
reader feature `v2Checkpoint` — round 9): newer Delta writers replace
classic `V.checkpoint.parquet` files with a UUID-named top-level file
(`V.checkpoint.<uuid>.json|parquet`) that carries
checkpointMetadata/protocol/metaData and either inline add/remove
actions or `sidecar` actions naming parquet files under
`_delta_log/_sidecars/` that hold them.

Contracts pinned here:
- a json top-level + sidecar layout replays to the same live set as the
  commits it replaced (post-checkpoint commits still apply on top);
- a parquet top-level with INLINE adds replays without sidecars;
- _last_checkpoint pointing at a version with only a UUID-named file
  resolves it (the pointer names the version, not the file);
- a missing sidecar and a top-level without checkpointMetadata both
  refuse loudly — never a silently smaller live set;
- the protocol guard ACCEPTS readerFeatures=["v2Checkpoint"] and still
  refuses unknown features alongside it;
- indexed search over a v2-checkpointed lake sees exactly the live set.
"""

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.delta import (
    DeltaSnapshotLake,
    _is_v2_checkpoint,
    delta_live_files,
)

CKPT_UUID = "80a083e8-7026-4e79-81be-64bd76c43a11"


def _commit(log_dir: str, version: int, adds=(), removes=()):
    lines = [
        json.dumps({"add": {"path": p, "dataChange": True}}) for p in adds
    ] + [
        json.dumps({"remove": {"path": p, "dataChange": True}})
        for p in removes
    ]
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


@pytest.fixture()
def delta_table(spark, sf_dir, tmp_path):
    """Same 3-part documents fixture as test_delta: v0 adds parts 0,1;
    v1 adds part 2 and removes part 0 → live = {1, 2}."""
    table = tmp_path / "dtable"
    log = table / "_delta_log"
    log.mkdir(parents=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = {}
    for i, cond in enumerate(
        ["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]
    ):
        name = f"part-{i:05d}.parquet"
        docs.filter(cond).coalesce(1).write.parquet(str(table / f"_tmp{i}"))
        import glob as g
        import shutil

        src = g.glob(str(table / f"_tmp{i}" / "*.parquet"))[0]
        shutil.move(src, str(table / name))
        shutil.rmtree(str(table / f"_tmp{i}"))
        parts[i] = name
    _commit(str(log), 0, adds=[parts[0], parts[1]])
    _commit(str(log), 1, adds=[parts[2]], removes=[parts[0]])
    return str(table), parts


def _proto_meta_lines():
    return [
        json.dumps(
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["v2Checkpoint"],
                    "writerFeatures": ["v2Checkpoint"],
                }
            }
        ),
        json.dumps(
            {
                "metaData": {
                    "id": "m-1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": "{}",
                    "partitionColumns": [],
                    "configuration": {},
                }
            }
        ),
    ]


def _write_v2_json_checkpoint(
    log: str, version: int, sidecar_adds, with_ckpt_meta=True
):
    """Top-level json + one sidecar parquet holding the add actions."""
    sc_dir = os.path.join(log, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    sc_name = f"{uuid.uuid4().hex}.parquet"
    pq.write_table(
        pa.table({"add": [{"path": p, "dataChange": True} for p in sidecar_adds]}),
        os.path.join(sc_dir, sc_name),
    )
    lines = []
    if with_ckpt_meta:
        lines.append(json.dumps({"checkpointMetadata": {"version": version}}))
    lines += _proto_meta_lines()
    lines.append(json.dumps({"sidecar": {"path": sc_name, "sizeInBytes": 1}}))
    top = os.path.join(log, f"{version:020d}.checkpoint.{CKPT_UUID}.json")
    with open(top, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": version}, fh)
    return top, sc_name


def test_is_v2_checkpoint_name_shapes():
    assert _is_v2_checkpoint(f"00000000000000000001.checkpoint.{CKPT_UUID}.json")
    assert _is_v2_checkpoint(
        f"00000000000000000001.checkpoint.{CKPT_UUID}.parquet"
    )
    assert not _is_v2_checkpoint("00000000000000000001.checkpoint.parquet")
    assert not _is_v2_checkpoint(
        "00000000000000000001.checkpoint.0000000001.0000000002.parquet"
    )


def test_v2_json_checkpoint_with_sidecar(spark, delta_table):
    table, parts = delta_table
    log = os.path.join(table, "_delta_log")
    _write_v2_json_checkpoint(log, 1, [parts[1], parts[2]])
    # simulate log cleanup: pre-checkpoint JSON commits deleted
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    _commit(log, 2, adds=[parts[0]])
    names = {os.path.basename(f) for f in delta_live_files(table)}
    assert names == {parts[0], parts[1], parts[2]}


def test_v2_parquet_checkpoint_inline_adds(spark, delta_table):
    table, parts = delta_table
    log = os.path.join(table, "_delta_log")
    tbl = pa.table(
        {
            "checkpointMetadata": [{"version": 1}, None, None],
            "add": [
                None,
                {"path": parts[1], "dataChange": True},
                {"path": parts[2], "dataChange": True},
            ],
        }
    )
    pq.write_table(
        tbl, os.path.join(log, f"{1:020d}.checkpoint.{CKPT_UUID}.parquet")
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1}, fh)
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    names = {os.path.basename(f) for f in delta_live_files(table)}
    assert names == {parts[1], parts[2]}


def test_missing_sidecar_fails_loudly(spark, delta_table):
    table, parts = delta_table
    log = os.path.join(table, "_delta_log")
    _top, sc_name = _write_v2_json_checkpoint(log, 1, [parts[1], parts[2]])
    os.remove(os.path.join(log, "_sidecars", sc_name))
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    with pytest.raises(ValueError, match="sidecar"):
        delta_live_files(table)


def test_missing_checkpoint_metadata_refuses(spark, delta_table):
    table, parts = delta_table
    log = os.path.join(table, "_delta_log")
    _write_v2_json_checkpoint(
        log, 1, [parts[1], parts[2]], with_ckpt_meta=False
    )
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    with pytest.raises(ValueError, match="checkpointMetadata"):
        delta_live_files(table)


def test_unknown_feature_next_to_v2checkpoint_still_refuses(
    spark, delta_table
):
    table, parts = delta_table
    log = os.path.join(table, "_delta_log")
    _write_v2_json_checkpoint(log, 1, [parts[1], parts[2]])
    # a later commit raises the feature set beyond what we read
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["v2Checkpoint", "collations"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="collations"):
        delta_live_files(table)


def test_search_over_v2_checkpointed_lake(spark, delta_table, tmp_path):
    from rottnest_spark.indices.substring import SubstringIndex

    table, parts = delta_table
    log = os.path.join(table, "_delta_log")
    _write_v2_json_checkpoint(log, 1, [parts[1], parts[2]])
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))

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
    assert all(d % 3 != 0 for d in got)  # the removed part never leaks
