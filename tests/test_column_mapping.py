"""Delta column mapping, NAME mode (PROTOCOL.md §column-mapping): data
files carry PHYSICAL column names (col-<uuid> style) while the log's
schemaString maps them to logical names via field metadata. Round 7 adds
read + search support — everything above the scan layer speaks logical
names; the scan layer translates (DeltaSnapshotLake._physical_column /
_to_logical). ID mode and DML on mapped tables stay loud refusals.
"""

import json
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.indices.exact import ExactIndex
from rottnest_spark.indices.substring import SubstringIndex
from rottnest_spark.sources.changes import delta_snapshot_diff
from rottnest_spark.sources.delta import (
    DeltaSnapshotLake,
    delta_column_mapping,
)
from rottnest_spark.sources.delta_write import delta_convert

PHYS_K = "col-3f9a"
PHYS_TXT = "col-b7c2"


def _mapped_schema_string() -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": PHYS_K,
                    },
                },
                {
                    "name": "txt",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": PHYS_TXT,
                    },
                },
            ],
        }
    )


def _data(spark):
    return spark.range(200).selectExpr(
        "id AS k", "concat('word', cast(id % 7 AS string), ' tail') AS txt"
    )


@pytest.fixture()
def twins(spark, tmp_path):
    """(plain table, column-mapped table) with identical logical rows."""
    plain = str(tmp_path / "plain")
    _data(spark).repartition(3).write.parquet(plain)
    delta_convert(plain)

    mapped = str(tmp_path / "mapped")
    (
        _data(spark)
        .select(F.col("k").alias(PHYS_K), F.col("txt").alias(PHYS_TXT))
        .repartition(3)
        .write.parquet(mapped)
    )
    delta_convert(mapped)
    # commit 1: upgrade the metaData to NAME-mode column mapping
    with open(
        os.path.join(mapped, "_delta_log", f"{1:020d}.json"), "w"
    ) as fh:
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "cm-test",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _mapped_schema_string(),
                        "partitionColumns": [],
                        "configuration": {
                            "delta.columnMapping.mode": "name",
                            "delta.columnMapping.maxColumnId": "2",
                        },
                    }
                }
            )
            + "\n"
        )
    return plain, mapped


def test_mapping_extraction(twins):
    plain, mapped = twins
    assert delta_column_mapping(plain) == {}
    assert delta_column_mapping(mapped) == {"k": PHYS_K, "txt": PHYS_TXT}


def test_mapped_read_equals_plain_twin(spark, twins):
    plain, mapped = twins
    pl = DeltaSnapshotLake(spark, plain, plain + "_i")
    ml = DeltaSnapshotLake(spark, mapped, mapped + "_i")
    assert ml.read().columns == ["k", "txt"]  # logical names, logical order
    assert sorted(map(tuple, ml.read().collect())) == sorted(
        map(tuple, pl.read().collect())
    )


def test_mapped_search_equals_plain_twin(spark, twins):
    plain, mapped = twins
    results = {}
    for name, path in (("plain", plain), ("mapped", mapped)):
        lake = DeltaSnapshotLake(
            spark, path, path + "_idx", brute_force_threshold=1
        )
        sidx = SubstringIndex()
        lake.build_index(sidx, "txt")
        results[name] = sorted(
            map(tuple, lake.search(sidx, "txt", "word3").collect())
        )
        eidx = ExactIndex()
        lake.build_index(eidx, "k")
        results[name + "_exact"] = sorted(
            map(tuple, lake.search(eidx, "k", 42).collect())
        )
    assert results["mapped"] == results["plain"]
    assert len(results["plain"]) == len([i for i in range(200) if i % 7 == 3])
    assert results["mapped_exact"] == results["plain_exact"]
    assert [r[0] for r in results["plain_exact"]] == [42]
    # and the search results carry LOGICAL column names
    assert all(len(r) == 2 for r in results["mapped"])


def test_mapped_diff_uses_logical_names(spark, twins):
    _, mapped = twins
    diff = delta_snapshot_diff(spark, mapped, -1, 1)
    assert set(diff.columns) == {"k", "txt", "_change_type"}
    rows = diff.collect()
    assert len(rows) == 200 and all(r._change_type == "insert" for r in rows)


def test_mapped_dml_refused(spark, twins):
    _, mapped = twins
    from rottnest_spark.sources.delta_write import (
        delta_delete_rows,
        delta_upsert,
        delta_write,
    )

    with pytest.raises(ValueError, match="column-mapped"):
        delta_delete_rows(spark, mapped, "k = 1")
    with pytest.raises(ValueError, match="column-mapped"):
        delta_upsert(spark, _data(spark).limit(1), mapped, ["k"])
    with pytest.raises(ValueError, match="column-mapped"):
        delta_write(_data(spark).limit(1), mapped, mode="append")


def test_mapped_table_with_deletion_vectors(spark, twins):
    """The Databricks default table shape: NAME-mode column mapping AND
    deletion vectors together. The DV anti-join runs on the physical
    scan (positions + _metadata), the rename to logical names happens
    after — a foreign engine's DV commit is hand-built to the protocol
    since our own DML refuses mapped tables."""
    import json as _json

    from rottnest_spark.sources.delta import delta_live_files
    from rottnest_spark.sources.roaring import roaring64_encode, z85_encode

    _, mapped = twins
    # hand-attach an inline DV to one data file: delete positions 0..4
    files = delta_live_files(mapped)
    victim = sorted(files)[0]
    n_victim = spark.read.parquet(victim).count()
    bm = roaring64_encode(list(range(5)))
    padded = bm + b"\x00" * (-len(bm) % 4)
    rel = os.path.relpath(victim, mapped)
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors", "columnMapping"],
                "writerFeatures": ["deletionVectors", "columnMapping"],
            }
        },
        {
            "remove": {
                "path": rel,
                "deletionTimestamp": 1,
                "dataChange": True,
            }
        },
        {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": os.path.getsize(victim),
                "modificationTime": 1,
                "dataChange": True,
                "deletionVector": {
                    "storageType": "i",
                    "pathOrInlineDv": z85_encode(padded),
                    "sizeInBytes": len(bm),
                    "cardinality": 5,
                },
            }
        },
    ]
    with open(
        os.path.join(mapped, "_delta_log", f"{2:020d}.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(_json.dumps(a) + "\n")

    lake = DeltaSnapshotLake(spark, mapped, mapped + "_dv")
    df = lake.read()
    assert df.columns == ["k", "txt"]  # logical names survive the DV join
    assert df.count() == 200 - 5
    dropped = {
        r.k
        for r in spark.read.parquet(victim)
        .limit(5)
        .select(F.col(PHYS_K).alias("k"))
        .collect()
    }
    assert dropped & {r.k for r in df.collect()} == set()
