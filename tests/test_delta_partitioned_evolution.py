"""Delta schema evolution on PARTITIONED tables (round 11 — removes
the blanket partitioned+mapped refusal).

The alignment invariant: partitionValues keys and hive dir segments
are PHYSICAL names (PROTOCOL.md); the columnMapping upgrade pins
physicalName == current name at every depth, and the rename/drop
writers refuse partition columns — so on any table this engine
evolves, the logical and physical vocabulary agree on partition
columns forever, and the one-scan hive read path just swaps the scan
schema to physical names (sources/delta.py read / _base_read). A
foreign table that renamed a partition column refuses loudly
(check_partition_mapping_aligned).
"""

import json

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.delta import (
    DeltaSnapshotLake,
    check_partition_mapping_aligned,
    delta_table_meta,
)
from rottnest_spark.sources.delta_write import (
    delta_add_column,
    delta_drop_column,
    delta_rename_column,
    delta_upsert,
    delta_write,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def ptable(spark, tmp_path):
    work = str(tmp_path / "t")
    src = spark.range(40).selectExpr(
        "id AS k",
        "CAST(id % 4 AS bigint) AS bucket",
        "CAST(id * 10 AS bigint) AS v",
    )
    delta_write(src, work, partition_by=["bucket"])
    return work, src


def test_rename_nonpartition_column_on_partitioned(spark, ptable, tmp_path):
    work, src = ptable
    delta_rename_column(work, "v", "value")  # auto-enables mapping
    meta = delta_table_meta(work)
    assert meta["partitionColumns"] == ["bucket"]
    got = DeltaSnapshotLake(spark, work, str(tmp_path / "ix")).read()
    assert set(got.columns) == {"k", "bucket", "value"}
    a = sorted((r.k, r.bucket, r.value) for r in got.collect())
    b = sorted((r.k, r.bucket, r.v) for r in src.collect())
    assert a == b
    # partition pruning still works through the logical view
    assert (
        got.filter(F.col("bucket") == 2).count()
        == src.filter("bucket = 2").count()
    )


def test_dml_on_renamed_partitioned(spark, ptable, tmp_path):
    work, src = ptable
    delta_rename_column(work, "v", "value")
    ch = spark.range(0, 40, 8).selectExpr(
        "id AS k", "CAST(id % 4 AS bigint) AS bucket",
        "CAST(0 AS bigint) AS value",
    )
    delta_upsert(spark, ch, work, ["k"])
    got = DeltaSnapshotLake(spark, work, str(tmp_path / "ix")).read()
    rows = {r.k: r.value for r in got.collect()}
    assert len(rows) == 40
    for k in range(40):
        assert rows[k] == (0 if k % 8 == 0 else k * 10)


def test_add_drop_on_partitioned(spark, ptable, tmp_path):
    work, src = ptable
    delta_add_column(work, "tag", "string")
    extra = spark.range(40, 48).selectExpr(
        "id AS k", "CAST(id % 4 AS bigint) AS bucket",
        "CAST(id * 10 AS bigint) AS v", "'new' AS tag",
    )
    delta_write(extra, work, mode="append", partition_by=["bucket"])
    got = DeltaSnapshotLake(spark, work, str(tmp_path / "ix")).read()
    rows = {r.k: r.tag for r in got.collect()}
    assert all(rows[k] is None for k in range(40))
    assert all(rows[k] == "new" for k in range(40, 48))
    # drop a non-partition column on the partitioned table
    delta_drop_column(work, "v")
    got2 = DeltaSnapshotLake(spark, work, str(tmp_path / "ix2")).read()
    assert set(got2.columns) == {"k", "bucket", "tag"}
    assert got2.count() == 48
    # partition columns still refuse rename/drop
    with pytest.raises(ValueError, match="partition column"):
        delta_rename_column(work, "bucket", "b2")
    with pytest.raises(ValueError, match="partition column"):
        delta_drop_column(work, "bucket")


def test_foreign_misaligned_partition_mapping_refuses():
    meta = {
        "partitionColumns": ["p"],
        "configuration": {"delta.columnMapping.mode": "name"},
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "p",
                        "type": "long",
                        "nullable": True,
                        "metadata": {
                            "delta.columnMapping.id": 1,
                            "delta.columnMapping.physicalName": "col-x",
                        },
                    }
                ],
            }
        ),
    }
    with pytest.raises(ValueError, match="physicalName"):
        check_partition_mapping_aligned(meta, "test")
