"""Delta RENAME/DROP COLUMN writer-side (round 11, VERDICT r10 ask #4):
rename = logical-name-only metaData commit over an auto-enabled
columnMapping (PROTOCOL.md — physical names in the files never change);
drop = metaData-only removal whose physical column simply stops being
projected; re-ADD of a dropped name must NOT resurrect stale file data
(the minted col-<uuid> physicalName guarantees it). DML (upsert) on a
renamed table keeps working through the logical<->physical adapters."""

import json
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.delta import (
    DeltaSnapshotLake,
    delta_column_mapping,
    delta_protocol,
    delta_table_meta,
)
from rottnest_spark.sources.delta_write import (
    delta_add_column,
    delta_convert,
    delta_drop_column,
    delta_enable_column_mapping,
    delta_rename_column,
    delta_upsert,
    delta_write,
)


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    work = str(tmp_path / "t")
    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter("o_orderkey % 3 = 0")
    )
    src.repartition(3).write.parquet(work)
    delta_convert(work)
    return work, src


def test_enable_column_mapping_upgrade(table):
    work, src = table
    v = delta_enable_column_mapping(work)
    meta = delta_table_meta(work)
    cfg = meta["configuration"]
    assert cfg["delta.columnMapping.mode"] == "name"
    assert cfg["delta.columnMapping.maxColumnId"] == "3"
    # upgrade convention: physicalName == current name for every field
    assert delta_column_mapping(work) == {
        c: c for c in ("o_orderkey", "o_orderstatus", "o_totalprice")
    }
    proto = delta_protocol(work)
    assert proto["minReaderVersion"] >= 2 and proto["minWriterVersion"] >= 5
    # idempotent: a second call commits nothing
    assert delta_enable_column_mapping(work) == v


def test_rename_read_and_dml(spark, table, tmp_path):
    work, src = table
    delta_rename_column(work, "o_totalprice", "price")
    # physicalName stayed the ORIGINAL name — old files resolve unchanged
    assert delta_column_mapping(work)["price"] == "o_totalprice"
    lake = DeltaSnapshotLake(spark, work, str(tmp_path / "idx"))
    df = lake.read()
    assert "price" in df.columns and "o_totalprice" not in df.columns
    assert (
        df.agg(F.round(F.sum("price"), 2)).first()[0]
        == src.agg(F.round(F.sum("o_totalprice"), 2)).first()[0]
    )
    # DML speaks the NEW logical vocabulary on a renamed table
    ch = (
        src.filter("o_orderkey % 9 = 0")
        .withColumnRenamed("o_totalprice", "price")
        .withColumn("price", F.col("price") * 2)
    )
    delta_upsert(spark, ch, work, ["o_orderkey"])
    got = DeltaSnapshotLake(spark, work, str(tmp_path / "idx2")).read()
    exp = src.withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % 9 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    assert (
        got.agg(F.round(F.sum("price"), 2)).first()[0]
        == exp.agg(F.round(F.sum("price"), 2)).first()[0]
    )
    assert got.count() == src.count()


def test_drop_then_readd_no_resurrection(spark, table, tmp_path):
    work, src = table
    delta_drop_column(work, "o_orderstatus")
    df = DeltaSnapshotLake(spark, work, str(tmp_path / "idx")).read()
    assert sorted(df.columns) == ["o_orderkey", "o_totalprice"]
    # re-ADD under the same logical name: a fresh col-<uuid> physicalName
    # means the stale physical column in old files stays invisible
    delta_add_column(work, "o_orderstatus", "string")
    phys = delta_column_mapping(work)["o_orderstatus"]
    assert phys.startswith("col-")
    df2 = DeltaSnapshotLake(spark, work, str(tmp_path / "idx2")).read()
    assert df2.filter(F.col("o_orderstatus").isNull()).count() == df2.count()
    # maxColumnId advanced past the minted id
    cfg = delta_table_meta(work)["configuration"]
    assert int(cfg["delta.columnMapping.maxColumnId"]) == 4


def test_add_nested_on_mapped_stamps_whole_tree(table):
    work, _ = table
    delta_enable_column_mapping(work)
    delta_add_column(work, "extra", "struct<a:int,b:string>")
    meta = delta_table_meta(work)
    schema = json.loads(meta["schemaString"])
    extra = next(f for f in schema["fields"] if f["name"] == "extra")
    ids = [extra["metadata"]["delta.columnMapping.id"]] + [
        f["metadata"]["delta.columnMapping.id"]
        for f in extra["type"]["fields"]
    ]
    assert len(set(ids)) == 3  # field + 2 nested, all distinct
    assert int(
        meta["configuration"]["delta.columnMapping.maxColumnId"]
    ) == max(ids)
    for f in extra["type"]["fields"]:
        assert f["metadata"]["delta.columnMapping.physicalName"].startswith(
            "col-"
        )


def test_refusals(spark, table, tmp_path):
    work, src = table
    # nested paths navigate (round 11) — a missing segment refuses
    with pytest.raises(ValueError, match="no column 'a'"):
        delta_rename_column(work, "a.b", "c")
    with pytest.raises(ValueError, match="does not exist"):
        delta_rename_column(work, "nope", "c")
    with pytest.raises(ValueError, match="already exists"):
        delta_rename_column(work, "o_orderkey", "o_orderstatus")
    with pytest.raises(ValueError, match="does not exist"):
        delta_drop_column(work, "nope")
    delta_drop_column(work, "o_orderstatus")
    delta_drop_column(work, "o_totalprice")
    with pytest.raises(ValueError, match="last column"):
        delta_drop_column(work, "o_orderkey")
    # partitioned tables UPGRADE now (round 11 — preserve-names keeps
    # partitionValues keys valid); partition COLUMNS still refuse
    # rename/drop (tests/test_delta_partitioned_evolution.py covers the
    # full partitioned-evolution surface)
    part = str(tmp_path / "p")
    delta_write(
        src.withColumn("bucket", F.col("o_orderkey") % 2),
        part,
        partition_by=["bucket"],
    )
    delta_enable_column_mapping(part)
    with pytest.raises(ValueError, match="partition column"):
        delta_rename_column(part, "bucket", "b2")


def test_features_protocol_merge(table):
    """A table already on table-features protocol gets columnMapping
    ADDED to both feature lists, not a downgrade to legacy versions."""
    from rottnest_spark.sources.delta_write import _mapping_protocol

    merged = _mapping_protocol(
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
    )
    assert merged["readerFeatures"] == ["columnMapping", "deletionVectors"]
    assert merged["writerFeatures"] == ["columnMapping", "deletionVectors"]
    assert merged["minReaderVersion"] == 3


def test_widen_column_reads_mixed_files(spark, table, tmp_path):
    """delta_widen_column (round 11): metaData-only type widening over a
    fresh narrow table — pre-widen files stay physical int32/float32,
    the widened schemaString up-casts them at scan (the round-9 read
    machinery), post-widen appends carry the wide type natively, the
    protocol gains the typeWidening feature, and delta.typeChanges
    bookkeeping is recorded per field."""
    from pyspark.sql.types import DoubleType, LongType

    from rottnest_spark.sources.delta import DeltaSnapshotLake
    from rottnest_spark.sources.delta_write import delta_widen_column

    work = str(tmp_path / "w")
    narrow = spark.range(20).selectExpr(
        "CAST(id AS int) AS k", "CAST(id * 1.5 AS float) AS v"
    )
    narrow.repartition(2).write.parquet(work)
    delta_convert(work)
    delta_widen_column(work, "k", "bigint")
    delta_widen_column(work, "v", "double")
    proto = delta_protocol(work)
    assert "typeWidening" in proto["readerFeatures"]
    # typeChanges bookkeeping recorded per field
    meta = delta_table_meta(work)
    kf = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "k"
    )
    assert kf["metadata"]["delta.typeChanges"][0]["fromType"] == "integer"
    wide = spark.range(20, 30).selectExpr(
        "CAST(id AS bigint) AS k", "CAST(id * 1.5 AS double) AS v"
    )
    delta_write(wide, work, mode="append")
    df = DeltaSnapshotLake(spark, work, str(tmp_path / "idx")).read()
    assert isinstance(df.schema["k"].dataType, LongType)
    assert isinstance(df.schema["v"].dataType, DoubleType)
    assert df.count() == 30
    assert df.agg(F.sum("k")).first()[0] == sum(range(30))
    # refusals: narrowing, cross-family, nested, unknown column
    with pytest.raises(ValueError, match="not a legal"):
        delta_widen_column(work, "k", "int")
    with pytest.raises(ValueError, match="not a legal"):
        delta_widen_column(work, "v", "string")
    with pytest.raises(ValueError, match="already"):
        delta_widen_column(work, "k", "bigint")
    with pytest.raises(ValueError, match="no column 'a'"):
        delta_widen_column(work, "a.b", "bigint")
