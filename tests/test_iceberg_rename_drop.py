"""Iceberg RENAME/DROP COLUMN — metadata-only schema evolution with
FIELD-ID preservation (round 11, iceberg.apache.org/spec
#schema-evolution; the rename+drop twin of test_iceberg_add_column).

Contracts pinned:
- zero data files touched (metadata version +1, same snapshot);
- renames preserve the field id — old files resolve their write-time
  name back to the current one (scan_with_schema_resolution maps BY
  FIELD ID through each file's adding-snapshot schema);
- mixed pre/post-rename file scans agree with the logical view;
- drop projects the column away without rewriting files; a later
  re-ADD of the same name takes a FRESH id and must NOT resurrect the
  stale physical data;
- time travel at a pre-evolution snapshot resolves the OLD schema
  (old name visible, dropped column still there);
- rewrites (compaction-style commits) carry each file's ADDING
  snapshot id so write-schema attribution survives;
- partition source fields, nested paths, last column refuse loudly.
"""

import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    _current_metadata,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_add_column,
    iceberg_commit,
    iceberg_drop_column,
    iceberg_rename_column,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, tmp_path, n=40):
    t = str(tmp_path / "t")
    df = spark.range(n).selectExpr(
        "id AS k", "concat('d', id) AS body", "CAST(id * 10 AS bigint) AS v"
    )
    iceberg_write(df.repartition(2), t)
    return t


def test_rename_metadata_only_and_resolution(spark, tmp_path):
    t = _mk(spark, tmp_path)
    md0 = _current_metadata(t)
    fid0 = next(
        f["id"]
        for f in md0["schemas"][-1]["fields"]
        if f["name"] == "v"
    )
    iceberg_rename_column(t, "v", "value")
    md = _current_metadata(t)
    assert md["current-snapshot-id"] == md0["current-snapshot-id"]  # no data
    cur = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    field = next(f for f in cur["fields"] if f["name"] == "value")
    assert field["id"] == fid0  # the id IS the identity — preserved
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    df = lake.read()
    assert "value" in df.columns and "v" not in df.columns
    assert df.agg(F.sum("value")).first()[0] == sum(i * 10 for i in range(40))


def test_mixed_pre_post_rename_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    iceberg_rename_column(t, "v", "value")
    extra = spark.range(40, 60).selectExpr(
        "id AS k", "concat('d', id) AS body", "CAST(id * 10 AS bigint) AS value"
    )
    iceberg_write(extra.repartition(2), t, mode="append")
    df = IcebergSnapshotLake(spark, t, t + "_ix").read()
    assert df.count() == 60
    assert df.agg(F.sum("value")).first()[0] == sum(i * 10 for i in range(60))
    # every row resolves, whichever physical name its file carries
    assert df.filter(F.col("value").isNull()).count() == 0


def test_drop_then_readd_no_resurrection(spark, tmp_path):
    t = _mk(spark, tmp_path)
    iceberg_drop_column(t, "body")
    df = IcebergSnapshotLake(spark, t, t + "_ix").read()
    assert sorted(df.columns) == ["k", "v"]
    iceberg_add_column(t, "body", "string")
    md = _current_metadata(t)
    ids = {
        s["schema-id"]: {
            f["name"]: f["id"] for f in s["fields"]
        }
        for s in md["schemas"]
    }
    old_id = ids[0]["body"]
    new_id = ids[md["current-schema-id"]]["body"]
    assert new_id != old_id  # never reused
    df2 = IcebergSnapshotLake(spark, t, t + "_ix2").read()
    assert df2.filter(F.col("body").isNull()).count() == 40


def test_time_travel_resolves_pre_evolution_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    snap1 = _current_metadata(t)["current-snapshot-id"]
    iceberg_rename_column(t, "v", "value")
    iceberg_drop_column(t, "body")
    pinned = IcebergSnapshotLake(spark, t, t + "_ix", snapshot_id=snap1)
    df = pinned.read()
    assert "v" in df.columns and "body" in df.columns  # the OLD world
    assert "value" not in df.columns


def test_rewrite_preserves_adding_snapshot_attribution(spark, tmp_path):
    """A post-rename rewrite commit (remove+add, compaction-style) must
    not re-stamp CARRIED pre-rename files with the new snapshot — their
    write-schema attribution (old column name) has to survive."""
    t = _mk(spark, tmp_path)
    iceberg_rename_column(t, "v", "value")
    extra = spark.range(40, 60).selectExpr(
        "id AS k", "concat('d', id) AS body", "CAST(id * 10 AS bigint) AS value"
    )
    iceberg_write(extra.repartition(1), t, mode="append")
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    files = sorted(lake.files)
    # rewrite: drop one POST-rename file, add a replacement (same rows)
    post = [
        f
        for f in files
        if "value"
        in __import__("pyarrow.parquet", fromlist=["ParquetFile"])
        .ParquetFile(f)
        .schema_arrow.names
    ]
    rows = spark.read.parquet(post[0])
    repl = os.path.join(t, "data", "rewritten.parquet")
    rows.coalesce(1).write.parquet(repl + "_stage")
    import glob
    import shutil

    shutil.move(glob.glob(repl + "_stage/*.parquet")[0], repl)
    shutil.rmtree(repl + "_stage")
    iceberg_commit(t, add=[repl], remove=[post[0]])
    df = IcebergSnapshotLake(spark, t, t + "_ix2").read()
    assert df.count() == 60
    assert df.agg(F.sum("value")).first()[0] == sum(i * 10 for i in range(60))
    assert df.filter(F.col("value").isNull()).count() == 0


def test_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # nested paths navigate (round 11) — a missing segment refuses
    with pytest.raises(ValueError, match="no column 'a'"):
        iceberg_rename_column(t, "a.b", "c")
    # a rename cannot move a field between structs
    with pytest.raises(ValueError, match="simple name"):
        iceberg_rename_column(t, "v", "a.b")
    # paths through a primitive refuse
    with pytest.raises(ValueError, match="primitive"):
        iceberg_rename_column(t, "v.x", "y")
    with pytest.raises(ValueError, match="does not exist"):
        iceberg_rename_column(t, "nope", "c")
    with pytest.raises(ValueError, match="already exists"):
        iceberg_rename_column(t, "v", "body")
    with pytest.raises(ValueError, match="does not exist"):
        iceberg_drop_column(t, "nope")
    iceberg_drop_column(t, "body")
    iceberg_drop_column(t, "v")
    with pytest.raises(ValueError, match="last column"):
        iceberg_drop_column(t, "k")
    # partition source fields refuse (identity values are addressed by
    # column name in the hive layout)
    p = str(tmp_path / "p")
    df = spark.range(20).selectExpr(
        "id AS k", "CAST(id % 2 AS bigint) AS bucket", "id * 2 AS v"
    )
    iceberg_write(df, p, partition_by=["bucket"])
    with pytest.raises(ValueError, match="partition source"):
        iceberg_rename_column(p, "bucket", "b2")
    with pytest.raises(ValueError, match="partition source"):
        iceberg_drop_column(p, "bucket")


def test_type_promotion_reads_and_pins(spark, tmp_path):
    """int→long promotion (spec widen-only evolution): metadata-only,
    field id preserved, pre-promotion files cast at scan, post-promotion
    appends carry the wide type natively, aggregates agree with the
    logical view; an illegal narrowing/cross-family promotion refuses."""
    from pyspark.sql.types import LongType

    from rottnest_spark.sources.iceberg_write import (
        iceberg_update_column_type,
    )

    t = str(tmp_path / "t")
    df = spark.range(40).selectExpr(
        "id AS k", "CAST(id * 10 AS int) AS v"
    )
    iceberg_write(df.repartition(2), t)
    snap1 = _current_metadata(t)["current-snapshot-id"]
    iceberg_update_column_type(t, "v", "long")
    md = _current_metadata(t)
    cur = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    f_new = next(f for f in cur["fields"] if f["name"] == "v")
    f_old = next(
        f for f in md["schemas"][0]["fields"] if f["name"] == "v"
    )
    assert f_new["id"] == f_old["id"] and f_new["type"] == "long"
    # mixed files: append rows carrying the WIDE type
    extra = spark.range(40, 60).selectExpr(
        "id AS k", "CAST(id * 10 AS bigint) AS v"
    )
    iceberg_write(extra.repartition(1), t, mode="append")
    got = IcebergSnapshotLake(spark, t, t + "_ix").read()
    assert isinstance(got.schema["v"].dataType, LongType)
    assert got.agg(F.sum("v")).first()[0] == sum(i * 10 for i in range(60))
    assert got.count() == 60
    # time travel at the pre-promotion snapshot reads the OLD type
    pinned = IcebergSnapshotLake(
        spark, t, t + "_ix2", snapshot_id=snap1
    ).read()
    assert pinned.schema["v"].dataType.simpleString() == "int"
    # illegal promotions refuse
    with pytest.raises(ValueError, match="not a legal"):
        iceberg_update_column_type(t, "v", "int")
    with pytest.raises(ValueError, match="not a legal"):
        iceberg_update_column_type(t, "v", "string")
    with pytest.raises(ValueError, match="already"):
        iceberg_update_column_type(t, "v", "long")


def test_decimal_precision_promotion(spark, tmp_path):
    from rottnest_spark.sources.iceberg_write import (
        iceberg_update_column_type,
    )

    t = str(tmp_path / "t")
    df = spark.range(10).selectExpr(
        "id AS k", "CAST(id AS decimal(10,2)) AS d"
    )
    iceberg_write(df.repartition(1), t)
    iceberg_update_column_type(t, "d", "decimal(18,2)")
    got = IcebergSnapshotLake(spark, t, t + "_ix").read()
    assert got.schema["d"].dataType.simpleString() == "decimal(18,2)"
    assert got.agg(F.sum("d")).first()[0] == sum(range(10))
    # scale change refuses (value-shifting, not a widen)
    with pytest.raises(ValueError, match="not a legal"):
        iceberg_update_column_type(t, "d", "decimal(20,4)")


def test_rename_on_partitioned_table_reconstructs(spark, tmp_path):
    """Renaming a NON-partition-source column of a hive-laid partitioned
    table: the per-partition reconstruction scans route through the
    schema-resolution path (the physically-missing partition column
    null-fills in the projection, then the manifest literal overwrites
    it), so values resolve across pre/post-rename files and partition
    columns stay intact."""
    from rottnest_spark.sources.iceberg_write import (
        iceberg_rename_column,
    )

    t = str(tmp_path / "p")
    df = spark.range(30).selectExpr(
        "id AS k", "CAST(id % 3 AS bigint) AS bucket",
        "CAST(id * 10 AS bigint) AS v",
    )
    iceberg_write(df, t, partition_by=["bucket"])
    iceberg_rename_column(t, "v", "value")
    extra = spark.range(30, 45).selectExpr(
        "id AS k", "CAST(id % 3 AS bigint) AS bucket",
        "CAST(id * 10 AS bigint) AS value",
    )
    iceberg_write(extra, t, mode="append")
    got = IcebergSnapshotLake(spark, t, t + "_ix").read()
    assert sorted(got.columns) == ["bucket", "k", "value"]
    assert got.count() == 45
    assert got.agg(F.sum("value")).first()[0] == sum(i * 10 for i in range(45))
    # partition values reconstructed, not null-filled
    assert got.filter(F.col("bucket").isNull()).count() == 0
    assert got.filter("bucket = 1").count() == 15


def test_search_after_rename(spark, sf_dir, tmp_path):
    """Index × rename interplay: an index built under the OLD name does
    not cover the NEW name, so a new-name search falls back to the
    resolution-aware full scan and stays EXACT over mixed
    pre/post-rename files; an old-name search on a mixed table raises
    (loud, never silent misses); rebuilding under the new name
    re-accelerates and stays exact."""
    from rottnest_spark.indices.substring import SubstringIndex
    from rottnest_spark.sources.iceberg_write import (
        iceberg_rename_column,
    )

    t = str(tmp_path / "t")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    iceberg_write(docs.filter("doc_id % 2 = 0").repartition(2), t)
    lake = IcebergSnapshotLake(spark, t, str(tmp_path / "ix"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    iceberg_rename_column(t, "text", "body")
    iceberg_write(
        docs.filter("doc_id % 2 = 1")
        .withColumnRenamed("text", "body")
        .repartition(2),
        t,
        mode="append",
    )
    lake2 = IcebergSnapshotLake(spark, t, str(tmp_path / "ix"))
    oracle = sorted(
        r.doc_id
        for r in docs.filter(
            F.contains(F.lower("text"), F.lit("merge sort"))
        ).collect()
    )
    got = sorted(
        r.doc_id
        for r in lake2.search(idx, "body", "merge sort")
        .select("doc_id")
        .collect()
    )
    assert got == oracle
    with pytest.raises(Exception, match="text"):
        lake2.search(idx, "text", "merge sort").collect()
    # rebuild under the new name: indexed again, still exact
    lake2.build_index(idx, "body")
    got = sorted(
        r.doc_id
        for r in lake2.search(idx, "body", "merge sort")
        .select("doc_id")
        .collect()
    )
    assert got == oracle
