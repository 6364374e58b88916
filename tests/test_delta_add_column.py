"""Delta ADD COLUMN — metaData-only schema evolution (round 10,
PROTOCOL.md: the table schema is the latest metaData's schemaString).
The Iceberg twin records a default; Delta (without the defaultColumns
feature) has none — null for pre-evolution rows IS the spec's answer.
The snapshot scan now pins the schemaString for UNMAPPED tables too, so
evolved columns surface deterministically per file instead of being
left to footer-sample inference (which may drop them entirely)."""

import pytest
from pyspark.sql import functions as F

from rottnest_spark.sources.delta import DeltaSnapshotLake
from rottnest_spark.sources.delta_write import (
    delta_add_column,
    delta_convert,
    delta_upsert,
    delta_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, tmp_path, n=30):
    t = str(tmp_path / "t")
    spark.range(n).selectExpr(
        "id AS k", "concat('d', id) AS body"
    ).repartition(2).write.parquet(t)
    delta_convert(t)
    return t


def test_add_column_reads_null_then_values(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = delta_add_column(t, "score", "bigint")
    assert v >= 1
    lake = DeltaSnapshotLake(spark, t, t + "_ix")
    df = lake.read()
    assert dict(df.dtypes)["score"] == "bigint"
    assert {r.score for r in df.select("score").collect()} == {None}
    # an append carrying the column: its rows surface values, the
    # pre-evolution rows stay null
    delta_write(
        spark.range(30, 35).selectExpr(
            "id AS k", "concat('d', id) AS body", "id * 2 AS score"
        ),
        t,
        mode="append",
    )
    got = {(r.k, r.score) for r in lake.read().select("k", "score").collect()}
    assert got == {(i, None) for i in range(30)} | {
        (i, i * 2) for i in range(30, 35)
    }


def test_upsert_after_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path)
    delta_add_column(t, "score", "bigint")
    delta_upsert(
        spark,
        spark.range(3).selectExpr(
            "id AS k", "'upd' AS body", "id * 7 AS score"
        ),
        t,
        ["k"],
    )
    lake = DeltaSnapshotLake(spark, t, t + "_ix")
    got = {(r.k, r.score) for r in lake.read().select("k", "score").collect()}
    assert got == {(i, None) for i in range(3, 30)} | {
        (i, i * 7) for i in range(3)
    }


def test_diff_carries_evolved_column(spark, tmp_path):
    from rottnest_spark.sources.changes import delta_snapshot_diff

    t = _mk(spark, tmp_path)
    delta_add_column(t, "score", "bigint")
    delta_write(
        spark.range(30, 33).selectExpr(
            "id AS k", "concat('d', id) AS body", "id AS score"
        ),
        t,
        mode="append",
    )
    diff = delta_snapshot_diff(spark, t, 0)
    ins = {
        (r.k, r.score)
        for r in diff.filter("_change_type = 'insert'").collect()
    }
    assert ins == {(i, i) for i in range(30, 33)}


def test_add_column_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path)
    delta_add_column(t, "score", "bigint")
    with pytest.raises(ValueError, match="already exists"):
        delta_add_column(t, "score", "bigint")
    with pytest.raises(ValueError, match="unparseable"):
        delta_add_column(t, "x", "not a type!!")
