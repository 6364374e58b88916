"""Iceberg ADD COLUMN — metadata-only schema evolution (round 10,
iceberg.apache.org/spec #schema-evolution + #default-values): the
writer-side twin of the v3 defaults READ machinery rounds 8-10 built.
Until now defaulted schemas existed only as hand-evolved fixtures;
`iceberg_add_column` makes the lifecycle real: evolve → old rows fill
the default → DML/appends continue.

Contracts pinned:
- zero data files touched (metadata version +1, same snapshot);
- the new field takes the next UNUSED table-global field id (nested
  element/key/value ids counted);
- both schema forms stay in sync, schema-id bumps, last-column-id
  tracked;
- with initial_default: format-version upgrades to 3, every
  pre-evolution row reads the default, appended old-shape frames keep
  working (missing column -> default at read), v3 DML works on the
  evolved table;
- time travel to a pre-evolution snapshot resolves the OLD schema (no
  column leak backwards);
- duplicate names, unreadable types and unparseable default values
  refuse EAGERLY (a committed-but-unreadable default bricks the table).
"""

import datetime
import os

import pytest

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    _current_metadata,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_add_column,
    iceberg_v3_upsert,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, tmp_path, n=40):
    t = str(tmp_path / "t")
    df = spark.range(n).selectExpr("id AS k", "concat('d', id) AS body")
    iceberg_write(df.repartition(2), t)
    return t


def test_add_column_no_default(spark, tmp_path):
    """No value given: the field records an EXPLICIT null default (the
    marker that routes reads through the mixed-file-safe fill) and the
    table upgrades to v3 like every evolution through this writer."""
    t = _mk(spark, tmp_path)
    md0 = _current_metadata(t)
    v = iceberg_add_column(t, "score", "long")
    md = _current_metadata(t)
    assert md["format-version"] == 3
    assert md["current-schema-id"] == md0.get("current-schema-id", 0) + 1
    assert md["current-snapshot-id"] == md0["current-snapshot-id"]
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    rows = lake.read().select("k", "score").collect()
    assert len(rows) == 40 and all(r.score is None for r in rows)
    assert isinstance(v, int)


def test_add_column_with_default_fills_and_upgrades(spark, tmp_path):
    t = _mk(spark, tmp_path)
    iceberg_add_column(t, "score", "long", initial_default=7)
    md = _current_metadata(t)
    assert md["format-version"] == 3
    f = [
        x
        for x in md["schemas"][-1]["fields"]
        if x["name"] == "score"
    ][0]
    assert f["initial-default"] == 7 and f["write-default"] == 7
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    assert {r.score for r in lake.read().select("score").collect()} == {7}
    # legacy form in sync
    assert any(
        x["name"] == "score" for x in md["schema"]["fields"]
    )
    assert md["last-column-id"] == f["id"]


def test_field_id_skips_nested_ids(spark, tmp_path):
    t = _mk(spark, tmp_path)
    iceberg_add_column(
        t,
        "tags",
        {
            "type": "list",
            "element-id": 900,
            "element": "long",
            "element-required": False,
        },
        initial_default=[1, 2],
    )
    md = _current_metadata(t)
    tag_f = [
        x for x in md["schemas"][-1]["fields"] if x["name"] == "tags"
    ][0]
    iceberg_add_column(t, "extra", "int")
    md = _current_metadata(t)
    extra_f = [
        x for x in md["schemas"][-1]["fields"] if x["name"] == "extra"
    ][0]
    assert extra_f["id"] > 900 and extra_f["id"] > tag_f["id"]
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    row = lake.read().select("tags").first()
    assert list(row.tags) == [1, 2]


def test_append_and_dml_after_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path)
    iceberg_add_column(t, "score", "long", initial_default=7)
    # old-shape append: the staged files miss the column; reads fill 7.
    # the v3 table routes through iceberg_v3_append automatically
    iceberg_write(
        spark.range(40, 50).selectExpr("id AS k", "concat('d', id) AS body"),
        t,
        mode="append",
    )
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    got = {(r.k, r.score) for r in lake.read().select("k", "score").collect()}
    assert got == {(i, 7) for i in range(50)}
    # v3 upsert with the evolved shape
    changes = spark.range(3).selectExpr(
        "id AS k", "'upd' AS body", "id * 10 AS score"
    )
    iceberg_v3_upsert(spark, changes, t, ["k"])
    got = {(r.k, r.score) for r in lake.read().select("k", "score").collect()}
    assert got == {(i, 7) for i in range(3, 50)} | {(i, i * 10) for i in range(3)}


def test_time_travel_resolves_pre_evolution_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    snap0 = _current_metadata(t)["current-snapshot-id"]
    iceberg_add_column(t, "score", "long", initial_default=7)
    pinned = IcebergSnapshotLake(spark, t, t + "_p", snapshot_id=snap0)
    assert "score" not in pinned.read().columns
    assert "score" in IcebergSnapshotLake(spark, t, t + "_c").read().columns


def test_add_column_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        iceberg_add_column(t, "body", "string")
    with pytest.raises(ValueError, match="no spark mapping"):
        iceberg_add_column(t, "x", "geometry")
    with pytest.raises(ValueError):  # unparseable default for the type
        iceberg_add_column(t, "d", "date", initial_default="not-a-date")
    with pytest.raises(ValueError, match="keys"):
        iceberg_add_column(
            t,
            "m",
            {"type": "map", "key-id": 1.0 and 800, "key": "string",
             "value-id": 801, "value": "int", "value-required": False},
            initial_default={"bad": []},
        )
    # nothing committed by the refusals
    md = _current_metadata(t)
    assert [f["name"] for f in md["schemas"][-1]["fields"]] == ["k", "body"]


def test_nested_struct_default_via_add_column(spark, tmp_path):
    t = _mk(spark, tmp_path, n=6)
    iceberg_add_column(
        t,
        "meta",
        {
            "type": "struct",
            "fields": [
                {"id": 701, "name": "src", "type": "string",
                 "required": False},
                {"id": 702, "name": "rev", "type": "int", "required": False},
            ],
        },
        initial_default={"701": "backfill", "702": 3},
    )
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    for r in lake.read().select("meta").collect():
        assert (r.meta.src, r.meta.rev) == ("backfill", 3)
