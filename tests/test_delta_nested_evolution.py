"""Delta NESTED-PATH schema evolution (round 11 follow-through — the
COVERAGE.md "nested paths refuse loudly" limitation removed, Delta
side).

Column mapping carries a physicalName at EVERY nesting depth
(PROTOCOL.md §column-mapping), so nested rename/drop/add/widen are the
same metaData-only commits as at top level; the reader's
pinned-physical-schema scan + positional struct casts already resolve
the tree (sources/delta.py to_logical_frame). Reference parity: the
reference has no schema-evolution support at all — this surface
exceeds it.

Contracts pinned:
- nested rename: physicalName at the nested level never changes; old
  files resolve; NULL struct values stay NULL; DML (upsert) speaks the
  new nested vocabulary;
- nested drop: subfield stops being projected, files untouched; re-ADD
  of the same nested name mints a fresh col-uuid physicalName and does
  NOT resurrect stale values;
- nested add: old files surface null for the new subfield;
- nested widen: old narrow files up-cast through the pinned schema;
- path refusals: array/map traversal, missing segments, last field of
  a struct.
"""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.delta import (
    DeltaSnapshotLake,
    delta_table_meta,
)
from rottnest_spark.sources.delta_write import (
    delta_add_column,
    delta_convert,
    delta_drop_column,
    delta_rename_column,
    delta_upsert,
    delta_widen_column,
    delta_write,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def table(spark, tmp_path):
    """Delta table with a struct column; every 5th row's struct NULL."""
    work = str(tmp_path / "t")
    src = spark.range(30).selectExpr(
        "id AS k",
        "CASE WHEN id % 5 = 4 THEN NULL ELSE "
        "named_struct('city', concat('c', id % 3), "
        "'pop', CAST(id * 7 AS int)) END AS info",
    )
    src.repartition(2).write.parquet(work)
    delta_convert(work)
    return work


def _read(spark, work, tmp_path, tag=""):
    return DeltaSnapshotLake(
        spark, work, str(tmp_path / ("ix" + tag))
    ).read()


def test_nested_rename_mixed_and_null_structs(spark, table, tmp_path):
    work = table
    delta_rename_column(work, "info.city", "town")
    meta = delta_table_meta(work)
    import json

    info = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "info"
    )
    town = next(
        f for f in info["type"]["fields"] if f["name"] == "town"
    )
    # physicalName at the nested level stayed the ORIGINAL name
    assert (
        town["metadata"]["delta.columnMapping.physicalName"] == "city"
    )
    # append post-rename files (new logical shape)
    extra = spark.range(30, 40).selectExpr(
        "id AS k",
        "named_struct('town', concat('c', id % 3), "
        "'pop', CAST(id * 7 AS int)) AS info",
    )
    delta_write(extra.repartition(1), work, mode="append")
    got = _read(spark, work, tmp_path)
    assert got.schema["info"].dataType.fieldNames() == ["town", "pop"]
    rows = {r.k: r.info for r in got.collect()}
    assert len(rows) == 40
    for k in range(40):
        if k < 30 and k % 5 == 4:
            assert rows[k] is None  # NULL structs stay NULL
        else:
            assert rows[k].town == f"c{k % 3}"
            assert rows[k].pop == k * 7
    # DML speaks the new nested vocabulary
    ch = spark.range(0, 30, 6).selectExpr(
        "id AS k",
        "named_struct('town', 'upd', 'pop', CAST(0 AS int)) AS info",
    )
    delta_upsert(spark, ch, work, ["k"])
    got2 = _read(spark, work, tmp_path, "2")
    rows2 = {r.k: r.info for r in got2.collect()}
    for k in range(0, 30, 6):
        assert rows2[k].town == "upd" and rows2[k].pop == 0


def test_nested_drop_readd_no_resurrection(spark, table, tmp_path):
    work = table
    delta_drop_column(work, "info.pop")
    got = _read(spark, work, tmp_path)
    assert got.schema["info"].dataType.fieldNames() == ["city"]
    delta_add_column(work, "info.pop", "bigint")
    got2 = _read(spark, work, tmp_path, "2")
    assert got2.schema["info"].dataType.fieldNames() == ["city", "pop"]
    for r in got2.collect():
        if r.info is not None:
            assert r.info.pop is None  # fresh physicalName — no stale data
    # fresh mapping id advanced past the drop
    import json

    meta = delta_table_meta(work)
    info = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "info"
    )
    pop = next(f for f in info["type"]["fields"] if f["name"] == "pop")
    assert pop["metadata"]["delta.columnMapping.physicalName"].startswith(
        "col-"
    )


def test_nested_add_and_widen(spark, table, tmp_path):
    work = table
    delta_add_column(work, "info.src", "string")
    delta_widen_column(work, "info.pop", "bigint")
    extra = spark.range(30, 36).selectExpr(
        "id AS k",
        "named_struct('city', concat('c', id % 3), "
        "'pop', CAST(id * 7 AS bigint), 'src', 'live') AS info",
    )
    delta_write(extra.repartition(1), work, mode="append")
    got = _read(spark, work, tmp_path)
    assert (
        got.schema["info"].dataType["pop"].dataType.simpleString()
        == "bigint"
    )
    rows = {r.k: r.info for r in got.collect()}
    for k in range(30):
        if k % 5 != 4:
            assert rows[k].src is None  # no defaults in Delta — null
            assert rows[k].pop == k * 7
    for k in range(30, 36):
        assert rows[k].src == "live"
    total = got.agg(F.sum("info.pop").alias("s")).first()["s"]
    assert total == sum(
        k * 7 for k in range(36) if not (k < 30 and k % 5 == 4)
    )


def test_refusals(spark, tmp_path):
    work = str(tmp_path / "t")
    spark.range(10).selectExpr(
        "id AS k",
        "named_struct('a', id) AS s",
        "array(named_struct('x', id)) AS arr",
    ).repartition(1).write.parquet(work)
    delta_convert(work)
    with pytest.raises(ValueError, match="array"):
        delta_rename_column(work, "arr.x", "y")
    with pytest.raises(ValueError, match="no column"):
        delta_rename_column(work, "s.nope.deep", "y")
    with pytest.raises(ValueError, match="simple name"):
        delta_rename_column(work, "s.a", "b.c")
    with pytest.raises(ValueError, match="primitive"):
        delta_drop_column(work, "k.x")
    with pytest.raises(ValueError, match="last field of its struct"):
        delta_drop_column(work, "s.a")
    with pytest.raises(ValueError, match="already exists"):
        delta_add_column(work, "s.a", "bigint")
    with pytest.raises(ValueError, match="not a legal"):
        delta_widen_column(work, "s.a", "string")
