"""Iceberg NESTED-PATH schema evolution (round 11 follow-through —
the COVERAGE.md "nested paths refuse loudly" limitation removed).

The spec keys field identity on ids AT EVERY DEPTH
(iceberg.apache.org/spec/#schema-evolution), so rename / drop / add /
promote inside a struct are the same metadata-only commits as at top
level; reads resolve each file through its write schema with
_resolve_evolved_column rebuilding structs FIELD BY ID (reference
parity: the reference has no schema-evolution support at all — its
backends/iceberg.py only appends index records — so this surface
exceeds it).

Contracts pinned:
- writers navigate dot paths through structs only (list/map element
  paths, missing segments, primitives mid-path refuse loudly);
- a nested rename preserves the nested field id; mixed pre/post-rename
  files agree with the logical view; NULL struct values stay NULL
  (F.struct would otherwise resurrect them as all-null rows);
- a nested drop projects the subfield away in old files; re-ADD of the
  same name mints a fresh id and does NOT resurrect stale values;
- a nested add surfaces its initial-default (or null) for old files;
- a nested promote (int→long) reads old narrow files at the wide type;
- time travel at a pre-evolution snapshot resolves the OLD shape.
"""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    _current_metadata,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_add_column,
    iceberg_drop_column,
    iceberg_rename_column,
    iceberg_update_column_type,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, tmp_path, n=30):
    """Table with a struct column (every 5th row's struct is NULL)."""
    t = str(tmp_path / "t")
    df = spark.range(n).selectExpr(
        "id AS k",
        "CASE WHEN id % 5 = 4 THEN NULL ELSE "
        "named_struct('city', concat('c', id % 3), "
        "'pop', CAST(id * 7 AS int)) END AS info",
    )
    iceberg_write(df.repartition(2), t)
    return t


def _read(spark, t, tag=""):
    return IcebergSnapshotLake(spark, t, t + "_ix" + tag).read()


def test_initial_schema_types_nested_ids(spark, tmp_path):
    t = _mk(spark, tmp_path)
    md = _current_metadata(t)
    info = next(
        f for f in md["schemas"][-1]["fields"] if f["name"] == "info"
    )
    assert info["type"]["type"] == "struct"
    ids = [f["id"] for f in info["type"]["fields"]]
    top = [f["id"] for f in md["schemas"][-1]["fields"]]
    assert len(set(ids + top)) == len(ids) + len(top)  # unique, disjoint
    assert [f["name"] for f in info["type"]["fields"]] == ["city", "pop"]
    assert [f["type"] for f in info["type"]["fields"]] == ["string", "int"]


def test_nested_rename_mixed_files_and_null_structs(spark, tmp_path):
    t = _mk(spark, tmp_path)
    md0 = _current_metadata(t)
    snap0 = md0["current-snapshot-id"]
    fid0 = next(
        f
        for f in next(
            g for g in md0["schemas"][-1]["fields"] if g["name"] == "info"
        )["type"]["fields"]
        if f["name"] == "city"
    )["id"]
    iceberg_rename_column(t, "info.city", "town")
    md = _current_metadata(t)
    assert md["current-snapshot-id"] == snap0  # metadata-only
    cur_info = next(
        g for g in md["schemas"][-1]["fields"] if g["name"] == "info"
    )
    f_new = next(
        f for f in cur_info["type"]["fields"] if f["name"] == "town"
    )
    assert f_new["id"] == fid0  # nested id preserved
    # append files carrying the NEW shape
    extra = spark.range(30, 40).selectExpr(
        "id AS k",
        "named_struct('town', concat('c', id % 3), "
        "'pop', CAST(id * 7 AS int)) AS info",
    )
    iceberg_write(extra.repartition(1), t, mode="append")
    got = _read(spark, t)
    assert got.schema["info"].dataType.fieldNames() == ["town", "pop"]
    assert got.count() == 40
    # old files' city values surface under the new name
    rows = {r.k: r.info for r in got.collect()}
    for k in range(30):
        if k % 5 == 4:
            assert rows[k] is None  # NULL structs stay NULL
        else:
            assert rows[k].town == f"c{k % 3}"
            assert rows[k].pop == k * 7
    for k in range(30, 40):
        assert rows[k].town == f"c{k % 3}"
    # time travel pin: old shape, old name
    pinned = IcebergSnapshotLake(
        spark, t, t + "_ixp", snapshot_id=snap0
    ).read()
    assert pinned.schema["info"].dataType.fieldNames() == ["city", "pop"]
    assert pinned.count() == 30


def test_nested_drop_and_readd_no_resurrection(spark, tmp_path):
    t = _mk(spark, tmp_path)
    iceberg_drop_column(t, "info.pop")
    got = _read(spark, t)
    assert got.schema["info"].dataType.fieldNames() == ["city"]
    # re-ADD the same name: fresh id — old physical values must NOT
    # resurrect
    iceberg_add_column(t, "info.pop", "long")
    got = _read(spark, t, "2")
    assert got.schema["info"].dataType.fieldNames() == ["city", "pop"]
    for r in got.collect():
        if r.info is not None:
            assert r.info.pop is None
    md = _current_metadata(t)
    info = next(
        g for g in md["schemas"][-1]["fields"] if g["name"] == "info"
    )
    ids = [f["id"] for f in info["type"]["fields"]]
    all_ids = set()
    for s in md["schemas"]:
        for g in s["fields"]:
            if isinstance(g["type"], dict):
                all_ids.update(
                    f["id"] for f in g["type"].get("fields", [])
                )
    assert len(set(ids)) == len(ids)
    # the re-added pop id is NEW (never seen in any earlier schema's
    # info struct except the final one)
    readd = next(
        f for f in info["type"]["fields"] if f["name"] == "pop"
    )["id"]
    earlier = set()
    for s in md["schemas"][:-1]:
        for g in s["fields"]:
            if isinstance(g["type"], dict):
                earlier.update(
                    f["id"] for f in g["type"].get("fields", [])
                )
    assert readd not in earlier


def test_nested_add_with_default_and_promote(spark, tmp_path):
    t = _mk(spark, tmp_path)
    iceberg_add_column(
        t, "info.src", "string", initial_default="backfill"
    )
    iceberg_update_column_type(t, "info.pop", "long")
    extra = spark.range(30, 36).selectExpr(
        "id AS k",
        "named_struct('city', concat('c', id % 3), "
        "'pop', CAST(id * 7 AS bigint), 'src', 'live') AS info",
    )
    iceberg_write(extra.repartition(1), t, mode="append")
    got = _read(spark, t)
    assert (
        got.schema["info"].dataType["pop"].dataType.simpleString()
        == "bigint"
    )
    rows = {r.k: r.info for r in got.collect()}
    for k in range(30):
        if k % 5 != 4:
            assert rows[k].src == "backfill"  # nested initial-default
            assert rows[k].pop == k * 7
    for k in range(30, 36):
        assert rows[k].src == "live"
    total = got.agg(
        F.sum(F.col("info.pop")).alias("s")
    ).first()["s"]
    want = sum(k * 7 for k in range(30) if k % 5 != 4) + sum(
        k * 7 for k in range(30, 36)
    )
    assert total == want


def test_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(10).selectExpr(
        "id AS k",
        "named_struct('a', id) AS s",
        "array(named_struct('x', id)) AS arr",
        "map('m', id) AS mp",
    )
    iceberg_write(df.repartition(1), t)
    with pytest.raises(ValueError, match="list"):
        iceberg_rename_column(t, "arr.x", "y")
    with pytest.raises(ValueError, match="map"):
        iceberg_rename_column(t, "mp.m", "y")
    with pytest.raises(ValueError, match="no column"):
        iceberg_rename_column(t, "s.nope.deep", "y")
    with pytest.raises(ValueError, match="last field of its struct"):
        iceberg_drop_column(t, "s.a")
    with pytest.raises(ValueError, match="already exists"):
        iceberg_add_column(t, "s.a", "long")
    with pytest.raises(ValueError, match="not a legal"):
        iceberg_update_column_type(t, "s.a", "string")
