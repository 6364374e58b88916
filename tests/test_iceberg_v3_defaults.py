"""Iceberg v3 FIELD DEFAULTS (iceberg.apache.org/spec/#default-values),
round 8: `initial-default` is the value a reader must surface for rows
whose data file predates the field's addition. Fixture shape mirrors what
a v3-writing engine leaves behind: v2-written data files, a later file
that physically CARRIES the evolved column (including an explicit null —
which must stay null), then hand-upgraded metadata adding the field with
its default.

Contract pinned here:
- read(): pre-evolution rows surface the default; post-evolution values —
  including explicit nulls — are untouched (the scan splits by footer, it
  never blanket-coalesces);
- snapshot diff / change feed / cross-format replication carry the
  default through (a DV delete of pre-evolution rows feeds deletes with
  the default filled);
- `write-default`-only tables are fully supported everywhere (writer-side
  concern, readers ignore);
- index build/search refuses loudly (raw candidate reads would index
  NULL), and equality deletes keyed on a defaulted field refuse.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    initial_default_fields,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_commit,
    iceberg_convert,
)

DEFAULT = 7


def _upgrade_v3(
    table: str, *extra_fields: dict, canonical: bool = False
) -> None:
    """Append fields to the schema and stamp format-version 3. With
    canonical=True the metadata is rewritten the way a real v3 engine
    writes it — `schemas` + `current-schema-id` only, the deprecated
    single `schema` key REMOVED — which is the form the round-8 reader
    silently dropped defaults on."""
    meta = os.path.join(table, "metadata")
    # NUMERIC version sort — lexicographic picks v2 over v12, so a
    # SECOND hand-evolution would silently start from stale metadata
    # and drop the first one's fields/defaults
    metas = sorted(
        (f for f in os.listdir(meta) if f.endswith(".metadata.json")),
        key=lambda f: int(f.split(".")[0].lstrip("v")),
    )
    md = json.loads(open(os.path.join(meta, metas[-1])).read())
    md["format-version"] = 3
    schema = md["schema"]
    schema["fields"].extend(extra_fields)
    if canonical:
        del md["schema"]
        md["schemas"] = [
            {"type": "struct", "schema-id": 0, "fields": []},  # stale old
            {**schema, "schema-id": 5},
        ]
        md["current-schema-id"] = 5
    elif "schemas" in md:
        # the writer emits both forms (round 9) — a hand-evolution must
        # keep them in sync or the canonical one wins with stale fields
        md["schemas"] = [{**schema, "schema-id": md.get("current-schema-id", 0)}]
    v = len(metas) + 10
    with open(os.path.join(meta, f"v{v}.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write(str(v))


@pytest.fixture()
def vtable(spark, tmp_path):
    """v3 table with `score long initial-default 7`: rows 0..99 predate
    the field (two files), rows 100..109 carry it physically — score =
    doc_id for even ids, EXPLICIT NULL for odd ones."""
    out = str(tmp_path / "v3d")
    spark.range(100).selectExpr(
        "id AS doc_id", "concat('d', id) AS body"
    ).repartition(2).write.parquet(out)
    iceberg_convert(out)
    new = spark.range(100, 110).selectExpr(
        "id AS doc_id",
        "concat('n', id) AS body",
        "CASE WHEN id % 2 = 0 THEN id ELSE NULL END AS score",
    ).coalesce(1)
    stage = os.path.join(out, "evolved")
    new.write.parquet(stage)
    files = [
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    ]
    iceberg_commit(out, add=files)
    next_id = 100  # clear of the convert-derived field ids
    _upgrade_v3(
        out,
        {
            "id": next_id,
            "name": "score",
            "required": False,
            "type": "long",
            "initial-default": DEFAULT,
        },
    )
    return out


def _scores(df):
    return {r.doc_id: r.score for r in df.select("doc_id", "score").collect()}


def test_read_fills_pre_evolution_rows_only(spark, vtable):
    got = _scores(IcebergSnapshotLake(spark, vtable, vtable + "_i").read())
    assert len(got) == 110
    for i in range(100):
        assert got[i] == DEFAULT, i  # pre-evolution: the spec default
    for i in range(100, 110):
        assert got[i] == (i if i % 2 == 0 else None), i  # explicit values


def test_diff_and_feed_carry_the_default(spark, vtable):
    from rottnest_spark.sources.changes import (
        IcebergChangesCursor,
        iceberg_snapshot_diff,
    )
    from rottnest_spark.sources.iceberg_write import iceberg_v3_dv_commit

    cur = IcebergChangesCursor(spark, vtable, vtable + "_ck")
    from rottnest_spark.sources.iceberg import _current_metadata

    cur.ack(_current_metadata(vtable)["current-snapshot-id"])

    # DV-delete rows 0..9 — all pre-evolution, so the feed's delete rows
    # must surface score == DEFAULT, not NULL
    import pyspark.sql.functions as _F

    from rottnest_spark.sources.iceberg import snapshot_state_from_metadata

    md = _current_metadata(vtable)
    files = sorted(snapshot_state_from_metadata(md, vtable)["data"])
    tagged = (
        spark.read.parquet(*[f for f in files if "evolved" not in f])
        .withColumns(
            {
                "__p": _F.regexp_replace(
                    _F.col("_metadata.file_path"), "^file:/+", "/"
                ),
                "__r": _F.col("_metadata.row_index"),
            }
        )
        .filter("doc_id < 10")
        .select("__p", "__r")
        .collect()
    )
    dels: dict[str, list[int]] = {}
    for r in tagged:
        dels.setdefault(r["__p"], []).append(int(r["__r"]))
    snap = iceberg_v3_dv_commit(vtable, dels)

    diff = iceberg_snapshot_diff(spark, vtable, md["current-snapshot-id"], snap)
    rows = {
        (r.doc_id, r.score)
        for r in diff.filter(F.col("_change_type") == "delete").collect()
    }
    assert rows == {(i, DEFAULT) for i in range(10)}

    feed, end = cur.poll()
    frows = {
        (r.doc_id, r.score)
        for r in feed.filter(F.col("_change_type") == "delete").collect()
    }
    assert frows == {(i, DEFAULT) for i in range(10)}
    cur.ack(end)


def test_replication_materializes_the_default(spark, vtable, tmp_path):
    from rottnest_spark.sources.changes import IcebergChangesCursor, sync_table
    from rottnest_spark.sources.delta_write import delta_convert
    from rottnest_spark.sources.writable import DeltaWritableLake

    dst = str(tmp_path / "dst")
    spark.createDataFrame(
        [], "doc_id long, body string, score long"
    ).coalesce(1).write.parquet(dst)
    delta_convert(dst)
    dlake = DeltaWritableLake(spark, dst, dst + "_idx")
    cur = IcebergChangesCursor(spark, vtable, str(tmp_path / "ck"))
    while sync_table(cur, dlake, "doc_id") is not None:
        pass
    got = _scores(dlake.read())
    assert got[0] == DEFAULT and got[99] == DEFAULT
    assert got[100] == 100 and got[101] is None


def test_index_paths_refuse_loudly(spark, vtable):
    from rottnest_spark.indices.exact import ExactIndex

    lake = IcebergSnapshotLake(spark, vtable, vtable + "_ix")
    with pytest.raises(ValueError, match="initial-default"):
        lake.build_index(ExactIndex(), "doc_id")
    with pytest.raises(ValueError, match="initial-default"):
        lake.files  # top-K / copy-on-write file listing refuses too
    with pytest.raises(ValueError, match="initial-default"):
        lake._search_files()  # the predicate-search hook


def test_write_default_only_is_fully_supported(spark, tmp_path):
    """write-default is writer-side per the spec — a table carrying only
    it reads AND indexes (the round-7 refusal covered both defaults)."""
    out = str(tmp_path / "wd")
    spark.range(50).selectExpr(
        "id AS doc_id", "concat('d', id) AS body"
    ).coalesce(1).write.parquet(out)
    iceberg_convert(out)
    meta = os.path.join(out, "metadata")
    metas = sorted(f for f in os.listdir(meta) if f.endswith(".metadata.json"))
    md = json.loads(open(os.path.join(meta, metas[-1])).read())
    md["format-version"] = 3
    md["schema"]["fields"][1]["write-default"] = "x"
    if "schemas" in md:
        md["schemas"] = [{**md["schema"], "schema-id": 0}]
    v = len(metas) + 10
    with open(os.path.join(meta, f"v{v}.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write(str(v))

    assert initial_default_fields(md) == {}
    from rottnest_spark.indices.exact import ExactIndex

    lake = IcebergSnapshotLake(spark, out, out + "_i")
    assert lake.read().count() == 50
    lake.build_index(ExactIndex(), "doc_id")
    assert lake.search(ExactIndex(), "doc_id", 5).count() == 1


def test_canonical_schemas_form_surfaces_defaults(spark, tmp_path):
    """Metadata in the spec-canonical form a real v3 engine writes —
    `schemas` + `current-schema-id`, NO deprecated `schema` key. The
    round-8 reader read only the legacy key, so defaults (and every
    dependent refusal guard) silently vanished on such tables."""
    out = str(tmp_path / "canon")
    spark.range(20).selectExpr(
        "id AS doc_id", "concat('d', id) AS body"
    ).coalesce(1).write.parquet(out)
    iceberg_convert(out)
    _upgrade_v3(
        out,
        {
            "id": 100,
            "name": "score",
            "required": False,
            "type": "long",
            "initial-default": DEFAULT,
        },
        canonical=True,
    )
    from rottnest_spark.sources.iceberg import _current_metadata

    md = _current_metadata(out)
    assert "schema" not in md and md["current-schema-id"] == 5
    assert initial_default_fields(md) == {"score": (DEFAULT, "bigint")}
    got = _scores(IcebergSnapshotLake(spark, out, out + "_i").read())
    assert got == {i: DEFAULT for i in range(20)}
    # and the dependent guard fires again too
    from rottnest_spark.indices.exact import ExactIndex

    with pytest.raises(ValueError, match="initial-default"):
        IcebergSnapshotLake(spark, out, out + "_i2").build_index(
            ExactIndex(), "doc_id"
        )


def test_typed_defaults_fill(spark, tmp_path):
    """Appendix-D single-value serialization: date / timestamp(ntz) /
    timestamptz / decimal / uuid / fixed defaults all fill as TYPED
    literals, not strings."""
    import datetime
    from decimal import Decimal

    out = str(tmp_path / "typed")
    spark.range(10).selectExpr(
        "id AS doc_id", "concat('d', id) AS body"
    ).coalesce(1).write.parquet(out)
    iceberg_convert(out)
    _upgrade_v3(
        out,
        {"id": 100, "name": "d", "required": False, "type": "date",
         "initial-default": "2024-03-15"},
        {"id": 101, "name": "ts", "required": False, "type": "timestamp",
         "initial-default": "2017-11-16T22:31:08.000001"},
        {"id": 102, "name": "tstz", "required": False,
         "type": "timestamptz",
         "initial-default": "2017-11-16T22:31:08.000001+00:00"},
        {"id": 103, "name": "price", "required": False,
         "type": "decimal(10, 2)", "initial-default": "19.99"},
        {"id": 104, "name": "u", "required": False, "type": "uuid",
         "initial-default": "f79c3e09-677c-4bbd-a479-3f349cb785d7"},
        {"id": 105, "name": "fx", "required": False, "type": "fixed[2]",
         "initial-default": "00ff"},
    )
    df = IcebergSnapshotLake(spark, out, out + "_i").read()
    types = dict(df.dtypes)
    assert types["d"] == "date"
    assert types["ts"] == "timestamp_ntz"
    assert types["tstz"] == "timestamp"
    assert types["price"] == "decimal(10,2)"
    assert types["fx"] == "binary"
    r = df.orderBy("doc_id").first()
    assert r.d == datetime.date(2024, 3, 15)
    assert r.ts == datetime.datetime(2017, 11, 16, 22, 31, 8, 1)
    # session tz is UTC, so the collected naive datetime IS the instant
    assert r.tstz == datetime.datetime(2017, 11, 16, 22, 31, 8, 1)
    assert r.price == Decimal("19.99")
    assert r.u == "f79c3e09-677c-4bbd-a479-3f349cb785d7"
    assert r.fx == b"\x00\xff"


def test_unsupported_default_type_refuses(spark, vtable):
    _upgrade_v3(
        vtable,
        {
            "id": 101,
            "name": "t_of_day",
            "required": False,
            "type": "time",  # Spark has no TIME column type — must refuse
            "initial-default": "22:31:08.000001",
        },
    )
    lake = IcebergSnapshotLake(spark, vtable, vtable + "_i2")
    with pytest.raises(ValueError, match="initial-default"):
        lake.read().count()


def test_parse_default_refusals():
    from rottnest_spark.sources.iceberg import _parse_default

    with pytest.raises(ValueError, match="UTC offset"):
        _parse_default("x", "timestamptz", "2017-11-16T22:31:08")
    with pytest.raises(ValueError, match="refusing"):
        _parse_default("x", "timestamp_ns", "2017-11-16T22:31:08.000000001")
    with pytest.raises(ValueError, match="refusing"):
        _parse_default("x", "time", "22:31:08")
    # malformed nested serializations refuse (round 10: nested defaults
    # FILL now — the refusal narrowed from 'any nested' to 'malformed')
    from rottnest_spark.sources.iceberg import _nested_default_column

    with pytest.raises(ValueError, match="keys"):
        _nested_default_column(
            "m",
            {"type": "map", "key": "string", "value": "int"},
            {"wrong": []},
        )
    with pytest.raises(ValueError, match="keys vs"):
        _nested_default_column(
            "m",
            {"type": "map", "key": "string", "value": "int"},
            {"keys": ["a"], "values": []},
        )


NESTED_STRUCT = {
    "id": 110,
    "name": "meta",
    "required": False,
    "type": {
        "type": "struct",
        "fields": [
            {"id": 201, "name": "a", "type": "int", "required": False},
            {"id": 202, "name": "b", "type": "string", "required": False},
            {"id": 203, "name": "c", "type": "double", "required": False},
        ],
    },
    # spec Appendix D: struct single-value JSON is keyed by FIELD ID;
    # id 203 omitted -> that member fills null
    "initial-default": {"201": 3, "202": "x"},
}
NESTED_LIST = {
    "id": 111,
    "name": "tags",
    "required": False,
    "type": {
        "type": "list",
        "element-id": 301,
        "element": "long",
        "element-required": False,
    },
    "initial-default": [1, 2, 3],
}
NESTED_MAP = {
    "id": 112,
    "name": "attrs",
    "required": False,
    "type": {
        "type": "map",
        "key-id": 401,
        "key": "string",
        "value-id": 402,
        "value": "int",
        "value-required": False,
    },
    "initial-default": {"keys": ["p", "q"], "values": [1, 2]},
}


def test_nested_defaults_fill(spark, vtable):
    """struct/list/map initial-defaults (round 10, spec Appendix D
    single-value JSON): every row of a table whose files physically lack
    the nested columns surfaces the default; an omitted struct field id
    fills null inside the struct."""
    _upgrade_v3(vtable, NESTED_STRUCT, NESTED_LIST, NESTED_MAP)
    lake = IcebergSnapshotLake(spark, vtable, vtable + "_in")
    rows = lake.read().select("doc_id", "meta", "tags", "attrs").collect()
    assert len(rows) == 110
    for r in rows:
        assert (r.meta.a, r.meta.b, r.meta.c) == (3, "x", None)
        assert list(r.tags) == [1, 2, 3]
        assert dict(r.attrs) == {"p": 1, "q": 2}
    # the scalar default on the same table still fills pre-evolution only
    sc = {r.doc_id: r.score for r in lake.read().select("doc_id", "score").collect()}
    assert sc[0] == DEFAULT and sc[101] is None and sc[102] == 102


def test_nested_default_physical_rows_untouched(spark, tmp_path):
    """A later file CARRYING the struct physically — including an
    explicit null member — reads back verbatim while pre-evolution rows
    fill the default (the footer-grouped scan discipline extends to
    nested types)."""
    out = str(tmp_path / "v3n")
    spark.range(10).selectExpr("id AS doc_id", "concat('d', id) AS body") \
        .coalesce(1).write.parquet(out)
    iceberg_convert(out)
    new = spark.range(10, 14).selectExpr(
        "id AS doc_id",
        "concat('n', id) AS body",
        "named_struct('a', CASE WHEN id % 2 = 0 THEN cast(id AS int) "
        "ELSE cast(NULL AS int) END, 'b', 'phys', 'c', cast(id AS double)"
        ") AS meta",
    ).coalesce(1)
    stage = os.path.join(out, "evolved")
    new.write.parquet(stage)
    files = [
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    ]
    iceberg_commit(out, add=files)
    _upgrade_v3(out, NESTED_STRUCT)
    lake = IcebergSnapshotLake(spark, out, out + "_ix")
    got = {r.doc_id: r.meta for r in lake.read().select("doc_id", "meta").collect()}
    for i in range(10):
        assert (got[i].a, got[i].b, got[i].c) == (3, "x", None)
    assert (got[10].a, got[10].b, got[10].c) == (10, "phys", 10.0)
    assert (got[11].a, got[11].b, got[11].c) == (None, "phys", 11.0)
