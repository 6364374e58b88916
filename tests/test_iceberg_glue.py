"""AWS Glue catalog adapter: boto3-shaped replay client (recorded
GetTable/GetTables/GetDatabases responses, NextToken pagination), plus an
end-to-end lake whose snapshot advances when the Glue pointer swaps —
mirroring tests/test_iceberg_rest.py for the reference's default catalog
deployment (backends/iceberg.py:29-39)."""

import json

import pyspark.sql.functions as F
import pytest

from rottnest_spark.indices.substring import SubstringIndex
from rottnest_spark.sources.iceberg_glue import (
    IcebergGlueCatalog,
    IcebergGlueConflict,
    IcebergGlueError,
    IcebergGlueLake,
)
from rottnest_spark.sources.iceberg_write import iceberg_write

# reuse the spec-shaped table builders from the storage-backend tests
from test_iceberg import _mk_manifest, _mk_manifest_list, _write_metadata


class FakeGlueClient:
    """Replays boto3-shaped Glue responses; records every call."""

    def __init__(self, databases=None, tables=None):
        # tables: {db: [table-dicts]}; mutable so tests can swap pointers
        self.databases = databases or []
        self.tables = tables or {}
        self.calls = []

    class EntityNotFoundException(Exception):
        pass

    class ConcurrentModificationException(Exception):
        pass

    class AlreadyExistsException(Exception):
        pass

    def create_table(self, DatabaseName, TableInput, **kw):
        self.calls.append(("create_table", DatabaseName, TableInput["Name"]))
        if any(
            t["Name"] == TableInput["Name"]
            for t in self.tables.get(DatabaseName, [])
        ):
            raise self.AlreadyExistsException(TableInput["Name"])
        self.tables.setdefault(DatabaseName, []).append(
            {**TableInput, "VersionId": "1"}
        )
        return {}

    def delete_table(self, DatabaseName, Name, **kw):
        self.calls.append(("delete_table", DatabaseName, Name))
        before = len(self.tables.get(DatabaseName, []))
        self.tables[DatabaseName] = [
            t for t in self.tables.get(DatabaseName, []) if t["Name"] != Name
        ]
        if len(self.tables[DatabaseName]) == before:
            raise self.EntityNotFoundException(f"{DatabaseName}.{Name}")
        return {}

    def get_databases(self, NextToken=None, **kw):
        self.calls.append(("get_databases", NextToken))
        # two-page replay to exercise pagination
        if NextToken is None and len(self.databases) > 1:
            return {
                "DatabaseList": [{"Name": self.databases[0]}],
                "NextToken": "p2",
            }
        rest = self.databases[1:] if NextToken else self.databases
        return {"DatabaseList": [{"Name": d} for d in rest]}

    def get_tables(self, DatabaseName, NextToken=None, **kw):
        self.calls.append(("get_tables", DatabaseName))
        if DatabaseName not in self.tables:
            raise self.EntityNotFoundException(f"EntityNotFound {DatabaseName}")
        return {"TableList": self.tables[DatabaseName]}

    def get_table(self, DatabaseName, Name, **kw):
        self.calls.append(("get_table", DatabaseName, Name))
        for t in self.tables.get(DatabaseName, []):
            if t["Name"] == Name:
                return {"Table": t}
        raise self.EntityNotFoundException(
            f"EntityNotFound {DatabaseName}.{Name}"
        )

    def update_table(
        self, DatabaseName, TableInput, SkipArchive=None, VersionId=None, **kw
    ):
        """Glue UpdateTable semantics: passing VersionId enables the OCC
        check — a mismatch raises ConcurrentModificationException and
        applies nothing; a successful update bumps the stored VersionId."""
        self.calls.append(
            ("update_table", DatabaseName, TableInput.get("Name"), VersionId)
        )
        for i, t in enumerate(self.tables.get(DatabaseName, [])):
            if t["Name"] == TableInput["Name"]:
                cur_v = t.get("VersionId", "1")
                if VersionId is not None and VersionId != cur_v:
                    raise self.ConcurrentModificationException(
                        f"version {VersionId} != {cur_v}"
                    )
                self.tables[DatabaseName][i] = {
                    **t,
                    **TableInput,
                    "VersionId": str(int(cur_v) + 1),
                }
                return {}
        raise self.EntityNotFoundException(
            f"EntityNotFound {DatabaseName}.{TableInput['Name']}"
        )


def _glue_table(name, metadata_location, table_type="ICEBERG"):
    return {
        "Name": name,
        "VersionId": "1",
        "Parameters": {
            "table_type": table_type,
            "metadata_location": metadata_location,
        },
    }


def test_glue_catalog_surface(tmp_path):
    md_path = str(tmp_path / "v1.metadata.json")
    with open(md_path, "w") as fh:
        json.dump({"location": "file:///wh/t", "snapshots": []}, fh)
    client = FakeGlueClient(
        databases=["db", "other"],
        tables={
            "db": [
                _glue_table("t", md_path),
                _glue_table("hive_t", "", table_type="EXTERNAL_TABLE"),
            ]
        },
    )
    cat = IcebergGlueCatalog(client=client)
    assert cat.list_namespaces() == [["db"], ["other"]]  # paginated replay
    assert cat.list_tables("db") == ["t"]  # non-Iceberg filtered out
    assert cat.metadata_location("db.t") == md_path
    assert cat.table_metadata("db.t")["location"] == "file:///wh/t"
    assert ("get_databases", "p2") in client.calls  # NextToken drained


def test_glue_errors(tmp_path):
    client = FakeGlueClient(databases=["db"], tables={"db": []})
    cat = IcebergGlueCatalog(client=client)
    with pytest.raises(IcebergGlueError, match="not found"):
        cat.metadata_location("db.missing")
    with pytest.raises(ValueError, match="database.table"):
        cat.metadata_location("bare")
    # a Glue table that is not Iceberg must refuse, not misparse
    client.tables["db"] = [_glue_table("h", "x", table_type="EXTERNAL_TABLE")]
    with pytest.raises(IcebergGlueError, match="not ICEBERG"):
        cat.metadata_location("db.h")
    # Iceberg-typed but pointerless (mid-create) must refuse too
    client.tables["db"] = [
        {"Name": "p", "Parameters": {"table_type": "ICEBERG"}}
    ]
    with pytest.raises(IcebergGlueError, match="metadata_location"):
        cat.metadata_location("db.p")


@pytest.fixture()
def glue_table(spark, sf_dir, tmp_path):
    """Two-part physical table + a fake Glue catalog pointing at v1."""
    import glob as g
    import shutil

    table = tmp_path / "gtable"
    (table / "data").mkdir(parents=True)
    (table / "metadata").mkdir()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for i, cond in enumerate(["doc_id % 2 = 0", "doc_id % 2 = 1"]):
        docs.filter(cond).coalesce(1).write.parquet(str(table / f"_t{i}"))
        src = g.glob(str(table / f"_t{i}" / "*.parquet"))[0]
        shutil.move(src, str(table / "data" / f"part-{i:05d}.parquet"))
        shutil.rmtree(str(table / f"_t{i}"))
    meta = str(table / "metadata")
    m1 = _mk_manifest(meta, "m1.avro", [(1, "part-00000.parquet", 0)])
    ml1 = _mk_manifest_list(meta, "snap-1.avro", [m1])
    _write_metadata(meta, 1, 1, ml1)
    client = FakeGlueClient(
        databases=["db"],
        tables={"db": [_glue_table("evt", f"{meta}/v1.metadata.json")]},
    )
    return str(table), client, m1


def test_glue_lake_end_to_end(spark, glue_table, tmp_path):
    """Build → search ≡ oracle over Glue-resolved metadata; a pointer swap
    in Glue (the catalog commit) is picked up on the next access."""
    table, client, m1 = glue_table
    cat = IcebergGlueCatalog(client=client)
    lake = IcebergGlueLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    assert len(lake.files) == 1  # snapshot 1: only part 0
    idx = SubstringIndex()
    assert lake.build_index(idx, "text")
    docs = spark.read.parquet(f"{table}/data")
    q = "the"

    def oracle(df):
        return sorted(
            r["doc_id"]
            for r in df.filter(
                F.contains(F.lower("text"), F.lit(q))
            ).collect()
        )

    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    assert got == oracle(docs.filter("doc_id % 2 = 0"))

    # another engine commits snapshot 2 (both parts live) and swaps the
    # Glue pointer to v2.metadata.json — the catalog commit protocol
    meta = f"{table}/metadata"
    m2 = _mk_manifest(meta, "m2.avro", [(1, "part-00001.parquet", 0)])
    ml2 = _mk_manifest_list(meta, "snap-2.avro", [m1, m2])
    _write_metadata(meta, 2, 2, ml2)
    client.tables["db"] = [_glue_table("evt", f"{meta}/v2.metadata.json")]

    assert len(lake.files) == 2
    rep = lake.refresh_indices()
    assert rep["built"]  # incremental: indexes exactly the new file
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    assert got == oracle(docs)


def test_glue_lake_resolves_location(spark, glue_table, tmp_path):
    """Without table_path, the lake mounts the metadata's own location."""
    table, client, _m1 = glue_table
    meta = f"{table}/metadata"
    # metadata whose recorded location IS the readable path (no rebase)
    with open(f"{meta}/v1.metadata.json", "w") as fh:
        json.dump(
            {
                "format-version": 2,
                "location": table,
                "current-snapshot-id": None,
                "snapshots": [],
            },
            fh,
        )
    cat = IcebergGlueCatalog(client=client)
    lake = IcebergGlueLake(spark, cat, "db.evt", str(tmp_path / "idx2"))
    assert lake._table_path == table
    assert lake.files == []  # empty table: no snapshot yet


def test_glue_mor_read_uses_catalog_freshness(spark, glue_table, tmp_path):
    """A delete-bearing snapshot committed via the Glue pointer must be
    APPLIED even while storage's version-hint still points at v1 — every
    snapshot resolution (read, merge-on-read state) goes through the
    catalog's metadata, not the stale hint. The delete file records the
    data file under its ORIGINAL location (relocated-table shape), so
    the delete-pair rebase is exercised too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_iceberg import ORIG_LOC

    table, client, m1 = glue_table
    meta = f"{table}/metadata"
    # positional delete file for part-00000: first 3 row positions,
    # addressed by the ORIGINAL (pre-relocation) absolute path
    pq.write_table(
        pa.table(
            {
                "file_path": [f"{ORIG_LOC}/data/part-00000.parquet"] * 3,
                "pos": pa.array([0, 1, 2], pa.int64()),
            }
        ),
        f"{table}/data/del-1.parquet",
    )
    m_del = _mk_manifest(meta, "mdel.avro", [(1, "del-1.parquet", 1)])
    ml2 = _mk_manifest_list(
        meta, "snap-2.avro", [m1, m_del], contents=[0, 1]
    )
    _write_metadata(meta, 2, 2, ml2)
    # storage hint pinned BACK to v1 — only the catalog knows about v2
    with open(f"{meta}/version-hint.text", "w") as fh:
        fh.write("1")
    client.tables["db"] = [
        {
            "Name": "evt",
            "Parameters": {
                "table_type": "ICEBERG",
                "metadata_location": f"{meta}/v2.metadata.json",
            },
        }
    ]
    cat = IcebergGlueCatalog(client=client)
    lake = IcebergGlueLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    part0 = spark.read.parquet(f"{table}/data/part-00000.parquet")
    got = sorted(r.doc_id for r in lake.read().select("doc_id").collect())
    assert len(got) == part0.count() - 3
    # positions 0,1,2 of the FILE order are gone
    first3 = [r.doc_id for r in part0.limit(3).collect()]
    assert not (set(first3) & set(got))


def test_glue_commit_roundtrip(spark, glue_table, tmp_path):
    """Catalog COMMIT (round 11): commit_files writes the new metadata to
    storage, then swaps the Glue pointer under double OCC. The pointer
    re-read sees the new snapshot; a racing writer loses cleanly with
    nothing applied (neither pointer nor version-hint moved)."""
    from rottnest_spark.sources.iceberg_glue import IcebergGlueConflict

    table, client, _m1 = glue_table
    cat = IcebergGlueCatalog(client=client)
    lake = IcebergGlueLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    assert len(lake.files) == 1  # snapshot 1: only part 0
    docs = spark.read.parquet(f"{table}/data")

    snap = lake.commit_files(add=[f"{table}/data/part-00001.parquet"])
    # pointer swapped to v2 and the catalog-read metadata shows it
    loc = cat.metadata_location("db.evt")
    assert loc.endswith("v2.metadata.json")
    md = cat.table_metadata("db.evt")
    assert md["current-snapshot-id"] == snap
    prev = client.tables["db"][0]["Parameters"]["previous_metadata_location"]
    assert prev.endswith("v1.metadata.json")
    assert len(lake.files) == 2
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    q = "the"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(q))).collect()
    )
    assert got == want

    # planning-read OCC: the expected pointer moved -> clean refusal
    with pytest.raises(IcebergGlueConflict, match="moved"):
        cat.update_metadata_location(
            "db.evt", "x", expected_location="bogus-old-pointer"
        )
    assert cat.metadata_location("db.evt") == loc  # nothing applied


def test_glue_commit_version_id_race(spark, glue_table, tmp_path):
    """Glue's own VersionId check: a racer committing between our
    GetTable and UpdateTable raises ConcurrentModificationException,
    surfaced as IcebergGlueConflict — and the commit leaves no
    observable state change (version-hint never advanced)."""
    from rottnest_spark.sources.iceberg_glue import IcebergGlueConflict

    table, client, _m1 = glue_table

    class RacingClient(type(client)):
        """Serves a pre-race snapshot from get_table, then lets the racer
        win: VersionId bumps underneath before our update_table lands."""

        def get_table(self, DatabaseName, Name, **kw):
            out = super().get_table(DatabaseName, Name, **kw)
            snap = {"Table": dict(out["Table"])}
            for i, t in enumerate(self.tables.get(DatabaseName, [])):
                if t["Name"] == Name:
                    self.tables[DatabaseName][i] = {
                        **t,
                        "VersionId": str(int(t.get("VersionId", "1")) + 1),
                    }
            return snap

    racing = RacingClient(
        databases=["db"], tables={"db": list(client.tables["db"])}
    )
    cat = IcebergGlueCatalog(client=racing)
    lake = IcebergGlueLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    with open(f"{table}/metadata/version-hint.text") as fh:
        hint_before = fh.read()
    with pytest.raises(IcebergGlueConflict, match="concurrent commit won"):
        lake.commit_files(add=[f"{table}/data/part-00001.parquet"])
    with open(f"{table}/metadata/version-hint.text") as fh:
        assert fh.read() == hint_before  # loser never advanced the hint


def test_glue_commit_retry_wins_after_race(spark, glue_table, tmp_path):
    """commit_files_retry: the first attempt loses the VersionId race
    (a racer commits between GetTable and UpdateTable), the retry
    re-plans from the fresh pointer and lands — and the version number
    allocation skips the lost attempt's orphan metadata file instead of
    deadlocking on its own debris."""
    from rottnest_spark.sources.iceberg_glue import IcebergGlueCatalog

    table, client, _m1 = glue_table

    class RaceOnce(type(client)):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.raced = False

        def update_table(self, DatabaseName, TableInput, **kw):
            if not self.raced:
                self.raced = True
                raise self.ConcurrentModificationException("racer won")
            return super().update_table(DatabaseName, TableInput, **kw)

    racing = RaceOnce(
        databases=["db"], tables={"db": list(client.tables["db"])}
    )
    cat = IcebergGlueCatalog(client=racing)
    lake = IcebergGlueLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    snap = lake.commit_files_retry(
        add=[f"{table}/data/part-00001.parquet"]
    )
    assert racing.raced
    loc = cat.metadata_location("db.evt")
    # the retry skipped past the lost attempt's orphan: v3, not v2
    assert loc.endswith("v3.metadata.json")
    assert cat.table_metadata("db.evt")["current-snapshot-id"] == snap
    assert len(lake.files) == 2


def test_glue_schema_evolution_roundtrip(spark, glue_table, tmp_path):
    """Schema evolution THROUGH Glue (round 11 follow-through): the
    client writes the evolved vN.metadata.json to storage and swaps the
    pointer under double OCC — rename + add land, field ids preserved,
    reads through the catalog see the new schema, version-hint advances
    only after the swap."""
    table, client, _m1 = glue_table
    meta = f"{table}/metadata"
    with open(f"{meta}/v1.metadata.json") as fh:
        md = json.load(fh)
    md["schemas"] = [
        {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "doc_id", "required": False,
                 "type": "long"},
                {"id": 2, "name": "text", "required": False,
                 "type": "string"},
                {"id": 3, "name": "lang", "required": False,
                 "type": "string"},
                {"id": 4, "name": "source", "required": False,
                 "type": "string"},
                {"id": 5, "name": "n_chars", "required": False,
                 "type": "long"},
            ],
        }
    ]
    md["current-schema-id"] = 0
    md["last-column-id"] = 5
    with open(f"{meta}/v1.metadata.json", "w") as fh:
        json.dump(md, fh)

    cat = IcebergGlueCatalog(client=client)
    lake = IcebergGlueLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    docs = spark.read.parquet(f"{table}/data").filter("doc_id % 2 = 0")

    v = lake.rename_column("lang", "language")
    assert cat.metadata_location("db.evt").endswith(
        f"v{v}.metadata.json"
    )
    md2 = cat.table_metadata("db.evt")
    assert md2["current-schema-id"] == 1
    cur = next(
        s
        for s in md2["schemas"]
        if s["schema-id"] == md2["current-schema-id"]
    )
    assert next(
        g for g in cur["fields"] if g["name"] == "language"
    )["id"] == 3
    got = lake.read()
    assert "language" in got.columns and "lang" not in got.columns
    assert sorted(r.language for r in got.collect()) == sorted(
        r.lang for r in docs.collect()
    )

    v2 = lake.add_column("rev", "int", initial_default=3)
    md3 = cat.table_metadata("db.evt")
    assert md3["format-version"] == 3 and md3["last-column-id"] == 6
    got = IcebergGlueLake(
        spark, cat, "db.evt", str(tmp_path / "idx2"), table_path=table
    ).read()
    assert {r.rev for r in got.collect()} == {3}
    # version-hint tracks the last successful swap
    with open(f"{meta}/version-hint.text") as fh:
        assert int(fh.read()) == v2


def test_glue_create_and_drop_table(spark, tmp_path):
    """Full Glue lifecycle (round 11): storage writers create the
    table, create_table registers the pointer, the lake reads/searches
    through the catalog, commit_files advances it, drop_table removes
    the registration (storage untouched)."""
    work = str(tmp_path / "t")
    df = spark.range(40).selectExpr("id AS k", "concat('d', id) AS body")
    iceberg_write(df.repartition(2), work)
    with open(f"{work}/metadata/version-hint.text") as fh:
        v = int(fh.read())
    client = FakeGlueClient(databases=["db"], tables={"db": []})
    cat = IcebergGlueCatalog(client=client)
    cat.create_table("db.t2", f"{work}/metadata/v{v}.metadata.json")
    assert cat.list_tables("db") == ["t2"]
    lake = IcebergGlueLake(
        spark, cat, "db.t2", str(tmp_path / "ix"), table_path=work
    )
    assert lake.read().count() == 40
    # name clash refuses through the typed conflict
    with pytest.raises(IcebergGlueConflict, match="already exists"):
        cat.create_table("db.t2", "x")
    cat.drop_table("db.t2")
    assert cat.list_tables("db") == []
    # storage untouched — a re-register round-trips
    cat.create_table("db.t2", f"{work}/metadata/v{v}.metadata.json")
    assert (
        IcebergGlueLake(
            spark, cat, "db.t2", str(tmp_path / "ix2"), table_path=work
        )
        .read()
        .count()
        == 40
    )
