"""Iceberg REST catalog adapter: route construction / prefix / auth header
against a fake transport, plus an end-to-end lake over a REAL in-process
HTTP server serving a spec-shaped table (reference loads REST/Glue catalogs
via pyiceberg, backends/iceberg.py:52-97 — here the client speaks the
public REST OpenAPI spec directly)."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pyspark.sql.functions as F
import pytest

from rottnest_spark.indices.substring import SubstringIndex
from rottnest_spark.sources.iceberg_rest import (
    NS_SEP,
    IcebergRestCatalog,
    IcebergRestError,
    IcebergRestLake,
)

# reuse the spec-shaped table builders from the storage-backend tests
from test_iceberg import _mk_manifest, _mk_manifest_list, _write_metadata


class FakeOpener:
    """Records requests; replies from a route->payload dict."""

    def __init__(self, routes):
        self.routes = routes
        self.calls = []

    def __call__(self, url, headers):
        self.calls.append((url, headers))
        path = url.split("://", 1)[1].split("/", 1)[1]
        if path in self.routes:
            return 200, json.dumps(self.routes[path]).encode()
        return 404, b'{"error": {"message": "nope"}}'


def test_prefix_and_auth_and_routes():
    ns = urllib.parse.quote(NS_SEP.join(["a", "b"]), safe="")
    routes = {
        "v1/config?warehouse=wh": {"overrides": {"prefix": "pfx"}},
        "v1/pfx/namespaces": {"namespaces": [["a", "b"]]},
        f"v1/pfx/namespaces/{ns}/tables": {
            "identifiers": [{"namespace": ["a", "b"], "name": "t"}]
        },
        f"v1/pfx/namespaces/{ns}/tables/t": {
            "metadata-location": "x",
            "metadata": {"location": "file:///wh/t", "snapshots": []},
        },
    }
    op = FakeOpener(routes)
    cat = IcebergRestCatalog(
        "http://cat.example", warehouse="wh", token="sekrit", opener=op
    )
    assert cat.list_namespaces() == [["a", "b"]]
    assert cat.list_tables("a.b") == ["t"]
    md = cat.table_metadata("a.b.t")
    assert md["location"] == "file:///wh/t"
    # every request carried the bearer token; config fetched exactly once
    assert all(h["Authorization"] == "Bearer sekrit" for _, h in op.calls)
    assert sum("config" in u for u, _ in op.calls) == 1


def test_errors():
    op = FakeOpener({"v1/config": {}})
    cat = IcebergRestCatalog("http://cat.example", opener=op)
    with pytest.raises(IcebergRestError) as ei:
        cat.load_table("ns.missing")
    assert ei.value.status == 404
    with pytest.raises(ValueError):  # identifier without a namespace
        cat.load_table("bare")


def _serve_catalog(state):
    """In-process REST catalog: serves /v1/config and the load-table route
    for `db.evt`, reading current metadata from the mutable `state` dict.
    POST on the table route implements the spec's updateTable operation:
    requirements validated atomically (a failure is 409 and NOTHING is
    applied), add-snapshot / set-snapshot-ref updates applied to the
    server-owned metadata, new metadata-location returned."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, status, body):
            data = json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            path = urllib.parse.unquote(self.path.split("?")[0])
            if path == "/v1/config":
                body = {"defaults": {}, "overrides": {}}
            elif path == "/v1/namespaces/db/tables/evt":
                body = {
                    "metadata-location": f"inmem-{state.get('mloc_v', 1)}",
                    "metadata": state["metadata"],
                }
            elif path.startswith("/v1/namespaces/db/tables/") and path.rsplit(
                "/", 1
            )[-1] in state.get("extra", {}):
                name = path.rsplit("/", 1)[-1]
                body = {
                    "metadata-location": f"inmem-{name}",
                    "metadata": state["extra"][name],
                }
            else:
                self.send_response(404)
                self.end_headers()
                return
            self._send(200, body)

        def do_DELETE(self):
            path = urllib.parse.unquote(self.path.split("?")[0])
            name = path.rsplit("/", 1)[-1]
            if name in state.get("extra", {}):
                del state["extra"][name]
                self.send_response(204)
                self.end_headers()
                return
            self.send_response(404)
            self.end_headers()

        def do_POST(self):
            path = urllib.parse.unquote(self.path.split("?")[0])
            if path == "/v1/namespaces/db/tables":
                # createTable: materialize minimal metadata server-side
                n = int(self.headers.get("Content-Length") or 0)
                req = json.loads(self.rfile.read(n))
                name = req["name"]
                if name == "evt" or name in state.get("extra", {}):
                    self._send(
                        409,
                        {"error": {"message": f"{name} already exists"}},
                    )
                    return
                md = {
                    "format-version": 2,
                    "location": req.get("location", f"inmem://{name}"),
                    "schemas": [req["schema"]],
                    "current-schema-id": int(
                        req["schema"].get("schema-id") or 0
                    ),
                    "schema": req["schema"],
                    "current-snapshot-id": -1,
                    "snapshots": [],
                    "properties": req.get("properties", {}),
                }
                if req.get("partition-spec"):
                    md["partition-specs"] = [req["partition-spec"]]
                    md["default-spec-id"] = int(
                        req["partition-spec"].get("spec-id") or 0
                    )
                    md["partition-spec"] = req["partition-spec"]["fields"]
                state.setdefault("extra", {})[name] = md
                self._send(
                    200,
                    {"metadata-location": f"inmem-{name}", "metadata": md},
                )
                return
            if path != "/v1/namespaces/db/tables/evt":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length") or 0)
            req = json.loads(self.rfile.read(n))
            md = state["metadata"]
            cur = md.get("current-snapshot-id")
            for r in req.get("requirements", []):
                ok = True
                if (
                    r.get("type") == "assert-ref-snapshot-id"
                    and r.get("ref") == "main"
                ):
                    want = r.get("snapshot-id")
                    ok = (
                        want == cur
                        if want is not None
                        else cur in (None, -1)
                    )
                elif r.get("type") == "assert-table-uuid":
                    ok = not md.get("table-uuid") or (
                        r.get("uuid") == md["table-uuid"]
                    )
                elif r.get("type") == "assert-current-schema-id":
                    ok = int(r.get("current-schema-id") or 0) == int(
                        md.get("current-schema-id") or 0
                    )
                if not ok:
                    self._send(
                        409,
                        {"error": {"message": f"requirement failed: {r}"}},
                    )
                    return
            new = dict(md)
            last_added_sid = None
            for up in req.get("updates", []):
                if up.get("action") == "add-snapshot":
                    new["snapshots"] = list(new.get("snapshots") or []) + [
                        up["snapshot"]
                    ]
                elif up.get("action") == "set-snapshot-ref":
                    new["current-snapshot-id"] = up["snapshot-id"]
                elif up.get("action") == "upgrade-format-version":
                    new["format-version"] = up["format-version"]
                elif up.get("action") == "add-schema":
                    sch = dict(up["schema"])
                    have = list(new.get("schemas") or [])
                    if not have and new.get("schema", {}).get("fields"):
                        have = [
                            {
                                **new["schema"],
                                "schema-id": int(
                                    new["schema"].get("schema-id") or 0
                                ),
                            }
                        ]
                    sid = int(sch.get("schema-id") or 0)
                    if any(
                        int(s.get("schema-id") or 0) == sid for s in have
                    ):
                        sid = (
                            max(
                                int(s.get("schema-id") or 0) for s in have
                            )
                            + 1
                        )  # server may reassign the id
                    sch["schema-id"] = sid
                    new["schemas"] = have + [sch]
                    last_added_sid = sid
                    if up.get("last-column-id") is not None:
                        new["last-column-id"] = up["last-column-id"]
                elif up.get("action") == "set-current-schema":
                    sid = up["schema-id"]
                    if sid == -1:
                        if last_added_sid is None:
                            self._send(
                                409,
                                {
                                    "error": {
                                        "message": "set-current-schema -1 "
                                        "without add-schema"
                                    }
                                },
                            )
                            return
                        sid = last_added_sid
                    new["current-schema-id"] = sid
                    new["schema"] = next(
                        s
                        for s in new.get("schemas") or []
                        if int(s.get("schema-id") or 0) == int(sid)
                    )
            state["metadata"] = new
            state["mloc_v"] = state.get("mloc_v", 1) + 1
            self._send(
                200,
                {
                    "metadata-location": f"inmem-{state['mloc_v']}",
                    "metadata": new,
                },
            )

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


@pytest.fixture()
def rest_table(spark, sf_dir, tmp_path):
    """Two-part physical table + a live HTTP catalog serving its metadata."""
    import glob as g
    import shutil

    table = tmp_path / "rtable"
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
    with open(f"{meta}/v1.metadata.json") as fh:
        state = {"metadata": json.load(fh)}
    srv = _serve_catalog(state)
    yield str(table), state, f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_rest_lake_end_to_end(spark, rest_table, tmp_path):
    """Build → search ≡ oracle over catalog-served metadata; a snapshot
    advance on the SERVER is picked up without any local metadata read."""
    table, state, uri = rest_table
    cat = IcebergRestCatalog(uri)
    lake = IcebergRestLake(
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
            for r in df.filter(F.contains(F.lower("text"), F.lit(q))).collect()
        )

    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    assert got == oracle(docs.filter("doc_id % 2 = 0"))

    # server advances to snapshot 2 (both parts live)
    meta = f"{table}/metadata"
    m2 = _mk_manifest(meta, "m2.avro", [(1, "part-00001.parquet", 0)])
    ml2 = _mk_manifest_list(meta, "snap-2.avro", [m2])
    state["metadata"] = {
        **state["metadata"],
        "current-snapshot-id": 2,
        "snapshots": state["metadata"]["snapshots"]
        + [{"snapshot-id": 2, "manifest-list": ml2, "timestamp-ms": 2_000}],
    }
    # manifest m2 only ADDS part 1; snapshot 2 must also carry m1 forward
    ml2b = _mk_manifest_list(meta, "snap-2.avro", [m1_uri(meta), m2])
    state["metadata"]["snapshots"][-1]["manifest-list"] = ml2b

    assert len(lake.files) == 2
    rep = lake.refresh_indices()
    assert rep["built"]  # incremental: indexes exactly the new file
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    assert got == oracle(docs)


def m1_uri(meta):
    return "file:///warehouse/evt/metadata/m1.avro"


def test_rest_commit_roundtrip(spark, rest_table, tmp_path):
    """Catalog COMMIT (round 11): commit_files plans against the
    catalog's current metadata, writes manifests to storage, publishes
    via add-snapshot + set-snapshot-ref with assert requirements — the
    catalog pointer is never stale, re-reads see the new snapshot, and
    a stale-requirement commit loses cleanly with NOTHING applied."""
    table, state, uri = rest_table
    cat = IcebergRestCatalog(uri)
    lake = IcebergRestLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    assert len(lake.files) == 1  # snapshot 1: only part 0
    docs = spark.read.parquet(f"{table}/data")

    snap = lake.commit_files(add=[f"{table}/data/part-00001.parquet"])
    # the catalog-served metadata advanced: re-read sees the new snapshot
    md = cat.table_metadata("db.evt")
    assert md["current-snapshot-id"] == snap
    assert [s["snapshot-id"] for s in md["snapshots"]][-1] == snap
    assert len(lake.files) == 2
    q = "the"
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(q))).collect()
    )
    assert got == want

    # OCC: a commit whose requirement was planned against the OLD state
    # is rejected with 409 and applies nothing
    from rottnest_spark.sources.iceberg_rest import IcebergRestCommitConflict

    before = json.dumps(cat.table_metadata("db.evt"), sort_keys=True)
    with pytest.raises(IcebergRestCommitConflict):
        cat.commit_table(
            "db.evt",
            [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 1}],
            [
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "main",
                    "type": "branch",
                    "snapshot-id": 999,
                }
            ],
        )
    assert json.dumps(cat.table_metadata("db.evt"), sort_keys=True) == before

    # a REMOVE through the catalog: back to one live file
    gone = sorted(lake.files)[0]
    lake.commit_files(remove=[gone])
    assert len(lake.files) == 1


def test_rest_readonly_opener_refuses_commit():
    """A legacy 2-arg opener keeps every GET route working but refuses
    POST with a clear error instead of a transport TypeError."""
    ns = urllib.parse.quote(NS_SEP.join(["a", "b"]), safe="")
    op = FakeOpener(
        {
            "v1/config": {},
            f"v1/namespaces/{ns}/tables/t": {
                "metadata-location": "x",
                "metadata": {"location": "file:///wh/t", "snapshots": []},
            },
        }
    )
    cat = IcebergRestCatalog("http://cat.example", opener=op)
    assert cat.table_metadata("a.b.t")["location"] == "file:///wh/t"
    with pytest.raises(IcebergRestError, match="read-only"):
        cat.commit_table("a.b.t", [], [])


def test_rest_lake_resolves_location(spark, rest_table, tmp_path):
    """Without table_path, the lake mounts the metadata's own location
    (correct whenever that URI is directly readable)."""
    table, state, uri = rest_table
    # metadata whose recorded location IS the readable path (no rebase)
    state["metadata"] = {
        "format-version": 2,
        "location": table,
        "current-snapshot-id": None,
        "snapshots": [],
    }
    cat = IcebergRestCatalog(uri)
    lake = IcebergRestLake(spark, cat, "db.evt", str(tmp_path / "idx2"))
    assert lake._table_path == table
    assert lake.files == []  # empty table: no snapshot yet


def test_rest_commit_retry_wins_after_conflict(spark, rest_table, tmp_path):
    """commit_files_retry: the first POST is rejected with 409 (injected
    at the transport), the retry re-plans against fresh metadata and
    lands — the discipline of iceberg_commit_retry, catalog edition."""
    table, state, uri = rest_table
    fail_once = {"n": 0}

    def opener(url, headers, method="GET", data=None):
        import urllib.request

        if method == "POST" and fail_once["n"] == 0:
            fail_once["n"] += 1
            return 409, b'{"error": {"message": "injected conflict"}}'
        req = urllib.request.Request(
            url, data=data, headers=headers, method=method
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()

    cat = IcebergRestCatalog(uri, opener=opener)
    lake = IcebergRestLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    snap = lake.commit_files_retry(
        add=[f"{table}/data/part-00001.parquet"]
    )
    assert fail_once["n"] == 1  # lost exactly once
    assert cat.table_metadata("db.evt")["current-snapshot-id"] == snap
    assert len(lake.files) == 2


DOC_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "text", "required": False, "type": "string"},
        {"id": 3, "name": "lang", "required": False, "type": "string"},
        {"id": 4, "name": "source", "required": False, "type": "string"},
        {"id": 5, "name": "n_chars", "required": False, "type": "long"},
    ],
}


def test_rest_schema_evolution_roundtrip(spark, rest_table, tmp_path):
    """Schema evolution THROUGH the catalog (round 11 follow-through —
    the COVERAGE.md 'evolution on a catalog table goes through storage'
    limitation removed): rename/add commit as add-schema +
    set-current-schema update actions guarded by
    assert-current-schema-id; the server owns the metadata, storage is
    never touched, and a stale-schema commit loses with 409 applying
    NOTHING."""
    table, state, uri = rest_table
    state["metadata"] = {
        **state["metadata"],
        "schemas": [DOC_SCHEMA],
        "current-schema-id": 0,
        "table-uuid": "u-evolve",
        "last-column-id": 5,
    }
    cat = IcebergRestCatalog(uri)
    lake = IcebergRestLake(
        spark, cat, "db.evt", str(tmp_path / "idx"), table_path=table
    )
    docs = spark.read.parquet(f"{table}/data").filter("doc_id % 2 = 0")

    lake.rename_column("lang", "language")
    md = cat.table_metadata("db.evt")
    assert md["current-schema-id"] == 1
    cur = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    f = next(g for g in cur["fields"] if g["name"] == "language")
    assert f["id"] == 3  # field id preserved
    got = lake.read()
    assert "language" in got.columns and "lang" not in got.columns
    assert sorted(r.language for r in got.collect()) == sorted(
        r.lang for r in docs.collect()
    )

    # ADD with a default upgrades format-version via the update action
    lake.add_column("rev", "int", initial_default=7)
    md = cat.table_metadata("db.evt")
    assert md["format-version"] == 3
    assert md["last-column-id"] == 6
    got = IcebergRestLake(
        spark, cat, "db.evt", str(tmp_path / "idx2"), table_path=table
    ).read()
    assert {r.rev for r in got.collect()} == {7}

    # OCC: an evolution planned against a STALE schema id loses with
    # 409 and nothing is applied
    import json as _json

    from rottnest_spark.sources.iceberg_rest import (
        IcebergRestCommitConflict,
    )

    before = _json.dumps(cat.table_metadata("db.evt"), sort_keys=True)
    with pytest.raises(IcebergRestCommitConflict):
        cat.commit_table(
            "db.evt",
            [{"type": "assert-current-schema-id", "current-schema-id": 0}],
            [
                {"action": "add-schema", "schema": DOC_SCHEMA},
                {"action": "set-current-schema", "schema-id": -1},
            ],
        )
    assert (
        _json.dumps(cat.table_metadata("db.evt"), sort_keys=True) == before
    )

    # nested surgery shares the storage writers' validation
    with pytest.raises(ValueError, match="does not exist"):
        lake.drop_column("nope")


def test_rest_create_and_drop_table(spark, rest_table, tmp_path):
    """Catalog lifecycle completion (round 11): createTable registers a
    new table (CreateTableRequest with schema + optional spec), loads
    round-trip, a name clash is a 409 conflict, dropTable removes it."""
    table, state, uri = rest_table
    cat = IcebergRestCatalog(uri)
    res = cat.create_table(
        "db.t9",
        DOC_SCHEMA,
        location=f"file://{table}",
        partition_spec=[
            {
                "name": "lang",
                "transform": "identity",
                "source-id": 3,
                "field-id": 1000,
            }
        ],
        properties={"owner": "tests"},
    )
    md = res["metadata"]
    assert md["schemas"][0]["fields"][0]["name"] == "doc_id"
    assert md["default-spec-id"] == 0
    # loadable after create
    got = cat.table_metadata("db.t9")
    assert got["properties"] == {"owner": "tests"}
    # clash → typed conflict, nothing changed
    from rottnest_spark.sources.iceberg_rest import (
        IcebergRestCommitConflict,
    )

    with pytest.raises(IcebergRestCommitConflict):
        cat.create_table("db.t9", DOC_SCHEMA)
    with pytest.raises(IcebergRestCommitConflict):
        cat.create_table("db.evt", DOC_SCHEMA)
    cat.drop_table("db.t9")
    from rottnest_spark.sources.iceberg_rest import IcebergRestError

    with pytest.raises(IcebergRestError, match="not found"):
        cat.load_table("db.t9")
