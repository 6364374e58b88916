"""Iceberg REST catalog client — the reference's network-catalog path
(backends/iceberg.py:52-97 loads tables from Glue/REST catalogs via
pyiceberg's `load_catalog`), re-expressed directly over the PUBLIC Iceberg
REST Catalog OpenAPI spec (rest-catalog-open-api.yaml, apache/iceberg repo)
with nothing but stdlib urllib — pyiceberg is not in this environment and
is not needed: the catalog's only job here is answering "what is this
table's current TableMetadata", after which the existing snapshot-replay
machinery (sources/iceberg.py) takes over unchanged.

Endpoints used (all GET, spec section "Catalog API"):

    {uri}/v1/config?warehouse=W          -> {defaults, overrides}   (prefix)
    {uri}/v1/{prefix}/namespaces         -> {namespaces: [[...], ...]}
    {uri}/v1/{prefix}/namespaces/{ns}/tables          -> {identifiers}
    {uri}/v1/{prefix}/namespaces/{ns}/tables/{table}  -> LoadTableResult
        {"metadata-location": ..., "metadata": {TableMetadata...}}

Multi-level namespaces join with the spec's unit separator %1F. Auth is a
bearer token header when given (the spec's OAuth flows reduce to this for
a pre-issued token). The transport is injectable (`opener`) so tests run
against an in-process HTTP server or a plain fake — the same seam the
reference gets from pyiceberg's mockable catalog object.

Data access still goes through storage: the catalog serves METADATA only;
manifest lists, manifests and data files are read from `table_path` (the
local/s3a mount of the table's `location`), exactly as the storage-resolved
`IcebergSnapshotLake` does.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    _norm_uri,
    history_files_from_metadata,
    live_files_from_metadata,
)

#: spec: multi-level namespace parts joined by the 0x1F unit separator
NS_SEP = "\x1f"


class IcebergRestError(RuntimeError):
    """Catalog returned an error response (carries the HTTP status)."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class IcebergRestCommitConflict(IcebergRestError):
    """A commit requirement failed (HTTP 409) — another writer won the
    optimistic-concurrency race; re-plan against fresh metadata and
    retry. The spec calls this CommitFailedException: the commit is
    cleanly REJECTED, nothing was applied."""


def _default_opener(
    url: str, headers: dict, method: str = "GET", data: bytes | None = None
) -> tuple[int, bytes]:
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a body
        return e.code, e.read()


def _normalize_opener(opener):
    """Accept both opener generations: the original read-only
    `(url, headers)` signature keeps working for every GET route, and a
    4-arg `(url, headers, method, data)` opener unlocks commits. A 2-arg
    opener asked to POST refuses with a clear error instead of a
    TypeError from inside the transport."""
    import inspect

    try:
        n_params = len(inspect.signature(opener).parameters)
    except (TypeError, ValueError):  # builtins / C callables: assume new
        n_params = 4
    if n_params >= 4:
        return opener

    def wrapped(url, headers, method="GET", data=None):
        if method != "GET" or data is not None:
            raise IcebergRestError(
                0,
                "this catalog's opener is read-only (legacy 2-arg "
                "signature) — pass an opener(url, headers, method, data) "
                "to enable commits",
            )
        return opener(url, headers)

    return wrapped


class IcebergRestCatalog:
    """Thin read-path client for an Iceberg REST catalog.

    `opener(url, headers) -> (status, body_bytes)` is the whole transport
    surface; the default is urllib. `warehouse` is forwarded to /v1/config
    as the spec directs; a `prefix` returned in the config overrides is
    inserted into every subsequent route."""

    def __init__(
        self,
        uri: str,
        warehouse: str | None = None,
        token: str | None = None,
        opener=None,
    ):
        self.uri = uri.rstrip("/")
        self.warehouse = warehouse
        self._opener = _normalize_opener(opener or _default_opener)
        self._headers = {"Accept": "application/json"}
        if token:
            self._headers["Authorization"] = f"Bearer {token}"
        self._prefix: str | None = None  # resolved lazily from /v1/config

    # -- transport ----------------------------------------------------------

    def _request(
        self,
        method: str,
        route: str,
        query: dict | None = None,
        body: dict | None = None,
    ) -> dict:
        url = f"{self.uri}/v1/{route}"
        if query:
            url += "?" + urllib.parse.urlencode(query)
        headers = dict(self._headers)
        data = None
        if body is not None:
            data = json.dumps(body).encode()
            headers["Content-Type"] = "application/json"
        status, resp = self._opener(url, headers, method, data)
        if status == 404:
            raise IcebergRestError(404, f"not found: {route}")
        if not 200 <= status < 300:
            try:
                msg = json.loads(resp).get("error", {}).get("message", "")
            except (ValueError, AttributeError):
                msg = resp[:200].decode(errors="replace")
            if status == 409:
                raise IcebergRestCommitConflict(409, msg or route)
            raise IcebergRestError(status, msg or route)
        return json.loads(resp) if resp else {}

    def _get(self, route: str, query: dict | None = None) -> dict:
        return self._request("GET", route, query=query)

    def _route(self, route: str) -> str:
        if self.prefix:
            return f"{self.prefix}/{route}"
        return route

    @staticmethod
    def _ns_path(namespace: str | list[str]) -> str:
        parts = (
            namespace.split(".")
            if isinstance(namespace, str)
            else list(namespace)
        )
        return urllib.parse.quote(NS_SEP.join(parts), safe="")

    # -- catalog surface ----------------------------------------------------

    @property
    def prefix(self) -> str:
        if self._prefix is None:
            q = {"warehouse": self.warehouse} if self.warehouse else None
            cfg = self._get("config", q)
            merged = {**cfg.get("defaults", {}), **cfg.get("overrides", {})}
            self._prefix = merged.get("prefix", "")
        return self._prefix

    def list_namespaces(self) -> list[list[str]]:
        out = self._get(self._route("namespaces"))
        return [list(ns) for ns in out.get("namespaces", [])]

    def list_tables(self, namespace: str | list[str]) -> list[str]:
        out = self._get(
            self._route(f"namespaces/{self._ns_path(namespace)}/tables")
        )
        return [i["name"] for i in out.get("identifiers", [])]

    def load_table(self, identifier: str) -> dict:
        """LoadTableResult for `namespace.table` (last dot splits the table
        name; everything before is the — possibly multi-level — namespace).
        """
        ns, _, name = identifier.rpartition(".")
        if not ns:
            raise ValueError(
                f"identifier {identifier!r} must be namespace.table"
            )
        return self._get(
            self._route(
                f"namespaces/{self._ns_path(ns)}/tables/"
                f"{urllib.parse.quote(name, safe='')}"
            )
        )

    def table_metadata(self, identifier: str) -> dict:
        result = self.load_table(identifier)
        md = result.get("metadata")
        if md is None:
            raise IcebergRestError(
                500, f"LoadTableResult for {identifier} has no metadata"
            )
        return md

    def create_table(
        self,
        identifier: str,
        schema: dict,
        location: str | None = None,
        partition_spec: list[dict] | None = None,
        properties: dict | None = None,
    ) -> dict:
        """CreateTableRequest → LoadTableResult (the spec's createTable
        operation, POST on the namespace's tables route — completes the
        catalog lifecycle: create → commit_files → evolve → drop).
        `schema` is an iceberg struct JSON; `partition_spec` the spec's
        fields list (identity/bucket/truncate/temporal — the same
        structs iceberg_write commits). A name clash is HTTP 409 →
        IcebergRestCommitConflict."""
        ns, _, name = identifier.rpartition(".")
        if not ns:
            raise ValueError(
                f"identifier {identifier!r} must be namespace.table"
            )
        body: dict = {
            "name": name,
            "schema": {**schema, "schema-id": 0},
        }
        if location:
            body["location"] = location
        if partition_spec is not None:
            body["partition-spec"] = {
                "spec-id": 0,
                "fields": list(partition_spec),
            }
        if properties:
            body["properties"] = dict(properties)
        return self._request(
            "POST",
            self._route(f"namespaces/{self._ns_path(ns)}/tables"),
            body=body,
        )

    def drop_table(self, identifier: str, purge: bool = False) -> None:
        """dropTable (DELETE on the table route); `purge` forwards the
        spec's purgeRequested flag — whether DATA is deleted is the
        server's policy, the catalog entry is gone either way."""
        ns, _, name = identifier.rpartition(".")
        if not ns:
            raise ValueError(
                f"identifier {identifier!r} must be namespace.table"
            )
        self._request(
            "DELETE",
            self._route(
                f"namespaces/{self._ns_path(ns)}/tables/"
                f"{urllib.parse.quote(name, safe='')}"
            ),
            query={"purgeRequested": "true"} if purge else None,
        )

    def commit_table(
        self,
        identifier: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        """CommitTableRequest → CommitTableResponse (the spec's
        updateTable operation, POST on the table route — the reference
        commits its index catalog records through exactly this endpoint
        via pyiceberg transactions, backends/iceberg.py:214-242).

        `requirements` are assert-* structs ("assert-table-uuid",
        "assert-ref-snapshot-id", ...); `updates` are action structs
        ("add-snapshot", "set-snapshot-ref", ...). The SERVER owns the
        metadata file: it validates the requirements atomically, applies
        the updates, writes the new metadata location and returns
        {"metadata-location", "metadata"}. A failed requirement is
        HTTP 409 → IcebergRestCommitConflict (nothing applied; the
        manifests this commit wrote to storage become orphans, removable
        by vacuum)."""
        ns, _, name = identifier.rpartition(".")
        if not ns:
            raise ValueError(
                f"identifier {identifier!r} must be namespace.table"
            )
        body = {
            "identifier": {"namespace": ns.split("."), "name": name},
            "requirements": list(requirements),
            "updates": list(updates),
        }
        return self._request(
            "POST",
            self._route(
                f"namespaces/{self._ns_path(ns)}/tables/"
                f"{urllib.parse.quote(name, safe='')}"
            ),
            body=body,
        )


class IcebergRestLake(IcebergSnapshotLake):
    """ParquetLake over the current snapshot of a REST-catalog table.

    Metadata comes from the catalog (re-fetched on every `.files` access —
    metadata-scale, and exactly the freshness the storage-resolved lake
    gets from re-reading version-hint); manifests and data files are read
    from `table_path`, the mounted location of the table (defaults to the
    metadata's own `location`, which is correct whenever that URI is
    directly readable, e.g. file:/ in tests or s3a-mounted paths on a
    cluster)."""

    def __init__(
        self,
        spark,
        catalog: IcebergRestCatalog,
        identifier: str,
        index_dir: str,
        table_path: str | None = None,
        **kw,
    ):
        self.rest_catalog = catalog
        self.identifier = identifier
        if table_path is None:
            table_path = _norm_uri(
                catalog.table_metadata(identifier).get("location", "")
            )
            if not table_path:
                raise ValueError(
                    f"{identifier}: no table_path given and the catalog "
                    f"metadata has no location"
                )
        super().__init__(spark, table_path, index_dir, **kw)

    def _resolve_metadata(self) -> dict:
        """Catalog-served freshness: every snapshot resolution (`.files`,
        reads, merge-on-read search state) re-fetches the catalog's
        metadata instead of reading version-hint from storage. The base
        class applies the time-travel pin on top (_table_metadata)."""
        return self.rest_catalog.table_metadata(self.identifier)

    def commit_files(
        self,
        add: list[str] | None = None,
        remove: list[str] | None = None,
        timestamp_ms: int | None = None,
        **kw,
    ) -> int:
        """Commit a file change set THROUGH the catalog (round 11 —
        before this, catalog tables were read-only: a storage-side
        metadata swap left the catalog pointer stale). Plans against the
        catalog's CURRENT metadata, writes manifests + the manifest list
        to storage (the REST spec keeps those client-side), then sends
        add-snapshot + set-snapshot-ref guarded by assert-table-uuid and
        assert-ref-snapshot-id on `main` — so a concurrent committer
        loses with IcebergRestCommitConflict and nothing is applied.
        Returns the new snapshot id."""
        import re

        from rottnest_spark.sources.iceberg_write import iceberg_commit

        res = self.rest_catalog.load_table(self.identifier)
        md = res.get("metadata") or {}
        loc = res.get("metadata-location") or ""
        m = re.match(r"v?(\d+)", loc.rsplit("/", 1)[-1])
        # snapshot ids stay unique either way: the location version grows
        # monotonically under the server, snapshot ids are its successor
        version = (
            int(m.group(1))
            if m
            else max(
                [int(s.get("snapshot-id") or 0) for s in md.get("snapshots") or []]
                + [0]
            )
        )
        cur = md.get("current-snapshot-id")
        requirements: list[dict] = []
        if md.get("table-uuid"):
            requirements.append(
                {"type": "assert-table-uuid", "uuid": md["table-uuid"]}
            )
        req_ref: dict = {"type": "assert-ref-snapshot-id", "ref": "main"}
        if cur is not None and cur != -1:
            req_ref["snapshot-id"] = cur  # omitted = ref must not exist
        requirements.append(req_ref)

        def committer(new_md, snapshot, ver):
            self.rest_catalog.commit_table(
                self.identifier,
                requirements,
                [
                    {"action": "add-snapshot", "snapshot": snapshot},
                    {
                        "action": "set-snapshot-ref",
                        "ref-name": "main",
                        "type": "branch",
                        "snapshot-id": snapshot["snapshot-id"],
                    },
                ],
            )

        return iceberg_commit(
            self._table_path,
            add=add,
            remove=remove,
            fs=self.fs,
            timestamp_ms=timestamp_ms,
            prior_state=(version, md),
            committer=committer,
            **kw,
        )

    # -- schema evolution THROUGH the catalog (round 11) ---------------
    # The REST server owns the metadata document, so evolution is a
    # CommitTableRequest of spec update actions — add-schema (the new
    # schema, field ids preserved by the shared surgery in
    # iceberg_write) + set-current-schema(-1 = last added) — guarded by
    # assert-current-schema-id so a concurrent evolution loses with 409
    # and nothing is applied. Storage is never touched: the catalog
    # pointer can't go stale.

    def _commit_schema(
        self,
        surgery,
        last_column_id: int | None = None,
        format_version: int | None = None,
    ) -> dict:
        from rottnest_spark.sources.iceberg_write import next_schema_id

        md = self.rest_catalog.table_metadata(self.identifier)
        schema = surgery(md)
        cur_sid = int(md.get("current-schema-id") or 0)
        requirements: list[dict] = []
        if md.get("table-uuid"):
            requirements.append(
                {"type": "assert-table-uuid", "uuid": md["table-uuid"]}
            )
        requirements.append(
            {
                "type": "assert-current-schema-id",
                "current-schema-id": cur_sid,
            }
        )
        updates: list[dict] = []
        if format_version is not None and format_version > int(
            md.get("format-version") or 1
        ):
            updates.append(
                {
                    "action": "upgrade-format-version",
                    "format-version": format_version,
                }
            )
        add_schema: dict = {
            "action": "add-schema",
            "schema": {**schema, "schema-id": next_schema_id(md)},
        }
        if last_column_id is not None:
            add_schema["last-column-id"] = last_column_id
        updates.append(add_schema)
        updates.append({"action": "set-current-schema", "schema-id": -1})
        return self.rest_catalog.commit_table(
            self.identifier, requirements, updates
        )

    def rename_column(self, old: str, new: str) -> dict:
        """RENAME COLUMN (dot paths into structs supported) committed
        through the catalog. Returns the CommitTableResponse."""
        from rottnest_spark.sources.iceberg_write import (
            evolved_schema_rename,
        )

        return self._commit_schema(
            lambda md: evolved_schema_rename(md, old, new)
        )

    def drop_column(self, name: str) -> dict:
        from rottnest_spark.sources.iceberg_write import evolved_schema_drop

        return self._commit_schema(
            lambda md: evolved_schema_drop(md, name)
        )

    def update_column_type(self, name: str, new_type: str) -> dict:
        from rottnest_spark.sources.iceberg_write import (
            evolved_schema_promote,
        )

        return self._commit_schema(
            lambda md: evolved_schema_promote(md, name, new_type)
        )

    def add_column(
        self, name: str, ice_type, initial_default=None
    ) -> dict:
        """ADD COLUMN (dot paths supported) committed through the
        catalog; a default value upgrades format-version to 3 via the
        spec's upgrade-format-version action (defaults are v3-gated)."""
        from rottnest_spark.sources.iceberg_write import evolved_schema_add

        md = self.rest_catalog.table_metadata(self.identifier)
        _schema, last_id = evolved_schema_add(
            md, name, ice_type, initial_default
        )
        return self._commit_schema(
            lambda m: evolved_schema_add(m, name, ice_type, initial_default)[
                0
            ],
            last_column_id=last_id,
            format_version=3,
        )

    def commit_files_retry(
        self,
        add: list[str] | None = None,
        remove: list[str] | None = None,
        max_retries: int = 20,
        **kw,
    ) -> int:
        """Optimistic-concurrency wrapper over commit_files (the
        iceberg_commit_retry discipline for catalog commits): a 409 from
        the catalog means a concurrent writer won — re-plan against the
        now-fresh catalog metadata and retry. Pure adds retry blindly;
        removals are revalidated by iceberg_commit against the fresh
        snapshot (a removal that vanished raises rather than no-ops)."""
        last: Exception | None = None
        for _ in range(max_retries):
            try:
                return self.commit_files(add=add, remove=remove, **kw)
            except IcebergRestCommitConflict as exc:
                last = exc
        raise TimeoutError(
            f"could not commit through the catalog after {max_retries} "
            "conflict retries"
        ) from last

    def vacuum(
        self,
        live_files: set[str] | None = None,
        history_days: float | None = None,
        now_ms: int | None = None,
        orphan_min_age_sec: float = 0.0,
    ) -> list[str]:
        if history_days is not None:
            md = self.rest_catalog.table_metadata(self.identifier)
            live_files = set(
                history_files_from_metadata(
                    md, self._table_path, history_days, now_ms,
                    fs=self.fs,
                )
            )
        # skip IcebergSnapshotLake.vacuum: it would re-resolve from storage
        return super(IcebergSnapshotLake, self).vacuum(
            live_files=live_files, orphan_min_age_sec=orphan_min_age_sec
        )
