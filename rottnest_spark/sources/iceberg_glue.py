"""AWS Glue Data Catalog adapter for Iceberg tables — the reference's
DEFAULT catalog deployment (backends/iceberg.py:29-39 builds a pyiceberg
`load_catalog(.., type='glue', ..)` from CATALOG_NAME/CATALOG_AWS_REGION
env vars and loads every table through it).

Glue stores an Iceberg table as a Glue table whose ``Parameters`` carry
the public pyiceberg/Glue convention (documented in the Iceberg AWS
integration spec, iceberg.apache.org/docs/latest/aws):

    Parameters: {"table_type": "ICEBERG",
                 "metadata_location": "s3://.../metadata/v7.metadata.json"}

i.e. the catalog is a POINTER STORE: the current TableMetadata lives in
storage at `metadata_location`, and catalog commits swap the pointer.
So the adapter's whole job is (a) Glue API calls to fetch the pointer and
(b) one `fs.read_text` of the metadata JSON — after which the existing
snapshot-replay machinery (sources/iceberg.py) takes over unchanged,
exactly as it does for the REST catalog (sources/iceberg_rest.py).

The transport is injectable like the REST opener: `client` is any
boto3-shaped Glue client (``get_table`` / ``get_tables`` /
``get_databases``, NextToken pagination). Tests replay recorded response
dicts through a fake; production passes ``boto3.client("glue", ...)``
(boto3 is not in this container, so the default constructor gates the
import behind a clear error instead of requiring it at module load).
"""

from __future__ import annotations

import json

from rottnest_spark.core.fs import LakeFS, LocalFS
from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    _norm_uri,
    history_files_from_metadata,
    live_files_from_metadata,
)


class IcebergGlueError(RuntimeError):
    """Glue returned an error / a table that is not an Iceberg table."""


class IcebergGlueConflict(IcebergGlueError):
    """The optimistic pointer swap lost — either the metadata_location
    moved between the planning read and the commit, or Glue rejected the
    UpdateTable VersionId check (ConcurrentModificationException). The
    commit was cleanly rejected; re-plan against the fresh pointer."""


def _default_client(region: str | None):
    try:
        import boto3  # noqa: F401 — optional, absent in this container
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise IcebergGlueError(
            "boto3 is not installed — pass an explicit `client` (any "
            "object with get_table/get_tables/get_databases) or install "
            "boto3 for the real AWS Glue transport"
        ) from exc
    return boto3.client("glue", region_name=region)  # pragma: no cover


class IcebergGlueCatalog:
    """Read-path client for Iceberg tables registered in AWS Glue.

    `identifier` is ``database.table`` (Glue namespaces are single-level).
    `fs` reads the metadata JSON the catalog points at — LocalFS for
    tests, HadoopFS for s3:// locations on a cluster."""

    def __init__(
        self,
        region: str | None = None,
        client=None,
        fs: LakeFS | None = None,
        catalog_id: str | None = None,
    ):
        self._client = client if client is not None else _default_client(region)
        self.fs = fs or LocalFS()
        self.catalog_id = catalog_id  # cross-account catalogs

    # -- transport ----------------------------------------------------------

    def _call(self, op: str, **kwargs):
        if self.catalog_id:
            kwargs["CatalogId"] = self.catalog_id
        fn = getattr(self._client, op)
        try:
            return fn(**kwargs)
        except Exception as exc:
            name = type(exc).__name__
            if "EntityNotFound" in name or "NotFound" in str(exc):
                raise IcebergGlueError(f"not found: {kwargs}") from exc
            raise

    def _paged(self, op: str, list_key: str, **kwargs):
        """Drain NextToken pagination (Glue pages at 100 entries)."""
        token = None
        while True:
            page = self._call(
                op, **({**kwargs, "NextToken": token} if token else kwargs)
            )
            yield from page.get(list_key, [])
            token = page.get("NextToken")
            if not token:
                return

    # -- catalog surface ------------------------------------------------

    def list_namespaces(self) -> list[list[str]]:
        return [
            [d["Name"]] for d in self._paged("get_databases", "DatabaseList")
        ]

    def list_tables(self, namespace: str) -> list[str]:
        """Iceberg tables in a Glue database (non-Iceberg Glue tables —
        hive/csv — are filtered out by the table_type parameter)."""
        out = []
        for t in self._paged(
            "get_tables", "TableList", DatabaseName=namespace
        ):
            params = t.get("Parameters") or {}
            if params.get("table_type", "").upper() == "ICEBERG":
                out.append(t["Name"])
        return out

    @staticmethod
    def _split(identifier: str) -> tuple[str, str]:
        db, _, name = identifier.rpartition(".")
        if not db:
            raise ValueError(
                f"identifier {identifier!r} must be database.table"
            )
        return db, name

    def metadata_location(self, identifier: str) -> str:
        """The current metadata pointer — one GetTable call."""
        db, name = self._split(identifier)
        table = self._call("get_table", DatabaseName=db, Name=name).get(
            "Table", {}
        )
        params = table.get("Parameters") or {}
        if params.get("table_type", "").upper() != "ICEBERG":
            raise IcebergGlueError(
                f"{identifier}: Glue table_type is "
                f"{params.get('table_type')!r}, not ICEBERG"
            )
        loc = params.get("metadata_location")
        if not loc:
            raise IcebergGlueError(
                f"{identifier}: Glue parameters carry no metadata_location"
            )
        return loc

    def table_metadata(self, identifier: str) -> dict:
        """Current TableMetadata: pointer from Glue, JSON from storage."""
        return json.loads(
            self.fs.read_text(_norm_uri(self.metadata_location(identifier)))
        )

    def update_metadata_location(
        self,
        identifier: str,
        new_location: str,
        expected_location: str | None = None,
    ) -> None:
        """Commit = pointer swap (the Iceberg/Glue convention the
        reference rides through pyiceberg's GlueCatalog): UpdateTable
        with Parameters.metadata_location moved to `new_location` and
        previous_metadata_location recording the old pointer, OCC'd two
        ways — `expected_location` guards the pointer read this commit
        PLANNED against, and the GetTable VersionId is passed to
        UpdateTable so Glue itself rejects a racing writer with
        ConcurrentModificationException. Either loss raises
        IcebergGlueConflict; nothing is applied."""
        db, name = self._split(identifier)
        table = self._call("get_table", DatabaseName=db, Name=name).get(
            "Table", {}
        )
        params = dict(table.get("Parameters") or {})
        cur = params.get("metadata_location")
        if expected_location is not None and cur != expected_location:
            raise IcebergGlueConflict(
                f"{identifier}: metadata_location moved ({cur!r}, planned "
                f"against {expected_location!r}) — a concurrent commit won"
            )
        params["metadata_location"] = new_location
        if cur:
            params["previous_metadata_location"] = cur
        # TableInput accepts a subset of the Table shape; carry what the
        # existing registration set so the swap touches only the pointer
        table_input = {
            k: table[k]
            for k in (
                "Name",
                "Description",
                "Owner",
                "TableType",
                "StorageDescriptor",
                "PartitionKeys",
            )
            if k in table
        }
        table_input["Name"] = name
        table_input["Parameters"] = params
        kwargs: dict = {
            "DatabaseName": db,
            "TableInput": table_input,
            "SkipArchive": True,
        }
        if table.get("VersionId") is not None:
            kwargs["VersionId"] = table["VersionId"]
        try:
            self._call("update_table", **kwargs)
        except IcebergGlueError:
            raise
        except Exception as exc:
            if "ConcurrentModification" in type(exc).__name__ or (
                "ConcurrentModification" in str(exc)
            ):
                raise IcebergGlueConflict(
                    f"{identifier}: Glue UpdateTable version check lost "
                    f"— a concurrent commit won"
                ) from exc
            raise


    def create_table(
        self,
        identifier: str,
        metadata_location: str,
    ) -> None:
        """Register an Iceberg table in Glue pointing at an existing
        metadata JSON (the Glue convention: CreateTable with
        table_type=ICEBERG + Parameters.metadata_location — how every
        engine registers Glue Iceberg tables; the metadata document
        itself is written by the storage writers first). A name clash
        surfaces as IcebergGlueConflict."""
        db, name = self._split(identifier)
        try:
            self._call(
                "create_table",
                DatabaseName=db,
                TableInput={
                    "Name": name,
                    "TableType": "EXTERNAL_TABLE",
                    "Parameters": {
                        "table_type": "ICEBERG",
                        "metadata_location": metadata_location,
                    },
                },
            )
        except IcebergGlueError:
            raise
        except Exception as exc:
            if "AlreadyExists" in type(exc).__name__ or (
                "AlreadyExists" in str(exc)
            ):
                raise IcebergGlueConflict(
                    f"{identifier}: table already exists in Glue"
                ) from exc
            raise

    def drop_table(self, identifier: str) -> None:
        """Remove the Glue registration (DeleteTable) — storage is
        untouched; vacuum/fs cleanup is the caller's policy."""
        db, name = self._split(identifier)
        self._call("delete_table", DatabaseName=db, Name=name)


class IcebergGlueLake(IcebergSnapshotLake):
    """ParquetLake over the current snapshot of a Glue-cataloged Iceberg
    table — the Glue twin of IcebergRestLake: `.files` re-fetches the
    metadata pointer on every access (one GetTable + one metadata-JSON
    read, both metadata-scale), so incremental builds and searches track
    catalog commits made by any other engine."""

    def __init__(
        self,
        spark,
        catalog: IcebergGlueCatalog,
        identifier: str,
        index_dir: str,
        table_path: str | None = None,
        **kw,
    ):
        self.glue_catalog = catalog
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
        reads, merge-on-read search state) re-fetches the Glue pointer
        instead of reading version-hint from storage. The base class
        applies the time-travel pin on top (_table_metadata)."""
        return self.glue_catalog.table_metadata(self.identifier)

    def commit_files(
        self,
        add: list[str] | None = None,
        remove: list[str] | None = None,
        timestamp_ms: int | None = None,
        **kw,
    ) -> int:
        """Commit a file change set THROUGH Glue (round 11 — before
        this, catalog tables were read-only: a storage-side metadata
        swap left the Glue pointer stale). Glue is a pointer store, so
        unlike REST the CLIENT writes the new vN.metadata.json to
        storage (exclusive-create claims the version against racing
        storage writers), then swaps the catalog pointer with double
        OCC (expected pointer + UpdateTable VersionId). Order matters:
        the version-hint advances only AFTER the swap succeeds, so a
        lost race leaves one orphan metadata file (vacuum-able) and no
        observable state change. Returns the new snapshot id."""
        import os
        import re

        from rottnest_spark.sources.iceberg_write import (
            _latest_metadata,
            _meta_dir,
            canon_path,
            iceberg_commit,
        )

        pointer = self.glue_catalog.metadata_location(self.identifier)
        md = json.loads(self.glue_catalog.fs.read_text(_norm_uri(pointer)))
        m = re.match(r"v?(\d+)", pointer.rsplit("/", 1)[-1])
        pv = (
            int(m.group(1))
            if m
            else max(
                [int(s.get("snapshot-id") or 0) for s in md.get("snapshots") or []]
                + [0]
            )
        )
        # version allocation takes the MAX of the pointer's version and
        # storage's newest metadata file: a LOST swap leaves our vN+1 as
        # an orphan in storage, and re-claiming that same name would
        # deadlock every retry on its own debris. The metadata CONTENT
        # still comes from the catalog pointer (authoritative).
        storage_v, _ = _latest_metadata(self._table_path, self.fs)
        version = max(pv, storage_v)
        fs = self.fs

        def committer(new_md, snapshot, ver):
            meta_dir = _meta_dir(self._table_path)
            fs.makedirs(meta_dir)
            md_path = os.path.join(meta_dir, f"v{ver}.metadata.json")
            fs.create_exclusive(md_path, json.dumps(new_md).encode())
            self.glue_catalog.update_metadata_location(
                self.identifier,
                canon_path(md_path),
                expected_location=pointer,
            )
            fs.write_text(
                os.path.join(meta_dir, "version-hint.text"), str(ver)
            )

        return iceberg_commit(
            self._table_path,
            add=add,
            remove=remove,
            fs=fs,
            timestamp_ms=timestamp_ms,
            prior_state=(version, md),
            committer=committer,
            **kw,
        )

    # -- schema evolution THROUGH Glue (round 11) ----------------------
    # Glue is a pointer store, so evolution = the same client-side
    # metadata write + double-OCC pointer swap as commit_files, carrying
    # an evolved-schema metadata document (shared surgery with the
    # storage writers — iceberg_write.evolved_schema_*). A lost swap
    # leaves one vacuum-able orphan metadata file and no observable
    # state change.

    def _commit_evolved(self, out_md_fn) -> int:
        import os
        import re

        from rottnest_spark.sources.iceberg_write import (
            _latest_metadata,
            _meta_dir,
            canon_path,
        )

        pointer = self.glue_catalog.metadata_location(self.identifier)
        md = json.loads(self.glue_catalog.fs.read_text(_norm_uri(pointer)))
        m = re.match(r"v?(\d+)", pointer.rsplit("/", 1)[-1])
        pv = int(m.group(1)) if m else 0
        storage_v, _ = _latest_metadata(self._table_path, self.fs)
        version = max(pv, storage_v) + 1
        out = out_md_fn(md)
        fs = self.fs
        meta_dir = _meta_dir(self._table_path)
        fs.makedirs(meta_dir)
        md_path = os.path.join(meta_dir, f"v{version}.metadata.json")
        fs.create_exclusive(md_path, json.dumps(out).encode())
        self.glue_catalog.update_metadata_location(
            self.identifier, canon_path(md_path), expected_location=pointer
        )
        fs.write_text(
            os.path.join(meta_dir, "version-hint.text"), str(version)
        )
        return version

    def rename_column(self, old: str, new: str) -> int:
        """RENAME COLUMN (dot paths into structs supported) committed
        through the Glue pointer swap. Returns the metadata version."""
        from rottnest_spark.sources.iceberg_write import (
            _evolved_metadata,
            evolved_schema_rename,
        )

        return self._commit_evolved(
            lambda md: _evolved_metadata(
                md, evolved_schema_rename(md, old, new), None
            )
        )

    def drop_column(self, name: str) -> int:
        from rottnest_spark.sources.iceberg_write import (
            _evolved_metadata,
            evolved_schema_drop,
        )

        return self._commit_evolved(
            lambda md: _evolved_metadata(
                md, evolved_schema_drop(md, name), None
            )
        )

    def update_column_type(self, name: str, new_type: str) -> int:
        from rottnest_spark.sources.iceberg_write import (
            _evolved_metadata,
            evolved_schema_promote,
        )

        return self._commit_evolved(
            lambda md: _evolved_metadata(
                md, evolved_schema_promote(md, name, new_type), None
            )
        )

    def add_column(self, name: str, ice_type, initial_default=None) -> int:
        from rottnest_spark.sources.iceberg_write import (
            _evolved_metadata,
            evolved_schema_add,
        )

        def build(md):
            schema, last_id = evolved_schema_add(
                md, name, ice_type, initial_default
            )
            out = _evolved_metadata(md, schema, None)
            out["last-column-id"] = last_id
            out["format-version"] = max(
                3, int(md.get("format-version") or 1)
            )
            return out

        return self._commit_evolved(build)

    def commit_files_retry(
        self,
        add: list[str] | None = None,
        remove: list[str] | None = None,
        max_retries: int = 20,
        **kw,
    ) -> int:
        """OCC wrapper over commit_files: a lost race surfaces either as
        IcebergGlueConflict (pointer moved / VersionId rejected) or as
        FileExistsError (the WINNER already claimed our vN+1 metadata
        filename before we reached the swap) — both mean re-plan from
        the fresh pointer and retry. Removals are revalidated by
        iceberg_commit against the fresh snapshot each attempt."""
        last: Exception | None = None
        for _ in range(max_retries):
            try:
                return self.commit_files(add=add, remove=remove, **kw)
            except (IcebergGlueConflict, FileExistsError) as exc:
                last = exc
        raise TimeoutError(
            f"could not commit through Glue after {max_retries} "
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
            md = self.glue_catalog.table_metadata(self.identifier)
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
