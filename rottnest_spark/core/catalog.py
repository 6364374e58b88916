"""Index catalog — one record per index, mirroring the reference's catalog
schema (backends/parquet.py:162-172 / backends/iceberg.py:216-226):

    index_name     unique name of the index build ("{name}.lava" analog)
    index_type     'substring' | 'exact' | 'bm25' | 'vector' | 'logcloud' | ...
    column_name    indexed column
    index_path     directory holding the index DataFrame(s) as Parquet
    file_paths     list of data files covered by this index
    record_counts  rows per covered file (for binpack / compaction planning)
    rows_indexed   total rows covered
    created_at     ISO timestamp (informational)
    config         JSON string of build knobs (tokenizer choice etc. — the
                   analog of serializing the tokenizer into the .lava header,
                   src/lava/tokenizer_utils.rs:14-80)

Invariant (backends/delta.py:9-10): each data file is covered by at most one
index of a given (index_type, column_name). Enforced by the planner's
anti-join; `validate()` re-checks it.

The catalog is tiny (one row per index file group), so it lives driver-side
as Parquet snapshots with a **rename-free versioned commit**: each mutation
publishes `catalog.{N}.parquet` via the FS's atomic put-if-absent
(`create_exclusive`) and readers take the highest N — the analog of the
reference's overwrite-with-lock metadata upload (backends/s3_utils.py:
83-109), made object-store safe (S3 has no atomic rename; conditional PUT
is native). Commit discipline for compaction is append-then-delete
(backends/iceberg.py:471-479): `replace()` writes the new records before
dropping the old ones in one atomic snapshot swap.

Concurrent writers: every mutation (append/replace/delete) runs its
read-modify-write under an exclusive flock on `.lock` in the catalog dir,
so two simultaneous `build_index` calls serialize instead of losing one
commit (the lock auto-releases on process death — no stale-lock states).
On platforms/stores without flock, the version claim itself is the OCC:
a losing writer's `create_exclusive` raises and the mutation re-reads and
retries (`_rmw`).
"""

from __future__ import annotations

import contextlib
import datetime
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

class ConcurrentCatalogWrite(RuntimeError):
    """Another writer claimed the catalog version this commit targeted
    (possible only on stores without flock serialization). Mutations
    retry their read-modify-write automatically."""


CATALOG_SCHEMA = pa.schema(
    [
        ("index_name", pa.string()),
        ("index_type", pa.string()),
        ("column_name", pa.string()),
        ("index_path", pa.string()),
        ("file_paths", pa.list_(pa.string())),
        ("record_counts", pa.list_(pa.int64())),
        ("rows_indexed", pa.int64()),
        ("created_at", pa.string()),
        ("config", pa.string()),
    ]
)


#: versioned snapshots kept around after a commit (readers racing a commit
#: may hold the previous version's path; older ones are pruned)
KEEP_VERSIONS = 4


class IndexCatalog:
    """Commit protocol (RENAME-FREE — object-store safe): each mutation
    publishes a complete snapshot as `catalog.{N:020d}.parquet` via the
    FS's atomic put-if-absent (`create_exclusive`); readers take the
    highest N. S3 has no atomic rename, but conditional PUT is native —
    this is the same version-claim discipline as the Delta log writer
    (sources/delta_write.py), applied to the index catalog. A torn local
    write cannot publish (the exclusive create writes the full buffer or
    raises); on S3 a PUT is atomic per object. The flock still serializes
    local read-modify-writes; on a remote store the exclusive create IS
    the OCC — a losing writer's create raises and the mutation retries on
    the winner's snapshot."""

    def __init__(self, catalog_dir: str, fs=None):
        from rottnest_spark.core.fs import LocalFS

        self.fs = fs or LocalFS()
        self.catalog_dir = catalog_dir
        self.fs.makedirs(catalog_dir)
        # legacy single-file location (pre-versioning); read-supported,
        # superseded by the first versioned commit
        self.path = os.path.join(catalog_dir, "catalog.parquet")

    # -- read ---------------------------------------------------------------

    def _versions(self) -> list[tuple[int, str]]:
        out = []
        for p in self.fs.glob(os.path.join(self.catalog_dir, "catalog.*.parquet")):
            tag = os.path.basename(p).split(".")[1]
            if tag.isdigit():
                out.append((int(tag), p))
        return sorted(out)

    def _current_path(self) -> str | None:
        versions = self._versions()
        if versions:
            return versions[-1][1]
        if self.fs.exists(self.path):
            return self.path
        return None

    def entries(self) -> list[dict]:
        return self._read_state()[1]

    def _read_state(self) -> tuple[int, list[dict]]:
        """(base version, entries) in ONE consistent read — the version a
        mutation's snapshot derives from. OCC commits must claim exactly
        base+1 (see `_write`): recomputing the target version from a
        FRESH listing at write time would let a loser claim a new number
        with a stale snapshot and silently drop the winner's records."""
        versions = self._versions()
        if versions:
            v, cur = versions[-1]
        elif self.fs.exists(self.path):
            v, cur = 0, self.path  # legacy single-file catalog = version 0
        else:
            return 0, []
        return v, pq.read_table(
            pa.BufferReader(self.fs.read_bytes(cur))
        ).to_pylist()

    def entries_for(self, index_type: str, column_name: str) -> list[dict]:
        return [
            e
            for e in self.entries()
            if e["index_type"] == index_type and e["column_name"] == column_name
        ]

    def indexed_files(self, index_type: str, column_name: str) -> set[str]:
        out: set[str] = set()
        for e in self.entries_for(index_type, column_name):
            out.update(e["file_paths"])
        return out

    # -- write (atomic, serialized) -----------------------------------------

    @contextlib.contextmanager
    def _locked(self):
        """Exclusive inter-process lock over a read-modify-write: two
        concurrent mutators serialize instead of the later overwrite
        dropping the earlier commit. flock releases automatically when
        the holder dies — no stale-lock recovery protocol needed.

        The lock is a local-filesystem fast path only: on a remote
        catalog_dir (s3a:// via HadoopFS) there is no flock, so we skip
        straight to OCC-only mode — create_exclusive version claims in
        `_write` plus the mutators' re-read-and-retry loop remain the
        correctness mechanism; the lock merely avoids wasted retries."""
        from rottnest_spark.core.fs import LocalFS

        fh = None
        locked = False
        if isinstance(self.fs, LocalFS):
            try:
                fh = open(os.path.join(self.catalog_dir, ".lock"), "a+")
                import fcntl

                fcntl.flock(fh, fcntl.LOCK_EX)
                locked = True
            except (ImportError, OSError):
                pass  # non-POSIX / remote path: OCC-only (see docstring)
        try:
            yield
        finally:
            if locked:
                import fcntl

                fcntl.flock(fh, fcntl.LOCK_UN)
            if fh is not None:
                fh.close()

    def _write(
        self, records: list[dict], base_version: int | None = None
    ) -> None:
        table = pa.Table.from_pylist(records, schema=CATALOG_SCHEMA)
        buf = pa.BufferOutputStream()
        pq.write_table(table, buf)
        data = buf.getvalue().to_pybytes()
        versions = self._versions()
        if base_version is None:
            base_version = versions[-1][0] if versions else 0
        # claim exactly base+1: the snapshot was computed FROM
        # base_version, so any interleaved winner owns base+1 and this
        # create must fail — re-listing for a fresh number here would
        # commit the stale snapshot under a new version (lost update,
        # caught by the OCC-only object-store race test).
        next_v = base_version + 1
        dst = os.path.join(self.catalog_dir, f"catalog.{next_v:020d}.parquet")
        try:
            self.fs.create_exclusive(dst, data)
        except FileExistsError:
            # another writer claimed this version (store without flock);
            # surface the conflict; the mutators' OCC loop re-reads and
            # retries the whole read-modify-write.
            raise ConcurrentCatalogWrite(
                f"catalog version {next_v} claimed concurrently"
            )
        # prune: superseded versions + the legacy single file
        for v, p in versions[:-KEEP_VERSIONS]:
            try:
                self.fs.remove(p)
            except OSError:
                pass
        if self.fs.exists(self.path):
            try:
                self.fs.remove(self.path)
            except OSError:
                pass

    def _rmw(self, mutate, attempts: int = 64):
        """Read-modify-write with OCC retry: `mutate(entries) -> (records,
        result) | None` (None = nothing to write). Under flock the first
        attempt always wins; on no-flock stores a lost version claim
        re-reads and retries with jittered backoff (each conflict round
        has exactly one winner, so N racing writers need up to N rounds —
        the backoff keeps them from re-colliding in lockstep)."""
        import random
        import time

        with self._locked():
            for attempt in range(attempts):
                base_v, entries = self._read_state()
                out = mutate(entries)
                if out is None:
                    return None
                records, result = out
                try:
                    self._write(records, base_version=base_v)
                    return result
                except ConcurrentCatalogWrite:
                    time.sleep(random.uniform(0, min(0.005 * (attempt + 1), 0.1)))
                    continue
            raise ConcurrentCatalogWrite(
                f"catalog commit lost {attempts} consecutive version races"
            )

    def append(self, record: dict) -> None:
        record = dict(record)
        record.setdefault(
            "created_at", datetime.datetime.now(datetime.timezone.utc).isoformat()
        )
        record.setdefault("config", "{}")
        record.setdefault(
            "rows_indexed", int(sum(record.get("record_counts", []) or [0]))
        )
        self._rmw(lambda entries: (entries + [record], None))

    def commit_build(self, record: dict) -> list[str]:
        """Commit a build entry under the lock, dropping any file a
        CONCURRENT build of the same (type, column) already covered —
        the two-writer `build_index` race resolves to disjoint coverage
        instead of a validate() violation. Returns the files actually
        committed; [] means the entry lost the whole race (the caller's
        index dir becomes an orphan that vacuum() reclaims). Committing a
        subset is sound: the index data may cover extra files, but plans
        only trust `file_paths`, and surplus candidates are filtered by
        the live-file semi-join."""
        record = dict(record)
        record.setdefault(
            "created_at", datetime.datetime.now(datetime.timezone.utc).isoformat()
        )
        record.setdefault("config", "{}")

        def mutate(entries):
            covered: set[str] = set()
            for e in entries:
                if (
                    e["index_type"] == record["index_type"]
                    and e["column_name"] == record["column_name"]
                ):
                    covered.update(e["file_paths"])
            keep = [
                i
                for i, f in enumerate(record["file_paths"])
                if f not in covered
            ]
            if not keep:
                return None
            rec = dict(record)
            rec["file_paths"] = [record["file_paths"][i] for i in keep]
            rec["record_counts"] = [record["record_counts"][i] for i in keep]
            rec["rows_indexed"] = int(sum(rec["record_counts"]))
            return entries + [rec], list(rec["file_paths"])

        return self._rmw(mutate) or []

    def replace(self, new_records: list[dict], drop_index_names: set[str]) -> None:
        """Append-then-delete in one atomic swap (compaction commit)."""
        now = datetime.datetime.now(datetime.timezone.utc).isoformat()

        def mutate(entries):
            kept = [
                e for e in entries if e["index_name"] not in drop_index_names
            ]
            for r in new_records:
                r = dict(r)
                r.setdefault("created_at", now)
                r.setdefault("config", "{}")
                kept.append(r)
            return kept, None

        self._rmw(mutate)

    def delete(self, index_names: set[str]) -> None:
        self._rmw(
            lambda entries: (
                [e for e in entries if e["index_name"] not in index_names],
                None,
            )
        )

    # -- invariants ----------------------------------------------------------

    def validate(self) -> None:
        """Each data file covered by ≤ 1 index per (type, column)."""
        seen: dict[tuple[str, str, str], str] = {}
        for e in self.entries():
            for f in e["file_paths"]:
                key = (e["index_type"], e["column_name"], f)
                if key in seen:
                    raise ValueError(
                        f"file {f} covered by both {seen[key]} and "
                        f"{e['index_name']} for {key[:2]}"
                    )
                seen[key] = e["index_name"]

    @staticmethod
    def config_json(**kwargs) -> str:
        return json.dumps(kwargs, sort_keys=True)
