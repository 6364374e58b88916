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
as a single Parquet file with **atomic overwrite** (write temp + rename),
the analog of the reference's overwrite-with-lock metadata upload
(backends/s3_utils.py:83-109). Commit discipline for compaction is
append-then-delete (backends/iceberg.py:471-479): `replace()` writes the new
records before dropping the old ones in one atomic swap.

Concurrent writers: every mutation (append/replace/delete) runs its
read-modify-write under an exclusive flock on `.lock` in the catalog dir,
so two simultaneous `build_index` calls serialize instead of losing one
commit (the lock auto-releases on process death — no stale-lock states).
On platforms/stores without flock the lock degrades to best-effort; a
remote catalog should use its store's conditional-put instead.
"""

from __future__ import annotations

import contextlib
import datetime
import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

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


class IndexCatalog:
    def __init__(self, catalog_dir: str):
        self.catalog_dir = catalog_dir
        os.makedirs(catalog_dir, exist_ok=True)
        self.path = os.path.join(catalog_dir, "catalog.parquet")

    # -- read ---------------------------------------------------------------

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        return pq.read_table(self.path).to_pylist()

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
        the holder dies — no stale-lock recovery protocol needed."""
        fh = open(os.path.join(self.catalog_dir, ".lock"), "a+")
        locked = False
        try:
            try:
                import fcntl

                fcntl.flock(fh, fcntl.LOCK_EX)
                locked = True
            except (ImportError, OSError):
                pass  # non-POSIX: best-effort (see module docstring)
            yield
        finally:
            if locked:
                import fcntl

                fcntl.flock(fh, fcntl.LOCK_UN)
            fh.close()

    def _write(self, records: list[dict]) -> None:
        table = pa.Table.from_pylist(records, schema=CATALOG_SCHEMA)
        fd, tmp = tempfile.mkstemp(dir=self.catalog_dir, suffix=".parquet.tmp")
        os.close(fd)
        pq.write_table(table, tmp)
        os.replace(tmp, self.path)  # atomic on POSIX

    def append(self, record: dict) -> None:
        record = dict(record)
        record.setdefault(
            "created_at", datetime.datetime.now(datetime.timezone.utc).isoformat()
        )
        record.setdefault("config", "{}")
        record.setdefault(
            "rows_indexed", int(sum(record.get("record_counts", []) or [0]))
        )
        with self._locked():
            self._write(self.entries() + [record])

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
        with self._locked():
            covered = self.indexed_files(
                record["index_type"], record["column_name"]
            )
            keep = [
                i
                for i, f in enumerate(record["file_paths"])
                if f not in covered
            ]
            if not keep:
                return []
            record["file_paths"] = [record["file_paths"][i] for i in keep]
            record["record_counts"] = [
                record["record_counts"][i] for i in keep
            ]
            record["rows_indexed"] = int(sum(record["record_counts"]))
            self._write(self.entries() + [record])
            return list(record["file_paths"])

    def replace(self, new_records: list[dict], drop_index_names: set[str]) -> None:
        """Append-then-delete in one atomic swap (compaction commit)."""
        now = datetime.datetime.now(datetime.timezone.utc).isoformat()
        with self._locked():
            kept = [
                e
                for e in self.entries()
                if e["index_name"] not in drop_index_names
            ]
            for r in new_records:
                r = dict(r)
                r.setdefault("created_at", now)
                r.setdefault("config", "{}")
                kept.append(r)
            self._write(kept)

    def delete(self, index_names: set[str]) -> None:
        with self._locked():
            self._write(
                [e for e in self.entries() if e["index_name"] not in index_names]
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
