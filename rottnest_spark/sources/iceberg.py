"""Read-only Apache Iceberg snapshot listing — the reference's PRIMARY
catalog backend (backends/iceberg.py:52-493) re-expressed over the public
Iceberg table spec, without pyiceberg (not in this environment).

Only one question matters to the index layer: *which data files are live in
the current snapshot*. The spec's answer:

    metadata/vN.metadata.json  →  current-snapshot-id + snapshot list
    snapshot.manifest-list     →  Avro file listing manifest files
    manifest (Avro)            →  entries (status, data_file{file_path,...})

Avro decoding is the hand-rolled spec codec in `avro_lite` (schema-driven,
reads manifests written by any engine; null/deflate codecs).

Safety refusals, mirroring the reference:
- tables with DELETE files (v2 row-level deletes) are refused outright —
  an index over files with un-applied deletes would return ghost rows
  (reference backends/iceberg.py:279-280 raises on delete_files);
- unreadable manifest lists / unknown codecs raise instead of returning a
  partial live set.

Path relocation: metadata records absolute URIs under the table's original
`location`; tables are routinely copied/mounted elsewhere, so paths are
rebased onto the actual table directory (file:// URIs normalized).
"""

from __future__ import annotations

import glob
import json
import os
import re

from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.sources.avro_lite import read_ocf


def _norm_uri(p: str) -> str:
    return re.sub(r"^file:/+", "/", p)


def _rebase(path: str, location: str, table_path: str) -> str:
    """Map a metadata-recorded absolute path onto the actual table dir."""
    path, location = _norm_uri(path), _norm_uri(location).rstrip("/")
    if location and path.startswith(location + "/"):
        return os.path.join(table_path, path[len(location) + 1 :])
    if os.path.isabs(path) and os.path.exists(path):
        return path
    return os.path.join(table_path, path.lstrip("/"))


def _current_metadata(table_path: str) -> dict:
    meta_dir = os.path.join(table_path, "metadata")
    if not os.path.isdir(meta_dir):
        raise ValueError(
            f"{table_path} has no metadata/ dir — not an Iceberg table"
        )
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        cand = [
            os.path.join(meta_dir, f"v{v}.metadata.json"),
            os.path.join(meta_dir, f"{v}.metadata.json"),
        ]
        for c in cand:
            if os.path.exists(c):
                with open(c) as fh:
                    return json.load(fh)
        raise ValueError(
            f"version-hint.text names version {v} but no matching "
            f"metadata.json exists"
        )
    files = glob.glob(os.path.join(meta_dir, "*.metadata.json"))
    if not files:
        raise ValueError(f"{meta_dir} has no *.metadata.json")

    def _ver(f: str) -> int:
        m = re.match(r"v?(\d+)", os.path.basename(f))
        return int(m.group(1)) if m else -1

    with open(max(files, key=_ver)) as fh:
        return json.load(fh)


def iceberg_live_files(table_path: str) -> list[str]:
    """Absolute paths of the data files live in the CURRENT snapshot."""
    md = _current_metadata(table_path)
    location = md.get("location", "")
    snap_id = md.get("current-snapshot-id")
    snaps = md.get("snapshots", [])
    if snap_id in (None, -1) or not snaps:
        return []  # empty table: no snapshot yet
    by_id = {s["snapshot-id"]: s for s in snaps}
    if snap_id not in by_id:
        raise ValueError(
            f"current-snapshot-id {snap_id} not in the snapshot list"
        )
    snap = by_id[snap_id]

    manifests: list[tuple[str, int]] = []  # (path, content)
    if "manifest-list" in snap:
        ml_path = _rebase(snap["manifest-list"], location, table_path)
        _, entries = read_ocf(ml_path)
        for e in entries:
            manifests.append((e["manifest_path"], int(e.get("content") or 0)))
    else:  # v1 tables may inline "manifests"
        manifests = [(p, 0) for p in snap.get("manifests", [])]

    delete_manifests = [p for p, content in manifests if content != 0]
    if delete_manifests:
        # reference backends/iceberg.py:279-280: refuse tables with deletes
        raise ValueError(
            f"table has delete manifests ({len(delete_manifests)}) — "
            f"row-level deletes are not supported; compact the table first"
        )

    live: list[str] = []
    for mpath, _ in manifests:
        _, entries = read_ocf(_rebase(mpath, location, table_path))
        for e in entries:
            status = int(e.get("status") or 0)  # 0 existing, 1 added, 2 deleted
            if status == 2:
                continue
            df = e["data_file"]
            if int(df.get("content") or 0) != 0:
                raise ValueError(
                    f"manifest {mpath} contains a delete file "
                    f"({df.get('file_path')}) — row-level deletes are not "
                    f"supported; compact the table first"
                )
            live.append(_rebase(df["file_path"], location, table_path))
    return sorted(set(live))


class IcebergSnapshotLake(ParquetLake):
    """ParquetLake over the CURRENT Iceberg snapshot. `.files` re-resolves
    the snapshot on each access (metadata-scale), so incremental builds
    index exactly the new snapshot's delta and searches never scan files
    that are physically present but dropped from the snapshot."""

    def __init__(self, spark, table_path: str, index_dir: str, **kw):
        super().__init__(spark, table_path, index_dir, **kw)
        self._table_path = table_path

    @property
    def files(self) -> list[str]:
        return iceberg_live_files(self._table_path)
