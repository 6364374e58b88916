"""Read-only Delta Lake snapshot listing — the S8 table-format backend
(reference backends/delta.py:12-96) without requiring delta-spark.

The Delta transaction log is public JSON: `_delta_log/NNNNNNNNNNNNNNNNNNNN.json`
commits containing `add`/`remove` actions (+ periodic parquet checkpoints).
For the index layer only ONE question matters: *which data files are live
in the current snapshot* — exactly what the reference's backend extracts
from its snapshot (delta.py:25-26). We replay add/remove over the JSON
commits; checkpoint parquet files are also consumed when present (they
compact earlier commits).

`DeltaSnapshotLake` re-reads the log on every `.files` access, so the L1
incremental plan (anti-join vs the catalog) naturally indexes ONLY newly
added files on the next build, and search never scans files that are
physically present but removed from the snapshot — Delta semantics the
plain directory listing cannot give.
"""

from __future__ import annotations

import glob
import json
import os

from rottnest_spark.core.lake import ParquetLake


def _checkpoint_parts(log_dir: str) -> tuple[int, list[str]]:
    """Locate the latest checkpoint: (version, parquet part files), or
    (-1, []) when the log has no checkpoint.

    `_last_checkpoint` is the authoritative pointer (Delta protocol —
    readers must not rely on listing); multi-part checkpoints are named
    `V.checkpoint.I.N.parquet`. Fails loudly on missing parts rather than
    returning an incomplete live set."""
    lc = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as fh:
            info = json.load(fh)
        v = int(info["version"])
        n_parts = int(info.get("parts") or 0)
        base = f"{v:020d}"
        if n_parts:
            files = [
                os.path.join(
                    log_dir,
                    f"{base}.checkpoint.{i + 1:010d}.{n_parts:010d}.parquet",
                )
                for i in range(n_parts)
            ]
        else:
            files = [os.path.join(log_dir, f"{base}.checkpoint.parquet")]
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise ValueError(
                f"_last_checkpoint points at version {v} but parts are "
                f"missing: {missing} — refusing to return a partial snapshot"
            )
        return v, files
    # no pointer: glob both single- and multi-part names, newest version
    found = glob.glob(os.path.join(log_dir, "*.checkpoint.parquet")) + glob.glob(
        os.path.join(log_dir, "*.checkpoint.*.*.parquet")
    )
    if not found:
        return -1, []
    by_ver: dict[int, list[str]] = {}
    for f in found:
        by_ver.setdefault(int(os.path.basename(f).split(".")[0]), []).append(f)
    v = max(by_ver)
    parts = sorted(by_ver[v])
    multi = [p for p in parts if len(os.path.basename(p).split(".")) == 5]
    if multi:
        expected = int(os.path.basename(multi[0]).split(".")[3])
        if len(multi) != expected:
            raise ValueError(
                f"checkpoint {v} has {len(multi)}/{expected} parts — "
                f"refusing to return a partial snapshot"
            )
    return v, parts


def delta_live_files(
    table_path: str, version_as_of: int | None = None
) -> list[str]:
    """Replay the _delta_log: returns absolute paths of live data files.

    `version_as_of` stops the replay at that commit (inclusive) — Delta
    time travel. Raises if the requested version precedes the earliest
    replayable state (a checkpoint hides older commits) or exceeds the
    log."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"{table_path} has no _delta_log — not a Delta table")

    commits = sorted(glob.glob(os.path.join(log_dir, "*.json")))

    live: set[str] = set()
    start_version, cp_files = _checkpoint_parts(log_dir)
    if version_as_of is not None:
        all_versions = {int(os.path.basename(c).split(".")[0]) for c in commits}
        if all_versions and version_as_of > max(all_versions):
            raise ValueError(
                f"versionAsOf {version_as_of} exceeds the log "
                f"(latest commit {max(all_versions)})"
            )
        if version_as_of < start_version:
            raise ValueError(
                f"versionAsOf {version_as_of} precedes the earliest "
                f"checkpoint ({start_version}) — older commits may have "
                f"been vacuumed; cannot reconstruct that snapshot"
            )
    if cp_files:
        import pyarrow.parquet as pq

        for cp in cp_files:
            tbl = pq.read_table(cp)
            if "add" in tbl.column_names:
                for rec in tbl.column("add").to_pylist():
                    if rec and rec.get("path"):
                        live.add(rec["path"])

    versions = {int(os.path.basename(c).split(".")[0]) for c in commits}
    if start_version < 0 and 0 not in versions:
        raise ValueError(
            f"{table_path}: commit 0 is absent and no checkpoint is "
            f"readable — the replay would miss earlier add actions"
        )

    for c in commits:
        version = int(os.path.basename(c).split(".")[0])
        if version <= start_version:
            continue
        if version_as_of is not None and version > version_as_of:
            break
        with open(c) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    live.add(action["add"]["path"])
                elif "remove" in action:
                    live.discard(action["remove"]["path"])
    return sorted(os.path.join(table_path, p) for p in live)


def delta_known_files(table_path: str) -> list[str]:
    """Every data file the log has EVER referenced (live + logically
    removed): the add actions of all commits and checkpoints, ignoring
    later removes. Writable lakes diff the physical dir against this set
    to find a rewrite's new files — a logically-removed file stays on
    disk (format semantics) and must never be mistaken for new."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"{table_path} has no _delta_log — not a Delta table")
    known: set[str] = set()
    _, cp_files = _checkpoint_parts(log_dir)
    if cp_files:
        import pyarrow.parquet as pq

        for cp in cp_files:
            tbl = pq.read_table(cp)
            for col in ("add", "remove"):
                if col in tbl.column_names:
                    for rec in tbl.column(col).to_pylist():
                        if rec and rec.get("path"):
                            known.add(rec["path"])
    for c in sorted(glob.glob(os.path.join(log_dir, "*.json"))):
        with open(c) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                for key in ("add", "remove"):
                    if key in action:
                        known.add(action[key]["path"])
    return sorted(os.path.join(table_path, p) for p in known)


class DeltaSnapshotLake(ParquetLake):
    """ParquetLake over a Delta snapshot. `.files` replays the log on each
    access (the log is metadata-scale), so incremental builds and searches
    always see the latest snapshot — or, with `version_as_of`, a pinned
    historical snapshot (time travel): searches then cover exactly that
    version's files, reusing whatever indexes apply and in-situ scanning
    the rest."""

    def __init__(
        self,
        spark,
        table_path: str,
        index_dir: str,
        version_as_of: int | None = None,
        **kw,
    ):
        super().__init__(spark, table_path, index_dir, **kw)
        self._table_path = table_path
        self._version_as_of = version_as_of

    @property
    def files(self) -> list[str]:
        return delta_live_files(self._table_path, self._version_as_of)
