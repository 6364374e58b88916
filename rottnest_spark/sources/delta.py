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


def delta_live_files(table_path: str) -> list[str]:
    """Replay the _delta_log: returns absolute paths of live data files."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"{table_path} has no _delta_log — not a Delta table")

    commits = sorted(glob.glob(os.path.join(log_dir, "*.json")))
    checkpoints = sorted(glob.glob(os.path.join(log_dir, "*.checkpoint.parquet")))

    live: set[str] = set()
    start_version = -1
    if checkpoints:
        import pyarrow.parquet as pq

        cp = checkpoints[-1]
        start_version = int(os.path.basename(cp).split(".")[0])
        tbl = pq.read_table(cp)
        cols = tbl.column_names
        if "add" in cols:
            for rec in tbl.column("add").to_pylist():
                if rec and rec.get("path"):
                    live.add(rec["path"])

    for c in commits:
        version = int(os.path.basename(c).split(".")[0])
        if version <= start_version:
            continue
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


class DeltaSnapshotLake(ParquetLake):
    """ParquetLake over the CURRENT Delta snapshot. `.files` replays the
    log on each access (the log is metadata-scale), so incremental builds
    and searches always see the latest snapshot."""

    def __init__(self, spark, table_path: str, index_dir: str, **kw):
        super().__init__(spark, table_path, index_dir, **kw)
        self._table_path = table_path

    @property
    def files(self) -> list[str]:
        return delta_live_files(self._table_path)
