"""DML on format-backed lakes — every ParquetLake mutation, committed to
the table-format transaction log.

`DeltaWritableLake` / `IcebergWritableLake` extend the snapshot lakes so
the FULL DML surface (`append`, `delete_matching`, `merge_into`,
`compact_files`, plus index lifecycle on top) runs against a Delta or
Iceberg table and lands as proper log commits readable by any
spec-conforming engine — closing the loop the writers
(sources/delta_write.py, sources/iceberg_write.py) opened.

How it works — the lake's mutations all funnel through two choke points:

- `append(df)` publishes new data files → override commits them as adds;
- every REWRITING op (compaction, copy-on-write merge, row-level delete)
  publishes its new files by atomic rename and then calls
  `_retire(replaced, pre_op)` → override commits ONE atomic
  add+remove action set: removals are the retired files, adds are the
  data files on disk that the log does not know yet (single-writer
  mutations make that diff exactly the op's new files — and it also
  self-heals a crash window where files were renamed in but the commit
  was lost).

Format semantics preserved:
- retired files are NOT physically deleted — removal is logical (the
  log), physical cleanup is the format's own VACUUM retention story, and
  time travel (`version_as_of` / snapshot history) keeps working over
  self-written history;
- `.files` replays the log, so searches, in-situ scans, incremental
  index builds, and index vacuum all track the committed snapshot
  automatically (an index entry over a removed file is dropped by the
  existing liveness machinery).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.sources.delta import DeltaSnapshotLake
from rottnest_spark.sources.iceberg import IcebergSnapshotLake


class _FormatDML:
    """Mixin: route the two mutation choke points into log commits.
    Subclasses supply `_commit(add, remove)`."""

    def _commit(self, add: list[str], remove: list[str]) -> None:
        raise NotImplementedError

    def _known_files(self) -> set[str]:
        """Every data file the log has EVER referenced (live + logically
        removed). The adds-diff must use this, not the live set: a
        logically-removed file stays on disk (format semantics) and must
        never be re-added by a later rewrite's commit."""
        raise NotImplementedError

    def _on_disk(self) -> set[str]:
        """Physical parquet data files under the table dir (underscore /
        dot entries invisible — same convention as ParquetLake.files)."""
        out = set()
        for p in self.fs.list_files(self.data_dir):
            parts = os.path.relpath(p, self.data_dir).split(os.sep)
            if any(s.startswith(("_", ".")) for s in parts[:-1]):
                continue
            fn = parts[-1]
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                out.add(p)
        return out

    def _partition_columns(self) -> list[str]:
        """The format's declared partition columns ([] = unpartitioned)."""
        return []

    def _stage_hive(self, df: DataFrame, prefix: str):
        """Stage `df` with partitionBy(partition columns); plan one
        publish move per staged part into its hive subdirectory, so
        _commit's add actions parse real partitionValues. Returns
        (cid, stage dir, [(staged src, destination), ...]) — the caller
        decides when to execute the moves (rewrites write their manifest
        FIRST so a crash mid-publish is repairable)."""
        import uuid as _uuid

        pcols = self._partition_columns()
        cid = _uuid.uuid4().hex[:12]
        stage = os.path.join(self.data_dir, f"_compact_stage_{cid}")
        from rottnest_spark.core.tuning import cluster_for_hive_write

        cluster_for_hive_write(df, pcols).write.partitionBy(*pcols).parquet(
            stage
        )
        moves = []
        for f in self.fs.list_files(stage):
            segs = os.path.relpath(f, stage).split(os.sep)
            leaf = segs[-1]
            if not leaf.endswith(".parquet") or leaf.startswith(("_", ".")):
                continue
            dst = os.path.join(
                self.data_dir, *segs[:-1], f"{prefix}_{cid}_{leaf}"
            )
            moves.append((f, dst))
        return cid, stage, moves

    def _publish_hive(self, df: DataFrame, prefix: str) -> list[str]:
        """Stage + publish in one step (append: a partial publish is
        self-healing — the orphan adds-diff of the NEXT commit completes
        it, and appended rows committed late are still a correct state)."""
        _cid, stage, moves = self._stage_hive(df, prefix)
        for src, dst in moves:
            self.fs.makedirs(os.path.dirname(dst))
            self.fs.rename(src, dst)
        self.fs.rmtree(stage)
        return [dst for _, dst in moves]

    def append(self, df: DataFrame) -> list[str]:
        if not self._partition_columns():
            new_files = ParquetLake.append(self, df)
        else:
            new_files = self._publish_hive(df, "appended")
        if new_files:  # an empty frame publishes nothing — no commit
            self._commit(add=new_files, remove=[])
        return new_files

    def compact_files(self, *a, **kw):
        # partitioned tables compact WITHIN each hive partition (one job
        # for all groups), so rewritten files keep their col=value path
        # segments and the commit's partitionValues stay correct. Group
        # by partition TUPLE, not directory: the same partition can live
        # under two layout roots (Iceberg's data/ plus appended files).
        pcols = self._partition_columns()
        if pcols:
            pset = set(pcols)

            def hive_tuple(f):
                segs = [
                    s
                    for s in f.split(os.sep)
                    if "=" in s and s.split("=", 1)[0] in pset
                ]
                return tuple(sorted(segs))

            kw["per_directory"] = True
            kw["group_key"] = hive_tuple
        return ParquetLake.compact_files(self, *a, **kw)

    def delete_matching(self, *a, **kw):
        # per-file copy-on-write publishes next to the replaced file
        # (core/lake.py), which preserves the hive layout — partitioned
        # tables need no special casing beyond that
        return ParquetLake.delete_matching(self, *a, **kw)

    def merge_into(
        self,
        changes: DataFrame,
        key_col: str,
        seq_col: str = "seq",
        op_col: str = "op",
        max_change_keys: int = 100_000,
        update_cols: list[str] | None = None,
    ) -> dict:
        pcols = self._partition_columns()
        if not pcols:
            return ParquetLake.merge_into(
                self, changes, key_col, seq_col, op_col,
                max_change_keys, update_cols,
            )
        # Partitioned path: base rows are read through the snapshot
        # lake's partition-reconstructing read (data files physically
        # LACK the partition columns), the merge runs over the full
        # logical schema, and the output re-publishes through hive
        # staging so every rewritten/inserted row lands in its
        # partition's directory with correct commit partitionValues.
        if key_col in pcols:
            raise ValueError(
                f"merge key {key_col!r} is a partition column — it has no "
                "physical data-file column to merge on"
            )
        missing = [c for c in pcols if c not in changes.columns]
        if missing:
            raise ValueError(
                "merge_into on a partitioned table needs the changeset to "
                f"carry the partition column(s) {missing} — inserted rows "
                "cannot be routed to a partition otherwise"
            )
        import json

        from pyspark.sql import functions as F

        from rottnest_spark.ops.merge import (
            DELETE_OP,
            latest_changes,
            merge_changes,
        )

        if not changes.filter(F.col(key_col).isNull()).isEmpty():
            raise ValueError(
                f"merge_into: changeset contains NULL values in key "
                f"column {key_col!r}; a CDC row must carry a non-null key"
            )
        final = latest_changes(changes, [key_col], seq_col, op_col)
        files = self.files
        touched = self._merge_touched(final, key_col, max_change_keys, files)
        if not touched and final.filter(
            F.col(op_col) != DELETE_OP
        ).isEmpty():
            return {"rewritten": [], "new_files": [], "pruned": len(files)}
        if touched:
            base = self.read(touched)  # reconstructs partition columns
        elif files:
            base = self.read(files).limit(0)
        else:
            base = changes.drop(seq_col, op_col).limit(0)
        merged = merge_changes(
            base, changes, [key_col], seq_col, op_col, update_cols
        )
        # manifest BEFORE publish (compact_files protocol): a crash
        # mid-publish leaves a manifest whose new_files are incomplete —
        # repair_files drops the published-but-uncommitted parts and the
        # originals stay live in the log
        cid, stage, moves = self._stage_hive(merged, "merged")
        new_files = [dst for _, dst in moves]
        man_dir = os.path.join(self.index_dir, "_compactions")
        self.fs.makedirs(man_dir)
        man_path = os.path.join(man_dir, f"{cid}.json")
        self.fs.write_text(
            man_path,
            json.dumps({"new_files": new_files, "replaces": touched}),
        )
        for src, dst in moves:
            self.fs.makedirs(os.path.dirname(dst))
            self.fs.rename(src, dst)
        self.fs.rmtree(stage)
        self._retire(touched, files)
        self.fs.remove(man_path)
        return {
            "rewritten": touched,
            "new_files": new_files,
            "pruned": len(files) - len(touched),
        }

    #: leaf-name prefixes of THIS DML surface's published rewrite
    #: outputs — the ONLY unknown on-disk files the adds-diff may commit.
    #: Anything else unknown is orphan garbage from some other op's
    #: publish-before-commit crash window (iceberg_delete_rows'
    #: delete-*.parquet, iceberg_upsert's eqdelete-*/uuid-hex data,
    #: delta_upsert's upserted_* which must never commit WITHOUT its
    #: vectors, expire victims) — committing those as data would
    #: resurrect or corrupt rows; vacuum reclaims them instead.
    _REWRITE_PREFIXES = ("compacted_", "appended_", "deleted_", "merged_")

    def _retire(self, files_to_remove, pre_op_files) -> None:
        # new files = physical dir minus everything the log ever knew
        # (live + tombstoned), RESTRICTED to this surface's own publish
        # prefixes; with single-writer mutations that diff is exactly the
        # op's freshly-renamed files — and it self-heals the crash window
        # where files were renamed in but the commit lost
        adds = sorted(
            f
            for f in self._on_disk() - self._known_files()
            if os.path.basename(f).startswith(self._REWRITE_PREFIXES)
        )
        if not adds and not files_to_remove:
            return
        self._commit(add=adds, remove=sorted(files_to_remove))

    def repair_files(self) -> list[str]:
        """Crash recovery for interrupted compact_files/merge swaps — the
        FORMAT-AWARE version. The base ParquetLake recovery finishes a
        published swap by physically deleting the replaced files; on a
        log-backed table that is corruption (the log still lists those
        files as live when the crash hit before the `_retire` commit, and
        even post-commit they back time travel until VACUUM retention
        expires). Here removal is always LOGICAL:

        - swap fully published + commit lost → finish the swap by
          committing add(new)+remove(replaces) through `_retire`'s
          adds-diff; the replaced files stay on disk for the format's
          VACUUM/retention story;
        - swap fully published + commit landed → nothing to do but
          manifest/stage cleanup (idempotent re-run);
        - crash mid-publish → drop the partially-published new files
          (never log-known, so physical delete is safe) and keep the
          originals, which the log still serves.

        Returns the replaced files whose logical removal it completed."""
        import json

        man_dir = os.path.join(self.index_dir, "_compactions")
        finished: list[str] = []
        for man_path in self.fs.glob(os.path.join(man_dir, "*.json")):
            m = json.loads(self.fs.read_text(man_path))
            if all(self.fs.exists(n) for n in m["new_files"]):
                live = set(self.files)
                pending = [f for f in m["replaces"] if f in live]
                if pending:  # the _retire commit never ran — finish it
                    self._retire(pending, None)
                    finished.extend(pending)
            else:
                known = self._known_files()
                for n in m["new_files"]:
                    if n not in known and self.fs.exists(n):
                        self.fs.remove(n)
            self.fs.remove(man_path)
            cid = os.path.splitext(os.path.basename(man_path))[0]
            self.fs.rmtree(
                os.path.join(self.data_dir, f"_compact_stage_{cid}")
            )
        return finished


class DeltaWritableLake(_FormatDML, DeltaSnapshotLake):
    """Delta table with the full DML surface: mutations commit
    add/remove actions to _delta_log (sources/delta_write.py)."""

    def _commit(self, add: list[str], remove: list[str]) -> None:
        from rottnest_spark.sources.delta_write import delta_commit_retry

        if self._version_as_of is not None:
            raise ValueError(
                "lake is pinned to versionAsOf "
                f"{self._version_as_of} — time-travel views are read-only"
            )
        # OCC: pure-add commits (appends) retry through version races;
        # remove-containing commits revalidate the removals against the
        # winner's snapshot and raise for a re-plan if they conflict
        delta_commit_retry(
            self._table_path,
            add=add or None,
            remove=remove or None,
            fs=self.fs,
        )

    def _known_files(self) -> set[str]:
        from rottnest_spark.sources.delta import delta_known_files

        return set(delta_known_files(self._table_path, fs=self.fs))

    def _partition_columns(self) -> list[str]:
        from rottnest_spark.sources.delta import delta_partition_columns

        return delta_partition_columns(self._table_path, fs=self.fs)


class IcebergWritableLake(_FormatDML, IcebergSnapshotLake):
    """Iceberg table with the full DML surface: mutations commit new
    snapshots (sources/iceberg_write.py); prior snapshots stay in the
    log for history-aware vacuum / time travel."""

    def _commit(self, add: list[str], remove: list[str]) -> None:
        from rottnest_spark.sources.iceberg_write import iceberg_commit_retry

        iceberg_commit_retry(
            self._table_path, add=add or None, remove=remove or None, fs=self.fs
        )

    def _partition_columns(self) -> list[str]:
        from rottnest_spark.sources.iceberg import iceberg_partition_columns

        return iceberg_partition_columns(self._table_path, fs=self.fs)

    def _known_files(self) -> set[str]:
        from rottnest_spark.sources.iceberg import (
            _current_metadata,
            _snapshot_state,
        )

        md = _current_metadata(self._table_path, fs=self.fs)
        known: set[str] = set()
        for s in md.get("snapshots", []):
            # walk HISTORY with the full state: old snapshots may carry
            # merge-on-read deletes — raising would wedge every DML after
            # a compacted MOR episode, and DELETE FILES must count as
            # known too, or the adds-diff would mistake an orphaned
            # delete-*.parquet for a rewrite output and commit its
            # (file_path, pos) rows as DATA
            st = _snapshot_state(md, s, self._table_path, self.fs)
            known |= set(st["data"])
            known |= set(st["pos_deletes"])
            known |= {d["path"] for d in st["eq_deletes"]}
        return known
