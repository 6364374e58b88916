"""ParquetLake — the user-facing lifecycle API, mirroring the reference's
backend surface (backends/parquet.py, backends/iceberg.py):

    L1 build_index   Plan (anti-join unindexed, binpack) → Build per group →
                     Commit catalog records            (iceberg.py:98-254)
    L2 search        Plan (covering entries + in-situ remainder) → probe index
                     → fetch candidates → exact refine → union in-situ → K
                                                        (utils.py:215-282)
    L3 compact       binpack small entries → merge index tables → commit
                     append-then-delete                 (iceberg.py:386-493)
    L4 vacuum        drop entries covering no live file; delete orphan index
                     dirs                               (iceberg.py:307-384)

A "lake" is an append-only set of Parquet files (a directory or explicit
list). Storage is any Hadoop-FS path; tests use the local FS. All heavy work
(index build, candidate fetch, refine) is Spark jobs; only catalog-scale
metadata (file lists, candidate unit lists) touches the driver.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from rottnest_spark.core.catalog import IndexCatalog
from rottnest_spark.core.layout import WHOLE_FILE, file_row_counts
from rottnest_spark.core.planner import (
    binpack,
    group_mergeable,
    plan_search,
    unindexed_files,
)
from rottnest_spark.core.refine import read_candidates
from rottnest_spark.sources.reader import read_parquet
from rottnest_spark.indices.base import BRUTE_FORCE, SparkIndex


class ParquetLake:
    def __init__(
        self,
        spark: SparkSession,
        data: str | list[str],
        index_dir: str,
        brute_force_threshold: int = 1000,
    ):
        self.spark = spark
        self._data = data
        self.index_dir = index_dir
        self.catalog = IndexCatalog(os.path.join(index_dir, "_catalog"))
        # candidate-unit count above which the index is deemed unselective
        # (reference brute_force_threshold=1000, utils.py:224-225)
        self.brute_force_threshold = brute_force_threshold

    @property
    def data_dir(self) -> str:
        """Lake root directory (required by the streaming file source)."""
        if isinstance(self._data, str) and os.path.isdir(self._data):
            return self._data
        raise ValueError("streaming maintenance needs a directory-backed lake")

    @property
    def files(self) -> list[str]:
        if isinstance(self._data, list):
            return sorted(self._data)
        if os.path.isdir(self._data):
            return sorted(glob.glob(os.path.join(self._data, "*.parquet")))
        return sorted(glob.glob(self._data))

    def read(self, files: list[str] | None = None) -> DataFrame:
        use = files or self.files
        if not use:
            raise ValueError(
                f"lake at {self._data!r} has no data files (empty snapshot "
                f"or wrong path)"
            )
        return read_parquet(self.spark, use)

    # -- L1: build ------------------------------------------------------------

    def build_index(
        self,
        index: SparkIndex,
        column: str,
        name: str | None = None,
        binpack_row_threshold: int = 100_000_000,
    ) -> list[str]:
        """Index all not-yet-covered lake files. Returns new index names.
        Idempotent: a second call is a no-op unless new files appeared."""
        todo = unindexed_files(self.catalog, index.index_type, column, self.files)
        if not todo:
            return []
        counts = file_row_counts(self.spark, todo)
        groups = binpack([(f, counts[f]) for f in todo], binpack_row_threshold)
        created = []
        base = name or f"{index.index_type}_{column}"
        for group in groups:
            gfiles = [f for f, _ in group]
            index_name = f"{base}_{uuid.uuid4().hex[:8]}"
            index_path = os.path.join(self.index_dir, index_name)
            # Build fully before committing the catalog record: a crash leaves
            # an orphan dir (cleaned by vacuum), never a catalog entry pointing
            # at a half-built index (reference cleanup-on-failure, iceberg.py:205-211).
            index.build(self.spark, gfiles, column, index_path)
            self.catalog.append(
                {
                    "index_name": index_name,
                    "index_type": index.index_type,
                    "column_name": column,
                    "index_path": index_path,
                    "file_paths": gfiles,
                    "record_counts": [counts[f] for f in gfiles],
                    "config": IndexCatalog.config_json(**index.config()),
                }
            )
            created.append(index_name)
        self.catalog.validate()
        return created

    # -- L2: search -----------------------------------------------------------

    def search(
        self,
        index: SparkIndex,
        column: str,
        query,
        k: int | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Index-accelerated exact search ≡ brute_force(full scan).limit(k)."""
        plan = plan_search(
            self.catalog,
            index.index_type,
            column,
            self.files,
            expect_config=IndexCatalog.config_json(**index.config()),
        )
        parts: list[DataFrame] = []

        if plan.entries:
            paths = [e["index_path"] for e in plan.entries]
            cands = index.search(self.spark, paths, query)
            if cands is BRUTE_FORCE:
                parts.append(self.read(plan.covered_files))
            else:
                # Candidate list is unit-scale (files × row groups), not
                # row-scale — safe to collect for planning the fetch.
                covered = set(plan.covered_files)
                cand_list = [
                    (r[0], r[1]) for r in cands.collect() if r[0] in covered
                ]
                if len(cand_list) > self.brute_force_threshold:
                    parts.append(self.read(plan.covered_files))
                elif cand_list:
                    parts.append(
                        read_candidates(self.spark, cand_list, columns=None)
                    )

        if plan.unindexed_files:
            # in-situ scan of unindexed files (utils.py:248-275)
            parts.append(self.read(plan.unindexed_files))

        if not parts:
            empty = self.read(self.files[:1]).limit(0)
            return index.brute_force(empty, column, query, k)

        refined = [index.brute_force(p, column, query, None) for p in parts]
        out = refined[0]
        for r in refined[1:]:
            out = out.unionByName(r)
        if columns:
            out = out.select(*columns)
        return out.limit(k) if k is not None else out

    def search_conj(
        self,
        specs: list[tuple[SparkIndex, str, object]],
        k: int | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Conjunctive multi-index search: rows satisfying EVERY
        (index, column, query) predicate, accelerated by INTERSECTING the
        candidate units of each index that covers a file.

        Unit semantics per file: a spec that covers the file contributes its
        candidate unit set ({WHOLE_FILE} admits every row group); a spec
        that does not cover it, or that returns BRUTE_FORCE, contributes no
        constraint. A file with an empty intersection is skipped entirely.
        The refine applies ALL predicates, so composition never loses
        exactness (each index alone is already only a pruning device).

        This is how the reference's time-windowed log search composes here
        (X9): LogIndex on the message column ∩ ExactIndex zone maps on the
        timestamp column."""
        # per-file constraint maps: None = unconstrained so far
        per_file: dict[str, set[int] | None] = {f: None for f in self.files}
        for index, column, query in specs:
            plan = plan_search(
                self.catalog,
                index.index_type,
                column,
                self.files,
                expect_config=IndexCatalog.config_json(**index.config()),
            )
            if not plan.entries:
                continue
            cands = index.search(
                self.spark, [e["index_path"] for e in plan.entries], query
            )
            if cands is BRUTE_FORCE:
                continue
            covered = set(plan.covered_files)
            by_file: dict[str, set[int]] = {f: set() for f in covered}
            for r in cands.collect():
                if r["file_path"] in covered:
                    by_file[r["file_path"]].add(r["row_group"])
            for f in covered:
                units = by_file[f]
                prev = per_file.get(f)
                if prev is None:
                    per_file[f] = units
                else:
                    if WHOLE_FILE in prev:
                        per_file[f] = units
                    elif WHOLE_FILE not in units:
                        per_file[f] = prev & units
                    # else: units is whole-file → keep prev
        cand_list: list[tuple[str, int]] = []
        for f, units in per_file.items():
            if units is None:
                cand_list.append((f, WHOLE_FILE))  # no index constrained it
            elif WHOLE_FILE in units:
                cand_list.append((f, WHOLE_FILE))
            else:
                cand_list.extend((f, rg) for rg in sorted(units))
        if not cand_list:
            out = self.read(self.files[:1]).limit(0)
        else:
            out = read_candidates(self.spark, cand_list, columns=None)
        for index, column, query in specs:
            out = index.brute_force(out, column, query, None)
        if columns:
            out = out.select(*columns)
        return out.limit(k) if k is not None else out

    def explain_search(self, index: SparkIndex, column: str, query) -> dict:
        """Structured plan introspection (the reference prints its tier
        decisions at search time; this returns them): coverage split,
        candidate count, pruning ratio, and the execution decision."""
        plan = plan_search(
            self.catalog,
            index.index_type,
            column,
            self.files,
            expect_config=IndexCatalog.config_json(**index.config()),
        )
        out = {
            "index_type": index.index_type,
            "column": column,
            "n_entries": len(plan.entries),
            "n_covered_files": len(plan.covered_files),
            "n_unindexed_files": len(plan.unindexed_files),
            "decision": "in_situ_only",
            "n_candidates": None,
            "total_units": None,
            "pruning_ratio": None,
        }
        if not plan.entries:
            return out
        cands = index.search(
            self.spark, [e["index_path"] for e in plan.entries], query
        )
        if cands is BRUTE_FORCE:
            out["decision"] = "brute_force_flag"
            return out
        cand_rows = cands.collect()  # unit-scale (files x row groups), small
        n = len(cand_rows)
        if any(r["row_group"] != WHOLE_FILE for r in cand_rows):
            from rottnest_spark.core.layout import extract_layout

            total = extract_layout(self.spark, plan.covered_files).count()
        else:
            total = sum(len(e["file_paths"]) for e in plan.entries)
        out["n_candidates"] = n
        out["total_units"] = total
        out["pruning_ratio"] = round(n / total, 4) if total else None
        out["decision"] = (
            "brute_force_threshold"
            if n > self.brute_force_threshold
            else "index_scan"
        )
        return out

    # -- hot-index caching (the reference's Redis cache-ranges analog, S5:
    # backends/utils.py:128-145 pins .lava byte ranges; we pin the index
    # DataFrames in Spark's block manager) ------------------------------------

    def cache_indices(
        self, index_type: str | None = None, column: str | None = None
    ) -> list[str]:
        """persist() every index table of the matching catalog entries and
        materialize them; repeated searches then probe memory instead of
        re-reading Parquet. Returns the cached paths."""
        import glob as _glob

        cached = []
        for e in self.catalog.entries():
            if index_type and e["index_type"] != index_type:
                continue
            if column and e["column_name"] != column:
                continue
            tables = [
                d
                for d in _glob.glob(os.path.join(e["index_path"], "*"))
                if os.path.isdir(d)
            ] or [e["index_path"]]
            for t in tables:
                df = self.spark.read.parquet(t).persist()
                df.count()  # materialize now
                self._cached = getattr(self, "_cached", {})
                self._cached[t] = df
                cached.append(t)
        return cached

    def uncache_indices(self) -> None:
        for df in getattr(self, "_cached", {}).values():
            df.unpersist()
        self._cached = {}

    # -- L3: compact ----------------------------------------------------------

    def compact_indices(
        self,
        index: SparkIndex,
        column: str,
        row_threshold: int = 100_000_000,
    ) -> list[str]:
        """Merge small index entries. Commit is append-then-delete in one
        atomic catalog swap (crash-safe ordering, iceberg.py:471-479)."""
        entries = self.catalog.entries_for(index.index_type, column)
        groups = group_mergeable(entries, row_threshold)
        created = []
        for group in groups:
            index_name = f"{index.index_type}_{column}_c{uuid.uuid4().hex[:8]}"
            index_path = os.path.join(self.index_dir, index_name)
            index.compact(self.spark, [e["index_path"] for e in group], index_path)
            record = {
                "index_name": index_name,
                "index_type": index.index_type,
                "column_name": column,
                "index_path": index_path,
                "file_paths": [f for e in group for f in e["file_paths"]],
                "record_counts": [c for e in group for c in e["record_counts"]],
                "rows_indexed": int(sum(e["rows_indexed"] for e in group)),
                "config": group[0]["config"],
            }
            self.catalog.replace([record], {e["index_name"] for e in group})
            for e in group:
                shutil.rmtree(e["index_path"], ignore_errors=True)
            created.append(index_name)
        self.catalog.validate()
        return created

    # -- L4: vacuum -----------------------------------------------------------

    def vacuum(self) -> list[str]:
        """Drop catalog entries covering no live lake file; delete index dirs
        not referenced by the catalog (≈ iceberg.py:307-384)."""
        live = set(self.files)
        dead = [
            e["index_name"]
            for e in self.catalog.entries()
            if not any(f in live for f in e["file_paths"])
        ]
        if dead:
            dead_set = set(dead)
            for e in self.catalog.entries():
                if e["index_name"] in dead_set:
                    shutil.rmtree(e["index_path"], ignore_errors=True)
            self.catalog.delete(dead_set)
        referenced = {e["index_path"] for e in self.catalog.entries()}
        removed = list(dead)
        for d in glob.glob(os.path.join(self.index_dir, "*")):
            if d.endswith("_catalog") or d in referenced or not os.path.isdir(d):
                continue
            shutil.rmtree(d, ignore_errors=True)
            removed.append(os.path.basename(d))
        return removed
