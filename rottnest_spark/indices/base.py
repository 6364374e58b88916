"""Index extension interface — the analog of the reference's 4-method ABC
`RottnestIndex` (indices/index_interface.py:9-37): build_index, search_index,
brute_force, compact_indices. Differences, per SURVEY §7.1:

- indexes are DataFrames persisted as Parquet directories, not binaries;
- search returns a *candidates* DataFrame keyed by (file_path, row_group)
  instead of Vec<(file_id, uid)> — uid = (file, row_group) is globally unique,
  so no uid-offset arithmetic is needed anywhere (including compaction);
- `BRUTE_FORCE` is the "Brute Force Everything Please" escape hatch
  (backends/utils.py:224-225): the index declares itself unselective for this
  query and the lake falls back to a full refine scan.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession

#: sentinel returned by search() when the index cannot prune for this query
BRUTE_FORCE = "__BRUTE_FORCE_EVERYTHING__"

#: schema of the candidates DataFrame returned by search()
CANDIDATE_COLS = ["file_path", "row_group"]


class SparkIndex(ABC):
    """One index type. Stateless aside from build knobs; all data lives in
    the index Parquet directory + the catalog."""

    index_type: str = "abstract"

    def config(self) -> dict:
        """Build knobs recorded in the catalog (tokenizer-in-header analog,
        src/lava/tokenizer_utils.rs:48-54: probe must match build)."""
        return {}

    @abstractmethod
    def build(
        self, spark: SparkSession, files: list[str], column: str, out_path: str
    ) -> None:
        """Build the index DataFrame over `column` of `files`, write Parquet
        under `out_path`."""

    @abstractmethod
    def search(
        self, spark: SparkSession, index_paths: list[str], query
    ):
        """Return candidates DataFrame[file_path, row_group] (row_group == -1
        means whole file), or BRUTE_FORCE."""

    @abstractmethod
    def brute_force(
        self, df: DataFrame, column: str, query, k: int | None
    ) -> DataFrame:
        """Exact predicate on raw rows — defines the query semantics
        (SURVEY §2.2 F1-F5). Applied to candidate rows AND to in-situ scans."""

    def compact(
        self, spark: SparkSession, index_paths: list[str], out_path: str
    ) -> None:
        """Merge several index directories into one. Default: union + rewrite
        (Spark's shuffle IS the reference's merge tree, src/lava/merge.rs:17-205)."""
        df = spark.read.parquet(*index_paths)
        self._write_index(df, out_path)

    # -- helpers shared by implementations -----------------------------------

    @staticmethod
    def _write_index(df: DataFrame, out_path: str, sort_cols: list[str] | None = None):
        """Persist an index table sorted by its probe key so Parquet row-group
        min/max stats prune probe lookups (the analog of the reference's
        chunked posting lists with offset directories, src/lava/bm25/bm25.rs:146-154)."""
        if sort_cols:
            df = df.repartitionByRange(*sort_cols).sortWithinPartitions(*sort_cols)
        df.write.mode("overwrite").parquet(out_path)
