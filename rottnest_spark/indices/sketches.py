"""HLL distinct-count summary index: one mergeable Datasketches HLL sketch
per lake file, lifecycle-managed like every other index (incremental
anti-join builds, config guard, union compaction, vacuum).

The reference keeps per-file metadata aggregates next to its indexes
(python/rottnest/table.py file-level rollups; A2/A3 zone-map aggregation);
this extends that idea to distinct counts: after one build pass, "how many
distinct X across files F" is answered from sketch metadata — no data scan,
any file subset, estimates mergeable across entries and compactions.

Scale notes (100 TB):
- build is one map-side-combined groupBy(file): the shuffle carries one
  ~2^lgk-byte sketch per file, not rows;
- estimates are a metadata-scale aggregate over the sketch table (rows =
  files), so interactive even with millions of files;
- sketches union losslessly at the same lgK: estimate(union of per-file
  sketches) is deterministic, and compaction (plain table union) never
  touches data files.

This is a SUMMARY index: `search()` truthfully returns BRUTE_FORCE (it can
prune nothing), and row-predicate refine is a type error — use
`estimate_distinct` / `ParquetLake.distinct_estimate`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rottnest_spark.core.layout import WHOLE_FILE
from rottnest_spark.indices.base import BRUTE_FORCE, SparkIndex
from rottnest_spark.indices.substring import provenance_file_col
from rottnest_spark.sources.reader import read_parquet


class StatsSketchIndex(SparkIndex):
    index_type = "hll_stats"
    sort_cols = ["file_path"]

    def __init__(self, lgk: int = 12):
        # lgK: sketch precision (error ~ 1.04/sqrt(2^lgK); 12 -> ~1.6%).
        # In the catalog config because sketches only union at equal lgK.
        self.lgk = lgk

    def config(self) -> dict:
        return {"lgk": self.lgk}

    def build(
        self, spark: SparkSession, files: list[str], column: str, out_path: str
    ) -> None:
        df = read_parquet(spark, files).select(
            provenance_file_col().alias("file_path"),
            F.col(column).alias("key"),
        )
        stats = df.groupBy("file_path").agg(
            F.lit(WHOLE_FILE).alias("row_group"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count("key").alias("n_nonnull"),
            F.hll_sketch_agg("key", F.lit(self.lgk)).alias("sketch"),
        )
        self._write_index(stats, out_path, sort_cols=self.sort_cols)

    def search(self, spark: SparkSession, index_paths: list[str], query):
        return BRUTE_FORCE  # a summary cannot prune row predicates

    def brute_force(
        self, df: DataFrame, column: str, query, k: int | None
    ) -> DataFrame:
        raise TypeError(
            "StatsSketchIndex is a summary index — it estimates distinct "
            "counts (estimate_distinct / ParquetLake.distinct_estimate) and "
            "has no row-predicate semantics"
        )

    # default compact() (union + file_path-sorted rewrite) is correct:
    # per-file rows are disjoint across entries, no re-aggregation needed

    @staticmethod
    def estimate_distinct(
        spark: SparkSession,
        index_paths: list[str],
        files: list[str] | None = None,
    ) -> dict:
        """Merge per-file sketches (optionally restricted to `files`) into
        one estimate. Returns {"estimate", "n_rows", "n_nonnull", "n_files"}."""
        df = spark.read.parquet(*index_paths)
        if files is not None:
            df = df.filter(F.col("file_path").isin(list(files)))
        row = df.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_nonnull").alias("n_nonnull"),
            F.count(F.lit(1)).alias("n_files"),
        ).collect()[0]
        return {
            "estimate": int(row["est"] or 0),
            "n_rows": int(row["n_rows"] or 0),
            "n_nonnull": int(row["n_nonnull"] or 0),
            "n_files": int(row["n_files"]),
        }
