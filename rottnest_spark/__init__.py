"""rottnest_spark — a PySpark-native secondary-index + data-pipeline engine.

A from-scratch rebuild of the capabilities of marsupialtail/rottnest
("Postgres indices for Parquet", reference README.md:5) expressed Spark-first:

- every index is a **DataFrame persisted as Parquet** (posting lists as rows),
  not an opaque binary; Parquet row-group pruning on sorted index tables
  replaces the reference's chunked-zstd sections with offset directories.
- the load-bearing invariant (reference backends/utils.py:227-230): the index
  is only a *candidate-pruning* device; an exact brute-force refine on the
  candidate rows removes false positives, and unindexed files are scanned
  in-situ, so `search(lake, q, K)` ≡ `filter(full scan).limit(K)` for exact
  index types. BM25 / vector are approximate top-K measured by recall.
- lifecycle (Plan → Build/Search → Commit) mirrors the reference's
  backends/iceberg.py:98-305 but each phase is a Spark job.

Subpackages:
    core/       lake, layout, catalog, planner, refine (the "backends/" analog)
    indices/    substring, exact, bm25, vector, logcloud (the "indices/" analog)
    ops/        dedup, textstats, multimodal, sampling, relational, pipeline
                (the training-data-pipeline operators)
    streaming/  incremental maintenance, windowed aggs, stateful dedup
"""

from rottnest_spark.core.fs import LakeFS, LocalFS
from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.session import get_spark

__all__ = ["LakeFS", "LocalFS", "ParquetLake", "get_spark"]
# bumped on index-format changes: the contract-query cache key includes this,
# so a format change can never reuse a stale on-disk index
__version__ = "0.4.0"
