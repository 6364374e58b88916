"""Incremental index maintenance via Structured Streaming.

The reference has no streaming: its incrementality is the L1 plan step —
"index the files that appeared since the last run" (anti-join against the
catalog, backends/iceberg.py:113-137). This module is the Spark-native
version of exactly that contract:

- a file-source stream over the lake directory discovers new Parquet files
  (checkpointed, exactly-once file discovery),
- `Trigger.AvailableNow` drains whatever is new and stops (the reference's
  "run the indexer again" cron shape),
- `foreachBatch` runs the SAME L1 build path (`ParquetLake.build_index`),
  whose catalog anti-join keeps the operation idempotent even if a batch
  retries — the catalog, not the checkpoint, is the source of truth for
  which files are indexed.

At scale this is the correct division of labor: Spark's file-stream source
handles listing/checkpointing of millions of objects; the catalog handles
index coverage; each micro-batch's build is an ordinary distributed job.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.indices.base import SparkIndex


def stream_index_maintenance(
    spark: SparkSession,
    lake: ParquetLake,
    index: SparkIndex,
    column: str,
    checkpoint_dir: str,
    binpack_row_threshold: int = 100_000_000,
    timeout_sec: int = 300,
    path: str | None = None,
    trigger_format: str = "parquet",
) -> list[str]:
    """Drain all not-yet-seen lake files and index them. Returns the names
    of index entries created in this drain. Blocking (AvailableNow).

    `path`/`trigger_format` override the watched directory — the stream is
    only the NEW-WORK TRIGGER; coverage is always decided by the catalog
    anti-join against `lake.files`. For table-format lakes (Delta/Iceberg
    snapshot lakes) watch the METADATA log as text
    (`path=<table>/_delta_log, trigger_format="text"`): data files land on
    disk BEFORE the commit, so watching the data directory would miss
    commit-only snapshot changes, while each new commit/metadata file is
    exactly one new trigger. Either way, files physically present but
    outside the current snapshot are never indexed."""
    created: list[str] = []

    def build_batch(batch_df, batch_id: int) -> None:
        # The batch's row payload is irrelevant: coverage is decided by the
        # catalog anti-join inside build_index (idempotent on retry).
        created.extend(
            lake.build_index(
                index, column, binpack_row_threshold=binpack_row_threshold
            )
        )

    if trigger_format == "text":
        stream = spark.readStream.text(path or lake.data_dir)
    else:
        schema = lake.read(lake.files[:1]).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 64)
            .parquet(path or lake.data_dir)
        )
    q = (
        stream.writeStream.foreachBatch(build_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return created
