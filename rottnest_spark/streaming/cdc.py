"""Streaming CDC apply: keep a keyed lake continuously merged as change
files land — the streaming half of MERGE INTO (ops/merge.py +
ParquetLake.merge_into).

Each micro-batch is one atomic-ish copy-on-write merge: the batch's
changes are collapsed to final-state-per-key and applied to only the lake
files whose footer key range intersects them. Idempotency note: unlike the
rollup's recompute-from-source refresh (streaming/rollup.py), a merge is
stateful — so the checkpoint is the replay guard (Structured Streaming
will not re-deliver a committed batch), and within a batch the apply
itself is crash-recoverable via the merge manifest (`repair_files()`).

Scale: a CDC feed's batches are key-scale, not lake-scale; every batch
rewrites the touched files only. Compaction (`compact_files`) absorbs the
small merged files this produces over time.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def stream_merge_maintenance(
    spark: SparkSession,
    changes_dir: str,
    schema,
    lake,
    key_col: str,
    checkpoint_dir: str,
    seq_col: str = "seq",
    op_col: str = "op",
    timeout_sec: int = 300,
) -> list[dict]:
    """Drain new change files (AvailableNow) from `changes_dir` and merge
    each micro-batch into `lake` (a ParquetLake). Change schema = lake
    schema + seq + op ('D' = delete, anything else upsert). Returns the
    per-batch merge stats dicts from `merge_into`."""
    stats: list[dict] = []

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats.append(lake.merge_into(batch_df, key_col, seq_col, op_col))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(changes_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return stats
