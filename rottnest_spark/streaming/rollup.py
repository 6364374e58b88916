"""Continuous aggregate maintenance: keep a materialized rollup table (per
time bucket × key) incrementally up to date as new data files land — the
hypertable "continuous aggregate" / materialized-view-refresh operation.

Design (partition-level refresh, the only shape that stays exact at scale):
- the micro-batch is used ONLY to discover which buckets were touched —
  its rows identify work, they are never added into existing aggregates;
- each touched bucket is then RECOMPUTED from the source lake with a bucket
  predicate (partition/zone-map-prunable scan), and written with dynamic
  partition overwrite on the bucket column.

This makes every refresh idempotent: replaying a micro-batch after a crash
recomputes the same buckets to the same values — there is no read-modify-
write of aggregate state to double-count (the failure mode of "add the
batch's partial sums into the table"). That trade — re-scan a bucket's
slice instead of merging partials — is exactly how partition-refresh
materialized views stay exact without a transaction log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def refresh_buckets(
    source: DataFrame,
    out_dir: str,
    buckets: list,
    ts_col: str,
    key_col: str,
    value_col: str,
    grain: str = "hour",
) -> None:
    """Recompute the given grain buckets from `source` and dynamic-
    partition-overwrite them in the rollup table at `out_dir`. Idempotent:
    same source slice -> same bucket content."""
    if not buckets:
        return
    spark = source.sparkSession
    bucket = F.date_trunc(grain, F.col(ts_col))
    agg = (
        source.filter(bucket.isin(buckets))
        .groupBy(
            bucket.alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        # partition dirs need a sortable scalar; keep the timestamp too
        .withColumn("bucket_id", F.date_format("bucket", "yyyy-MM-dd-HH"))
    )
    (
        agg.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_id")
        .parquet(out_dir)
    )


def stream_rollup_maintenance(
    spark: SparkSession,
    src_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    grain: str = "hour",
    timeout_sec: int = 300,
) -> list:
    """Drain new source files (AvailableNow) and refresh every rollup
    bucket they touch. Returns the buckets refreshed in this drain.

    The stream is the new-work trigger; values always come from a full
    recompute of the touched buckets against the CURRENT source directory,
    so late-arriving files for an old bucket simply re-trigger that
    bucket's refresh (no watermark-discarded state — for an append-only
    lake the rollup converges to the batch aggregate of what the lake
    holds; deletions would leave a stale partition until its bucket is
    next touched, the usual partition-refresh caveat)."""
    refreshed: list = []

    def refresh_batch(batch_df, batch_id: int) -> None:
        touched = [
            r["b"]
            for r in batch_df.select(
                F.date_trunc(grain, F.col(ts_col)).alias("b")
            )
            .distinct()
            .collect()
        ]
        refreshed.extend(touched)
        refresh_buckets(
            spark.read.schema(schema).parquet(src_dir),
            out_dir,
            touched,
            ts_col,
            key_col,
            value_col,
            grain,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(refresh_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return refreshed


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """The materialized rollup as a DataFrame (drops the partition dir
    column; `bucket` carries the grain)."""
    return spark.read.parquet(out_dir).select(
        "bucket", "key", "n_rows", "total_value"
    )
