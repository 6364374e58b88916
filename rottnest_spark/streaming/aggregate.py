"""Streaming analytics over the events table shape.

Watermarked tumbling-window aggregation — the canonical Structured
Streaming operator set (event-time window + late-data bound + streaming
state). Run with Trigger.AvailableNow over a parquet directory it behaves
as an incremental batch job with exactly-once state; run against a live
directory it keeps running.

The same logical plan works in both modes, so the batch oracle for tests
is the identical `groupBy(window(...))` on a static read — Spark guarantees
result parity for append-mode windows whose watermark has passed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) counts + value sums. Works on a streaming
    OR static `events` DataFrame (same plan both ways)."""
    df = events
    if df.isStreaming:
        # Watermarks require TIMESTAMP (LTZ); parquet timestamps without a
        # zone infer as TIMESTAMP_NTZ in Spark 4. The cast is value-identical
        # under a UTC session zone and keeps the batch plan (and its oracle
        # hash) untouched.
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Hopping-window counts: each event lands in window/slide overlapping
    windows (reference analog: the tumbling rollup above is the slide ==
    window special case). Works on a streaming OR static `events` frame —
    same plan both ways, so batch ≡ stream parity is testable.

    Scale note: `F.window(ts, w, s)` expands each row to its w/s covering
    windows MAP-SIDE and partial-aggregates before the exchange, so the
    shuffle carries (windows × types) group rows, not row-count × fan-out.
    """
    df = events
    if df.isStreaming:
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    schema,
    name: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
    agg_fn=None,
):
    """Drive a windowed aggregation (tumbling by default, pass
    `agg_fn=sliding_event_counts` for hopping) over a parquet directory with
    AvailableNow into an in-memory sink (complete mode) for verification."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = (agg_fn or windowed_event_counts)(
        stream, window=window, watermark=watermark
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)
