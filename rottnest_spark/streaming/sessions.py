"""Session-window aggregation: gap-based sessions as ONE streaming-capable
operator (`F.session_window`), the stateful sibling of the tumbling-window
agg in `aggregate.py`.

Same plan both modes: on a static frame Catalyst runs it as a merge-sort
aggregation per key; on a stream the session state store merges/extends
windows across micro-batches and the watermark closes sessions whose
possible extensions have expired. The batch run is therefore the exact
oracle for the streaming run (append mode emits only watermark-closed
sessions; AvailableNow over a finite directory closes everything).

Contrast with `entrypoints.q_events_sessionize` (lag/sum window functions):
identical session semantics, but that shape is batch-only — this one is
the operator a live pipeline deploys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(key, session) stats; a session extends while consecutive events
    arrive within `gap`. Output: key, session_start (first event ts),
    n_events, sum_value.

    Scale: sessions group by (key, merged-window) — the shuffle is on the
    key exactly like any per-user aggregation; no per-user event lists are
    ever collected (the window merge is streaming-state/sort-merge based).
    """
    df = events
    if df.isStreaming:
        # Watermarks require TIMESTAMP; parquet NTZ casts value-identically
        # under the UTC session zone (see streaming/aggregate.py).
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(key_col, "session_start", "n_events", "sum_value")
    )


def run_session_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    schema,
    name: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
):
    """Drain a parquet directory through the streaming session aggregation
    into an in-memory sink. Complete mode so sessions still open at
    end-of-stream (watermark not yet passed) are visible for verification;
    a production append-mode sink would emit each session exactly once as
    the watermark closes it."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = session_stats(stream, gap=gap, watermark=watermark)
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)
