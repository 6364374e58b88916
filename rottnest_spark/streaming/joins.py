"""Watermarked stream-stream interval join: event attribution.

The canonical hard case of Structured Streaming state management — joining
two unbounded streams — becomes bounded when BOTH sides carry watermarks
and the join predicate constrains the event-time distance: each side's
state can drop rows once the other side's watermark passes the interval.

Operator here: attribute each `purchase` to the same user's most recent
qualifying `trigger` event (e.g. a click) within a lookback window — the
standard ad-attribution / conversion join. The same function runs on
static frames (plain join + window) so the batch run is the exact oracle
for the streaming run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ensure_ltz(df: DataFrame, ts_col: str) -> DataFrame:
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def attribution_join(
    triggers: DataFrame,
    conversions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """All (conversion, trigger) pairs for the same user with
    trigger.ts <= conversion.ts < trigger.ts + lookback.

    Streaming: both sides watermarked; the range predicate bounds state —
    trigger rows age out `lookback + watermark` past the conversion-side
    watermark. Batch: identical plan minus watermarks. The equi-key
    (user) makes this a hash join with a range residual, never a
    nested-loop over streams.

    Returns one row per qualifying pair: user, conv_ts, conv_value,
    trig_ts (callers wanting only the LATEST trigger per conversion
    aggregate with max_by — see `last_touch`)."""
    lb = F.expr(f"INTERVAL {lookback}")
    # NTZ->LTZ only on the streaming path (watermarks require TIMESTAMP;
    # value-identical under the UTC session zone) — batch keeps the source
    # type so the oracle comparison sees the same column type as every
    # other batch query.
    if triggers.isStreaming:
        triggers = _ensure_ltz(triggers, ts_col)
    if conversions.isStreaming:
        conversions = _ensure_ltz(conversions, ts_col)
    trig = triggers.select(
        F.col(user_col).alias("t_user"), F.col(ts_col).alias("trig_ts")
    )
    conv = conversions.select(
        F.col(user_col).alias("c_user"),
        F.col(ts_col).alias("conv_ts"),
        F.col("value").alias("conv_value"),
        F.col("event_id").alias("conv_id"),
    )
    if trig.isStreaming:
        trig = trig.withWatermark("trig_ts", watermark)
    if conv.isStreaming:
        conv = conv.withWatermark("conv_ts", watermark)
    return (
        conv.join(
            trig,
            (F.col("c_user") == F.col("t_user"))
            & (F.col("trig_ts") <= F.col("conv_ts"))
            & (F.col("conv_ts") < F.col("trig_ts") + lb),
            "inner",
        )
        .select(
            F.col("c_user").alias(user_col),
            "conv_id",
            "conv_ts",
            "conv_value",
            "trig_ts",
        )
    )


def last_touch(pairs: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Collapse attribution pairs to the LATEST trigger per conversion
    (last-touch attribution). One combine-enabled groupBy on the
    conversion id — no window sort."""
    return pairs.groupBy(user_col, "conv_id", "conv_ts", "conv_value").agg(
        F.max("trig_ts").alias("attributed_trig_ts")
    )


def run_attribution_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    schema,
    name: str,
    trigger_type: str = "click",
    conversion_type: str = "purchase",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    timeout_sec: int = 300,
):
    """Drive the stream-stream join over one events directory split into
    the two sides by event_type (append mode — interval joins emit exactly
    the closed pairs; AvailableNow closes everything)."""
    ev = spark.readStream.schema(schema).parquet(src_dir)
    pairs = attribution_join(
        ev.filter(F.col("event_type") == trigger_type),
        ev.filter(F.col("event_type") == conversion_type),
        lookback=lookback,
        watermark=watermark,
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)
