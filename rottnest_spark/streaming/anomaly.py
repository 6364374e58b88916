"""Custom stateful streaming operator: per-key online anomaly detection.

`applyInPandasWithState` carries per-key running moments (Welford count /
mean / M2) across micro-batches, so an event is judged against the key's
ENTIRE history, not just its batch — the difference between a real
streaming detector and a per-batch z-score. State is three scalars per
key (constant size, unlike the dedup operator's seen-set), checkpointed
by the state store, so restarts resume with the learned baseline.

Semantics (deterministic, order-dependent within a key — events are
processed in the batch order delivered): an event is flagged when
|value − mean_so_far| > z · std_so_far once at least `min_n` prior
events exist; every event then updates the moments (flagged ones too —
a poisoning trade documented here: robust variants would skip updating
on flagged values, at the cost of never adapting to level shifts).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, event_id long, value double, score double"
STATE_SCHEMA = "n long, mean double, m2 double"


def anomaly_stream(
    events: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
    z: float = 3.0,
    min_n: int = 10,
):
    """events → flagged (key, event_id, value, score) rows; score = the
    running z-score at the time the event arrived."""

    def detect(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        out_i, out_v, out_s = [], [], []
        for pdf in pdfs:
            for i, v in zip(pdf[id_col], pdf[value_col]):
                v = float(v)
                if n >= min_n:
                    std = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
                    if std > 0 and abs(v - mean) > z * std:
                        out_i.append(int(i))
                        out_v.append(v)
                        out_s.append(round(abs(v - mean) / std, 4))
                # Welford update
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(out_i),
                "event_id": out_i,
                "value": out_v,
                "score": out_s,
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_anomaly(
    spark: SparkSession,
    src_dir: str,
    schema,
    checkpoint_dir: str,
    sink_dir: str,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    z: float = 3.0,
    min_n: int = 10,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain src_dir (AvailableNow) through the stateful detector into a
    parquet sink; re-running continues from the persisted moments."""
    stream = spark.readStream.schema(schema).parquet(src_dir).select(
        F.col(key_col).cast("string").alias("k"),
        F.col(id_col).alias("i"),
        F.col(value_col).cast("double").alias("v"),
    )
    out = anomaly_stream(stream, "k", "i", "v", z=z, min_n=min_n)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.read.parquet(sink_dir)
