"""Custom stateful streaming operator: per-group heavy hitters.

A Misra-Gries summary (capacity m) lives in the state store per group
key, updated across micro-batches — the streaming top-k that a per-batch
groupBy/count cannot give: an item that is frequent over HOURS but never
dominant within any single batch still surfaces, and memory stays O(m)
per group regardless of value cardinality (the whole point versus the
exact stateful-dedup operator's seen-set).

Guarantee (classic MG): for every item, est ≤ true ≤ est + n/m where n
is the group's total event count — any item with true frequency > n/m is
guaranteed present in the summary. Emission is the CURRENT summary after
each batch (update semantics).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, item string, est long, n_total long"
STATE_SCHEMA = "items array<string>, counts array<long>, n long"


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str,
    item_col: str,
    capacity: int = 16,
):
    """events → per-group MG summary rows after each batch: (key, item,
    est, n_total). est undercounts by at most n_total/capacity."""

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            summary = dict(zip(items, counts))
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            for item in pdf[item_col]:
                item = str(item)
                n += 1
                if item in summary:
                    summary[item] += 1
                elif len(summary) < capacity:
                    summary[item] = 1
                else:
                    # decrement-all step; drop zeros
                    summary = {
                        k: c - 1 for k, c in summary.items() if c > 1
                    }
        state.update((list(summary), [summary[k] for k in summary], n))
        ordered = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(ordered),
                "item": [k for k, _ in ordered],
                "est": [int(c) for _, c in ordered],
                "n_total": [int(n)] * len(ordered),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_heavy_hitters(
    spark: SparkSession,
    src_dir: str,
    schema,
    checkpoint_dir: str,
    key_col: str,
    item_col: str,
    capacity: int = 16,
    timeout_sec: int = 300,
) -> list:
    """Drain src_dir (AvailableNow) through the summary; returns the
    latest emitted summary rows (collected via foreachBatch — update-mode
    output has no parquet sink)."""
    latest: dict = {}

    def keep_latest(batch_df, batch_id: int) -> None:
        rows = [tuple(r) for r in batch_df.collect()]
        if rows:
            latest["rows"] = rows

    stream = spark.readStream.schema(schema).parquet(src_dir).select(
        F.col(key_col).cast("string").alias("k"),
        F.col(item_col).cast("string").alias("it"),
    )
    out = heavy_hitters_stream(stream, "k", "it", capacity)
    q = (
        out.writeStream.foreachBatch(keep_latest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return latest.get("rows", [])
