"""Dedup-at-ingest: filter a stream against what the LAKE already holds.

The static side is not the lake's data — it is the lake's ExactIndex key
table (`keys/`), i.e. the same secondary index the batch search path probes
doubles as the streaming dedup reference. A micro-batch therefore joins
against a key-sorted, metadata-scale Parquet table instead of re-scanning
the lake, and the join is a stream-static LEFT ANTI (supported natively by
Structured Streaming; the static side is re-read per micro-batch, picking
up index entries added by concurrent incremental builds).

Two layers compose:
1. intra-stream: watermarked `dropDuplicates` on the key (state-store
   backed, exactly-once across micro-batches);
2. stream-vs-lake: left-anti join against the indexed key set.

Scale: the anti join broadcasts or shuffles a key table with ≤ one row per
distinct indexed key — for a 100 TB lake keyed by content hash this is the
billions-of-rows-but-narrow table the key-sorted layout was built for, and
Spark prunes its row groups by the micro-batch's key range pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keys_already_in_lake(lake, column: str) -> DataFrame:
    """The distinct indexed key set of `column` (from every exact-index
    entry). Raises if the lake has no exact index on the column — dedup
    against an unindexed lake would silently pass everything."""
    entries = lake.catalog.entries_for("exact", column)
    if not entries:
        raise ValueError(
            f"no exact index on {column!r}: build one first "
            "(lake.build_index(ExactIndex(), column)) — ingest dedup uses "
            "the index as its reference set"
        )
    paths = [f"{e['index_path']}/keys" for e in entries]
    return lake.spark.read.parquet(*paths).select("key").distinct()


def stream_ingest_dedup(
    stream: DataFrame,
    key_col: str,
    lake,
    column: str,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Rows of `stream` whose `key_col` is NOT already in the lake (per its
    exact index on `column`), with intra-stream duplicates dropped first.

    `watermark=(ts_col, delay)` bounds the dropDuplicates state store; omit
    it only for bounded backfills (state then grows with distinct keys).
    Returns a streaming DataFrame — attach your own writeStream sink."""
    out = stream
    if watermark is not None:
        ts_col, delay = watermark
        out = out.withWatermark(ts_col, delay)
    out = out.dropDuplicates([key_col])
    keys = keys_already_in_lake(lake, column).withColumnRenamed(
        "key", "__lake_key__"
    )
    return out.join(
        keys, out[key_col] == F.col("__lake_key__"), "left_anti"
    )
