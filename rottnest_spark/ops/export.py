"""Training-data export: token-bounded shards + a verifiable manifest.

The last step of a curation pipeline: write the curated corpus as shards
of ≈`shard_tokens` tokens each (the unit a data loader streams), plus a
manifest the consumer can trust — per-shard document/token counts and an
order-insensitive content checksum, so a training job can verify a shard
before using it and resume by shard id.

Plan shape: shard assignment reuses the windowed packing
(ops/sampling.pack_sequences — partition_col keeps the window
distributed; a source/date column is the natural choice), the write is
one `partitionBy("shard_id")` job (one directory per shard, writer
parallelism = shard count), and the manifest is one aggregation over the
written shards — no driver-side loops over rows anywhere.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_sig(df: DataFrame):
    """Order-insensitive per-row signature over ALL columns (sorted by name
    so write- and verify-side column order can't diverge): md5 of the
    row's JSON form, truncated to 48 bits and summed per shard. Covering
    every column means corruption or substitution of ANY field — the text
    itself, not just the id — fails verification."""
    cols = sorted(df.columns)
    return F.conv(
        F.substring(F.md5(F.to_json(F.struct(*cols))), 1, 12), 16, 10
    ).cast("bigint")


def write_token_shards(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    out_dir: str,
    shard_tokens: int,
    partition_col: str | None = None,
) -> dict:
    """Write `df` as token-bounded shards under `out_dir` and return the
    manifest dict (also persisted as out_dir/_manifest.json).

    Shard id = (partition value, packed batch id) flattened to a string;
    rows keep their full schema. The checksum is the xor-free SUM of
    per-row md5 prefixes over the FULL row content (order-insensitive,
    mergeable — the same associativity argument as every partial
    aggregation here)."""
    from rottnest_spark.ops.sampling import pack_sequences

    packed = pack_sequences(
        df, id_col, n_tokens_col, shard_tokens, partition_col
    )
    shard = (
        F.concat_ws(
            "-",
            *( [F.col(partition_col)] if partition_col else [] ),
            F.col("batch_id"),
        )
        if partition_col
        else F.col("batch_id").cast("string")
    )
    packed = packed.withColumn("shard_id", shard).drop("batch_id")
    packed.write.partitionBy("shard_id").mode("overwrite").parquet(out_dir)

    written = packed.sparkSession.read.parquet(out_dir)
    row_sig = _row_sig(written)
    stats = (
        written.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens_col).alias("n_tokens"),
            F.sum(row_sig).alias("checksum"),
        )
        .orderBy("shard_id")
        .collect()
    )
    manifest = {
        "shard_tokens": shard_tokens,
        "n_shards": len(stats),
        "total_docs": int(sum(r["n_docs"] for r in stats)),
        "total_tokens": int(sum(r["n_tokens"] for r in stats)),
        # str() both here and in verify_shards: partition-value inference
        # on read-back can type a numeric-looking shard_id as int, while
        # JSON manifest keys are always strings
        "shards": {
            str(r["shard_id"]): {
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"]),
                "checksum": int(r["checksum"]),
            }
            for r in stats
        },
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def verify_shards(spark, out_dir: str, id_col: str, n_tokens_col: str) -> list[str]:
    """Re-derive every shard's counts + checksum from the written data and
    return the ids that MISMATCH the manifest (empty list = intact).
    One aggregation pass; the consumer-side trust check."""
    with open(os.path.join(out_dir, "_manifest.json")) as fh:
        manifest = json.load(fh)
    written = spark.read.parquet(out_dir)
    row_sig = _row_sig(written)
    stats = {
        str(r["shard_id"]): (int(r["n"]), int(r["t"]), int(r["c"]))
        for r in written.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(n_tokens_col).alias("t"),
            F.sum(row_sig).alias("c"),
        )
        .collect()
    }
    bad = []
    for sid, m in manifest["shards"].items():
        got = stats.get(sid)
        if got != (m["n_docs"], m["n_tokens"], m["checksum"]):
            bad.append(sid)
    bad += [sid for sid in stats if sid not in manifest["shards"]]
    return sorted(bad)
