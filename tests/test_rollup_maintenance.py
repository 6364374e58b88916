"""Continuous aggregate maintenance: rollup converges to the batch oracle
after each drain, late files re-refresh old buckets, refresh is idempotent."""

import pyspark.sql.functions as F

from rottnest_spark.streaming.rollup import (
    read_rollup,
    refresh_buckets,
    stream_rollup_maintenance,
)


def _oracle(df, grain="hour"):
    return {
        (r["bucket"], r["key"]): (r["n_rows"], r["total_value"])
        for r in df.groupBy(
            F.date_trunc(grain, F.col("ts")).alias("bucket"),
            F.col("event_type").alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }


def _materialized(spark, out_dir):
    return {
        (r["bucket"], r["key"]): (r["n_rows"], r["total_value"])
        for r in read_rollup(spark, out_dir).collect()
    }


def test_stream_rollup_converges_and_refreshes_late_buckets(
    spark, sf_dir, tmp_path
):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    # first drain: even event_ids
    ev.filter(F.col("event_id") % 2 == 0).repartition(3).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    r1 = stream_rollup_maintenance(spark, src, schema, out, ckpt)
    assert r1
    assert _materialized(spark, out) == _oracle(spark.read.parquet(src))

    # second drain: odd event_ids land in the SAME hours (late data for
    # already-materialized buckets) -> those buckets are recomputed from
    # source, not incremented
    ev.filter(F.col("event_id") % 2 == 1).repartition(3).write.mode(
        "append"
    ).parquet(src)
    r2 = stream_rollup_maintenance(spark, src, schema, out, ckpt)
    assert r2
    full = _oracle(spark.read.parquet(src))
    assert _materialized(spark, out) == full

    # third drain with nothing new: no refresh, table unchanged
    r3 = stream_rollup_maintenance(spark, src, schema, out, ckpt)
    assert r3 == []
    assert _materialized(spark, out) == full


def test_refresh_is_idempotent(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    out = str(tmp_path / "rollup")
    ev.repartition(2).write.parquet(src)
    source = spark.read.parquet(src)
    buckets = [
        r["b"]
        for r in source.select(F.date_trunc("hour", "ts").alias("b"))
        .distinct()
        .limit(5)
        .collect()
    ]
    refresh_buckets(source, out, buckets, "ts", "event_type", "value")
    first = _materialized(spark, out)
    # replaying the same refresh (a retried micro-batch) changes nothing
    refresh_buckets(source, out, buckets, "ts", "event_type", "value")
    assert _materialized(spark, out) == first
    # and the materialized buckets match the oracle restricted to them
    oracle = {
        kv: v
        for kv, v in _oracle(source).items()
        if kv[0] in set(buckets)
    }
    assert first == oracle
