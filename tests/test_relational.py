"""as-of join: match is the max right_ts <= left_ts, tie determinism,
inner/left semantics."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.ops.relational import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 99), (4, 20, 500)],
        "event_id long, key long, t long",
    )
    right = spark.createDataFrame(
        [
            (10, 100, "a"),
            (10, 200, "b"),
            (10, 200, "c"),  # tie on (key, ts): tiebreak picks max tag
            (10, 300, "d"),
            (30, 1, "z"),
        ],
        "key long, t long, tag string",
    )
    return left, right


def test_backward_match_and_ties(spark, frames):
    left, right = frames
    out = {
        r["event_id"]: r["tag"]
        for r in asof_join(
            left, right, "key", "key", "t", "t",
            payload=["tag"], tiebreak="tag",
        ).collect()
    }
    assert out[1] == "a"      # equal ts matches (>= semantics)
    assert out[2] == "c"      # 205 -> ts 200, tie resolved to max tag
    assert 3 not in out       # t=99: no right row at or before -> inner drops
    assert 4 not in out       # key 20 never matches


def test_left_keeps_unmatched(spark, frames):
    left, right = frames
    out = {
        r["event_id"]: r["tag"]
        for r in asof_join(
            left, right, "key", "key", "t", "t",
            payload=["tag"], tiebreak="tag", how="left",
        ).collect()
    }
    assert out[3] is None and out[4] is None and len(out) == 4


def test_fixture_scale_properties(spark, sf_dir):
    from rottnest_spark.sources.reader import read_parquet

    ev = read_parquet(spark, [f"{sf_dir}/events.parquet"]).select(
        "event_id", "user_id", "ts"
    )
    orders = read_parquet(spark, [f"{sf_dir}/orders.parquet"]).select(
        "o_custkey", F.col("o_orderdate").alias("od")
    ).distinct()
    out = asof_join(
        ev, orders, "user_id", "o_custkey", "ts", "od", payload=["od"]
    )
    joined = out.alias("x").join(
        orders.alias("o"),
        (F.col("x.user_id") == F.col("o.o_custkey"))
        & (F.col("o.od") <= F.col("x.ts")),
    )
    # matched date is <= ts and is the MAX eligible date per event
    viol = (
        joined.groupBy("x.event_id", "x.od")
        .agg(F.max("o.od").alias("best"))
        .filter(F.col("x.od") != F.col("best"))
        .count()
    )
    assert viol == 0
    assert out.filter(F.col("od") > F.col("ts")).count() == 0
