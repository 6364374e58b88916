"""Co-location: bucketed joins plan without exchanges; salted joins are
result-identical to plain joins."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.ops.colocate import (
    assert_no_shuffle_join,
    bucketed_join,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"],
        path=str(wh / "b_orders"),
    )
    write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"],
        path=str(wh / "b_lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge planning so the test exercises bucket co-location
    (the fixture tables are small enough to broadcast otherwise)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    bo, bl = bucketed_tables
    joined = (
        spark.table(bl)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table(bo), "o_orderkey")
    )
    assert_no_shuffle_join(joined)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # and it still computes rows
    assert joined.count() > 0


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    bo, bl = bucketed_tables
    got = (
        spark.table(bl)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table(bo), "o_orderkey")
        .count()
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    """Bucketing also pre-partitions groupBy on the bucket key."""
    bo, _ = bucketed_tables
    agg = spark.table(bo).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    assert_no_shuffle_join(agg)


def test_assert_no_shuffle_detects_exchanges(spark, sf_dir, no_broadcast):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    with pytest.raises(AssertionError, match="Exchange"):
        assert_no_shuffle_join(plain)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, sf_dir, how):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    got = salted_join(
        li, orders, ["l_orderkey"], salt_col="l_linenumber", num_salts=4, how=how
    )
    want = li.join(orders, ["l_orderkey"], how)
    cols = want.columns
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.collect())
    )


def test_key_skew_stats(spark):
    from rottnest_spark.ops.colocate import key_skew_stats

    # key 1 holds 8 of 12 rows across 3 keys: skew = 8 / (12/3) = 2.0
    rows = [(1,)] * 8 + [(2,)] * 3 + [(3,)] * 1
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_stats(df, ["k"], top=2).collect()
    assert [(r["k"], r["n_rows"]) for r in out] == [(1, 8), (2, 3)]
    assert out[0]["row_share"] == round(8 / 12, 4)
    assert out[0]["skew_factor"] == 2.0
