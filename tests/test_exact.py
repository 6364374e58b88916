"""Exact-match index: point-lookup ≡ full-scan equality (F2), zone-map and
key-table pruning, range-clustered lake."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.exact import ExactIndex


@pytest.fixture(scope="module")
def orders_lake(spark, sf_dir, tmp_path_factory):
    """orders range-clustered by o_orderkey into 6 files (disjoint ranges)."""
    out = str(tmp_path_factory.mktemp("orders") / "lake")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .repartitionByRange(6, "o_orderkey")
        .write.parquet(out)
    )
    return out


def _keys(df):
    return sorted(r[0] for r in df.select("o_orderkey").collect())


@pytest.mark.parametrize("store_keys", [True, False])
def test_point_lookup_equals_oracle(spark, orders_lake, tmp_path, store_keys):
    lake = ParquetLake(spark, orders_lake, str(tmp_path / "idx"))
    idx = ExactIndex(store_keys=store_keys)
    lake.build_index(idx, "o_orderkey")
    probe = spark.read.parquet(orders_lake).select("o_orderkey").limit(1).collect()[0][0]
    for q in [probe, -12345]:
        got = _keys(lake.search(idx, "o_orderkey", q))
        want = _keys(
            spark.read.parquet(orders_lake).filter(F.col("o_orderkey") == q)
        )
        assert got == want, (store_keys, q)


def test_prunes_to_one_file(spark, orders_lake, tmp_path):
    lake = ParquetLake(spark, orders_lake, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "o_orderkey")
    probe = spark.read.parquet(orders_lake).agg(F.min("o_orderkey")).collect()[0][0]
    entry = lake.catalog.entries()[0]
    cands = idx.search(spark, [entry["index_path"]], probe).collect()
    # range-clustered lake → exactly one candidate file for a point probe
    assert len(cands) == 1


def test_compaction_preserves_lookup(spark, orders_lake, tmp_path):
    lake = ParquetLake(spark, orders_lake, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "o_orderkey", binpack_row_threshold=1)
    assert len(lake.catalog.entries()) > 1
    probe = spark.read.parquet(orders_lake).select("o_orderkey").limit(1).collect()[0][0]
    before = _keys(lake.search(idx, "o_orderkey", probe))
    lake.compact_indices(idx, "o_orderkey", row_threshold=10_000_000)
    after = _keys(lake.search(idx, "o_orderkey", probe))
    assert before == after and before


def test_range_search_equals_between(spark, sf_dir, tmp_path):
    """Zone-map range scan == BETWEEN full scan, and it prunes units."""
    out = str(tmp_path / "orders_lake")
    from rottnest_spark.sources.reader import read_parquet

    read_parquet(spark, [f"{sf_dir}/orders.parquet"]).repartition(
        8, "o_orderkey"
    ).write.parquet(out)
    # repartition by key clusters ranges poorly (hash), so also make a
    # range-clustered lake for the pruning assertion
    out2 = str(tmp_path / "orders_sorted")
    read_parquet(spark, [f"{sf_dir}/orders.parquet"]).repartitionByRange(
        8, "o_orderkey"
    ).write.parquet(out2)

    for lake_dir, expect_prune in ((out, False), (out2, True)):
        lake = ParquetLake(spark, lake_dir, lake_dir + "_idx")
        idx = ExactIndex()
        lake.build_index(idx, "o_orderkey")
        lo, hi = 100, 300
        got = sorted(
            r[0]
            for r in lake.search(idx, "o_orderkey", (lo, hi))
            .select("o_orderkey")
            .collect()
        )
        want = sorted(
            r[0]
            for r in spark.read.parquet(lake_dir)
            .filter(F.col("o_orderkey").between(lo, hi))
            .select("o_orderkey")
            .collect()
        )
        assert got == want and len(got) > 0
        if expect_prune:
            entry = lake.catalog.entries_for("exact", "o_orderkey")[0]
            cands = idx.search(spark, [entry["index_path"]], (lo, hi)).collect()
            assert len(cands) < len(lake.files)


def test_cache_indices_substitutes_in_memory_scan(spark, sf_dir, tmp_path):
    """S5 analog: persisted index tables are substituted into later probe
    plans by Spark's cache manager (InMemoryTableScan)."""
    from rottnest_spark.indices.substring import SubstringIndex
    from rottnest_spark.sources.reader import read_parquet

    out = str(tmp_path / "lake")
    read_parquet(spark, [f"{sf_dir}/documents.parquet"]).repartition(
        3
    ).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    before = sorted(
        r["doc_id"] for r in lake.search(idx, "text", "merge sort").collect()
    )
    cached = lake.cache_indices("substring", "text")
    assert cached
    entry = lake.catalog.entries_for("substring", "text")[0]
    # escape disabled: this inspects the postings-probe plan specifically
    probe = SubstringIndex(unselective_frac=None).search(
        spark, [entry["index_path"]], "merge sort"
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    after = sorted(
        r["doc_id"] for r in lake.search(idx, "text", "merge sort").collect()
    )
    lake.uncache_indices()
    assert before == after and len(before) > 0


def test_string_key_exact_match(spark, sf_dir, tmp_path):
    """UUID-style string keys (the reference's uuid index use case,
    demo.py:10-37): zone maps + key table work on lexicographic order."""
    from rottnest_spark.sources.reader import read_parquet

    out = str(tmp_path / "ev_lake")
    ev = read_parquet(spark, [f"{sf_dir}/events.parquet"]).withColumn(
        "uuid", F.md5(F.concat_ws(":", "event_id", "user_id"))
    )
    ev.repartition(4).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "uuid")

    probe = spark.read.parquet(out).limit(1).collect()[0]["uuid"]
    got = [r["uuid"] for r in lake.search(idx, "uuid", probe).collect()]
    assert got == [probe]
    # absent key -> empty, not error
    assert lake.search(idx, "uuid", "0" * 32).count() == 0


def test_search_many_equals_per_key(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_many")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .repartition(4)
        .write.parquet(out)
    )
    lake = ParquetLake(spark, out, out + "_idx")
    idx = ExactIndex()
    lake.build_index(idx, "o_orderkey")
    keys = [1, 500, 999_999_999]  # last one: no hit
    batched = lake.search_many(idx, "o_orderkey", keys)
    for key in keys:
        got = sorted(
            r["o_orderkey"]
            for r in batched.filter(F.col("__query__") == key).collect()
        )
        want = sorted(
            r["o_orderkey"]
            for r in lake.search(idx, "o_orderkey", key).collect()
        )
        assert got == want, key
    assert batched.filter(F.col("__query__") == 999_999_999).count() == 0


def test_virtual_zone_search_equals_between_and_prunes(spark, sf_dir, tmp_path):
    """Footer-stats virtual range search: exact results with NO index, and
    on a key-clustered multi-row-group file most row groups are pruned."""
    import os

    import pyarrow.parquet as pq_

    from rottnest_spark import ParquetLake
    from rottnest_spark.core.layout import footer_zone_candidates

    rg_dir = str(tmp_path / "rg")
    os.makedirs(rg_dir)
    # orders are generated in key order -> row-group ranges are disjoint
    pq_.write_table(
        pq_.read_table(f"{sf_dir}/orders.parquet"),
        os.path.join(rg_dir, "orders.parquet"),
        row_group_size=512,
    )
    lake = ParquetLake(spark, rg_dir, str(tmp_path / "idx"))
    lo, hi = 100, 200
    got = sorted(
        r[0]
        for r in lake.search_range_virtual("o_orderkey", lo, hi)
        .select("o_orderkey")
        .collect()
    )
    want = sorted(
        r[0]
        for r in spark.read.parquet(rg_dir)
        .filter(F.col("o_orderkey").between(lo, hi))
        .select("o_orderkey")
        .collect()
    )
    assert got == want and got
    # pruning: candidates far fewer than total row groups
    total = pq_.ParquetFile(os.path.join(rg_dir, "orders.parquet")).metadata.num_row_groups
    cands = footer_zone_candidates(
        spark, lake.files, "o_orderkey", lo, hi
    ).count()
    assert cands < total / 2, (cands, total)
    # missing column: empty result, not an error
    assert (
        footer_zone_candidates(spark, lake.files, "no_such_col", 0, 1).count()
        == 0
    )


def test_count_matches_index_only(spark, sf_dir, tmp_path):
    """count_matches: covered files counted from the index's per-key cnt
    column (no data fetch); unindexed files refine-counted; totals exact."""
    from rottnest_spark import ParquetLake
    from rottnest_spark.indices.exact import ExactIndex

    out = str(tmp_path / "li")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(4).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "l_orderkey")
    key = li.select("l_orderkey").orderBy("l_orderkey").limit(1).collect()[0][0]
    want = li.filter(F.col("l_orderkey") == key).count()
    assert want >= 1
    assert lake.count_matches(idx, "l_orderkey", key) == want
    assert lake.count_matches(idx, "l_orderkey", -99) == 0

    # partially-indexed lake: append files after the build
    li.limit(200).coalesce(1).write.mode("append").parquet(out)
    lake2 = ParquetLake(spark, out, str(tmp_path / "idx"))
    want2 = spark.read.parquet(out).filter(F.col("l_orderkey") == key).count()
    assert lake2.count_matches(idx, "l_orderkey", key) == want2

    # zone-only index cannot count from the index -> refine fallback
    lake3 = ParquetLake(spark, out, str(tmp_path / "idx3"))
    z = ExactIndex(store_keys=False)
    lake3.build_index(z, "l_orderkey")
    assert lake3.count_matches(z, "l_orderkey", key) == want2


def test_key_histogram_index_only_matches_groupby(spark, sf_dir, tmp_path):
    from rottnest_spark import ParquetLake
    from rottnest_spark.indices.exact import ExactIndex

    out = str(tmp_path / "li")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(3).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "l_orderkey")
    got = {
        r["key"]: r["n_rows"] for r in lake.key_histogram(idx, "l_orderkey").collect()
    }
    want = {
        r["l_orderkey"]: r["count"]
        for r in li.groupBy("l_orderkey").count().collect()
    }
    assert got == want
    # partially indexed: appended files counted by refine scan
    li.limit(300).coalesce(1).write.mode("append").parquet(out)
    lake2 = ParquetLake(spark, out, str(tmp_path / "idx"))
    got2 = {
        r["key"]: r["n_rows"]
        for r in lake2.key_histogram(idx, "l_orderkey").collect()
    }
    want2 = {
        r["l_orderkey"]: r["count"]
        for r in spark.read.parquet(out).groupBy("l_orderkey").count().collect()
    }
    assert got2 == want2
