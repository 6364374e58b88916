"""Auto-routed lookups: the catalog picks the access path."""

import pytest

from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.indices.bloom import BloomIndex
from rottnest_spark.indices.exact import ExactIndex


@pytest.fixture()
def klake(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"name_{i % 40}") for i in range(400)], "k bigint, name string"
    )
    data = str(tmp_path / "data")
    df.repartition(4).write.parquet(data)
    return ParquetLake(spark, data, str(tmp_path / "idx"))


def test_lookup_routes_to_exact_index(klake):
    klake.build_index(ExactIndex(), "k")
    got = klake.lookup("k", 123).collect()
    assert len(got) == 1 and got[0]["name"] == "name_3"


def test_lookup_routes_to_bloom_when_no_exact(klake):
    klake.build_index(BloomIndex(m_bits=1 << 12), "name")
    got = klake.lookup("name", "name_7").collect()
    assert len(got) == 10 and all(r["name"] == "name_7" for r in got)
    # absent key: the bloom probe proves absence (zero rows, exact)
    assert klake.lookup("name", "nope").count() == 0


def test_lookup_virtual_fallback_without_any_index(klake):
    assert klake.lookup("k", 55).count() == 1
    assert klake.lookup("k", -1).count() == 0


def test_lookup_range_exact_vs_virtual(klake):
    # no index: virtual footer zones
    assert klake.lookup_range("k", 100, 110).count() == 11
    # with the exact index: zone-map route, identical result
    klake.build_index(ExactIndex(), "k")
    assert klake.lookup_range("k", 100, 110).count() == 11


# -- disjunctive (OR) search -------------------------------------------------


def test_search_disj_unions_index_probes(klake):
    """exact(k=5) OR exact(k=250): union of two point probes, refined with
    a single OR predicate — equals the full-scan disjunction."""
    idx = ExactIndex()
    klake.build_index(idx, "k")
    got = sorted(
        r["k"]
        for r in klake.search_disj([(idx, "k", 5), (idx, "k", 250)]).collect()
    )
    assert got == [5, 250]


def test_search_disj_cross_index_types(spark, tmp_path):
    """substring OR exact across different columns/index types."""
    from rottnest_spark.indices.substring import SubstringIndex

    df = spark.createDataFrame(
        [(i, f"doc number {i} " + ("needle " if i % 50 == 0 else "hay "))
         for i in range(200)],
        "id bigint, text string",
    )
    data = str(tmp_path / "d")
    df.repartition(4).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    sub, ex = SubstringIndex(), ExactIndex()
    lake.build_index(sub, "text")
    lake.build_index(ex, "id")
    got = sorted(
        r["id"]
        for r in lake.search_disj(
            [(sub, "text", "needle"), (ex, "id", 7)]
        ).collect()
    )
    # needles at 0,50,100,150 plus id 7
    assert got == [0, 7, 50, 100, 150]
    # matches full-scan OR semantics exactly
    expected = sorted(
        r["id"]
        for r in df.filter(
            sub.predicate("text", "needle") | ex.predicate("id", 7)
        ).collect()
    )
    assert got == expected


def test_search_disj_range_or_point(klake):
    idx = ExactIndex()
    klake.build_index(idx, "k")
    got = sorted(
        r["k"]
        for r in klake.search_disj(
            [(idx, "k", (10, 12)), (idx, "k", 300)]
        ).collect()
    )
    assert got == [10, 11, 12, 300]


def test_search_disj_rejects_topk_indexes(klake):
    from rottnest_spark.indices.bm25 import BM25Index

    with pytest.raises(ValueError, match="top-K"):
        klake.search_disj([(BM25Index(), "name", "x")])


def test_search_disj_unindexed_falls_back_exact(klake):
    """No covering entries → full refine scan, still exact."""
    idx = ExactIndex()
    got = sorted(
        r["k"]
        for r in klake.search_disj([(idx, "k", 3), (idx, "k", 399)]).collect()
    )
    assert got == [3, 399]


def test_lookup_prefix_routes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"user-{i:04d}") for i in range(300)], "id bigint, uid string"
    )
    data = str(tmp_path / "d")
    df.repartition(3).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    # virtual path (no index)
    assert lake.lookup_prefix("uid", "user-01").count() == 100
    # exact-index path, identical result
    lake.build_index(ExactIndex(), "uid")
    assert lake.lookup_prefix("uid", "user-01").count() == 100
    assert lake.lookup_prefix("uid", "zz").count() == 0
