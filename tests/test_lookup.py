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
