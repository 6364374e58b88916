"""Edge hardening: NULLs in indexed columns, empty strings, unicode text,
and empty search results — every index must build and stay exact."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.bloom import BloomIndex
from rottnest_spark.indices.exact import ExactIndex
from rottnest_spark.indices.substring import SubstringIndex


@pytest.fixture(scope="module")
def nullish_lake(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nullish") / "lake")
    rows = [
        (1, "alpha beta", "k-001"),
        (2, None, None),
        (3, "", "k-003"),
        (4, "Grüße ÜNICÖDE text", "k-004"),
        (5, "alpha beta", "k-001"),  # dup key on purpose
        (6, "tail words here", "k-006"),
    ]
    spark.createDataFrame(
        rows, "id long, text string, key string"
    ).repartition(2).write.parquet(out)
    return out


def _ids(df):
    return sorted(r[0] for r in df.select("id").collect())


def test_substring_with_nulls_and_unicode(spark, nullish_lake, tmp_path):
    lake = ParquetLake(spark, nullish_lake, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    for q, want_ids in [
        ("alpha", [1, 5]),
        ("ünicöde", [4]),  # case-folded unicode
        ("zzz-not-there", []),
    ]:
        got = _ids(lake.search(idx, "text", q))
        want = _ids(
            spark.read.parquet(nullish_lake).filter(
                F.contains(F.lower("text"), F.lit(q.lower()))
            )
        )
        assert got == want == sorted(want_ids), q


def test_exact_with_nulls(spark, nullish_lake, tmp_path):
    lake = ParquetLake(spark, nullish_lake, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "key")
    got = _ids(lake.search(idx, "key", "k-001"))
    assert got == [1, 5]
    assert _ids(lake.search(idx, "key", "k-404")) == []


def test_bloom_with_nulls(spark, nullish_lake, tmp_path):
    lake = ParquetLake(spark, nullish_lake, str(tmp_path / "idx"))
    idx = BloomIndex()
    lake.build_index(idx, "key")
    assert _ids(lake.search(idx, "key", "k-004")) == [4]
    assert _ids(lake.search(idx, "key", "k-404")) == []


def test_empty_search_results_keep_schema(spark, nullish_lake, tmp_path):
    lake = ParquetLake(spark, nullish_lake, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    out = lake.search(idx, "text", "absolutely-absent-gram-xyz")
    assert out.count() == 0
    assert set(out.columns) == {"id", "text", "key"}
