"""Fuzzy (edit-distance ≤ 1) index: SymSpell deletion neighborhoods."""

import pytest

from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.indices.fuzzy import FuzzyIndex, deletion_variants


def test_deletion_variants():
    assert deletion_variants("Cat") == ["cat", "at", "ct", "ca"]
    assert deletion_variants("a") == ["a", ""]


@pytest.fixture()
def name_lake(spark, tmp_path):
    rows = [
        (0, "gandalf"),
        (1, "gandolf"),   # substitution
        (2, "gandalff"),  # insertion
        (3, "gandal"),    # deletion
        (4, "bilbo"),
        (5, "frodo"),
        (6, "gandalfff"), # distance 2: no match
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, name string")
    data = str(tmp_path / "d")
    df.repartition(3).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    return lake, df


def test_fuzzy_brute_force_semantics(spark, name_lake):
    _, df = name_lake
    got = sorted(
        r["id"]
        for r in FuzzyIndex().brute_force(df, "name", "GANDALF", None).collect()
    )
    assert got == [0, 1, 2, 3]


def test_fuzzy_index_equals_full_scan(spark, name_lake):
    lake, df = name_lake
    idx = FuzzyIndex()
    lake.build_index(idx, "name")
    got = sorted(r["id"] for r in lake.search(idx, "name", "gandalf").collect())
    assert got == [0, 1, 2, 3]
    # absent neighborhoods prune everything
    assert lake.search(idx, "name", "sauron").count() == 0
    # case-insensitive both ways
    assert lake.search(idx, "name", "BILBO").count() == 1


def test_fuzzy_rowgroup_granularity(spark, name_lake):
    lake, _ = name_lake
    idx = FuzzyIndex(granularity="row_group")
    lake.build_index(idx, "name")
    got = sorted(r["id"] for r in lake.search(idx, "name", "frodoo").collect())
    assert got == [5]


def test_fuzzy_in_disjunction(spark, name_lake):
    lake, _ = name_lake
    idx = FuzzyIndex()
    lake.build_index(idx, "name")
    got = sorted(
        r["id"]
        for r in lake.search_disj(
            [(idx, "name", "bilbo"), (idx, "name", "frodo")]
        ).collect()
    )
    assert got == [4, 5]


# -- prefix search on the exact index ---------------------------------------


def test_prefix_search_reuses_exact_entries(spark, tmp_path):
    from rottnest_spark.indices.exact import ExactIndex, PrefixSearch

    rows = [(i, f"user-{i:04d}") for i in range(300)] + [(999, None)]
    df = spark.createDataFrame(rows, "id bigint, uid string")
    data = str(tmp_path / "d")
    df.repartition(3).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    lake.build_index(ExactIndex(), "uid")  # ONE index serves both
    got = sorted(
        r["id"] for r in lake.search(PrefixSearch(), "uid", "user-02").collect()
    )
    assert got == list(range(200, 300))  # user-0200 .. user-0299
    assert lake.search(PrefixSearch(), "uid", "nope-").count() == 0
    # full-scan equivalence
    expected = sorted(
        r["id"] for r in df.filter(df.uid.startswith("user-02")).collect()
    )
    assert got == expected


def test_fuzzy_search_many(spark, name_lake):
    lake, df = name_lake
    idx = FuzzyIndex()
    lake.build_index(idx, "name")
    res = lake.search_many(
        idx, "name", ["gandalf", "frodoo", "sauron"]
    ).collect()
    got: dict = {"gandalf": [], "frodoo": [], "sauron": []}
    for r in res:
        got[r["__query__"]].append(r["id"])
    assert sorted(got["gandalf"]) == [0, 1, 2, 3]
    assert sorted(got["frodoo"]) == [5]
    assert got["sauron"] == []
