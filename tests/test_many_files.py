"""Metadata-scale smoke: a 64-file lake exercises the driver-side planning
paths (anti-join, binpack, per-entry probes, compaction to one entry) at a
file count where any per-file Spark job or quadratic driver loop would
show. Correctness invariants only — no timing asserts."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.bloom import BloomIndex
from rottnest_spark.indices.exact import ExactIndex


@pytest.fixture(scope="module")
def wide_lake(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wide") / "lake")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .repartitionByRange(64, "o_orderkey")
        .write.parquet(out)
    )
    return out


def test_64_file_lifecycle(spark, wide_lake, tmp_path):
    lake = ParquetLake(spark, wide_lake, str(tmp_path / "idx"))
    assert len(lake.files) >= 60
    # several entries via binpack, then point + range probes
    idx = ExactIndex()
    created = lake.build_index(idx, "o_orderkey", binpack_row_threshold=300)
    assert len(created) >= 4
    probe = (
        spark.read.parquet(wide_lake)
        .agg(F.min("o_orderkey"))
        .collect()[0][0]
    )
    got = sorted(
        r[0]
        for r in lake.search(idx, "o_orderkey", probe)
        .select("o_orderkey")
        .collect()
    )
    want = sorted(
        r[0]
        for r in spark.read.parquet(wide_lake)
        .filter(F.col("o_orderkey") == probe)
        .select("o_orderkey")
        .collect()
    )
    assert got == want and got
    # range-clustered 64-file lake: a point probe prunes to ~1 unit
    paths = [e["index_path"] for e in lake.catalog.entries_for("exact", "o_orderkey")]
    assert idx.search(spark, paths, probe).count() <= 2

    # compact all entries into one; search unchanged
    lake.compact_indices(idx, "o_orderkey", row_threshold=10**9)
    assert len(lake.catalog.entries_for("exact", "o_orderkey")) == 1
    got2 = sorted(
        r[0]
        for r in lake.search(idx, "o_orderkey", probe)
        .select("o_orderkey")
        .collect()
    )
    assert got2 == got
    assert lake.vacuum() == []


def test_64_file_bloom_prunes(spark, wide_lake, tmp_path):
    lake = ParquetLake(spark, wide_lake, str(tmp_path / "idx"))
    idx = BloomIndex(granularity="file")
    lake.build_index(idx, "o_orderkey")
    probe = (
        spark.read.parquet(wide_lake).agg(F.max("o_orderkey")).collect()[0][0]
    )
    paths = [e["index_path"] for e in lake.catalog.entries_for("bloom", "o_orderkey")]
    cands = idx.search(spark, paths, probe).count()
    assert 1 <= cands <= 3  # 64 files -> a couple of candidates max
    got = lake.search(idx, "o_orderkey", probe).count()
    want = (
        spark.read.parquet(wide_lake)
        .filter(F.col("o_orderkey") == probe)
        .count()
    )
    assert got == want >= 1


def test_64_file_virtual_range(spark, wide_lake, tmp_path):
    lake = ParquetLake(spark, wide_lake, str(tmp_path / "idx"))
    lo, hi = 10, 60
    got = lake.search_range_virtual("o_orderkey", lo, hi).count()
    want = (
        spark.read.parquet(wide_lake)
        .filter(F.col("o_orderkey").between(lo, hi))
        .count()
    )
    assert got == want >= 1


def test_hive_partitioned_lake_discovery_and_search(spark, sf_dir, tmp_path):
    """A hive-partitioned lake (lang=.../part.parquet) is discovered
    recursively; index build + search work across partitions; staging-style
    underscore dirs stay invisible."""
    import os

    from rottnest_spark.indices.substring import SubstringIndex

    out = str(tmp_path / "part_lake")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.partitionBy("lang").parquet(out)
    # plant an underscore staging dir with a decoy parquet file
    decoy = os.path.join(out, "_staging")
    os.makedirs(decoy)
    docs.limit(5).coalesce(1).write.parquet(os.path.join(decoy, "d"))

    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    assert len(lake.files) >= 2  # one file per lang at least
    assert all("_staging" not in f for f in lake.files)
    n_expected = docs.count()
    assert lake.read().count() == n_expected  # decoy invisible

    idx = SubstringIndex()
    lake.build_index(idx, "text")
    got = lake.search(idx, "text", "merge sort").count()
    want = docs.filter(
        F.contains(F.lower("text"), F.lit("merge sort"))
    ).count()
    assert got == want > 0


def test_partition_pruned_search(spark, sf_dir, tmp_path):
    """partition_pruned: search runs only over the partition's files while
    sharing the parent lake's catalog (partition pruning composes with
    index pruning)."""
    import pytest as _pytest

    from rottnest_spark.indices.substring import SubstringIndex

    out = str(tmp_path / "plake")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.partitionBy("lang").parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")

    en = lake.partition_pruned(lang="en")
    assert 0 < len(en.files) < len(lake.files)
    got = sorted(
        r[0] for r in en.search(idx, "text", "merge sort").select("doc_id").collect()
    )
    want = sorted(
        r[0]
        for r in docs.filter(
            (F.col("lang") == "en")
            & F.contains(F.lower("text"), F.lit("merge sort"))
        ).select("doc_id").collect()
    )
    assert got == want and got

    with _pytest.raises(ValueError, match="no lake files"):
        lake.partition_pruned(lang="nope")
