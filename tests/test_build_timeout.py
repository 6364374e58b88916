"""L1 build-timeout guard (reference backends/iceberg.py:178-211 analog):
a hung build must raise, commit nothing, and leave only an orphan dir that
vacuum reclaims."""

import os
import time

import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.base import BRUTE_FORCE, SparkIndex
from rottnest_spark.indices.substring import SubstringIndex


class SlowIndex(SparkIndex):
    """Deliberately hung build: sleeps past any reasonable deadline, then
    writes its output (simulating a stuck stage that eventually finishes)."""

    index_type = "slow"

    def __init__(self, delay: float = 3.0):
        self.delay = delay

    def build(self, spark, files, column, out_path):
        time.sleep(self.delay)
        spark.createDataFrame(
            [(f, -1) for f in files], "file_path string, row_group int"
        ).write.mode("overwrite").parquet(out_path)

    def search(self, spark, index_paths, query):
        return BRUTE_FORCE

    def brute_force(self, df, column, query, k):
        return df.limit(k) if k is not None else df


def test_timeout_raises_commits_nothing_vacuum_reclaims(
    spark, docs_lake_dir, tmp_path
):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SlowIndex(delay=3.0)
    with pytest.raises(TimeoutError, match="exceeded"):
        lake.build_index(idx, "text", timeout=0.5)
    assert lake.catalog.entries() == []  # nothing committed
    # let the hung thread finish writing its orphan, then reclaim it
    time.sleep(4.0)
    orphans = [
        d
        for d in os.listdir(str(tmp_path / "idx"))
        if not d.endswith("_catalog")
    ]
    removed = lake.vacuum()
    for o in orphans:
        assert o in removed
        assert not os.path.exists(str(tmp_path / "idx" / o))


def test_fast_build_unaffected_by_timeout(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    created = lake.build_index(idx, "text", timeout=300.0)
    assert created
    assert lake.catalog.entries_for("substring", "text")


def test_compact_crash_leaves_catalog_intact(spark, docs_lake_dir, tmp_path):
    """A compaction that dies AFTER writing its merged table but BEFORE the
    catalog swap must leave the original entries live (search unchanged)
    and only an orphan dir, which vacuum reclaims."""
    import pyspark.sql.functions as F

    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text", binpack_row_threshold=1)
    entries_before = {e["index_name"] for e in lake.catalog.entries()}
    assert len(entries_before) > 1
    q = "merge sort"
    before = sorted(
        r["doc_id"] for r in lake.search(idx, "text", q).select("doc_id").collect()
    )

    # simulate the crash: run the merge exactly as compact_indices would,
    # then "die" before catalog.replace
    import os as _os
    import uuid as _uuid

    group = lake.catalog.entries_for("substring", "text")
    orphan = _os.path.join(str(tmp_path / "idx"), f"crashed_{_uuid.uuid4().hex[:8]}")
    idx.compact(spark, [e["index_path"] for e in group], orphan)
    assert _os.path.isdir(orphan)

    # catalog unchanged → search unchanged
    assert {e["index_name"] for e in lake.catalog.entries()} == entries_before
    after = sorted(
        r["doc_id"] for r in lake.search(idx, "text", q).select("doc_id").collect()
    )
    assert after == before
    removed = lake.vacuum()
    assert _os.path.basename(orphan) in removed
    assert not _os.path.exists(orphan)


def test_compact_timeout_keeps_original_entries(spark, docs_lake_dir, tmp_path):
    class SlowCompactIndex(SubstringIndex):
        def compact(self, spark_, index_paths, out_path):
            time.sleep(3.0)
            super().compact(spark_, index_paths, out_path)

    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SlowCompactIndex()
    lake.build_index(idx, "text", binpack_row_threshold=1)
    entries_before = {e["index_name"] for e in lake.catalog.entries()}
    with pytest.raises(TimeoutError, match="compaction"):
        lake.compact_indices(idx, "text", row_threshold=10_000_000, timeout=0.5)
    assert {e["index_name"] for e in lake.catalog.entries()} == entries_before


def test_build_error_propagates_through_guard(spark, docs_lake_dir, tmp_path):
    class BoomIndex(SlowIndex):
        index_type = "boom"

        def build(self, spark, files, column, out_path):
            raise RuntimeError("boom")

    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    with pytest.raises(RuntimeError, match="boom"):
        lake.build_index(BoomIndex(), "text", timeout=30.0)
    assert lake.catalog.entries() == []
