"""HLL distinct-count summary index: accuracy, subset estimates, lifecycle
(incremental build / compaction / vacuum) and merge determinism."""

import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.sketches import StatsSketchIndex


@pytest.fixture()
def ev_lake(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ev_lake")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartition(6)
        .write.parquet(out)
    )
    return ParquetLake(spark, out, str(tmp_path / "idx"))


def test_estimate_within_hll_error(spark, ev_lake):
    idx = StatsSketchIndex(lgk=12)
    created = ev_lake.build_index(idx, "user_id")
    assert created
    est = ev_lake.distinct_estimate("user_id")
    exact = (
        ev_lake.read().select("user_id").distinct().count()
    )
    assert est["uncovered_files"] == 0
    assert est["n_rows"] == ev_lake.read().count()
    # lgK=12 -> ~1.6% relative standard error; allow 3 sigma
    assert abs(est["estimate"] - exact) <= max(3, 0.05 * exact)


def test_subset_estimate_and_incremental_build(spark, ev_lake, sf_dir, tmp_path):
    idx = StatsSketchIndex()
    ev_lake.build_index(idx, "user_id")
    # subset restricted to two files: estimate close to that subset's exact
    sub = ev_lake.files[:2]
    est = ev_lake.distinct_estimate("user_id", files=sub)
    exact = ev_lake.read(sub).select("user_id").distinct().count()
    assert abs(est["estimate"] - exact) <= max(3, 0.05 * exact)
    assert est["n_files"] == 2

    # new file appears -> it is uncovered until the next incremental build
    extra = spark.read.parquet(f"{sf_dir}/events.parquet").limit(100)
    extra.coalesce(1).write.mode("append").parquet(ev_lake.data_dir)
    est2 = ev_lake.distinct_estimate("user_id")
    assert est2["uncovered_files"] == 1
    created = ev_lake.build_index(idx, "user_id")
    assert len(created) == 1
    est3 = ev_lake.distinct_estimate("user_id")
    assert est3["uncovered_files"] == 0
    assert est3["n_rows"] == ev_lake.read().count()


def test_compaction_preserves_estimates(spark, ev_lake):
    idx = StatsSketchIndex()
    # force several entries: build per-file groups
    ev_lake.build_index(idx, "user_id", binpack_row_threshold=1)
    assert len(ev_lake.catalog.entries_for("hll_stats", "user_id")) > 1
    before = ev_lake.distinct_estimate("user_id")
    merged = ev_lake.compact_indices(idx, "user_id")
    assert merged
    assert len(ev_lake.catalog.entries_for("hll_stats", "user_id")) == 1
    after = ev_lake.distinct_estimate("user_id")
    # sketch union is deterministic: identical merged estimate
    assert after["estimate"] == before["estimate"]
    assert after["n_rows"] == before["n_rows"]

    # vacuum after data loss drops the entry
    for f in ev_lake.files:
        import os

        os.remove(f)
    removed = ev_lake.vacuum()
    assert removed
    assert ev_lake.catalog.entries_for("hll_stats", "user_id") == []


def test_config_guard_rejects_mismatched_lgk(spark, ev_lake):
    ev_lake.build_index(StatsSketchIndex(lgk=12), "user_id")
    with pytest.raises(ValueError, match="config"):
        ev_lake.distinct_estimate("user_id", index=StatsSketchIndex(lgk=14))


def test_summary_index_refuses_row_predicates(spark, ev_lake):
    idx = StatsSketchIndex()
    ev_lake.build_index(idx, "user_id")
    with pytest.raises(TypeError, match="summary"):
        ev_lake.search(idx, "user_id", 42).collect()
