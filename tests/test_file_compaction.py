"""Data-file compaction (the small-file problem): row preservation, big
files untouched, index-plan composition, and crash-recovery via
repair_files()."""

import glob
import json
import os
import shutil

import pyspark.sql.functions as F

from rottnest_spark import ParquetLake
from rottnest_spark.indices.substring import SubstringIndex


def _mk_lake(spark, sf_dir, tmp_path, n_small=6):
    """n_small small files + one big file."""
    out = str(tmp_path / "lake")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    small_part = docs.filter(F.col("doc_id") < 60)
    big_part = docs.filter(F.col("doc_id") >= 60)
    small_part.repartition(n_small).write.parquet(out)
    # the big file: single part dropped in with a distinct name
    stage = str(tmp_path / "big_stage")
    big_part.coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.replace(part, os.path.join(out, "big-00000.parquet"))
    return out


def _rows(spark, lake_dir):
    return sorted(
        r["doc_id"] for r in spark.read.parquet(lake_dir).select("doc_id").collect()
    )


def test_compact_files_preserves_rows_and_skips_big(spark, sf_dir, tmp_path):
    lake_dir = _mk_lake(spark, sf_dir, tmp_path)
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    before = _rows(spark, lake_dir)
    n_before = len(lake.files)

    # big file has ~440 rows, small ones ~10 each: threshold splits them
    new = lake.compact_files(target_rows=100, small_row_threshold=100)
    assert new and all(os.path.basename(f).startswith("compacted_") for f in new)
    assert len(lake.files) < n_before
    # the big file survived untouched
    assert any(f.endswith("big-00000.parquet") for f in lake.files)
    assert _rows(spark, lake_dir) == before
    # idempotent: nothing small enough remains worth rewriting
    assert lake.compact_files(target_rows=100, small_row_threshold=100) == []


def test_compact_files_noop_when_no_benefit(spark, sf_dir, tmp_path):
    lake_dir = _mk_lake(spark, sf_dir, tmp_path, n_small=2)
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    # target so small every input maps to its own output -> no reduction
    assert lake.compact_files(target_rows=1, small_row_threshold=10**9) == []


def test_search_stays_exact_across_file_compaction(spark, sf_dir, tmp_path):
    lake_dir = _mk_lake(spark, sf_dir, tmp_path)
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    oracle = sorted(
        r["doc_id"]
        for r in spark.read.parquet(lake_dir)
        .filter(F.col("text").contains("merge sort"))
        .select("doc_id")
        .collect()
    )

    lake.compact_files(target_rows=100, small_row_threshold=100)
    # stale entries (covering replaced files) are dropped from the plan;
    # new compacted files are scanned in-situ -> still exact
    got = sorted(
        r["doc_id"] for r in lake.search(idx, "text", "merge sort").select("doc_id").collect()
    )
    assert got == oracle

    # re-index covers the compacted files; vacuum reclaims dead entries
    created = lake.build_index(idx, "text")
    assert created
    removed = lake.vacuum()
    got2 = sorted(
        r["doc_id"] for r in lake.search(idx, "text", "merge sort").select("doc_id").collect()
    )
    assert got2 == oracle
    # every catalog entry now covers only live files
    live = set(lake.files)
    for e in lake.catalog.entries():
        assert any(f in live for f in e["file_paths"])
    assert isinstance(removed, list)


def test_repair_completes_interrupted_swap(spark, sf_dir, tmp_path):
    lake_dir = _mk_lake(spark, sf_dir, tmp_path)
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    before = _rows(spark, lake_dir)
    small = [f for f in lake.files if not f.endswith("big-00000.parquet")]

    # simulate a crash AFTER publish, BEFORE deletes: copy two small files
    # to "published" names and leave the manifest behind
    man_dir = os.path.join(str(tmp_path / "idx"), "_compactions")
    os.makedirs(man_dir, exist_ok=True)
    pub = [os.path.join(lake_dir, f"compacted_dead_{i:05d}.parquet") for i in range(2)]
    shutil.copy(small[0], pub[0])
    shutil.copy(small[1], pub[1])
    with open(os.path.join(man_dir, "dead.json"), "w") as fh:
        json.dump({"new_files": pub, "replaces": small[:2]}, fh)
    # rows are double-counted until repair finishes the swap
    assert len(_rows(spark, lake_dir)) > len(before)

    finished = lake.repair_files()
    assert sorted(finished) == sorted(small[:2])
    assert _rows(spark, lake_dir) == before
    assert glob.glob(os.path.join(man_dir, "*.json")) == []


def test_repair_rolls_back_partial_publish(spark, sf_dir, tmp_path):
    lake_dir = _mk_lake(spark, sf_dir, tmp_path)
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    before = _rows(spark, lake_dir)
    small = [f for f in lake.files if not f.endswith("big-00000.parquet")]

    # crash MID-publish: manifest names two new files, only one got renamed
    # in; originals all intact
    man_dir = os.path.join(str(tmp_path / "idx"), "_compactions")
    os.makedirs(man_dir, exist_ok=True)
    pub = [os.path.join(lake_dir, f"compacted_half_{i:05d}.parquet") for i in range(2)]
    shutil.copy(small[0], pub[0])  # pub[1] never appeared
    with open(os.path.join(man_dir, "half.json"), "w") as fh:
        json.dump({"new_files": pub, "replaces": small[:2]}, fh)

    assert lake.repair_files() == []
    # rollback: the half-published file is gone, originals untouched
    assert not os.path.exists(pub[0])
    assert _rows(spark, lake_dir) == before


def test_optimize_one_call_maintenance(spark, sf_dir, tmp_path):
    """lake.optimize(): data compaction + index refresh + index compaction
    + vacuum in one call; search exact before, during churn, and after."""
    import pyspark.sql.functions as F

    from rottnest_spark import ParquetLake
    from rottnest_spark.indices import SubstringIndex

    data = str(tmp_path / "lake")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(6).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text", binpack_row_threshold=1)  # entry per file
    assert len(lake.catalog.entries_for("substring", "text")) == 6
    q = "merge sort"
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(q))).collect()
    )
    report = lake.optimize(target_rows=10_000)
    # small files merged, indexes refreshed over the new files, entries
    # compacted down, orphans reclaimed
    assert report["data_files_compacted"]
    assert report["indices_refreshed"]["built"]
    assert len(lake.catalog.entries_for("substring", "text")) == 1
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    assert got == want
    lake.catalog.validate()


def test_optimize_on_writable_delta_lake(spark, sf_dir, tmp_path):
    """optimize() on a Delta-backed lake: the data rewrite lands as a log
    commit and the snapshot search stays exact."""
    import glob as _glob

    import pyspark.sql.functions as F

    from rottnest_spark.indices import SubstringIndex
    from rottnest_spark.sources.delta import delta_live_files
    from rottnest_spark.sources.delta_write import delta_write
    from rottnest_spark.sources.writable import DeltaWritableLake

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = str(tmp_path / "dt")
    delta_write(docs.repartition(6), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    pre_commits = len(_glob.glob(table + "/_delta_log/*.json"))
    report = lake.optimize(target_rows=10_000)
    assert report["data_files_compacted"]
    assert len(_glob.glob(table + "/_delta_log/*.json")) > pre_commits
    assert set(report["data_files_compacted"]) <= set(delta_live_files(table))
    q = "merge sort"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(q))).collect()
    )
    assert got == want
