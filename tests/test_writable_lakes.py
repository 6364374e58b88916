"""DML on format-backed lakes: every ParquetLake mutation must land as a
proper Delta/Iceberg log commit, with search staying exact throughout and
retired files remaining on disk (logical removal, format semantics)."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.indices import SubstringIndex
from rottnest_spark.indices.exact import ExactIndex
from rottnest_spark.sources.delta import delta_live_files
from rottnest_spark.sources.delta_write import delta_write
from rottnest_spark.sources.iceberg import iceberg_live_files
from rottnest_spark.sources.iceberg_write import iceberg_write
from rottnest_spark.sources.writable import (
    DeltaWritableLake,
    IcebergWritableLake,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def oracle_ids(df, q):
    return sorted(
        r["doc_id"]
        for r in df.filter(F.contains(F.lower("text"), F.lit(q))).collect()
    )


def test_delta_append_and_search(spark, docs, tmp_path):
    table = str(tmp_path / "dt")
    delta_write(docs.filter("doc_id < 300").repartition(2), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    new = lake.append(docs.filter("doc_id >= 300"))
    # the append landed in the log, not just on disk
    assert set(new) <= set(delta_live_files(table))
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", "merge sort").collect())
    assert got == oracle_ids(docs, "merge sort")


def test_delta_row_level_delete_commits(spark, docs, tmp_path):
    table = str(tmp_path / "dt")
    delta_write(docs.repartition(3), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "doc_id")
    victim = docs.limit(1).collect()[0]["doc_id"]
    pre_versions = len(glob.glob(table + "/_delta_log/*.json"))
    stats = lake.delete_matching(idx, "doc_id", victim)
    assert stats["n_deleted"] == 1
    # one new commit; rewritten file(s) added, replaced file(s) removed
    assert len(glob.glob(table + "/_delta_log/*.json")) == pre_versions + 1
    live = set(delta_live_files(table))
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(*sorted(live)).select("doc_id").collect()
    )
    assert victim not in ids and len(ids) == docs.count() - 1
    # the replaced physical file is retained on disk (logical removal)
    on_disk = set(glob.glob(table + "/*.parquet"))
    assert on_disk - live, "retired file should remain until format VACUUM"


def test_delta_compaction_commits_swap(spark, docs, tmp_path):
    table = str(tmp_path / "dt")
    delta_write(docs.repartition(6), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    before = sorted(r["doc_id"] for r in lake.read().select("doc_id").collect())
    new_files = lake.compact_files(target_rows=10_000)
    assert new_files
    live = set(delta_live_files(table))
    assert set(new_files) <= live
    after = sorted(r["doc_id"] for r in lake.read().select("doc_id").collect())
    assert after == before
    assert len(live) < 6 + 1


def test_delta_time_travel_reaches_pre_delete(spark, docs, tmp_path):
    table = str(tmp_path / "dt")
    delta_write(docs.repartition(2), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "doc_id")
    victim = docs.limit(1).collect()[0]["doc_id"]
    lake.delete_matching(idx, "doc_id", victim)
    assert victim not in {
        r["doc_id"] for r in lake.read().select("doc_id").collect()
    }
    pinned = DeltaWritableLake(
        spark, table, str(tmp_path / "idx2"), version_as_of=0
    )
    assert victim in {
        r["doc_id"] for r in pinned.read().select("doc_id").collect()
    }
    with pytest.raises(ValueError, match="read-only"):
        pinned.append(docs.limit(1))


def test_delete_then_compact_never_resurrects(spark, docs, tmp_path):
    """Regression: a logically-removed file stays on DISK, and a later
    rewrite's adds-diff must not mistake it for a new file and re-add it
    (rows of deleted data would resurrect in the snapshot)."""
    table = str(tmp_path / "dt")
    delta_write(docs.repartition(4), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "doc_id")
    victim = docs.limit(1).collect()[0]["doc_id"]
    lake.delete_matching(idx, "doc_id", victim)
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") != victim)
        .select("doc_id")
        .collect()
    )
    lake.compact_files(target_rows=10_000)
    after = sorted(r["doc_id"] for r in lake.read().select("doc_id").collect())
    assert after == want  # deleted row must NOT come back
    # and appends still work on top
    lake.append(docs.limit(0))  # empty append allowed? ensure no crash
    assert sorted(
        r["doc_id"] for r in lake.read().select("doc_id").collect()
    ) == want


def test_iceberg_dml_roundtrip(spark, docs, tmp_path):
    table = str(tmp_path / "it")
    iceberg_write(docs.filter("doc_id < 300").repartition(2), table)
    lake = IcebergWritableLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    lake.append(docs.filter("doc_id >= 300"))
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", "merge sort").collect())
    assert got == oracle_ids(docs, "merge sort")
    # row-level delete commits a rewrite snapshot
    eidx = ExactIndex()
    lake.build_index(eidx, "doc_id")
    victim = docs.limit(1).collect()[0]["doc_id"]
    lake.delete_matching(eidx, "doc_id", victim)
    live = iceberg_live_files(table)
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(*live).select("doc_id").collect()
    }
    assert victim not in ids and len(ids) == docs.count() - 1
    # post-churn search still exact (index liveness over the new snapshot)
    after = sorted(
        r["doc_id"] for r in lake.search(idx, "text", "merge sort").collect()
    )
    want = oracle_ids(docs.filter(F.col("doc_id") != victim), "merge sort")
    assert after == want
