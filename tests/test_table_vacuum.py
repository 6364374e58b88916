"""Physical table retention: delta_vacuum_table (the VACUUM command's
semantics — unreferenced data files and deletion-vector bins, with a
time-travel retention window) and iceberg_expire_snapshots (prune the
snapshot log, delete files only expired snapshots referenced). These
bound storage growth that index-level vacuum (ParquetLake.vacuum) never
touches."""

import json
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.delta import DeltaSnapshotLake, delta_live_files
from rottnest_spark.sources.delta_write import (
    delta_convert,
    delta_delete_rows,
    delta_rewrite_deletes,
    delta_vacuum_table,
)
from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    iceberg_live_files,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_commit,
    iceberg_convert,
    iceberg_expire_snapshots,
    iceberg_write,
)


def _mk(spark, sf_dir, path, parts=3):
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
        .repartition(parts)
        .write.parquet(path)
    )


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_delta_vacuum_reclaims_orphans_and_old_dv_bins(spark, sf_dir, tmp_path):
    t = str(tmp_path / "dv")
    _mk(spark, sf_dir, t)
    delta_convert(t)
    lake = DeltaSnapshotLake(spark, t, t + "_idx")
    # big delete -> shared .bin vector; rewrite orphans it + the old files
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey")
        .write.mode("overwrite")
        .parquet(t + "_ignore")  # unrelated, just ensures enough rows
    )
    delta_delete_rows(spark, t, "doc_id >= 0 AND doc_id % 2 = 0")
    expect = _ids(lake.read())
    delta_rewrite_deletes(spark, t)
    on_disk = [
        f for f in os.listdir(t) if f.endswith(".parquet") or f.endswith(".bin")
    ]
    live = {os.path.basename(f) for f in delta_live_files(t)}
    assert set(on_disk) - live  # orphans exist (replaced files +/- bins)

    dry = delta_vacuum_table(t, older_than_sec=0, dry_run=True)
    assert dry and all(os.path.exists(f) for f in dry)
    gone = delta_vacuum_table(t, older_than_sec=0)
    assert gone == dry
    assert not any(os.path.exists(f) for f in gone)
    # live snapshot unharmed
    assert _ids(lake.read()) == expect
    remaining = {
        f for f in os.listdir(t) if f.endswith((".parquet", ".bin"))
    }
    assert remaining == live


def test_delta_vacuum_retention_window_protects_recent(spark, sf_dir, tmp_path):
    t = str(tmp_path / "dret")
    _mk(spark, sf_dir, t)
    delta_convert(t)
    delta_delete_rows(spark, t, "doc_id % 2 = 0")
    delta_rewrite_deletes(spark, t)  # fresh orphans
    kept = delta_vacuum_table(t, older_than_sec=3600)
    assert kept == []  # everything is younger than the window
    # time travel to version 0 still works because nothing was deleted
    lake0 = DeltaSnapshotLake(spark, t, t + "_i", version_as_of=0)
    assert lake0.read().count() == 300


def test_delta_vacuum_keeps_live_dv_bins(spark, sf_dir, tmp_path):
    t = str(tmp_path / "dbin")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .repartition(2)
        .write.parquet(t)
    )
    delta_convert(t)
    delta_delete_rows(spark, t, "o_orderkey % 2 = 0")  # big -> .bin storage
    bins = [f for f in os.listdir(t) if f.startswith("deletion_vector_")]
    assert bins  # the vector spilled to a bin file
    gone = delta_vacuum_table(t, older_than_sec=0)
    assert not any("deletion_vector_" in f for f in gone)
    lake = DeltaSnapshotLake(spark, t, t + "_idx")
    assert lake.read().filter("o_orderkey % 2 = 0").count() == 0


def test_iceberg_expire_keep_last(spark, sf_dir, tmp_path):
    t = str(tmp_path / "iexp")
    _mk(spark, sf_dir, t)
    iceberg_convert(t)  # snapshot 1
    extra = spark.range(1000, 1010).selectExpr(
        "id AS doc_id", "'xx' AS lang", "cast(1 as bigint) AS n_chars"
    )
    iceberg_write(extra, t, mode="append")  # snapshot 2
    # snapshot 3: rewrite — remove one original file (its bytes orphan)
    live = iceberg_live_files(t)
    victim = sorted(live)[0]
    iceberg_commit(t, remove=[victim])
    lake = IcebergSnapshotLake(spark, t, t + "_idx")
    expect = _ids(lake.read())

    dry = iceberg_expire_snapshots(t, keep_last=1, dry_run=True)
    assert victim in dry
    gone = iceberg_expire_snapshots(t, keep_last=1)
    assert victim in gone and not os.path.exists(victim)
    # pruned log: only the current snapshot remains; reads unchanged
    metas = sorted(
        f
        for f in os.listdir(os.path.join(t, "metadata"))
        if f.endswith(".metadata.json")
    )
    md = json.loads(open(os.path.join(t, "metadata", metas[-1])).read())
    assert len(md["snapshots"]) == 1
    assert _ids(lake.read()) == expect
    # expired snapshots' manifest lists are gone too
    assert not any("snap-1-" in f for f in os.listdir(os.path.join(t, "metadata")))
    # idempotent: nothing further to expire
    assert iceberg_expire_snapshots(t, keep_last=1) == []


def test_iceberg_expire_protects_shared_files(spark, sf_dir, tmp_path):
    """Files referenced by BOTH an expired and a kept snapshot survive."""
    t = str(tmp_path / "ishare")
    _mk(spark, sf_dir, t)
    iceberg_convert(t)  # snapshot 1 references the 3 originals
    extra = spark.range(5).selectExpr(
        "id AS doc_id", "'xx' AS lang", "cast(1 as bigint) AS n_chars"
    )
    iceberg_write(extra, t, mode="append")  # snapshot 2 references them too
    before = set(iceberg_live_files(t))
    gone = iceberg_expire_snapshots(t, keep_last=1)
    assert gone == [] or all(f not in before for f in gone)
    assert set(iceberg_live_files(t)) == before


def test_iceberg_expire_arg_validation(spark, sf_dir, tmp_path):
    t = str(tmp_path / "iargs")
    _mk(spark, sf_dir, t, parts=1)
    iceberg_convert(t)
    with pytest.raises(ValueError, match="exactly one"):
        iceberg_expire_snapshots(t)
    with pytest.raises(ValueError, match="exactly one"):
        iceberg_expire_snapshots(t, keep_last=1, older_than_ms=0)


def test_iceberg_expire_on_upserted_table(spark, sf_dir, tmp_path):
    """Expiration walks delete-bearing snapshots too: an upserted table
    expires its pre-upsert snapshot without touching files the current
    snapshot still references (including the equality delete file)."""
    from rottnest_spark.sources.iceberg_write import iceberg_upsert

    t = str(tmp_path / "iexq")
    _mk(spark, sf_dir, t)
    iceberg_convert(t)  # snapshot 1
    changes = spark.createDataFrame(
        [(i, "xx", -1) for i in range(5)],
        "doc_id long, lang string, n_chars long",
    )
    iceberg_upsert(spark, changes, t, ["doc_id"])  # snapshot 2
    lake = IcebergSnapshotLake(spark, t, t + "_idx")
    expect = sorted(
        (r.doc_id, r.n_chars) for r in lake.read().collect()
    )
    gone = iceberg_expire_snapshots(t, keep_last=1)
    # snapshot 1's manifests went; shared data + the eq delete survive
    assert all(f.endswith(".avro") for f in gone)
    assert sorted(
        (r.doc_id, r.n_chars) for r in lake.read().collect()
    ) == expect


def test_delta_log_cleanup_after_checkpoint(spark, sf_dir, tmp_path):
    from rottnest_spark.sources.delta_write import (
        delta_checkpoint,
        delta_cleanup_log,
        delta_commit_retry,
    )

    t = str(tmp_path / "dlog")
    _mk(spark, sf_dir, t)
    delta_convert(t)
    delta_delete_rows(spark, t, "doc_id % 5 = 0")
    lake = DeltaSnapshotLake(spark, t, t + "_idx")
    expect = _ids(lake.read())
    # nothing checkpointed yet: cleanup refuses to touch the log
    assert delta_cleanup_log(t, older_than_sec=0) == []
    v = delta_checkpoint(t)
    gone = delta_cleanup_log(t, older_than_sec=0)
    assert gone and all(
        int(os.path.basename(f).split(".")[0]) <= v for f in gone
    )
    # replay works from the checkpoint alone, deletes still applied
    assert _ids(lake.read()) == expect
    # post-checkpoint commits survive
    extra = os.path.join(t, "late.parquet")
    spark.range(3).selectExpr(
        "id AS doc_id", "'xx' AS lang", "cast(1 as bigint) AS n_chars"
    ).coalesce(1).write.parquet(t + "_st")
    import glob as g
    import shutil

    shutil.move(g.glob(f"{t}_st/*.parquet")[0], extra)
    delta_commit_retry(t, add=[extra])
    assert len(_ids(lake.read())) == len(expect) + 3
    remaining = [
        f
        for f in os.listdir(os.path.join(t, "_delta_log"))
        if f.endswith(".json")
    ]
    assert remaining  # the post-checkpoint commit file is intact
