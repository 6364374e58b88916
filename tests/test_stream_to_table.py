"""Streaming ingestion into format-backed lakes: every micro-batch lands
as a transaction-log commit; dedup-keyed ingestion skips rows the lake's
index already knows."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.indices import SubstringIndex
from rottnest_spark.indices.exact import ExactIndex
from rottnest_spark.sources.delta import delta_live_files
from rottnest_spark.sources.delta_write import delta_write
from rottnest_spark.sources.writable import DeltaWritableLake
from rottnest_spark.streaming.ingest import stream_ingest_to_table


@pytest.fixture()
def incoming(spark, sf_dir, tmp_path):
    """Stream source dir: the back half of documents split into 3 files."""
    src = str(tmp_path / "incoming")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id >= 250")
        .repartition(3)
        .write.parquet(src)
    )
    return src


def test_stream_appends_commit_per_batch(spark, sf_dir, incoming, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = str(tmp_path / "dt")
    delta_write(docs.filter("doc_id < 250").repartition(2), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    pre_commits = len(glob.glob(table + "/_delta_log/*.json"))

    schema = docs.schema
    stats = stream_ingest_to_table(
        spark,
        incoming,
        schema,
        lake,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    assert len(stats) >= 2  # one commit per non-empty batch
    assert len(glob.glob(table + "/_delta_log/*.json")) == pre_commits + len(stats)
    n = spark.read.parquet(*delta_live_files(table)).count()
    assert n == docs.count()
    # index the grown snapshot and search exactly
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    q = "merge sort"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(q))).collect()
    )
    assert got == want


def test_stream_dedup_key_skips_known_rows(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = str(tmp_path / "dt")
    delta_write(docs.filter("doc_id < 300").repartition(2), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    lake.build_index(ExactIndex(), "doc_id")
    # incoming OVERLAPS the lake: 200..499 (100 dupes, 200 new)
    src = str(tmp_path / "in2")
    docs.filter("doc_id >= 200").repartition(2).write.parquet(src)
    stats = stream_ingest_to_table(
        spark, src, docs.schema, lake, str(tmp_path / "ckpt2"),
        dedup_key="doc_id",
    )
    kept = sum(s["rows"] for s in stats)
    assert kept == 200  # only the genuinely-new keys landed
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(*delta_live_files(table))
        .select("doc_id")
        .collect()
    )
    assert ids == sorted(r["doc_id"] for r in docs.select("doc_id").collect())


def test_stream_dedup_sees_unindexed_appends(spark, sf_dir, tmp_path):
    """Round-4 ADVICE: the dedup reference set must include keys of files
    appended since the last index build. Two scenarios in one flow:
    (a) a key repeated across micro-batches within one run — the earlier
    batch's append is unindexed but must still block the later batch;
    (b) a full crash-replay (checkpoint lost, same source re-run) must
    land ZERO rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = str(tmp_path / "dt")
    delta_write(docs.filter("doc_id < 100").repartition(2), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    lake.build_index(ExactIndex(), "doc_id")

    # source: two files with OVERLAPPING new keys (500-599, 550-649),
    # deterministic key ranges via row_number
    src = str(tmp_path / "in3")
    os.makedirs(src)
    fill = docs.filter("doc_id < 100")
    from pyspark.sql import Window

    w = Window.orderBy("text")
    src_rows = fill.withColumn("__rn", F.row_number().over(w) - 1)
    fa = src_rows.filter("__rn < 100").withColumn(
        "doc_id", (F.col("__rn") + 500).cast(docs.schema["doc_id"].dataType)
    ).drop("__rn").select(docs.columns)
    fb = src_rows.filter("__rn < 100").withColumn(
        "doc_id", (F.col("__rn") + 550).cast(docs.schema["doc_id"].dataType)
    ).drop("__rn").select(docs.columns)
    fa.coalesce(1).write.parquet(src + "/a")
    fb.coalesce(1).write.parquet(src + "/b")
    # flatten into one dir of two parquet files
    import shutil

    flat = str(tmp_path / "in3_flat")
    os.makedirs(flat)
    for i, d in enumerate(("a", "b")):
        part = glob.glob(f"{src}/{d}/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/f{i}.parquet")

    stats = stream_ingest_to_table(
        spark, flat, docs.schema, lake, str(tmp_path / "ckpt3"),
        dedup_key="doc_id", max_files_per_trigger=1,
    )
    landed = sum(s["rows"] for s in stats)
    assert landed == 150, f"overlap must dedup across batches, landed={landed}"
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(*delta_live_files(table))
        .select("doc_id").collect()
    ]
    assert len(ids) == len(set(ids)) == 100 + 150

    # (b) crash replay: lose the checkpoint, re-run the same source — the
    # appended files are still unindexed, yet nothing may re-land
    stats2 = stream_ingest_to_table(
        spark, flat, docs.schema, lake, str(tmp_path / "ckpt3b"),
        dedup_key="doc_id", max_files_per_trigger=1,
    )
    assert sum(s["rows"] for s in stats2) == 0
    ids2 = [
        r["doc_id"]
        for r in spark.read.parquet(*delta_live_files(table))
        .select("doc_id").collect()
    ]
    assert sorted(ids2) == sorted(ids)


def test_stream_appends_into_partitioned_table(spark, sf_dir, tmp_path):
    """Streaming ingestion into a PARTITIONED Delta table: each
    micro-batch commits hive-staged adds whose partitionValues parse from
    the col=value paths (composition of round-6 partitioned append with
    the per-batch commit protocol)."""
    from rottnest_spark.sources.delta import delta_live_adds

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    table = str(tmp_path / "pt")
    delta_write(docs.filter("doc_id < 250"), table, partition_by=["lang"])
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))

    src = str(tmp_path / "incoming")
    docs.filter("doc_id >= 250").repartition(2).write.parquet(src)
    stats = stream_ingest_to_table(
        spark,
        src,
        docs.schema,
        lake,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert stats
    assert lake.read().count() == docs.count()
    adds = delta_live_adds(table)
    assert adds
    for f, pv in adds.items():
        seg = [s for s in f.split("/") if s.startswith("lang=")]
        assert len(seg) == 1 and set(pv) == {"lang"}
        want = seg[0].split("=", 1)[1]
        assert pv["lang"] == (
            None if want == "__HIVE_DEFAULT_PARTITION__" else want
        )


def test_stream_ingest_upsert_iceberg(spark, sf_dir, tmp_path):
    """CDC micro-batches upsert into an Iceberg table: each batch is ONE
    equality-delete snapshot; the final table equals last-write-wins
    over the feed, read through the eq-delete-aware snapshot read."""
    from rottnest_spark.sources.iceberg import IcebergSnapshotLake
    from rottnest_spark.sources.iceberg_write import iceberg_convert
    from rottnest_spark.streaming.ingest import stream_ingest_upsert

    table = str(tmp_path / "ice_upsert")
    (
        spark.createDataFrame(
            [(i, 0.0) for i in range(100)], "k long, v double"
        )
        .repartition(2)
        .write.parquet(table)
    )
    iceberg_convert(table)

    src = str(tmp_path / "feed")
    import os as _os

    _os.makedirs(src)
    # two change files -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [(i, 1.0) for i in range(0, 30)] + [(1000, 1.0)], "k long, v double"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(i, 2.0) for i in range(20, 40)], "k long, v double"
    ).coalesce(1).write.mode("append").parquet(src)

    stats = stream_ingest_upsert(
        spark,
        src,
        "k long, v double",
        table,
        ["k"],
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert len(stats) >= 1 and sum(s["rows"] for s in stats) == 51
    lake = IcebergSnapshotLake(spark, table, str(tmp_path / "idx"))
    got = {r.k: r.v for r in lake.read().collect()}
    assert len(got) == 101
    assert got[1000] == 1.0
    assert all(got[i] == 2.0 for i in range(20, 40))
    assert all(got[i] == 1.0 for i in range(0, 20))
    assert all(got[i] == 0.0 for i in range(40, 100))
