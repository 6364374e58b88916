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
