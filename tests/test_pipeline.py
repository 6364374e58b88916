"""Curation pipeline: stage monotonicity, near-dup removal, report parity."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.ops import dedup
from rottnest_spark.ops.pipeline import curate_documents, curation_report


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_stage_monotonicity_and_report(spark, docs):
    rep = curation_report(docs, "doc_id", "text").collect()[0]
    assert (
        rep["n_input"]
        >= rep["n_after_quality"]
        >= rep["n_after_exact_dedup"]
        >= rep["n_after_near_dedup"]
        > 0
    )
    out = curate_documents(docs, "doc_id", "text")
    assert out.count() == rep["n_after_near_dedup"]


def test_no_surviving_near_dup_pair(spark, docs):
    """No two survivors form a near-dup pair at the pipeline threshold."""
    out = curate_documents(docs, "doc_id", "text")
    pairs = dedup.minhash_lsh_pairs(out, "doc_id", "text", threshold=0.5)
    assert pairs.count() == 0


def test_skew_guard_report_no_silent_caps(spark, docs):
    """The default max_bucket guard must be visible: the report counts
    dropped buckets/pairs, zero on this fixture at the default bound, and a
    deliberately tiny bound shows up as dropped buckets + extra survivors
    (fewer candidate pairs -> fewer losers removed)."""
    rep = curation_report(docs, "doc_id", "text").collect()[0]
    assert rep["n_dropped_buckets"] == 0  # default bound ample here

    tiny = curation_report(docs, "doc_id", "text", max_bucket=1).collect()[0]
    assert tiny["n_dropped_buckets"] > 0
    assert tiny["dropped_candidate_pairs"] > 0
    assert tiny["n_after_near_dedup"] >= rep["n_after_near_dedup"]

    stats = dedup.lsh_bucket_stats(docs, "doc_id", "text", max_bucket=1).collect()[0]
    assert stats["n_buckets"] >= stats["n_dropped_buckets"] > 0
    assert stats["max_bucket_size"] > 1


def test_guarded_equals_exact_when_no_bucket_oversized(spark, docs):
    """With the default bound and no oversized bucket, the guarded pipeline
    is bit-identical to the exact (max_bucket=None) one."""
    a = sorted(
        r["doc_id"] for r in curate_documents(docs, "doc_id", "text").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in curate_documents(
            docs, "doc_id", "text", max_bucket=None
        ).collect()
    )
    assert a == b


def test_exact_dups_collapse(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again ok"),
        (2, "the quick brown fox jumps over the lazy dog again and again ok"),
        (3, "a completely different document about the spark optimizer and it"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(r["doc_id"] for r in curate_documents(df, "doc_id", "text").collect())
    assert 2 not in out and 1 in out and 3 in out
