"""Runnable end-to-end training-data curation pipeline:

    quality filter → exact dedup → near dedup (MinHash) → decontamination
    → quality-weighted sampling → token-budget mixing → token-shard export
    with a verified manifest

Every stage is a DataFrame → DataFrame operator from rottnest_spark.ops;
the output is the artifact a data loader consumes.

Usage: python examples/curation_tour.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rottnest_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("curation-tour", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="curation_tour_")
    try:
        from rottnest_spark.ops.decontam import ngram_overlap
        from rottnest_spark.ops.dedup import exact_dup_groups, minhash_lsh_pairs
        from rottnest_spark.ops.export import verify_shards, write_token_shards
        from rottnest_spark.ops.sampling import (
            mixture_by_tokens,
            quality_weighted_sample,
        )
        from rottnest_spark.ops.textstats import quality_signals

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n0 = docs.count()

        # 1. quality gate
        q = quality_signals(docs, "doc_id", "text").filter("keep")
        docs = docs.join(q.select(F.col("id").alias("doc_id")), "doc_id", "semi")
        n1 = docs.count()

        # 2. exact dedup (drop every duplicate beyond the keeper)
        dups = exact_dup_groups(docs, "doc_id", "text")
        docs = (
            docs.withColumn("__h__", F.md5("text"))
            .join(
                dups.select(
                    F.col("content_hash").alias("__h__"), "keep_id"
                ),
                "__h__",
                "left",
            )
            .filter(
                F.col("keep_id").isNull()
                | (F.col("doc_id") == F.col("keep_id"))
            )
            .drop("__h__", "keep_id")
        )
        n2 = docs.count()

        # 3. near dedup: drop the larger id of each near-pair
        pairs = minhash_lsh_pairs(docs, "doc_id", "text")
        drop = pairs.select(
            F.greatest("id_a", "id_b").alias("doc_id")
        ).distinct()
        docs = docs.join(drop, "doc_id", "left_anti")
        n3 = docs.count()

        # 4. decontamination vs the held-out slice (doc_id % 50 == 0)
        flagged = ngram_overlap(
            docs.filter("doc_id % 50 != 0"), docs.filter("doc_id % 50 = 0"),
            "doc_id", "text",
        ).filter("contaminated")
        docs = docs.filter("doc_id % 50 != 0").join(
            flagged.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
        )
        n4 = docs.count()

        # 5. quality-weighted downsample (length prior)
        docs = quality_weighted_sample(
            docs.withColumn("w", F.col("n_chars") / 400.0), "doc_id", "w"
        )
        n5 = docs.count()

        # 6. token-budget mixing per source (the training recipe: only
        # budgeted sources participate — the fixture has 20 sources, this
        # recipe takes three of them) + 7. shard export
        docs = docs.withColumn("n_tokens", F.size(F.split(F.lower("text"), " ")))
        mixed = mixture_by_tokens(
            docs, "doc_id", "source", "n_tokens",
            {"src0": 20_000, "src1": 10_000, "src2": 5_000},
        )
        out = os.path.join(work, "shards")
        man = write_token_shards(
            mixed.select("doc_id", "source", "n_tokens", "text"),
            "doc_id", "n_tokens", out, shard_tokens=4_000,
            partition_col="source",
        )
        bad = verify_shards(spark, out, "doc_id", "n_tokens")
        print(
            f"pipeline: {n0} → quality {n1} → exact {n2} → near {n3} "
            f"→ decontam {n4} → sampled {n5} → mixed {man['total_docs']} docs "
            f"/ {man['total_tokens']} tokens in {man['n_shards']} shards"
        )
        assert bad == [], bad
        print("manifest verified: all shards intact — curation tour OK")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
