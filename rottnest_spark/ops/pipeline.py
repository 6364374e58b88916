"""Composable training-data curation pipeline.

`curate_documents` chains the individual operators into the canonical
pretraining-data flow, entirely as DataFrame composition (each stage's
output feeds the next lazily — Catalyst optimizes across stage boundaries,
so e.g. the quality-signal projection and the dedup shingling share one
scan):

    1. quality filter   (ops/textstats.quality_signals, keep == true)
    2. exact dedup      (keep the min-id representative per content hash)
    3. near dedup       (MinHash+LSH pairs; drop the larger id of every
                         verified pair — a deterministic, order-free policy:
                         a doc survives iff it is not the max side of any
                         near-dup pair among quality survivors)

Returns the surviving rows plus a `stage` audit column is NOT included by
design — pipelines at 100 TB write one curated table; audit counts come
from `curation_report`, which computes per-stage drop counts in one pass
over the same lazy stages (no extra scans of the raw lake).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rottnest_spark.ops import dedup, textstats

from rottnest_spark.core.smalldf import local_df


#: pipeline default for the LSH bucket skew guard: one boilerplate band key
#: shared by B docs emits B² candidate pairs, so at corpus scale a single
#: degenerate bucket can dominate the whole dedup job. 500 bounds any bucket
#: to ~125k pairs. This is an explicit recall trade (pairs co-occurring ONLY
#: in oversized buckets are missed) — `curation_report` surfaces the dropped
#: count so a capped run is never silently capped. Pass max_bucket=None for
#: the exact (oracle) behavior.
DEFAULT_MAX_BUCKET = 500


def curate_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Surviving (id) rows after quality filter -> exact dedup -> near dedup."""
    quality = textstats.quality_signals(df, id_col, text_col).filter("keep")
    survivors = df.join(
        quality.select(F.col("id").alias(id_col)), id_col, "leftsemi"
    )

    # exact dedup: keep min id per content hash
    keep_exact = (
        survivors.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col)
    )
    deduped = survivors.join(keep_exact, id_col, "leftsemi")

    # near dedup among remaining docs: drop the max side of each pair
    pairs = dedup.minhash_lsh_pairs(
        deduped, id_col, text_col, threshold=jaccard_threshold,
        max_bucket=max_bucket,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return deduped.join(losers, id_col, "left_anti")


def curation_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """One-row audit: input/survivor counts per stage, plus the skew-guard
    report (buckets dropped by max_bucket and the candidate pairs they
    would have emitted) — a capped run is never silently capped."""
    n_input = df.count()
    quality = textstats.quality_signals(df, id_col, text_col).filter("keep")
    survivors = df.join(
        quality.select(F.col("id").alias(id_col)), id_col, "leftsemi"
    )
    n_quality = survivors.count()
    keep_exact = (
        survivors.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col)
    )
    deduped = survivors.join(keep_exact, id_col, "leftsemi")
    n_exact = deduped.count()
    n_final = curate_documents(
        df, id_col, text_col, jaccard_threshold, max_bucket=max_bucket
    ).count()
    guard = dedup.lsh_bucket_stats(
        deduped, id_col, text_col, max_bucket=max_bucket
    ).collect()[0]
    spark = df.sparkSession
    return local_df(
        spark,
        [
            (
                n_input,
                n_quality,
                n_exact,
                n_final,
                guard["n_dropped_buckets"],
                guard["dropped_candidate_pairs"],
            )
        ],
        "n_input long, n_after_quality long, n_after_exact_dedup long, "
        "n_after_near_dedup long, n_dropped_buckets long, "
        "dropped_candidate_pairs long",
    )
