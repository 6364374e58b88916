"""Cluster-balanced (diversity) sampling: per-cluster cap, determinism,
clustering-only mode."""

import pyspark.sql.functions as F

from rottnest_spark.ops.sampling import cluster_balanced_sample


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_cap_and_subset(spark, sf_dir):
    df = _emb(spark, sf_dir)
    out = cluster_balanced_sample(
        df, "vec_id", "embedding", rows_per_centroid=32, cap_per_cluster=10
    )
    sizes = out.groupBy("cluster_id").count().collect()
    assert sizes and all(r["count"] <= 10 for r in sizes)
    in_ids = {r[0] for r in df.select("vec_id").collect()}
    out_ids = [r[0] for r in out.select("vec_id").collect()]
    assert set(out_ids) <= in_ids
    assert len(out_ids) == len(set(out_ids))  # no dup rows


def test_deterministic(spark, sf_dir):
    df = _emb(spark, sf_dir)
    a = sorted(
        r[0]
        for r in cluster_balanced_sample(
            df, "vec_id", "embedding", rows_per_centroid=32, cap_per_cluster=7
        ).select("vec_id").collect()
    )
    b = sorted(
        r[0]
        for r in cluster_balanced_sample(
            df, "vec_id", "embedding", rows_per_centroid=32, cap_per_cluster=7
        ).select("vec_id").collect()
    )
    assert a == b and a


def test_cluster_only_mode_keeps_all_rows(spark, sf_dir):
    df = _emb(spark, sf_dir)
    out = cluster_balanced_sample(
        df, "vec_id", "embedding", rows_per_centroid=32,
        cap_per_cluster=10**9,
    )
    assert out.count() == df.count()
    assert out.select("cluster_id").distinct().count() > 1


def test_flattens_distribution(spark, sf_dir):
    df = _emb(spark, sf_dir)
    full = cluster_balanced_sample(
        df, "vec_id", "embedding", rows_per_centroid=32, cap_per_cluster=10**9
    )
    before = full.groupBy("cluster_id").count()
    mx_before = before.agg(F.max("count")).collect()[0][0]
    capped = cluster_balanced_sample(
        df, "vec_id", "embedding", rows_per_centroid=32
    )  # default cap = mean cluster size
    mx_after = (
        capped.groupBy("cluster_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert mx_after <= mx_before
    n, k = df.count(), before.count()
    assert mx_after <= max(1, n // k)
