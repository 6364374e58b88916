"""Pins the independent numpy recomputes (rottnest_spark/oracles.py) to
the engine pipelines they oracle — semantic_dedup and
cluster_balanced_sample — at the smallest fixture. The correctness gate
re-checks this through DuckDB at sf0.01; this test catches drift (a
changed sampling seed, a different Lloyd iteration count, a new
tie-break) in plain pytest, where the diff that caused it is still on
screen."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"
EMB = f"{SF}/embeddings.parquet"


def test_semantic_dedup_recompute_matches_engine(spark):
    from rottnest_spark import oracles as orc
    from rottnest_spark.ops import dedup

    tau = 0.45
    kept = dedup.semantic_dedup(
        spark.read.parquet(EMB), "vec_id", "embedding", tau
    )
    got = sorted((r.vec_id, r.label) for r in kept.select("vec_id", "label").collect())
    exp = sorted(orc.semantic_dedup_expected(EMB, tau))
    assert got == exp


def test_diversity_sample_recompute_matches_engine(spark):
    from rottnest_spark import oracles as orc
    from rottnest_spark.ops.sampling import cluster_balanced_sample

    got = sorted(
        (r.vec_id, r.label, r.cluster_id)
        for r in cluster_balanced_sample(
            spark.read.parquet(EMB),
            "vec_id",
            "embedding",
            rows_per_centroid=64,
            cap_per_cluster=16,
        ).select("vec_id", "label", "cluster_id").collect()
    )
    exp = sorted(orc.diversity_sample_expected(EMB))
    assert got == exp


def test_signature_matches_duckdb():
    """The SQL branch key and the Python-side key must agree exactly —
    an IEEE divergence here would select no branch and fail every gate
    run loudly; this pins the arithmetic parity."""
    import duckdb

    from rottnest_spark import oracles as orc

    n, s = orc._signature(EMB)
    dn, ds = duckdb.sql(
        f"SELECT {orc._SIG_SQL} FROM read_parquet('{EMB}')"
    ).fetchone()
    assert (n, s) == (dn, ds)


def test_bucket_matches_spark_expr(spark):
    """The pure-Python _bucket twin must equal ops.sampling._bucket's
    Spark expression for the same (seed, id) — the sampling membership
    the recompute reproduces hangs on this."""
    from pyspark.sql import functions as F

    from rottnest_spark import oracles as orc
    from rottnest_spark.ops.sampling import _bucket as spark_bucket

    df = spark.range(500).select(F.col("id").cast("long"))
    rows = df.select("id", spark_bucket("id", "ivf:42").alias("b")).collect()
    for r in rows[:200]:
        assert orc._bucket("ivf:42", r.id) == r.b, r.id


def test_empty_fixture_root_degrades_loudly(tmp_path, monkeypatch):
    import pytest

    from rottnest_spark import oracles as orc

    monkeypatch.setattr(orc, "_TESTDATA_ROOT", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        orc.diversity_sample_oracle_sql()


def test_signature_floor_is_exact():
    """floor(f32→f64 * 1000) must be integer-exact on both sides; spot
    the round-trip math the signature depends on."""
    import numpy as np

    for v in (0.1234, -0.9999, 0.0, 1.5, -2.25):
        f = np.float32(v)
        assert math.floor(float(f) * 1000) == int(np.floor(np.float64(f) * 1000))
