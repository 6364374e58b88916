"""Z-order layout rewrite: Morton-key correctness, row preservation, and
the actual point — a 2-D box predicate prunes far more files than a linear
sort allows."""

import glob
import os

import pyspark.sql.functions as F

from rottnest_spark.ops.zorder import (
    prunable_files,
    zorder_key,
    zorder_write,
)


def test_zorder_key_interleaves_bits(spark):
    # 2 cols, 2 bits each, bounds [0,3]: Morton code of (x=2=0b10, y=1=0b01)
    # = bits x0,y0,x1,y1 -> 0b0110 = 6
    df = spark.createDataFrame([(2.0, 1.0)], "x double, y double")
    z = df.select(
        zorder_key([("x", 0.0, 3.0), ("y", 0.0, 3.0)], bits=2).alias("z")
    ).collect()[0]["z"]
    assert z == 0b0110
    # locality: neighbors in both dims have nearby codes, far points don't
    pts = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (3.0, 3.0)]
    codes = [
        spark.createDataFrame([p], "x double, y double")
        .select(zorder_key([("x", 0.0, 3.0), ("y", 0.0, 3.0)], bits=2).alias("z"))
        .collect()[0]["z"]
        for p in pts
    ]
    assert max(codes[:3]) < codes[3]


def test_zorder_write_prunes_2d_box(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_files = 16

    lin_dir = str(tmp_path / "linear")
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(lin_dir)
    )
    z_dir = str(tmp_path / "zorder")
    bounds = zorder_write(ev, ["user_id", "value"], z_dir, n_files)
    assert [b[0] for b in bounds] == ["user_id", "value"]

    # row preservation
    assert (
        spark.read.parquet(z_dir).count() == ev.count()
    )

    # the z-order payoff: a predicate on the SECOND clustering column.
    # A linear sort on user_id leaves value unclustered (every file spans
    # the full value range -> zero pruning); the Morton layout gives every
    # file a bounded value range too.
    row = ev.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.expr("percentile(value, 0.9)").alias("vlo"),
        F.max("value").alias("vhi"),
    ).collect()[0]
    box = {
        "user_id": (row["ulo"], row["uhi"]),  # unconstrained
        "value": (row["vlo"], row["vhi"]),  # top decile
    }
    lin_files = sorted(glob.glob(f"{lin_dir}/*.parquet"))
    z_files = sorted(glob.glob(f"{z_dir}/*.parquet"))
    assert len(z_files) == n_files

    lin_cand, _ = prunable_files(lin_files, box)
    z_cand, z_pruned = prunable_files(z_files, box)
    # linear layout barely prunes a value-only predicate (only files whose
    # few rows happen to miss the decile drop out)
    assert len(lin_cand) >= n_files * 3 // 4
    # the morton layout prunes at least half the files for a decile band,
    # and at least halves the candidate set vs the linear sort
    assert len(z_pruned) >= n_files // 2
    assert len(z_cand) * 2 <= len(lin_cand)

    # pruning is SOUND: scanning only candidates returns exactly the box rows
    full = ev.filter(
        F.col("user_id").between(*box["user_id"])
        & F.col("value").between(*box["value"])
    ).count()
    got = (
        spark.read.parquet(*z_cand)
        .filter(
            F.col("user_id").between(*box["user_id"])
            & F.col("value").between(*box["value"])
        )
        .count()
    )
    assert got == full > 0


def test_zone_maps_distributed_equals_driver(spark, tmp_path):
    """Past _ZONES_DRIVER_MAX files the footer walk distributes
    (mapInPandas) — same zones, any order of input paths."""
    import rottnest_spark.ops.zorder as z

    out = str(tmp_path / "many")
    spark.range(2000).selectExpr("id AS x", "id * 2 AS y").repartition(
        8
    ).write.parquet(out)
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    driver = z.file_zone_maps(files, ["x", "y"])
    orig = z._ZONES_DRIVER_MAX
    z._ZONES_DRIVER_MAX = 0
    try:
        dist = z.file_zone_maps(files, ["x", "y"], spark=spark)
    finally:
        z._ZONES_DRIVER_MAX = orig
    assert dist == driver
