"""Iceberg PARTITION SPEC EVOLUTION (round 11 — spec "Partition
Evolution"): a new default spec lands as a metadata-only commit; old
files keep their spec, attributed through per-spec data manifests and
the manifest-list partition_spec_id.

Contracts pinned:
- evolve commits zero data files; the spec history carries forward
  through later snapshots verbatim;
- appends after evolution lay out + record r102 under the NEW spec;
- mixed-spec reads reconstruct each file's identity columns through
  ITS OWN spec (one scan per spec x partition tuple) and agree with
  the source frame exactly;
- transform pruning evaluates each file against its own spec — two
  specs sharing a field name with different params (bucket[2] vs
  bucket[4] both `k_bucket`) never cross-prune; files whose spec lacks
  the transform are KEPT (sound);
- partition_pruned (hive-path addressing) refuses mixed snapshots;
- row-mutating DML refuses mixed snapshots with the migration pointer;
  iceberg_rewrite_partition_spec migrates old-spec files in one staged
  job, after which DML un-gates and reads stay exact;
- partition FIELD ids reuse for an existing (source, transform) pair
  and mint past the table max otherwise.
"""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    _current_metadata,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_delete_rows,
    iceberg_evolve_partition_spec,
    iceberg_rewrite_partition_spec,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _src(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k",
        "CAST(id % 3 AS bigint) AS region",
        "CAST(id * 10 AS bigint) AS v",
    )


def test_evolve_metadata_only_and_field_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg_write(_src(spark, 0, 20), t, partition_by=["region"])
    md0 = _current_metadata(t)
    snap0 = md0["current-snapshot-id"]
    iceberg_evolve_partition_spec(t, ["bucket(2, k)"])
    md = _current_metadata(t)
    assert md["current-snapshot-id"] == snap0  # zero data commits
    specs = md["partition-specs"]
    assert [s["spec-id"] for s in specs] == [0, 1]
    assert md["default-spec-id"] == 1
    fid_region = specs[0]["fields"][0]["field-id"]
    fid_bucket = specs[1]["fields"][0]["field-id"]
    assert fid_bucket > fid_region  # minted past the table max
    # re-evolving BACK to identity(region) re-activates SPEC 0 (spec
    # identity stays stable — no duplicate spec appended)
    iceberg_evolve_partition_spec(t, ["region"])
    md2 = _current_metadata(t)
    assert md2["default-spec-id"] == 0
    assert [s["spec-id"] for s in md2["partition-specs"]] == [0, 1]
    # an already-default spec shape refuses
    with pytest.raises(ValueError, match="already the default"):
        iceberg_evolve_partition_spec(t, ["region"])


def test_mixed_spec_read_exact(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg_write(_src(spark, 0, 30), t, partition_by=["region"])
    iceberg_evolve_partition_spec(t, ["k"])  # identity on a different col
    iceberg_write(_src(spark, 30, 50), t, mode="append")
    md = _current_metadata(t)
    # spec history survived the append
    assert [s["spec-id"] for s in md["partition-specs"]] == [0, 1]
    got = IcebergSnapshotLake(spark, t, t + "_ix").read()
    a = sorted((r.k, r.region, r.v) for r in got.collect())
    b = sorted((r.k, r.region, r.v) for r in _src(spark, 0, 50).collect())
    assert a == b


def test_per_spec_transform_pruning_sound(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg_write(_src(spark, 0, 30), t, partition_by=["bucket(2, k)"])
    iceberg_evolve_partition_spec(t, ["bucket(4, k)"])  # SAME field name
    iceberg_write(_src(spark, 30, 60), t, mode="append")
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    total = len(lake.files)
    for probe in (7, 31, 42):
        view = lake.transform_pruned(k=probe)
        rows = {r.k for r in view.read().collect()}
        assert probe in rows  # never wrongly pruned (soundness)
        assert len(view.files) < total  # and it does prune something
    # hive-path pruning refuses the mixed snapshot loudly
    with pytest.raises(ValueError, match="span specs"):
        lake.partition_pruned(k_bucket=0)


def test_dml_refusal_and_spec_rewrite(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg_write(_src(spark, 0, 30), t, partition_by=["region"])
    iceberg_evolve_partition_spec(t, ["k"])
    iceberg_write(_src(spark, 30, 40), t, mode="append")
    with pytest.raises(ValueError, match="span partition specs"):
        iceberg_delete_rows(spark, t, F.col("v") == 100)
    # migrate: one staged job over exactly the old-spec files
    iceberg_rewrite_partition_spec(spark, t)
    md = _current_metadata(t)
    # single live spec now; DML un-gates
    lake = IcebergSnapshotLake(spark, t, t + "_ix")
    iceberg_delete_rows(spark, t, F.col("v") == 100)
    got = IcebergSnapshotLake(spark, t, t + "_ix2").read()
    a = sorted((r.k, r.region, r.v) for r in got.collect())
    b = sorted(
        (r.k, r.region, r.v)
        for r in _src(spark, 0, 40).filter("v <> 100").collect()
    )
    assert a == b
    # idempotent: second rewrite is a no-op
    snap = _current_metadata(t)["current-snapshot-id"]
    assert iceberg_rewrite_partition_spec(spark, t) == snap


def test_unpartitioned_to_partitioned_evolution(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg_write(_src(spark, 0, 20).repartition(2), t)  # unpartitioned
    iceberg_evolve_partition_spec(t, ["region"])
    iceberg_write(_src(spark, 20, 35), t, mode="append")
    got = IcebergSnapshotLake(spark, t, t + "_ix").read()
    a = sorted((r.k, r.region, r.v) for r in got.collect())
    b = sorted((r.k, r.region, r.v) for r in _src(spark, 0, 35).collect())
    assert a == b
    # an explicit CONFLICTING partition_by on append still refuses
    with pytest.raises(ValueError, match="conflicts"):
        iceberg_write(
            _src(spark, 35, 40), t, mode="append", partition_by=["v"]
        )
