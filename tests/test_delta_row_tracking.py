"""Delta ROW TRACKING (round 11 — PROTOCOL.md Row Tracking, the Delta
twin of Iceberg v3 row lineage, tests/test_iceberg_row_lineage.py).

Contracts pinned:
- enable = ONE commit (protocol features rowTracking+domainMetadata,
  the config flag, re-ADDs of live files with disjoint baseRowId
  ranges, the high-water-mark domainMetadata) — zero data files
  touched; idempotent;
- every later commit stamps fresh adds past the mark and PRESERVES
  ids on re-adds (DV attachments re-commit the same path — losing the
  id there would re-mint every row on every delete);
- _row_id = baseRowId + position is unique and STABLE across DV
  deletes and upserts; upsert re-inserts take fresh ids;
- checkpoints carry baseRowId + the domainMetadata mark, so lineage
  survives log vacuum;
- v2 readers of the table are unaffected (rowTracking is writer-only).
"""

import glob
import json
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.delta import (
    DeltaSnapshotLake,
    delta_protocol,
    delta_row_id_state,
)
from rottnest_spark.sources.delta_write import (
    delta_checkpoint,
    delta_cleanup_log,
    delta_convert,
    delta_enable_row_tracking,
    delta_upsert,
    delta_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, tmp_path):
    t = str(tmp_path / "t")
    spark.range(20).selectExpr("id AS k", "id * 2 AS v").repartition(
        2
    ).write.parquet(t)
    delta_convert(t)
    return t


def test_enable_assigns_disjoint_ranges(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = delta_enable_row_tracking(t)
    proto = delta_protocol(t)
    assert {"rowTracking", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    ids, hwm = delta_row_id_state(t)
    assert len(ids) == 2 and hwm == 19
    spans = sorted(base for base, _ in ids.values())
    assert spans[0] == 0 and spans[1] > 0
    assert delta_enable_row_tracking(t) == v  # idempotent
    got = DeltaSnapshotLake(spark, t, t + "_ix").read_with_lineage()
    rows = {r.k: r._row_id for r in got.collect()}
    assert set(rows.values()) == set(range(20))


def test_stability_across_dv_dml_and_appends(spark, tmp_path):
    t = _mk(spark, tmp_path)
    delta_enable_row_tracking(t)
    # append: fresh ids past the mark
    delta_write(
        spark.range(20, 28).selectExpr("id AS k", "id * 2 AS v"),
        t,
        mode="append",
    )
    before = {
        r.k: r._row_id
        for r in DeltaSnapshotLake(spark, t, t + "_a")
        .read_with_lineage()
        .collect()
    }
    assert len(set(before.values())) == 28
    # DV upsert: touched keys re-insert (fresh ids), survivors stable
    ch = spark.range(0, 28, 9).selectExpr(
        "id AS k", "CAST(0 AS bigint) AS v"
    )
    delta_upsert(spark, ch, t, ["k"])
    after = {
        r.k: (r._row_id, r.v)
        for r in DeltaSnapshotLake(spark, t, t + "_b")
        .read_with_lineage()
        .collect()
    }
    touched = set(range(0, 28, 9))
    for k, rid in before.items():
        if k in touched:
            assert after[k][0] != rid and after[k][1] == 0
        else:
            assert after[k][0] == rid  # survivor: STABLE
    ids = [rid for rid, _ in after.values()]
    assert len(set(ids)) == len(ids)


def test_lineage_survives_checkpoint_vacuum(spark, tmp_path):
    t = _mk(spark, tmp_path)
    delta_enable_row_tracking(t)
    before = {
        r.k: r._row_id
        for r in DeltaSnapshotLake(spark, t, t + "_a")
        .read_with_lineage()
        .collect()
    }
    delta_checkpoint(t)
    delta_cleanup_log(t, older_than_sec=0.0)
    assert not glob.glob(
        os.path.join(t, "_delta_log", "00000000000000000000.json")
    )
    ids, hwm = delta_row_id_state(t)
    assert hwm == 19 and len(ids) == 2
    after = {
        r.k: r._row_id
        for r in DeltaSnapshotLake(spark, t, t + "_b")
        .read_with_lineage()
        .collect()
    }
    assert after == before


def test_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    spark.range(10).selectExpr(
        "id AS k", "CAST(id % 2 AS bigint) AS p"
    ).write.parquet(t)
    delta_convert(t)
    lake = DeltaSnapshotLake(spark, t, t + "_ix")
    with pytest.raises(ValueError, match="not enabled"):
        lake.read_with_lineage()
    # partitioned tables refuse the enable
    p = str(tmp_path / "p")
    delta_write(
        spark.range(10).selectExpr(
            "id AS k", "CAST(id % 2 AS bigint) AS b"
        ),
        p,
        partition_by=["b"],
    )
    with pytest.raises(ValueError, match="PARTITIONED"):
        delta_enable_row_tracking(p)
