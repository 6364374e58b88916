"""Iceberg v3 ROW LINEAGE (round 11 — spec "Row Lineage"): every v3
DML commit assigns each data file a first_row_id range from the
table's next-row-id counter (manifest field 142; carried files keep
theirs, legacy pre-lineage files get fresh ranges — the upgrade
behavior), and `read_with_lineage` surfaces the stable per-row
`_row_id` = first_row_id + position.

Contracts pinned:
- ranges are disjoint and next-row-id == total rows ever assigned;
- _row_id values are unique and STABLE across DV deletes and upserts
  (positions never move; survivors keep their ids, upsert re-inserts
  take fresh ids);
- a physical rewrite re-mints (documented seam);
- v2 tables and lineage-less files refuse loudly.
"""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    _current_metadata,
    _snapshot_state,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_v3_append,
    iceberg_v3_delete_rows,
    iceberg_v3_upsert,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(20).selectExpr("id AS k", "id * 2 AS v")
    iceberg_write(df.repartition(2), t)  # v2 create — no lineage yet
    return t


def _state(t):
    md = _current_metadata(t)
    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    return md, _snapshot_state(md, snap, t, None)


def test_assignment_and_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    lake0 = IcebergSnapshotLake(spark, t, t + "_ix0")
    with pytest.raises(ValueError, match="v3 feature"):
        lake0.read_with_lineage()
    extra = spark.range(20, 28).selectExpr("id AS k", "id * 2 AS v")
    stage = str(tmp_path / "stage")
    extra.coalesce(1).write.parquet(stage)
    import glob

    iceberg_v3_append(t, glob.glob(f"{stage}/*.parquet"))
    md, st = _state(t)
    # every live file got a range; ranges disjoint; counter == rows
    fr = st["data_first_row"]
    assert set(fr) == set(st["data"])
    spans = sorted(
        (v, v + st["data_info"][p][0]) for p, v in fr.items()
    )
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 <= a2  # disjoint
    assert md["next-row-id"] == 28
    got = IcebergSnapshotLake(spark, t, t + "_ix").read_with_lineage()
    rows = {r.k: r._row_id for r in got.collect()}
    assert len(rows) == 28
    assert len(set(rows.values())) == 28  # unique
    assert set(rows.values()) == set(range(28))


def test_stability_across_dv_dml(spark, tmp_path):
    t = _mk(spark, tmp_path)
    iceberg_v3_delete_rows(spark, t, F.col("k") % 5 == 0)  # upgrades + assigns
    before = {
        r.k: r._row_id
        for r in IcebergSnapshotLake(spark, t, t + "_a")
        .read_with_lineage()
        .collect()
    }
    assert len(before) == 16
    # upsert: touched keys are re-inserted (fresh ids), others stable
    ch = spark.range(0, 20, 7).selectExpr("id AS k", "CAST(0 AS bigint) AS v")
    iceberg_v3_upsert(spark, ch, t, ["k"])
    after = {
        r.k: (r._row_id, r.v)
        for r in IcebergSnapshotLake(spark, t, t + "_b")
        .read_with_lineage()
        .collect()
    }
    touched = {k for k in range(0, 20, 7)}
    for k, rid in before.items():
        if k in touched:
            assert after[k][0] != rid  # re-inserted row: fresh id
            assert after[k][1] == 0
        else:
            assert after[k][0] == rid  # survivor: STABLE id
    md = _current_metadata(t)
    all_ids = [rid for rid, _ in after.values()]
    assert len(set(all_ids)) == len(all_ids)
    assert max(all_ids) < md["next-row-id"]
