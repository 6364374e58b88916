"""Runnable tour of merge-on-read row-level deletes on BOTH table formats:

    Iceberg: convert → index → iceberg_delete_rows (positional delete
      files, data untouched) → indexed search stays exact WITHOUT
      compaction → snapshot diff names the deleted rows → rewrite
      compacts only the touched files
    Delta: convert → delta_delete_rows (roaring-bitmap deletion vectors,
      inline or shared .bin per PROTOCOL.md) → read + indexed search
      apply the vectors → per-commit change feed with a durable cursor

Usage: python examples/mor_tour.py
Writes everything under a temp dir; prints one line per capability.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rottnest_spark import get_spark  # noqa: E402
from rottnest_spark.indices import SubstringIndex  # noqa: E402
from rottnest_spark.sources.changes import (  # noqa: E402
    DeltaChangesCursor,
    iceberg_snapshot_diff,
)
from rottnest_spark.sources.delta import (  # noqa: E402
    DeltaSnapshotLake,
    delta_live_dvs,
)
from rottnest_spark.sources.delta_write import (  # noqa: E402
    delta_convert,
    delta_delete_rows,
)
from rottnest_spark.sources.iceberg import (  # noqa: E402
    IcebergSnapshotLake,
    iceberg_live_files_and_deletes,
)
from rottnest_spark.sources.iceberg_write import (  # noqa: E402
    iceberg_convert,
    iceberg_delete_rows,
    iceberg_rewrite_deletes,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
Q = "merge sort"


def main() -> None:
    spark = get_spark("mor_tour", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mor_tour_")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang")
    )

    # ---- Iceberg ----------------------------------------------------------
    it = os.path.join(work, "iceberg_table")
    docs.repartition(3).write.parquet(it)
    iceberg_convert(it)
    ilake = IcebergSnapshotLake(spark, it, os.path.join(work, "iidx"))
    ilake.build_index(SubstringIndex(), "text")
    n0 = len(set(ilake.search(SubstringIndex(), "text", Q).collect()))
    sid = iceberg_delete_rows(spark, it, F.col("doc_id") % 2 == 0)
    data, dels = iceberg_live_files_and_deletes(it)
    print(
        f"iceberg: snapshot {sid} holds {len(dels)} positional delete "
        f"file(s); all {len(data)} data files untouched"
    )
    hits = [r.doc_id for r in ilake.search(SubstringIndex(), "text", Q).collect()]
    assert all(i % 2 == 1 for i in hits) and len(hits) < n0
    print(
        f"iceberg: indexed search still exact under deletes "
        f"({n0} hits -> {len(hits)}, no compaction, no rebuild)"
    )
    gone = iceberg_snapshot_diff(spark, it, 1, sid).filter(
        "_change_type = 'delete'"
    )
    print(f"iceberg: snapshot diff names {gone.count()} deleted rows")
    iceberg_rewrite_deletes(spark, it)
    _, dels2 = iceberg_live_files_and_deletes(it)
    assert not dels2
    print("iceberg: rewrite compacted the deletes (touched files only)")

    # ---- Delta ------------------------------------------------------------
    dt = os.path.join(work, "delta_table")
    docs.repartition(3).write.parquet(dt)
    delta_convert(dt)
    dlake = DeltaSnapshotLake(spark, dt, os.path.join(work, "didx"))
    dlake.build_index(SubstringIndex(), "text")
    cur = DeltaChangesCursor(spark, dt, os.path.join(work, "ckpt"))
    delta_delete_rows(spark, dt, F.col("doc_id") % 3 == 0)
    dvs = delta_live_dvs(dt)
    kinds = {d["storageType"] for d in dvs.values()}
    print(
        f"delta: {len(dvs)} deletion vector(s) attached "
        f"(storage {sorted(kinds)}), "
        f"{sum(d['cardinality'] for d in dvs.values())} rows deleted"
    )
    hits = [r.doc_id for r in dlake.search(SubstringIndex(), "text", Q).collect()]
    assert all(i % 3 != 0 for i in hits)
    print(f"delta: indexed search exact under vectors ({len(hits)} hits)")
    feed, latest = cur.poll()
    n_del = feed.filter("_change_type = 'delete'").count()
    cur.ack(latest)
    print(
        f"delta: change feed delivered {n_del} row-level deletes up to "
        f"version {latest}; cursor acknowledged"
    )
    assert cur.poll()[0] is None
    print("delta: cursor caught up")

    # ---- CDC upsert (equality deletes) -------------------------------------
    from rottnest_spark.sources.iceberg_write import iceberg_upsert

    ut = os.path.join(work, "upsert_table")
    docs.select("doc_id", "lang").repartition(3).write.parquet(ut)
    iceberg_convert(ut)
    changes = (
        docs.select("doc_id")
        .limit(20)
        .withColumn("lang", F.lit("xx"))
    )
    iceberg_upsert(spark, changes, ut, ["doc_id"])
    ulake = IcebergSnapshotLake(spark, ut, os.path.join(work, "uidx"))
    n_xx = ulake.read().filter(F.col("lang") == "xx").count()
    assert n_xx == 20
    print(
        "iceberg: CDC upsert rewrote 20 keys as ONE equality-delete "
        "snapshot — zero data-file scans (O(batch), not O(table))"
    )
    iceberg_rewrite_deletes(spark, ut)
    assert ulake.read().filter(F.col("lang") == "xx").count() == 20
    print("iceberg: rewrite materialized the equality deletes")
    print(f"\nall merge-on-read capabilities verified under {work}")


if __name__ == "__main__":
    main()
