"""Partition-count ladder for the single-job delete-compaction rewrite
(round-9 verdict ask #6): round 9 collapsed both rewrite paths from a
per-partition-dir loop (10^3 partitions = 10^3 sequential Spark jobs)
to ONE job; this probe MEASURES that claim at 10 / 10^2 / 10^3 identity
partition dirs — Spark job count via the status tracker and rewrite
wall time per rung. Done = flat job count, sub-linear wall growth.

Usage: python tools/partition_rewrite_probe.py [max_rung]
Writes one JSON row per rung; the summary row goes into COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/tmp/rottnest_part_rewrite_probe"


def main() -> None:
    max_rung = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    from pyspark.sql import functions as F

    from rottnest_spark.session import get_spark
    from rottnest_spark.sources.iceberg import IcebergSnapshotLake
    from rottnest_spark.sources.iceberg_write import (
        iceberg_v3_delete_rows,
        iceberg_v3_rewrite_deletes,
        iceberg_write,
    )

    spark = get_spark("part-rewrite-probe", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    def job_count() -> int:
        return len(tracker.getJobIdsForGroup(None)) or len(
            tracker.getActiveJobsIds()
        )

    # job ids are global and monotonically increasing — count by delta
    def max_job_id() -> int:
        ids = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
        return max(list(ids), default=-1)

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    rows = []
    for n_parts in (10, 100, 1000):
        if n_parts > max_rung:
            break
        table = os.path.join(SCRATCH, f"t{n_parts}")
        # ~40 rows per partition — metadata-bound by design: the probe
        # measures JOB-COUNT scaling with partition-dir count, not scan
        # throughput (bench covers that)
        df = spark.range(40 * n_parts).selectExpr(
            "id AS k", f"cast(id % {n_parts} AS string) AS p", "id * 2 AS v"
        )
        iceberg_write(df.repartition(8), table, partition_by=["p"])
        iceberg_v3_delete_rows(spark, table, "k % 4 = 0")

        j0 = max_job_id()
        t0 = time.time()
        iceberg_v3_rewrite_deletes(spark, table)
        wall = time.time() - t0
        jobs = max_job_id() - j0

        got = IcebergSnapshotLake(spark, table, table + "_ix").read().count()
        want = 40 * n_parts - len(range(0, 40 * n_parts, 4))
        assert got == want, (n_parts, got, want)

        row = {
            "partition_dirs": n_parts,
            "rewrite_jobs": jobs,
            "rewrite_wall_s": round(wall, 2),
            "wall_per_dir_ms": round(wall / n_parts * 1000, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(table, ignore_errors=True)

    print(json.dumps({"metric": "partition_rewrite_probe", "rows": rows}))
    spark.stop()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
