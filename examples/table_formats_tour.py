"""Runnable tour of the round-trip table-format backends:

    Delta: write a table from a DataFrame → append → indexed search over
      the live snapshot → remove a file (snapshot excludes it while the
      bytes remain) → checkpoint + vacuum the log → replay still exact
    Iceberg: write → append → snapshot history window → indexed search

Usage: python examples/table_formats_tour.py
Writes everything under a temp dir; prints one line per capability.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rottnest_spark import get_spark  # noqa: E402
from rottnest_spark.indices import SubstringIndex  # noqa: E402
from rottnest_spark.sources.delta import (  # noqa: E402
    DeltaSnapshotLake,
    delta_live_files,
)
from rottnest_spark.sources.delta_write import (  # noqa: E402
    delta_checkpoint,
    delta_commit,
    delta_write,
)
from rottnest_spark.sources.iceberg import (  # noqa: E402
    IcebergSnapshotLake,
    iceberg_history_files,
    iceberg_live_files,
)
from rottnest_spark.sources.iceberg_write import (  # noqa: E402
    iceberg_commit,
    iceberg_write,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("table-formats-tour", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="formats_tour_")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = "merge sort"
    oracle = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(q))).collect()
    )
    try:
        # -- Delta round-trip ---------------------------------------------
        dt = os.path.join(work, "delta_table")
        v0 = delta_write(docs.filter("doc_id < 300").repartition(3), dt)
        v1 = delta_write(docs.filter("doc_id >= 300"), dt, mode="append")
        print(
            f"delta: created v{v0}, appended v{v1} -> "
            f"{len(delta_live_files(dt))} live files"
        )
        lake = DeltaSnapshotLake(spark, dt, os.path.join(work, "didx"))
        idx = SubstringIndex()
        lake.build_index(idx, "text")
        got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
        assert got == oracle
        print(f"delta: indexed search over the snapshot == full scan ({len(got)} rows)")
        victim = delta_live_files(dt)[0]
        delta_commit(dt, remove=[victim])
        after = lake.search(idx, "text", q).count()
        assert after < len(oracle) and os.path.exists(victim)
        print(
            "delta: removed one file from the snapshot — search excludes its "
            f"rows ({after} left) while the bytes remain on disk"
        )
        cp = delta_checkpoint(dt)
        for c in glob.glob(dt + "/_delta_log/*.json"):
            if int(os.path.basename(c).split(".")[0]) <= cp:
                os.remove(c)
        assert lake.search(idx, "text", q).count() == after
        print(f"delta: checkpoint v{cp} + vacuumed log replays identically")

        # -- Iceberg round-trip -------------------------------------------
        it = os.path.join(work, "iceberg_table")
        s0 = iceberg_write(docs.filter("doc_id < 300").repartition(3), it)
        s1 = iceberg_write(docs.filter("doc_id >= 300"), it, mode="append")
        print(
            f"iceberg: snapshots {s0},{s1} -> "
            f"{len(iceberg_live_files(it))} live files (version-hint honored)"
        )
        ilake = IcebergSnapshotLake(spark, it, os.path.join(work, "iidx"))
        ilake.build_index(idx, "text")
        got = sorted(r["doc_id"] for r in ilake.search(idx, "text", q).collect())
        assert got == oracle
        print(f"iceberg: indexed search over own metadata == full scan ({len(got)} rows)")
        victim = iceberg_live_files(it)[0]
        iceberg_commit(it, remove=[victim])
        hist = iceberg_history_files(it, history_days=30)
        assert victim not in iceberg_live_files(it) and victim in hist
        print(
            "iceberg: rewrite snapshot committed; history window still "
            "reaches the removed file (time-travel liveness for vacuum)"
        )

        # -- full DML through the writable lakes --------------------------
        from rottnest_spark.indices.exact import ExactIndex
        from rottnest_spark.sources.writable import DeltaWritableLake

        wt = os.path.join(work, "writable_delta")
        delta_write(docs.filter("doc_id < 400").repartition(3), wt)
        wlake = DeltaWritableLake(spark, wt, os.path.join(work, "widx"))
        wlake.build_index(idx, "text")
        wlake.append(docs.filter("doc_id >= 400"))
        eidx = ExactIndex()
        wlake.build_index(eidx, "doc_id")
        victim_id = oracle[0]
        wlake.delete_matching(eidx, "doc_id", victim_id)
        wlake.compact_files(target_rows=10_000)
        final = sorted(
            r["doc_id"] for r in wlake.search(idx, "text", q).collect()
        )
        assert final == [d for d in oracle if d != victim_id]
        print(
            "writable delta lake: append + row delete + compaction all "
            "landed as log commits; indexed search exact throughout "
            f"({len(final)} rows, deleted row stays gone)"
        )
        print("TOUR OK")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
