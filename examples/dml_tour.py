"""Runnable tour of the lake's DML + time-travel surface:

    append → merge (CDC upsert/delete) → snapshot diff → as_of reads →
    predicate delete → index refresh → file compaction → history vacuum

Usage: python examples/dml_tour.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rottnest_spark import ParquetLake, get_spark  # noqa: E402
from rottnest_spark.indices.exact import ExactIndex  # noqa: E402
from rottnest_spark.ops.merge import merge_changes, snapshot_diff  # noqa: E402


def main() -> None:
    spark = get_spark("dml-tour", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="dml_tour_")
    try:
        data = os.path.join(work, "lake")
        lake = ParquetLake(
            spark, data, os.path.join(work, "idx"), retain_history=True
        )
        os.makedirs(data)

        # append: staged atomic inserts
        base = spark.createDataFrame(
            [(i, f"v{i}", i % 5) for i in range(1000)],
            "k bigint, v string, grp int",
        )
        lake_files = lake.append(base.repartitionByRange(4, "k"))
        print("appended files:", len(lake_files), "rows:", lake.read().count())

        idx = ExactIndex()
        lake.build_index(idx, "k")

        # CDC merge: copy-on-write pruned by footer key ranges
        changes = spark.createDataFrame(
            [(5, "updated", None, 1, "U"), (250, None, None, 1, "D"),
             (5000, "inserted", 9, 1, "I")],
            "k bigint, v string, grp int, seq bigint, op string",
        )
        st = lake.merge_into(changes, "k")
        print("merge rewrote", len(st["rewritten"]), "pruned", st["pruned"])

        # snapshot diff reconstructs the feed from storage
        diff = snapshot_diff(lake, 0, None, "k")
        print("derived feed:", sorted(
            (r["k"], r["op"]) for r in diff.collect()
        ))
        # and the round-trip law holds
        merged = merge_changes(lake.as_of(0).read(), diff, ["k"])
        assert merged.count() == lake.read().count()
        print("as_of(0) rows:", lake.as_of(0).read().count(),
              "live rows:", lake.read().count())

        # predicate delete (takedown), then one-call upkeep
        dl = lake.delete_matching(idx, "k", (100, 110))
        print("deleted", dl["n_deleted"], "rows;",
              dl["pruned"], "files untouched")
        print("upkeep:", lake.refresh_indices()["built"])

        # search stays exact through all of it
        assert lake.search(idx, "k", 5).collect()[0]["v"] == "updated"
        assert lake.search(idx, "k", 105).count() == 0
        assert lake.search(idx, "k", 5000).count() == 1

        # bound history retention
        removed = lake.vacuum_history(keep_last=1)
        print("history vacuum reclaimed:", len(removed), "files")
        print("DML tour OK")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
