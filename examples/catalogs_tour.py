"""Runnable tour of the catalog + object-store deployment surface:

    Glue: a boto3-shaped fake replays GetTable responses;
      IcebergGlueLake follows the metadata_location pointer, and a
      pointer swap (the Glue commit protocol) advances the snapshot —
      the reference's default deployment shape. (The REST-catalog twin
      is driven against a live in-process HTTP server in
      tests/test_iceberg_rest.py.)
    Object store: the index lifecycle end-to-end over FakeObjectStoreFS
      — no atomic rename, conditional-PUT-only catalog commits.

Usage: python examples/catalogs_tour.py
Writes everything under a temp dir; prints one line per capability.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from rottnest_spark import ParquetLake, get_spark
    from rottnest_spark.core.fs import FakeObjectStoreFS
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.sources.iceberg_glue import (
        IcebergGlueCatalog,
        IcebergGlueLake,
    )

    spark = get_spark("catalogs-tour", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="catalogs-tour-")
    try:
        # -- a tiny Iceberg table on disk (the storage plane) -----------
        from rottnest_spark.sources.iceberg import iceberg_live_files
        from rottnest_spark.sources.iceberg_write import (
            iceberg_commit_retry,
            iceberg_convert,
            iceberg_write,
        )

        table = os.path.join(base, "tbl")
        df = spark.range(200).selectExpr("id", "id % 9 AS v")
        iceberg_write(df, table)
        print(f"iceberg table: {len(iceberg_live_files(table))} data file(s)")

        # -- Glue adapter: pointer store + swap -------------------------
        class FakeGlue:
            def __init__(self):
                self.md = None

            def get_table(self, DatabaseName, Name, **kw):
                return {
                    "Table": {
                        "Name": Name,
                        "Parameters": {
                            "table_type": "ICEBERG",
                            "metadata_location": self.md,
                        },
                    }
                }

        glue = FakeGlue()
        metas = sorted(
            p
            for p in os.listdir(os.path.join(table, "metadata"))
            if p.endswith(".metadata.json")
        )
        glue.md = os.path.join(table, "metadata", metas[-1])
        cat = IcebergGlueCatalog(client=glue)
        lake = IcebergGlueLake(
            spark, cat, "db.tbl", os.path.join(base, "idx"), table_path=table
        )
        idx = ExactIndex()
        lake.build_index(idx, "id")
        hit = lake.search(idx, "id", 42).collect()
        print(f"glue-cataloged search: id=42 -> {len(hit)} row(s)")

        # another engine appends + swaps the Glue pointer
        extra_stage = os.path.join(base, "stage")
        spark.range(200, 260).selectExpr("id", "id % 9 AS v").coalesce(
            1
        ).write.parquet(extra_stage)
        import glob as g

        extra = os.path.join(table, "part-extra.parquet")
        shutil.move(g.glob(extra_stage + "/*.parquet")[0], extra)
        iceberg_commit_retry(table, add=[extra])
        metas = sorted(
            p
            for p in os.listdir(os.path.join(table, "metadata"))
            if p.endswith(".metadata.json")
        )
        glue.md = os.path.join(table, "metadata", metas[-1])
        print(
            "pointer swap picked up: "
            f"{len(lake.files)} files live, id=255 -> "
            f"{lake.search(idx, 'id', 255).count()} row(s) "
            "(unindexed tail scanned in-situ)"
        )

        # -- full lifecycle over object-store semantics -----------------
        store_root = os.path.join(base, "store")
        fs = FakeObjectStoreFS(root=store_root)
        data = os.path.join(store_root, "data")
        spark.range(500).selectExpr("id", "id % 50 AS grp").repartition(
            5
        ).write.parquet(data)
        olake = ParquetLake(spark, data, os.path.join(store_root, "oidx"), fs=fs)
        olake.build_index(idx, "id")
        n = olake.search(idx, "id", 123).count()
        cat_commits = [
            c for c in fs.ops("create_exclusive") if "_catalog" in c[1]
        ]
        renames = [c for c in fs.ops("rename") if "_catalog" in c[1]]
        print(
            f"object-store lifecycle: search hit {n} row(s); "
            f"{len(cat_commits)} conditional-PUT catalog commit(s), "
            f"{len(renames)} catalog renames (rename-free)"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
