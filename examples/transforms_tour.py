"""Runnable tour of the round-10 surface:

    Iceberg partition transforms (day + bucket partitioned create via
      the transform partition_by syntax)
    → v3 DML lifecycle on the transform table (DV delete, keyed upsert,
      single-job rewrite)
    → transform partition pruning (point bucket lookup + day range)
    → nested initial-defaults (struct/list/map fill)
    → index build + search on a type-widened Delta table

Usage: python examples/transforms_tour.py
Writes everything under a temp dir; prints one line per capability.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rottnest_spark import get_spark  # noqa: E402
from rottnest_spark.indices.exact import ExactIndex  # noqa: E402
from rottnest_spark.sources.iceberg import (  # noqa: E402
    IcebergSnapshotLake,
    iceberg_live_adds,
)
from rottnest_spark.sources.iceberg_write import (  # noqa: E402
    iceberg_v3_delete_rows,
    iceberg_v3_rewrite_deletes,
    iceberg_v3_upsert,
    iceberg_write,
)


def main() -> None:
    spark = get_spark("transforms-tour", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="transforms_tour_")
    try:
        # -- 1. transform-partitioned create -----------------------------
        t = os.path.join(work, "events")
        df = spark.range(500).selectExpr(
            "id AS event_id",
            "id % 13 AS user_id",
            "timestamp_ntz'2024-06-01 00:00:00'"
            " + make_interval(0,0,0,cast(id % 7 AS int),0,0,0) AS ts",
            "cast(id * 1.5 AS double) AS amount",
        )
        iceberg_write(
            df, t, partition_by=["day(ts)", "bucket(8, user_id)"]
        )
        adds = iceberg_live_adds(t)
        one = next(iter(adds.values()))
        print(
            f"transform create: {len(adds)} files across "
            f"{len({v['ts_day'] for v in adds.values()})} days x "
            f"{len({v['user_id_bucket'] for v in adds.values()})} buckets "
            f"(sample r102: {json.dumps(one)})"
        )

        # -- 2. v3 DML lifecycle -----------------------------------------
        iceberg_v3_delete_rows(spark, t, "amount > 600 AND event_id % 2 = 0")
        changes = df.filter("event_id % 9 = 0").withColumn(
            "amount", F.lit(-1.0)
        )
        iceberg_v3_upsert(spark, changes, t, ["event_id"])
        iceberg_v3_rewrite_deletes(spark, t)
        lake = IcebergSnapshotLake(spark, t, os.path.join(work, "idx"))
        n = lake.read().count()
        n_upd = lake.read().filter("amount = -1.0").count()
        print(f"v3 DML on transforms: {n} rows after delete+upsert+rewrite, "
              f"{n_upd} upserted")

        # -- 3. transform pruning ----------------------------------------
        view = lake.transform_pruned(user_id=5)
        rng = lake.transform_pruned_range(
            ts=(datetime.datetime(2024, 6, 2), datetime.datetime(2024, 6, 3))
        )
        print(
            f"transform pruning: bucket point view {len(view.files)}/"
            f"{len(lake.files)} files, day-range view {len(rng.files)}/"
            f"{len(lake.files)} files"
        )

        # -- 4. nested initial-defaults ----------------------------------
        nt = os.path.join(work, "nested")
        spark.range(6).selectExpr("id AS k", "concat('r', id) AS body") \
            .coalesce(1).write.parquet(nt)
        from rottnest_spark.sources.iceberg_write import iceberg_convert

        iceberg_convert(nt)
        meta = os.path.join(nt, "metadata")
        mfs = sorted(
            (f for f in os.listdir(meta) if f.endswith(".metadata.json")),
            key=lambda f: int(f.split(".")[0].lstrip("v")),
        )
        md = json.loads(open(os.path.join(meta, mfs[-1])).read())
        md["format-version"] = 3
        md["schema"]["fields"].append(
            {
                "id": 50,
                "name": "meta",
                "required": False,
                "type": {
                    "type": "struct",
                    "fields": [
                        {"id": 51, "name": "source", "type": "string",
                         "required": False},
                        {"id": 52, "name": "rev", "type": "int",
                         "required": False},
                    ],
                },
                "initial-default": {"51": "backfill", "52": 3},
            }
        )
        if "schemas" in md:
            md["schemas"] = [
                {**md["schema"], "schema-id": md.get("current-schema-id", 0)}
            ]
        v = len(mfs) + 10
        with open(os.path.join(meta, f"v{v}.metadata.json"), "w") as fh:
            json.dump(md, fh)
        with open(os.path.join(meta, "version-hint.text"), "w") as fh:
            fh.write(str(v))
        row = (
            IcebergSnapshotLake(spark, nt, os.path.join(work, "nidx"))
            .read()
            .select("meta")
            .first()
        )
        print(f"nested default fill: meta = ({row.meta.source}, {row.meta.rev})")

        # -- 5. index on a type-widened Delta table ----------------------
        import pyarrow as pa
        import pyarrow.parquet as pq

        from rottnest_spark.sources.delta import DeltaSnapshotLake

        wt = os.path.join(work, "widened")
        log = os.path.join(wt, "_delta_log")
        os.makedirs(log)
        pq.write_table(
            pa.table({"k": pa.array([1, 2, 3], pa.int32())}),
            os.path.join(wt, "narrow.parquet"),
        )
        pq.write_table(
            pa.table({"k": pa.array([4, 5], pa.int64())}),
            os.path.join(wt, "wide.parquet"),
        )
        schema_string = json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "k", "type": "long", "nullable": True,
                     "metadata": {}}
                ],
            }
        )
        with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
            fh.write(
                "\n".join(
                    json.dumps(a)
                    for a in [
                        {
                            "protocol": {
                                "minReaderVersion": 3,
                                "minWriterVersion": 7,
                                "readerFeatures": ["typeWidening"],
                                "writerFeatures": ["typeWidening"],
                            }
                        },
                        {
                            "metaData": {
                                "id": "w",
                                "format": {
                                    "provider": "parquet", "options": {}
                                },
                                "schemaString": schema_string,
                                "partitionColumns": [],
                                "configuration": {},
                            }
                        },
                        {"add": {"path": "narrow.parquet",
                                 "dataChange": True}},
                        {"add": {"path": "wide.parquet", "dataChange": True}},
                    ]
                )
                + "\n"
            )
        dlake = DeltaSnapshotLake(spark, wt, os.path.join(work, "widx"))
        idx = ExactIndex()
        dlake.build_index(idx, "k")
        hit = dlake.search(idx, "k", 2).count()
        print(f"widened Delta index: search(k=2) -> {hit} row "
              f"(narrow int32 file read at bigint)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
