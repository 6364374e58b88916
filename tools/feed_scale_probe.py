"""Change-feed / replication scaling probe (round 7, verdict item 9):
hold the CHANGE VOLUME fixed (one narrow keyed delete, ~200 rows in a
key-clustered file neighborhood) while the TABLE grows 10x per decade,
and time the consumer side — cursor poll + feed materialization, and one
sync_table replication step into a Delta destination.

The claim under test: diff/feed cost is proportional to the CHANGED
files, not the table (sources/changes.py `changed_common` bound). A
flat-ish row across decades proves it; a ~10x/decade row means some scan
re-reads the whole table per poll.

Out of scope by design: Iceberg EQUALITY-delete feeds — value-addressed
deletes have no positional metadata bound, so their positional
projection scans all candidate files older than the delete (inherent;
`iceberg_rewrite_deletes` / upsert auto-rewrite bounds the backlog).
This probe measures the positional paths both formats share.

Usage: python tools/feed_scale_probe.py
  (uses /root/testdata/sf0.1, plus /tmp/testdata_sf1 and
   /tmp/testdata_sf10 from tools/make_sf1.py when present)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/tmp/rottnest_feed_probe"


def decades() -> list[tuple[str, str]]:
    out = [("sf0.1", "/root/testdata/sf0.1")]
    for label, d in (
        ("sf1", os.environ.get("SCALE_SF1_DIR", "/tmp/testdata_sf1")),
        ("sf10", os.environ.get("SCALE_SF10_DIR", "/tmp/testdata_sf10")),
    ):
        if os.path.exists(os.path.join(d, "orders.parquet")):
            out.append((label, d))
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from rottnest_spark.session import get_spark
    from rottnest_spark.sources.changes import (
        DeltaChangesCursor,
        IcebergChangesCursor,
        sync_table,
    )
    from rottnest_spark.sources.delta_write import (
        delta_convert,
        delta_delete_rows,
    )
    from rottnest_spark.sources.iceberg_write import (
        iceberg_convert,
        iceberg_delete_rows,
    )
    from rottnest_spark.sources.writable import DeltaWritableLake

    spark = get_spark("feed-scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    cols = "o_orderkey long, o_custkey long, o_totalprice double"
    rows: list[dict] = []
    for label, sf_dir in decades():
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        lo = orders.agg(F.min("o_orderkey")).collect()[0][0]
        pred = f"o_orderkey >= {lo} AND o_orderkey < {lo + 200}"
        n_files = 16  # fixed file count: decades grow rows-per-file

        def mk(path):
            (
                orders.repartitionByRange(n_files, "o_orderkey")
                .sortWithinPartitions("o_orderkey")
                .write.parquet(path)
            )

        # --- Delta: deletion-vector commit, then consume the feed -----
        dt = os.path.join(SCRATCH, f"delta_{label}")
        mk(dt)
        delta_convert(dt)
        dcur = DeltaChangesCursor(spark, dt, dt + ".ck")
        dcur.ack(0)  # skip the bootstrap (O(table) by definition)
        delta_delete_rows(spark, dt, pred)  # untimed: the write side
        t0 = time.time()
        feed, latest = dcur.poll()
        n = feed.count()
        d_feed = time.time() - t0
        dcur.ack(latest)

        # --- Delta: sync_table one fixed-volume step -------------------
        dst = os.path.join(SCRATCH, f"dst_{label}")
        spark.createDataFrame([], cols).coalesce(1).write.parquet(dst)
        delta_convert(dst)
        dlake = DeltaWritableLake(spark, dst, dst + "_idx")
        cur2 = DeltaChangesCursor(spark, dt, dt + ".ck2")
        cur2.ack(0)
        t0 = time.time()
        stats = sync_table(cur2, dlake, "o_orderkey")
        d_sync = time.time() - t0

        # --- Iceberg: positional-delete commit, consume the feed ------
        it = os.path.join(SCRATCH, f"iceberg_{label}")
        mk(it)
        iceberg_convert(it)
        icur = IcebergChangesCursor(spark, it, it + ".ck")
        _, first = icur.poll()
        icur.ack(first)  # skip the bootstrap
        iceberg_delete_rows(spark, it, pred)
        t0 = time.time()
        ifeed, ilatest = icur.poll()
        ni = ifeed.count()
        i_feed = time.time() - t0
        icur.ack(ilatest)

        # --- Iceberg: EQUALITY upsert (the Flink-CDC shape), consume --
        from rottnest_spark.sources.iceberg_write import iceberg_upsert

        changes = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .filter(F.expr(pred.replace(str(lo + 200), str(lo + 400))))
            .filter(F.col("o_orderkey") >= lo + 200)
            .withColumn("o_totalprice", F.lit(-1.0))
        )
        iceberg_upsert(spark, changes, it, ["o_orderkey"])
        t0 = time.time()
        ufeed, ulatest = icur.poll()
        nu = ufeed.count()
        u_feed = time.time() - t0

        rows.append(
            {
                "sf": label,
                "delta_feed_sec": round(d_feed, 2),
                "delta_feed_rows": n,
                "delta_sync_sec": round(d_sync, 2),
                "iceberg_feed_sec": round(i_feed, 2),
                "iceberg_feed_rows": ni,
                "iceberg_upsert_feed_sec": round(u_feed, 2),
                "iceberg_upsert_feed_rows": nu,
            }
        )
        print(rows[-1], flush=True)

    print(
        "\n| sf | delta feed (s) | delta sync (s) | iceberg feed (s) "
        "| iceberg eq-upsert feed (s) |"
    )
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['sf']} | {r['delta_feed_sec']} | {r['delta_sync_sec']} "
            f"| {r['iceberg_feed_sec']} | {r['iceberg_upsert_feed_sec']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
