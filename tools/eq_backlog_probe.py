"""Equality-delete BACKLOG cadence probe (round 8, verdict item 8): an
unattended CDC consumer polls after every upsert while the table's
equality-delete file count climbs toward `auto_rewrite_threshold` (128),
crosses it, and resets.

What must hold (the ladder claim): per-poll cost stays BOUNDED as the
backlog grows — equality deletes are value-addressed, so each feed step's
delete side anti-joins candidate rows against the step's OWN keys, and the
candidate set is footer-pruned; a poll whose cost climbs with the number
of OLDER unrewritten delete files means some consumer re-applies the whole
backlog per step. Also measured: the read() cost at sampled backlog
depths (reads DO re-apply the whole live delete set — bounded growth
expected there, which is exactly why the auto-rewrite trigger exists) and
the poll that spans the auto-rewrite snapshot itself.

Usage: python tools/eq_backlog_probe.py [threshold]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/tmp/rottnest_eq_backlog_probe"
SAMPLE_AT = {1, 8, 16, 32, 64, 96, 112, 120, 126, 127}


def main() -> None:
    from pyspark.sql import functions as F

    from rottnest_spark.session import get_spark
    from rottnest_spark.sources.changes import IcebergChangesCursor
    from rottnest_spark.sources.iceberg import (
        IcebergSnapshotLake,
        _current_metadata,
        snapshot_state_from_metadata,
    )
    from rottnest_spark.sources.iceberg_write import (
        iceberg_convert,
        iceberg_upsert,
    )

    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spark = get_spark("eq-backlog-probe", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    table = os.path.join(SCRATCH, "tbl")

    # 50 data files x 2k rows — big enough that an O(live files) consumer
    # bug would dominate the per-step numbers, small enough to iterate
    base = spark.range(100_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    base.repartition(50).write.parquet(table)
    iceberg_convert(table)

    ckpt = os.path.join(SCRATCH, "ckpt")
    cur = IcebergChangesCursor(spark, table, ckpt)
    md = _current_metadata(table)
    cur.ack(md["current-snapshot-id"])

    rows = []
    rewrite_seen = False
    step = 0
    while True:
        step += 1
        batch = spark.range(100).select(
            ((F.col("id") * 977 + step * 13) % 100_000).alias("k"),
            F.concat(F.lit(f"u{step}-"), F.col("id")).alias("v"),
        ).dropDuplicates(["k"])
        snap = iceberg_upsert(
            spark, batch, table, ["k"], auto_rewrite_threshold=threshold
        )
        md = _current_metadata(table)
        backlog = len(snapshot_state_from_metadata(md, table)["eq_deletes"])

        t0 = time.time()
        feed, end = cur.poll()
        n_feed = feed.count()
        cur.ack(end)
        poll_s = time.time() - t0

        row = {
            "step": step,
            "backlog_after": backlog,
            "poll_s": round(poll_s, 2),
            "feed_rows": n_feed,
        }
        if backlog in SAMPLE_AT or backlog == 0:
            t0 = time.time()
            n_read = IcebergSnapshotLake(
                spark, table, os.path.join(SCRATCH, "idx")
            ).read().count()
            row["read_s"] = round(time.time() - t0, 2)
            row["read_rows"] = n_read
        if backlog == 0 and step > 1:
            # auto-rewrite fired inside iceberg_upsert: this poll covered
            # upsert + rewrite snapshots
            row["rewrite_fired"] = True
            rewrite_seen = True
        if row.get("read_s") is not None or backlog >= threshold - 2 or rewrite_seen:
            print(json.dumps(row), flush=True)
        rows.append(row)
        if rewrite_seen and backlog <= 1 and step > threshold:
            # one step past the reset to show post-rewrite cadence
            break
        if step > threshold + 10:
            break

    polls = [r["poll_s"] for r in rows]
    summary = {
        "metric": "eq_backlog_probe",
        "threshold": threshold,
        "steps": len(rows),
        "poll_s_first10_median": sorted(polls[:10])[5],
        "poll_s_last10_before_rewrite_median": sorted(
            [r["poll_s"] for r in rows if not r.get("rewrite_fired")][-10:]
        )[5],
        "rewrite_fired": rewrite_seen,
        "max_poll_s": max(polls),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
