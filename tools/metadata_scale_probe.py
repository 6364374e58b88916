"""Metadata-scale probe (round 8, verdict item 3): state resolution,
row-level diff, and one cursor poll as the table's FILE COUNT grows
10³ → 10⁴ → 10⁵ with the row count fixed.

The question under test: driver-side metadata decode — pure-Python Avro
manifest walks (sources/iceberg.py `_snapshot_state`) and Delta JSON log
replay (sources/delta.py `_delta_live_state`) — is O(files). That is
semantically required (every live file appears in the state), but the
CONSTANT matters: at 100 TB a table is 10⁵-10⁶ files, and if a decade of
file count costs more than a decade of time, or 10⁵-file resolution
parks the driver for ~30 s, the decode belongs executor-side
(binaryFile + mapInPandas). Measure first; fix only what the row proves
(the discipline that caught the vector and feed O(table) bugs).

Fixture design: metadata cost depends on ENTRY COUNT, not data bytes, so
base files are hard links of one tiny parquet (real footers, real sizes —
the convert path reads both) and only the CHANGED files carry real rows.
Diff and poll must touch changed files only; a probe failure from a
placeholder file being read IS the finding.

Usage: python tools/metadata_scale_probe.py [max_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/tmp/rottnest_meta_probe"


def _make_base(path: str, n_files: int) -> str:
    """Directory of n_files parquet files: one 100-row donor + links."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    donor = os.path.join(path, "a-donor.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array(range(100), pa.int64()),
                "v": pa.array([f"row-{i}" for i in range(100)]),
            }
        ),
        donor,
    )
    # several link donors: filesystems cap hard links per inode (~65k)
    donors = [donor]
    for d in range(1, 1 + (n_files // 30_000)):
        extra = os.path.join(path, f"a-donor-{d}.parquet")
        shutil.copyfile(donor, extra)
        donors.append(extra)
    for i in range(n_files - len(donors)):
        os.link(
            donors[i % len(donors)],
            os.path.join(path, f"base-{i:07d}.parquet"),
        )
    return donor


def _change_file(path: str, name: str, lo: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = os.path.join(path, name)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(range(lo, lo + 200), pa.int64()),
                "v": pa.array([f"new-{i}" for i in range(200)]),
            }
        ),
        f,
    )
    return f


def main() -> None:
    from rottnest_spark.session import get_spark
    from rottnest_spark.sources.changes import (
        DeltaChangesCursor,
        IcebergChangesCursor,
        delta_snapshot_diff,
        iceberg_snapshot_diff,
    )
    from rottnest_spark.sources.delta import delta_live_files
    from rottnest_spark.sources.delta_write import delta_commit, delta_convert
    from rottnest_spark.sources.iceberg import iceberg_live_files
    from rottnest_spark.sources.iceberg_write import (
        iceberg_commit,
        iceberg_convert,
    )

    max_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("metadata-scale-probe", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    rows = []
    for n in (1_000, 10_000, 100_000, 1_000_000):
        if n > max_files:
            break
        for fmt in ("delta", "iceberg"):
            table = os.path.join(SCRATCH, f"{fmt}_{n}")
            t0 = time.time()
            _make_base(table, n)
            setup_s = time.time() - t0

            t0 = time.time()
            if fmt == "delta":
                base_ver = delta_convert(table)
            else:
                base_ver = iceberg_convert(table)
            convert_s = time.time() - t0

            # state resolution, cold (module-level readers hold no cache)
            t0 = time.time()
            live = (
                delta_live_files(table)
                if fmt == "delta"
                else iceberg_live_files(table)
            )
            state_s = time.time() - t0
            assert len(live) == n, (fmt, n, len(live))

            # position a cursor BEFORE the change so poll covers only it
            ckpt = os.path.join(SCRATCH, f"ckpt_{fmt}_{n}")
            cur = (
                DeltaChangesCursor(spark, table, ckpt)
                if fmt == "delta"
                else IcebergChangesCursor(spark, table, ckpt)
            )
            cur.ack(base_ver)

            change = _change_file(table, "zz-change.parquet", lo=10_000)
            if fmt == "delta":
                new_ver = delta_commit(table, add=[change])
            else:
                new_ver = iceberg_commit(table, add=[change])

            t0 = time.time()
            if fmt == "delta":
                diff = delta_snapshot_diff(spark, table, base_ver, new_ver)
            else:
                diff = iceberg_snapshot_diff(spark, table, base_ver, new_ver)
            n_diff = diff.count()
            diff_s = time.time() - t0
            assert n_diff == 200, (fmt, n, n_diff)

            t0 = time.time()
            feed, end = cur.poll()
            n_feed = feed.count()
            cur.ack(end)
            poll_s = time.time() - t0
            assert n_feed == 200, (fmt, n, n_feed)

            row = {
                "fmt": fmt,
                "files": n,
                "setup_s": round(setup_s, 2),
                "convert_s": round(convert_s, 2),
                "state_s": round(state_s, 3),
                "diff_s": round(diff_s, 2),
                "poll_s": round(poll_s, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            shutil.rmtree(table, ignore_errors=True)

    print(json.dumps({"metric": "metadata_scale_probe", "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
