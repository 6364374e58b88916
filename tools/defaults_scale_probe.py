"""v3 initial-defaults scan ladder (round 9, verdict item 4): the
defaults-fill read groups data files by which defaulted columns their
FOOTERS lack. Round 8 peeked every footer in a driver loop — O(files)
GET round-trips serialized on one node at object-storage latency. Round
9 moves the peek executor-side past a small-file threshold
(sources/iceberg.py `_missing_defaults_by_file`: mapInPandas over the
path list, one descriptor row per file collected back).

This probe measures the GROUPING pass alone (the part that was
driver-bound) as file count grows 10² → 10³ → 10⁴, for both paths, plus
a full read()+count at each rung. Pass criterion: executor-path
grouping cost grows no worse than linearly with a flat per-file
constant (the work is distributed), and the full read stays
correctness-identical between rungs.

Usage: python tools/defaults_scale_probe.py [max_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/tmp/rottnest_defaults_probe"


def _make_table(path: str, n_files: int) -> None:
    """n_files pre-evolution files (no `score` column) + 1 evolved file,
    converted to Iceberg and hand-upgraded to v3 with an
    initial-default. Pre-evolution files are hard links of one donor
    (footer peeks read real footers; rows don't matter)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rottnest_spark.sources.iceberg_write import (
        iceberg_commit,
        iceberg_convert,
    )

    os.makedirs(path, exist_ok=True)
    donor = os.path.join(path, "a-donor.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array(range(50), pa.int64()),
                "v": pa.array([f"row-{i}" for i in range(50)]),
            }
        ),
        donor,
    )
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
    iceberg_convert(path)
    evolved = os.path.join(path, "zz-evolved.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array(range(100, 150), pa.int64()),
                "v": pa.array([f"new-{i}" for i in range(50)]),
                "score": pa.array(range(100, 150), pa.int64()),  # never 7
            }
        ),
        evolved,
    )
    iceberg_commit(path, add=[evolved])
    meta = os.path.join(path, "metadata")
    metas = sorted(f for f in os.listdir(meta) if f.endswith(".metadata.json"))
    md = json.loads(open(os.path.join(meta, metas[-1])).read())
    md["format-version"] = 3
    md["schema"]["fields"].append(
        {
            "id": 1 + max(f["id"] for f in md["schema"]["fields"]),
            "name": "score",
            "required": False,
            "type": "long",
            "initial-default": 7,
        }
    )
    if "schemas" in md:  # keep the canonical form in sync
        md["schemas"] = [{**md["schema"], "schema-id": 0}]
    v = len(metas) + 10
    with open(os.path.join(meta, f"v{v}.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write(str(v))


def main() -> None:
    import rottnest_spark.sources.iceberg as ice
    from rottnest_spark.session import get_spark
    from rottnest_spark.sources.iceberg import (
        IcebergSnapshotLake,
        _missing_defaults_by_file,
        iceberg_live_files,
    )

    max_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark("defaults-scale-probe", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    rows = []
    for n in (100, 1_000, 10_000):
        if n > max_files:
            break
        table = os.path.join(SCRATCH, f"t{n}")
        _make_table(table, n)
        fl = iceberg_live_files(table)

        # grouping pass, DRIVER loop (the round-8 shape), forced
        orig = ice._DEFAULTS_PROBE_DRIVER_MAX
        ice._DEFAULTS_PROBE_DRIVER_MAX = 10**9
        t0 = time.time()
        g_driver = _missing_defaults_by_file(spark, fl, ["score"])
        driver_s = time.time() - t0

        # grouping pass, EXECUTOR-distributed (the round-9 shape), forced
        ice._DEFAULTS_PROBE_DRIVER_MAX = 0
        t0 = time.time()
        g_exec = _missing_defaults_by_file(spark, fl, ["score"])
        exec_s = time.time() - t0
        ice._DEFAULTS_PROBE_DRIVER_MAX = orig
        assert g_driver == g_exec, f"grouping mismatch at n={n}"

        # full defaults read at this rung (default path selection)
        t0 = time.time()
        df = IcebergSnapshotLake(spark, table, table + "_ix").read()
        n_default = df.filter("score = 7").count()
        read_s = time.time() - t0
        assert n_default == 50 * n, (n, n_default)

        row = {
            "files": n + 1,
            "group_driver_s": round(driver_s, 3),
            "group_executor_s": round(exec_s, 3),
            "driver_us_per_file": round(driver_s / (n + 1) * 1e6, 1),
            "read_s": round(read_s, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(table, ignore_errors=True)

    print(json.dumps({"metric": "defaults_scale_probe", "rows": rows}))
    spark.stop()
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
