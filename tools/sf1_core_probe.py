"""Scale-out probe (VERDICT r11 item 2): run the 10 most expensive
bench entries at sf1 (tools/make_sf1.py output) at a given core count
and print per-entry wall seconds. Run once with 32 and once with 8 in
SEPARATE processes; the 32/8 ratio per entry is the scale-out evidence
the r11 scaling block could not provide at sf0.1.

Usage: python tools/sf1_core_probe.py <cpus> [sf_dir] [entry ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERY_ENTRIES = [
    "sync_table_replication",
    "iceberg_transform_partitioned_dml",
    "iceberg_v3_partitioned_dml",
    "compacted_search",
    "ngram_jaccard_join",
    "delta_change_feed",
    "iceberg_spec_evolution",
]
BUILD_ENTRIES = [
    "suffix_build_documents",
    "logcloud_build_events",
    "substring_build_documents",
]


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
    only = set(sys.argv[3:])

    cache = f"/tmp/rottnest_sf1_probe_idx_{cpus}"
    shutil.rmtree(cache, ignore_errors=True)
    os.environ["ROTTNEST_SPARK_INDEX_CACHE"] = cache
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS",
        "-Xms12g -XX:+AlwaysPreTouch -XX:+UseG1GC -XX:MaxGCPauseMillis=100"
        " -XX:+ParallelRefProcEnabled",
    )

    from rottnest_spark import entrypoints as ep
    from rottnest_spark.session import get_spark

    spark = get_spark("sf1-core-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from rottnest_spark.indices.logcloud import LogIndex
    from rottnest_spark.indices.substring import SubstringIndex
    from rottnest_spark.indices.suffix import SuffixArrayIndex

    builds = {
        "suffix_build_documents": lambda d: ep.indexed_lake(
            spark, d, "documents", "text", SuffixArrayIndex()
        ),
        "logcloud_build_events": lambda d: ep.indexed_lake(
            spark, d, "events", "props", LogIndex()
        ),
        "substring_build_documents": lambda d: ep.indexed_lake(
            spark, d, "documents", "text", SubstringIndex()
        ),
    }

    # shape warmup at sf0.001 (same policy as bench.py: steady-state, the
    # warm dirs are destroyed before anything is timed)
    warm = "/root/testdata/sf0.001"
    for name in QUERY_ENTRIES:
        if only and name not in only:
            continue
        try:
            ep.QUERIES[name](spark, warm).collect()
        except Exception:
            pass
    for name, fn in builds.items():
        if only and name not in only:
            continue
        try:
            fn(warm)
        except Exception:
            pass
    shutil.rmtree(cache, ignore_errors=True)

    def gc() -> None:
        try:
            m = spark.sparkContext._jsc.getPersistentRDDs()
            it = m.entrySet().iterator()
            while it.hasNext():
                it.next().getValue().unpersist()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    out: dict[str, float] = {}
    for name in BUILD_ENTRIES:
        if only and name not in only:
            continue
        gc()
        t0 = time.time()
        builds[name](sf_dir)
        out[name] = round(time.time() - t0, 2)
        print(f"{name:36s} {out[name]:8.2f}s  (build, cold)", flush=True)
    for name in QUERY_ENTRIES:
        if only and name not in only:
            continue
        ts = []
        for _ in range(3):
            gc()
            t0 = time.time()
            ep.QUERIES[name](spark, sf_dir).collect()
            ts.append(time.time() - t0)
        out[name] = round(sorted(ts)[1], 2)
        print(
            f"{name:36s} {out[name]:8.2f}s  (median of {len(ts)}:"
            f" {['%.2f' % t for t in ts]})",
            flush=True,
        )
    print("PROBE_JSON " + json.dumps({"cpus": cpus, "sf_dir": sf_dir, "entries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
