"""Time one or more bench entries in isolation, mirroring bench.py's
methodology (same session factory, same cache dir, drop_persisted + gc
between iterations, warmup run first).

Usage: python tools/profile_entry.py [-n ITERS] <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    iters = 3
    if args and args[0] == "-n":
        iters = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cache = "/tmp/rottnest_spark_profile_idx"
    shutil.rmtree(cache, ignore_errors=True)
    os.environ["ROTTNEST_SPARK_INDEX_CACHE"] = cache
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS",
        "-Xms12g -XX:+AlwaysPreTouch -XX:+UseG1GC -XX:MaxGCPauseMillis=100"
        " -XX:+ParallelRefProcEnabled",
    )

    from rottnest_spark import entrypoints as ep
    from rottnest_spark.session import get_spark

    spark = get_spark("rottnest-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def drop_persisted() -> None:
        try:
            m = spark.sparkContext._jsc.getPersistentRDDs()
            it = m.entrySet().iterator()
            while it.hasNext():
                it.next().getValue().unpersist()
        except Exception:
            pass
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    # small warmup (JIT) on the first named entry at sf0.001
    try:
        ep.QUERIES[args[0]](spark, "/root/testdata/sf0.001").collect()
    except Exception as exc:
        print(f"warmup failed (ok): {exc}", file=sys.stderr)

    for name in args:
        fn = ep.QUERIES[name]
        ts = []
        for _ in range(iters):
            drop_persisted()
            t0 = time.time()
            fn(spark, sf_dir).collect()
            ts.append(round(time.time() - t0, 3))
        ts_sorted = sorted(ts)
        med = ts_sorted[(len(ts_sorted) - 1) // 2]
        print(f"{name}: median={med} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
