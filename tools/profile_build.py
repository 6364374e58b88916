"""Median-of-N cold index builds in one warmed JVM (each iteration builds
into a FRESH index dir — "cold" = no index reuse, not first-JVM-touch),
mirroring how bench.py times builds but with repetition for noisy hosts.

Usage: python tools/profile_build.py [-n N] <spec> [spec ...]
Specs as in tools/profile_jobs.py (ivf, pq, vamana, logcloud,
substring_documents, substring_events, bm25, suffix, conj, exact, bloom,
fuzzy).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPECS = {
    "ivf": ("embeddings", "embedding", lambda m: m["VectorIndex"](rows_per_centroid=64, nprobes=8)),
    "pq": ("embeddings", "embedding", lambda m: m["VectorIndex"](rows_per_centroid=64, nprobes=8, pq_m=8, pq_k=64, refine=128)),
    "vamana": ("embeddings", "embedding", lambda m: m["VamanaIndex"](rows_per_cluster=256, nprobes=6, refine=64)),
    "logcloud": ("events", "props", lambda m: m["LogIndex"]()),
    "substring_documents": ("documents", "text", lambda m: m["SubstringIndex"]()),
    "substring_events": ("events", "props", lambda m: m["SubstringIndex"]()),
    "bm25": ("documents", "text", lambda m: m["BM25Index"]()),
    "suffix": ("documents", "text", lambda m: m["SuffixArrayIndex"]()),
    "exact": ("orders", "o_orderkey", lambda m: m["ExactIndex"]()),
    "bloom": ("customer", "c_name", lambda m: m["BloomIndex"]()),
    "fuzzy": ("customer", "c_name", lambda m: m["FuzzyIndex"]()),
}


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS",
        "-Xms12g -XX:+AlwaysPreTouch -XX:+UseG1GC -XX:MaxGCPauseMillis=100"
        " -XX:+ParallelRefProcEnabled",
    )
    from rottnest_spark import entrypoints as ep
    from rottnest_spark.core.lake import ParquetLake
    from rottnest_spark.indices.bloom import BloomIndex
    from rottnest_spark.indices.bm25 import BM25Index
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.indices.fuzzy import FuzzyIndex
    from rottnest_spark.indices.logcloud import LogIndex
    from rottnest_spark.indices.substring import SubstringIndex
    from rottnest_spark.indices.suffix import SuffixArrayIndex
    from rottnest_spark.indices.vamana import VamanaIndex
    from rottnest_spark.indices.vector import VectorIndex
    from rottnest_spark.session import get_spark

    mods = dict(
        VectorIndex=VectorIndex, VamanaIndex=VamanaIndex, LogIndex=LogIndex,
        SubstringIndex=SubstringIndex, BM25Index=BM25Index,
        SuffixArrayIndex=SuffixArrayIndex, ExactIndex=ExactIndex,
        BloomIndex=BloomIndex, FuzzyIndex=FuzzyIndex,
    )
    spark = get_spark("rottnest-profile-build")
    spark.sparkContext.setLogLevel("ERROR")

    # JIT warmup: one throwaway small build + a query
    try:
        ep.QUERIES["token_stats"](spark, "/root/testdata/sf0.001").collect()
        shutil.rmtree("/tmp/profile_build_warm", ignore_errors=True)
        wl = ParquetLake(
            spark, [ep.table_path("/root/testdata/sf0.001", "documents")],
            "/tmp/profile_build_warm",
        )
        wl.build_index(SubstringIndex(), "text")
        shutil.rmtree("/tmp/profile_build_warm", ignore_errors=True)
    except Exception as exc:
        print(f"warmup failed (ok): {exc}", file=sys.stderr)

    def gc() -> None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    for spec in args:
        table, column, mk = SPECS[spec]
        ts = []
        for i in range(n):
            idx_dir = f"/tmp/profile_build_{spec}_{i}"
            shutil.rmtree(idx_dir, ignore_errors=True)
            lake = ParquetLake(
                spark, [ep.table_path(sf_dir, table)], idx_dir
            )
            idx = mk(mods)
            gc()
            t0 = time.time()
            lake.build_index(idx, column)
            ts.append(round(time.time() - t0, 3))
            shutil.rmtree(idx_dir, ignore_errors=True)
        ts_sorted = sorted(ts)
        med = ts_sorted[(len(ts_sorted) - 1) // 2]
        print(f"{spec}: median={med} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
