"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Index builds are timed as separate `*_build` entries (cold build each run —
the cache dir is wiped first) so search latencies measure the accelerated
path, mirroring the reference's stage-timing prints
(src/lava/substring/search.rs:89 et al.).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    bench_cache = "/tmp/rottnest_spark_bench_idx"
    shutil.rmtree(bench_cache, ignore_errors=True)
    os.environ["ROTTNEST_SPARK_INDEX_CACHE"] = bench_cache

    from rottnest_spark import entrypoints as ep
    from rottnest_spark.session import get_spark

    spark = get_spark("rottnest-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from rottnest_spark.indices.bm25 import BM25Index
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.indices.logcloud import LogIndex
    from rottnest_spark.indices.substring import SubstringIndex
    from rottnest_spark.indices.vector import VectorIndex

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # -- index builds (cold) -------------------------------------------------
    timed(
        "substring_build_documents",
        lambda: ep.indexed_lake(spark, sf_dir, "documents", "text", SubstringIndex()),
    )
    timed(
        "substring_build_events",
        lambda: ep.indexed_lake(spark, sf_dir, "events", "props", SubstringIndex()),
    )
    timed(
        "exact_build_orders",
        lambda: ep.indexed_lake(spark, sf_dir, "orders", "o_orderkey", ExactIndex()),
    )
    timed(
        "bm25_build_documents",
        lambda: ep.indexed_lake(spark, sf_dir, "documents", "text", BM25Index()),
    )
    timed(
        "logcloud_build_events",
        lambda: ep.indexed_lake(spark, sf_dir, "events", "props", LogIndex()),
    )
    timed(
        "ivf_build_embeddings",
        lambda: ep.indexed_lake(
            spark, sf_dir, "embeddings", "embedding",
            VectorIndex(rows_per_centroid=64, nprobes=8),
        ),
    )

    # -- queries (accelerated / Catalyst path) --------------------------------
    for name, fn in ep.QUERIES.items():
        timed(name, lambda fn=fn: fn(spark, sf_dir).collect())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
