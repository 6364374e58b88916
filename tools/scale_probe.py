"""Data-scaling probe: time representative queries at sf0.001 / 0.01 / 0.1
and print per-query scaling factors vs the 10x data growth. Near-1x factors
at small SF mean fixed overhead dominates; the interesting signal is the
0.01 -> 0.1 column staying well under 10x for index-accelerated paths
(pruning works) and near-linear for full-scan analytics (no superlinear
shuffle blowup).

Usage: python tools/scale_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "substring_search",
    "exact_match",
    "bloom_match",
    "bm25_topk",
    "vector_knn_exact",
    "minhash_dedup",
    "tpch_q1",
    "tpch_q5",
    "token_stats",
    "chunk_documents",
    "phrase_search",
    "cdc_merge",
    "value_outliers",
    "json_extract_agg",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    os.environ.setdefault("ROTTNEST_SPARK_INDEX_CACHE", "/tmp/rottnest_scale_idx")
    from rottnest_spark import entrypoints as ep
    from rottnest_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    # steady-state: run everything once at the smallest sf first
    for n in names:
        try:
            ep.QUERIES[n](spark, SFS[0]).collect()
        except Exception:
            pass
    print(f"{'query':24s} {'sf.001':>8s} {'sf.01':>8s} {'sf.1':>8s} "
          f"{'x(.01/.001)':>12s} {'x(.1/.01)':>10s}")
    for n in names:
        ts = []
        for sf in SFS:
            t0 = time.time()
            ep.QUERIES[n](spark, sf).collect()
            ts.append(time.time() - t0)
        r1 = ts[1] / ts[0] if ts[0] else float("nan")
        r2 = ts[2] / ts[1] if ts[1] else float("nan")
        print(f"{n:24s} {ts[0]:8.2f} {ts[1]:8.2f} {ts[2]:8.2f} "
              f"{r1:12.2f} {r2:10.2f}")


if __name__ == "__main__":
    main()
