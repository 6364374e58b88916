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
    "suffix_search",
    "vector_knn_vamana",
    "tpch_q9",
    "tpch_q21",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    os.environ.setdefault("ROTTNEST_SPARK_INDEX_CACHE", "/tmp/rottnest_scale_idx")
    from rottnest_spark import entrypoints as ep
    from rottnest_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    sfs = list(SFS)
    # synthetic sf1/sf10 (tools/make_sf1.py) extend the ladder when present
    # — the 0.1 -> 1 -> 10 columns are the strongest sub-linearity evidence
    sf1 = os.environ.get("SCALE_SF1_DIR", "/tmp/testdata_sf1")
    if os.path.exists(os.path.join(sf1, "orders.parquet")):
        sfs.append(sf1)
        sf10 = os.environ.get("SCALE_SF10_DIR", "/tmp/testdata_sf10")
        if os.path.exists(os.path.join(sf10, "orders.parquet")):
            sfs.append(sf10)
    spark = get_spark("scale-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    # steady-state: run everything once at the smallest sf first
    for n in names:
        try:
            ep.QUERIES[n](spark, sfs[0]).collect()
        except Exception:
            pass
    labels = ["sf.001", "sf.01", "sf.1", "sf1", "sf10"][: len(sfs)]
    hdr = " ".join(f"{l:>8s}" for l in labels)
    ratios = " ".join(
        f"{'x(' + labels[i + 1] + ')':>10s}" for i in range(len(sfs) - 1)
    )
    print(f"{'query':24s} {hdr} {ratios}   (each x column is vs 10x data)")
    for n in names:
        ts = []
        for sf in sfs:
            t0 = time.time()
            ep.QUERIES[n](spark, sf).collect()
            ts.append(time.time() - t0)
        rs = [
            ts[i + 1] / ts[i] if ts[i] else float("nan")
            for i in range(len(ts) - 1)
        ]
        tcols = " ".join(f"{t:8.2f}" for t in ts)
        rcols = " ".join(f"{r:10.2f}" for r in rs)
        print(f"{n:24s} {tcols} {rcols}")


if __name__ == "__main__":
    main()
