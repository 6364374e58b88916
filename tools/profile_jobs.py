"""Per-Spark-job profile of one bench entry (guide §1: measure first).

Runs one declared query / build entry with the event log enabled, then
prints every Spark job with submission gap, duration and call site —
the local[N] stand-in for the Spark UI's Jobs page (spark.ui is disabled
in this sandbox).

Usage: python tools/profile_jobs.py <entry> [sf_dir]
where <entry> is a queries() key, or build:<spec> matching bench.py's
index-build entries (e.g. build:ivf, build:pq, build:vamana, build:logcloud,
build:substring_documents, build:conj).
"""

from __future__ import annotations

import glob
import io
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVDIR = "/tmp/rottnest_profile_events"


def get_spark_ev(cpus: str):
    from pyspark.sql import SparkSession

    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rottnest-profile-jobs")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .getOrCreate()
    )


def run_entry(spark, name: str, sf_dir: str) -> None:
    from rottnest_spark import entrypoints as ep

    if not name.startswith("build:"):
        ep.QUERIES[name](spark, sf_dir).collect()
        return
    spec = name.split(":", 1)[1]
    if spec == "ivf":
        from rottnest_spark.indices.vector import VectorIndex

        ep.indexed_lake(
            spark, sf_dir, "embeddings", "embedding",
            VectorIndex(rows_per_centroid=64, nprobes=8),
        )
    elif spec == "pq":
        from rottnest_spark.indices.vector import VectorIndex

        ep.indexed_lake(
            spark, sf_dir, "embeddings", "embedding",
            VectorIndex(rows_per_centroid=64, nprobes=8, pq_m=8, pq_k=64,
                        refine=128),
        )
    elif spec == "vamana":
        from rottnest_spark.indices.vamana import VamanaIndex

        ep.indexed_lake(
            spark, sf_dir, "embeddings", "embedding",
            VamanaIndex(rows_per_cluster=256, nprobes=6, refine=64),
        )
    elif spec == "logcloud":
        from rottnest_spark.indices.logcloud import LogIndex

        ep.indexed_lake(spark, sf_dir, "events", "props", LogIndex())
    elif spec == "substring_documents":
        from rottnest_spark.indices.substring import SubstringIndex

        ep.indexed_lake(spark, sf_dir, "documents", "text", SubstringIndex())
    elif spec == "substring_events":
        from rottnest_spark.indices.substring import SubstringIndex

        ep.indexed_lake(spark, sf_dir, "events", "props", SubstringIndex())
    elif spec == "bm25":
        from rottnest_spark.indices.bm25 import BM25Index

        ep.indexed_lake(spark, sf_dir, "documents", "text", BM25Index())
    elif spec == "suffix":
        from rottnest_spark.indices.suffix import SuffixArrayIndex

        ep.indexed_lake(spark, sf_dir, "documents", "text", SuffixArrayIndex())
    elif spec == "conj":
        ep.conj_events_lake(spark, sf_dir)
    else:
        raise SystemExit(f"unknown build spec {spec!r}")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR)
    cache = "/tmp/rottnest_profile_idx"
    shutil.rmtree(cache, ignore_errors=True)
    os.environ["ROTTNEST_SPARK_INDEX_CACHE"] = cache

    spark = get_spark_ev(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from rottnest_spark import entrypoints as ep

    # JIT/python-worker warmup, comparable to bench.py's
    try:
        ep.QUERIES["token_stats"](spark, "/root/testdata/sf0.001").collect()
        if not name.startswith("build:"):
            ep.QUERIES[name](spark, "/root/testdata/sf0.001").collect()
    except Exception as exc:
        print(f"warmup failed (ok): {exc}", file=sys.stderr)

    spark.sparkContext.setJobDescription(f"PROFILE:{name}")
    t0 = time.time()
    run_entry(spark, name, sf_dir)
    wall = time.time() - t0
    spark.stop()
    print(f"\n{name}: wall {wall:.2f}s")

    ev_files = [
        f
        for f in glob.glob(f"{EVDIR}/*")
        if not f.endswith(".inprogress")
    ] or glob.glob(f"{EVDIR}/*")
    jobs: dict[int, tuple[float, str]] = {}
    rows = []
    for fp in ev_files:
        if os.path.isdir(fp):
            inner = [
                g
                for g in glob.glob(os.path.join(fp, "events_*"))
                if ".compact" not in g
            ]
            fp = inner[0] if inner else None
        if not fp:
            continue
        for line in open(fp):
            e = json.loads(line)
            evt = e.get("Event")
            if evt == "SparkListenerJobStart":
                props = e.get("Properties") or {}
                desc = props.get("spark.job.description") or props.get(
                    "callSite.short", ""
                )
                jobs[e["Job ID"]] = (e["Submission Time"], desc)
            elif evt == "SparkListenerJobEnd":
                sub, desc = jobs.get(e["Job ID"], (None, ""))
                if sub:
                    rows.append(
                        (
                            e["Job ID"],
                            sub / 1000.0,
                            (e["Completion Time"] - sub) / 1000.0,
                            desc[:110],
                        )
                    )
    rows.sort()
    profiled = [r for r in rows if r[3].startswith(f"PROFILE:{name}")]
    use = profiled or rows
    if not use:
        print("no jobs captured")
        return
    t_first = use[0][1]
    prev_end = None
    print(f"{len(use)} jobs in profiled section:")
    for jid, ts, dur, desc in use:
        gap = ts - prev_end if prev_end is not None else 0.0
        prev_end = max(prev_end or 0, ts + dur)
        print(f"  job{jid:3d} t+{ts - t_first:7.2f} gap={gap:6.2f} dur={dur:7.3f} {desc}")
    total_job = sum(r[2] for r in use)
    print(f"sum of job durations: {total_job:.2f}s (wall {wall:.2f}s; "
          f"gap total {wall - total_job:.2f}s is driver-side work)")


if __name__ == "__main__":
    main()
