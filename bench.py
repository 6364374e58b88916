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

    # pin the bench JVM's heap behavior (round-7 finding: sub-second
    # entries swung +28-55% with untouched code — heap-resize and major-GC
    # pauses land on whichever query is running when the heap tips).
    # Fixed+pre-touched initial heap removes resize stalls; the G1 pause
    # target bounds individual pauses to noise level for >0.1 s entries.
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS",
        "-Xms12g -XX:+AlwaysPreTouch -XX:+UseG1GC -XX:MaxGCPauseMillis=100"
        " -XX:+ParallelRefProcEnabled",
    )

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
    errors: dict[str, str] = {}

    # host-speed calibration: a fixed pure-JVM job whose cost depends
    # only on the machine, never on this repo's code. Recorded in the
    # line and compared in vs_prev — when EVERY entry drifts together
    # (round 9: untouched round-5 queries measured uniformly ~1.4-2x an
    # older record on a quieter host), the calibration ratio says
    # whether that is the host or the code, so flags can be normalized
    # instead of chased.
    def _calibrate() -> float:
        cal = []
        for _ in range(3):
            t0 = time.time()
            spark.range(50_000_000).selectExpr(
                "sum(id * 2 + 1) AS s"
            ).collect()
            cal.append(time.time() - t0)
        return round(sorted(cal)[1], 3)

    # NOTE: the start calibration runs AFTER the warmup block below — a
    # cold-JVM calibration measures first-call JIT, not host speed
    # (observed: pre-warmup 3.8 s vs post-run 0.11 s on the same quiet
    # host — a 35x phantom "drift"). A second calibration runs after
    # the timed entries: a mid-run load change makes per-query flags
    # unattributable in a way a start-only anchor cannot see — the
    # start/end disagreement is recorded so the run SELF-REPORTS
    # contamination instead of flagging 60 phantom regressions
    # (observed: a probe concurrent with two pytest suites flagged 65
    # entries off a quiet-start anchor)

    def drop_persisted() -> None:
        """Unpersist leftover storage blocks (localCheckpoints, persists)
        between timed entries: queries are independent, but accumulated
        blocks from 70 entries create storage-eviction + GC churn that
        shows up as 5-10x outliers on whichever query runs when memory
        tips (observed: semantic_dedup 45s mid-bench vs 5.5s isolated)."""
        try:
            m = spark.sparkContext._jsc.getPersistentRDDs()
            it = m.entrySet().iterator()
            while it.hasNext():
                it.next().getValue().unpersist()
        except Exception:
            pass
        try:
            # settle the heap between entries: without this, whichever
            # query runs when accumulated garbage tips a major GC eats a
            # multi-second pause that looks like a query regression
            # (measured: quality_filter 0.6 s isolated vs 2.9 s mid-bench)
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def timed(name: str, fn) -> None:
        # fail-soft: one broken entry must never zero out the whole bench
        # line (round 2 lost ALL its numbers to a single AnalysisException)
        drop_persisted()
        t0 = time.time()
        try:
            fn()
        except Exception as exc:
            errors[name] = str(exc).splitlines()[-1][:300] if str(exc) else repr(exc)
            import traceback

            traceback.print_exc(file=sys.stderr)
            return
        timings[name] = round(time.time() - t0, 3)

    # -- untimed JVM/JIT warmup ----------------------------------------------
    # Compile the hot pipeline shapes once at the smallest SF so the timed
    # entries measure steady-state throughput, not first-call codegen JIT
    # (measured: the first parquet+explode+distinct job of a fresh JVM pays
    # ~10 s of JIT that repeat runs don't). Reported as warmup_sec — nothing
    # hidden. The reference's stage prints are steady-state too.
    t_warm = time.time()
    warm_dir = "/root/testdata/sf0.001"
    warm_cache = os.path.join(bench_cache, "warmup_idx")
    try:
        for wq in ("token_stats", "quality_filter", "lang_id",
                   "frequent_ngrams", "windowed_event_counts", "tpch_q1"):
            ep.QUERIES[wq](spark, warm_dir).collect()
        # dedup pipelines: sf0.001 is too small to cross the JVM's C2
        # compile thresholds for the 32-min hash-agg loops — warm at
        # sf0.01 (measured: first sf0.1 minhash run 12.6 s cold-JIT vs
        # 3.5 s steady-state)
        ep.QUERIES["minhash_dedup"](spark, "/root/testdata/sf0.01").collect()
        ep.QUERIES["ngram_jaccard_join"](spark, "/root/testdata/sf0.01").collect()
        from rottnest_spark.core.lake import ParquetLake as _PL

        _lake = _PL(spark, [ep.table_path(warm_dir, "documents")], warm_cache)
        _lake.build_index(SubstringIndex(), "text")
        _lake.search(SubstringIndex(), "text", "the").collect()
        # round 11: the OTHER build shapes get the same treatment — the
        # build entries are single cold-timed runs ("cold" = fresh index
        # dir, per the note on the timed block below), and without a
        # small-SF warmup each one ALSO measured its shape's first-call
        # codegen/JIT + Python-worker spin-up, which repeat builds don't
        # pay (measured at sf0.1: logcloud first build 14.4 s vs 3.2 s
        # steady; pq 19.3 vs 3.7; bm25 8.6 vs 2.1). One tiny build per
        # index family at sf0.001 compiles the pipeline shapes; the cost
        # is reported in warmup_sec, nothing hidden.
        from rottnest_spark.indices.bloom import BloomIndex as _BL
        from rottnest_spark.indices.fuzzy import FuzzyIndex as _FZ
        from rottnest_spark.indices.suffix import SuffixArrayIndex as _SX
        from rottnest_spark.indices.vamana import VamanaIndex as _VM

        for _tbl, _col, _idx in (
            ("documents", "text", _SX()),
            ("documents", "text", BM25Index()),
            ("orders", "o_orderkey", ExactIndex()),
            ("customer", "c_name", _BL()),
            ("customer", "c_name", _FZ()),
            ("events", "props", LogIndex()),
            ("events", "props", SubstringIndex(granularity="row_group")),
            ("embeddings", "embedding", VectorIndex(rows_per_centroid=64, nprobes=8)),
            ("embeddings", "embedding",
             VectorIndex(rows_per_centroid=64, nprobes=8, pq_m=8, pq_k=16, refine=32)),
            ("embeddings", "embedding", _VM(rows_per_cluster=256, nprobes=4, refine=16)),
        ):
            _wdir = os.path.join(warm_cache, f"w_{_idx.index_type}_{_tbl}_{_col}"[:80])
            _PL(spark, [ep.table_path(warm_dir, _tbl)], _wdir).build_index(
                _idx, _col
            )
        # the two single-shot op entries (zorder rewrite, CDC merge) get
        # the same one-small-run shape warmup
        from rottnest_spark.ops.zorder import zorder_write as _zw

        _zdir = os.path.join(warm_cache, "w_zorder")
        _zw(ep.load(spark, warm_dir, "events"), ["user_id", "value"], _zdir, 4)
        from pyspark.sql import functions as _F

        _mdir = os.path.join(warm_cache, "w_merge")
        _od = ep.load(spark, warm_dir, "orders")
        _od.repartitionByRange(4, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ).write.parquet(_mdir)
        _ml = _PL(spark, _mdir, os.path.join(warm_cache, "w_merge_idx"))
        _ml.merge_into(
            _od.limit(40)
            .withColumn("seq", _F.lit(1))
            .withColumn("op", _F.lit("U")),
            "o_orderkey",
        )
    except Exception:
        # warmup must never fail the bench — but a silently skipped
        # warmup makes cold-JIT costs reappear in the build entries, so
        # report it on stderr (not in the JSON line)
        import traceback

        traceback.print_exc(file=sys.stderr)
    shutil.rmtree(warm_cache, ignore_errors=True)
    warmup_sec = round(time.time() - t_warm, 2)
    calibration = _calibrate()  # post-warmup: measures the HOST, not JIT

    # -- index builds (cold) -------------------------------------------------
    timed(
        "substring_build_documents",
        lambda: ep.indexed_lake(spark, sf_dir, "documents", "text", SubstringIndex()),
    )
    timed(
        "substring_build_events",
        lambda: ep.indexed_lake(spark, sf_dir, "events", "props", SubstringIndex()),
    )
    from rottnest_spark.indices.suffix import SuffixArrayIndex

    timed(
        "suffix_build_documents",
        lambda: ep.indexed_lake(
            spark, sf_dir, "documents", "text", SuffixArrayIndex()
        ),
    )
    timed(
        "exact_build_orders",
        lambda: ep.indexed_lake(spark, sf_dir, "orders", "o_orderkey", ExactIndex()),
    )
    from rottnest_spark.indices.bloom import BloomIndex

    timed(
        "bloom_build_customer",
        lambda: ep.indexed_lake(spark, sf_dir, "customer", "c_name", BloomIndex()),
    )
    from rottnest_spark.indices.fuzzy import FuzzyIndex

    timed(
        "fuzzy_build_customer",
        lambda: ep.indexed_lake(spark, sf_dir, "customer", "c_name", FuzzyIndex()),
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
    timed(
        "pq_build_embeddings",
        # MUST match q_vector_knn_pq's params exactly: indexed_lake keys
        # its cache on the index config, so a drifted build entry makes
        # the query entry silently REBUILD inside its timed run (round-8
        # finding: vector_knn_pq read 19.3 s — 17 s of it a hidden
        # rebuild, because this entry still used the pre-gate pq_k=16)
        lambda: ep.indexed_lake(
            spark, sf_dir, "embeddings", "embedding",
            VectorIndex(rows_per_centroid=64, nprobes=8, pq_m=8, pq_k=64, refine=128),
        ),
    )
    from rottnest_spark.indices.vamana import VamanaIndex

    timed(
        "vamana_build_embeddings",
        lambda: ep.indexed_lake(
            spark, sf_dir, "embeddings", "embedding",
            VamanaIndex(rows_per_cluster=256, nprobes=6, refine=64),
        ),
    )
    timed(
        "conj_build_events",
        lambda: ep.conj_events_lake(spark, sf_dir),
    )

    # -- queries (accelerated / Catalyst path) --------------------------------
    # steady-state latency: MEDIAN of 3 runs per query (indexes are
    # prebuilt above, so every run measures the same accelerated path).
    # The median — not min — makes round-over-round deltas attributable:
    # sub-second entries showed ±40% min-of-2 jitter with untouched code
    # (value_outliers 0.62→1.38 s r5→r6), which drowned real regressions.
    # A per-entry relative spread is summarized in the jitter metrics so
    # the line itself says how trustworthy its numbers are. Builds above
    # remain single cold-timed runs (cold is the thing being measured).
    # sub-second entries get 5 iterations: at that magnitude the jitter
    # term (GC/JIT, absolute ±0.3-0.5 s) exceeds the signal, and round-7's
    # median-of-3 still swung +28-55% on untouched code (event_kpis
    # 0.94→1.46 s with zero diff). Five samples put the median inside the
    # noise floor; everything slower runs 3 iterations — a TRUE median
    # even above 5 s (round-9 finding: min-of-2 on a noisy host let
    # suffix_build swing 2.1→25.2 s in the driver record; the ~1 extra
    # wall-minute buys attributability).
    EXTRA_ITERS_BELOW_SEC = 1.0
    # round-11 (VERDICT r10 ask #2): a 3-sample rel spread above this gets
    # the 5-iteration treatment REGARDLESS of magnitude — the committed
    # r10 snapshot published ngram_jaccard_join at 26.7 s with spread 1.06
    # while the same-code driver run measured 5.07 s; an entry whose own
    # run flags it 2x-noisy must not settle on 3 samples.
    HIGH_SPREAD = 0.5
    spreads: dict[str, float] = {}
    noisy_mins: dict[str, float] = {}
    for name, fn in ep.QUERIES.items():
        ts = []
        try:
            for it in range(5):
                drop_persisted()
                t0 = time.time()
                fn(spark, sf_dir).collect()
                ts.append(time.time() - t0)
                if it == 2:
                    s3 = sorted(ts)
                    spread3 = (s3[-1] - s3[0]) / max(s3[1], 1e-9)
                    if s3[1] >= EXTRA_ITERS_BELOW_SEC and spread3 <= HIGH_SPREAD:
                        break
        except Exception as exc:
            errors[name] = str(exc).splitlines()[-1][:300] if str(exc) else repr(exc)
            import traceback

            traceback.print_exc(file=sys.stderr)
            continue
        ts.sort()
        # LOWER median: odd lengths (3 or 5 samples) give the true middle
        med = ts[(len(ts) - 1) // 2]
        timings[name] = round(med, 3)
        if len(ts) > 1:
            spreads[name] = (ts[-1] - ts[0]) / max(med, 1e-9)
            # entries STILL noisy after 5 samples also record their MIN —
            # the steady-state floor. Round-11 finding: ngram_jaccard_join
            # is bimodal in long-lived bench JVMs (17 s vs 5 s; the slow
            # mode is whole-stage-codegen compile of its very large
            # generated plan + context GC, not the query — standalone
            # probes settle at 4.2-5.0 s ≈ the r8 record, ops/dedup.py
            # unchanged). The min lets a reader separate the two modes
            # without re-running.
            if spreads[name] > HIGH_SPREAD:
                noisy_mins[name] = round(ts[0], 3)

    # -- quality metrics promised in BASELINE.md ------------------------------
    # pruning ratio = candidate units the index returns / total units
    # (READ_RANGE_COUNTER analog); recall@K for the approximate vector path.
    metrics: dict[str, float] = {}
    try:
        # fixture tables are single files, so measure sub-file pruning on a
        # multi-row-group copy with the row_group-granular index
        import pyarrow.parquet as pq

        from rottnest_spark.core.lake import ParquetLake
        from rottnest_spark.core.layout import extract_layout

        rg_dir = os.path.join(bench_cache, "events_rg")
        os.makedirs(rg_dir, exist_ok=True)
        rg_file = os.path.join(rg_dir, "events.parquet")
        pq.write_table(
            pq.read_table(ep.table_path(sf_dir, "events")),
            rg_file,
            row_group_size=4096,
        )
        # median-of-3 like the query entries (each iteration builds into a
        # FRESH index dir — "cold" means no index reuse, not first-JVM-touch;
        # the single-shot r6 entry swung ±1 s with untouched code). The
        # auto-salt decision + probe cost land in _build_info.json.
        idx = SubstringIndex(granularity="row_group")
        rg_ts = []
        for it in range(5):  # 5 fresh-dir builds: the one entry with a
            # standing verdict target (<=2.5 s) deserves the tight median
            # (round-8: 3-build medians straddled 2.4-3.0 s on identical
            # code; isolated 5-build runs settle at 2.0-2.6 s)
            drop_persisted()
            lake = ParquetLake(
                spark, rg_dir, os.path.join(bench_cache, f"rg_idx_{it}")
            )
            t0 = time.time()
            lake.build_index(idx, "props")
            rg_ts.append(time.time() - t0)
        rg_ts.sort()
        timings["substring_rg_build_events"] = round(rg_ts[2], 3)
        # the bench line explains the build entry: auto-salt decision and
        # what the probe cost (round-5/6 regression was unattributable)
        info = getattr(idx, "last_build_info", None)
        if info:
            metrics["substring_rg_salted"] = 1.0 if info["salted"] else 0.0
            metrics["substring_rg_salt_probe_sec"] = info["salt_probe_sec"]
        timed(
            "substring_rg_search_events",
            lambda: lake.search(idx, "props", ep.LOG_QUERY).collect(),
        )
        # A needle query (absent value) — the log-search case where the
        # index proves absence and prunes everything. LOG_QUERY itself is
        # measured separately below: its matches are ~1% of rows spread
        # uniformly, so EVERY 4096-row group contains hits and no correct
        # index can return fewer than all units for it (ratio floor = 1.0);
        # the df-ranked probe detects that and escapes to brute-force.
        NEEDLE = '"k": 871'
        timed(
            "substring_rg_needle_events",
            lambda: lake.search(idx, "props", NEEDLE).collect(),
        )
        total_units = extract_layout(spark, [rg_file]).count()
        paths = [
            e["index_path"]
            for e in lake.catalog.entries_for("substring", "props")
        ]
        from rottnest_spark.indices.base import BRUTE_FORCE

        def ratio(query: str) -> float:
            cands = idx.search(spark, paths, query)
            if cands is BRUTE_FORCE:  # index prunes nothing for this query
                return 1.0
            return round(cands.count() / max(total_units, 1), 4)

        metrics["substring_rg_pruning_ratio"] = ratio(NEEDLE)
        metrics["substring_rg_pruning_ratio_dense"] = ratio(ep.LOG_QUERY)
        # zone-map pruning on a naturally key-clustered fact (orders are
        # generated in key order, so row-group min/max ranges are disjoint)
        rg_ord = os.path.join(rg_dir, "orders.parquet")
        pq.write_table(
            pq.read_table(ep.table_path(sf_dir, "orders")),
            rg_ord,
            row_group_size=4096,
        )
        olake = ParquetLake(
            spark, [rg_ord], os.path.join(bench_cache, "rg_oidx")
        )
        oidx = ExactIndex(granularity="row_group")
        olake.build_index(oidx, "o_orderkey")
        opaths = [
            e["index_path"]
            for e in olake.catalog.entries_for("exact", "o_orderkey")
        ]
        o_units = extract_layout(spark, [rg_ord]).count()
        metrics["exact_rg_pruning_ratio"] = round(
            oidx.search(spark, opaths, ep.EXACT_KEY).count()
            / max(o_units, 1),
            4,
        )
        exact = {
            r["vec_id"] for r in ep.q_vector_knn_exact(spark, sf_dir).collect()
        }
        ivf = {
            r["vec_id"] for r in ep.q_vector_knn_ivf(spark, sf_dir).collect()
        }
        metrics["vector_ivf_recall_at_k"] = round(
            len(exact & ivf) / max(len(exact), 1), 4
        )
        vam = {
            r["vec_id"] for r in ep.q_vector_knn_vamana(spark, sf_dir).collect()
        }
        metrics["vector_vamana_recall_at_k"] = round(
            len(exact & vam) / max(len(exact), 1), 4
        )
        # z-order layout quality: candidate-file fraction for a top-decile
        # predicate on the SECOND clustering column (a linear sort cannot
        # prune this class at all — ratio 1.0 by construction)
        import glob as _glob

        from rottnest_spark.ops.zorder import prunable_files, zorder_write

        ev = ep.load(spark, sf_dir, "events")
        z_dir = os.path.join(bench_cache, "events_zorder")
        n_zfiles = 32
        timed(
            "zorder_rewrite_events",
            lambda: zorder_write(ev, ["user_id", "value"], z_dir, n_zfiles),
        )
        from pyspark.sql import functions as _F

        vrow = ev.agg(
            _F.min("user_id").alias("ulo"),
            _F.max("user_id").alias("uhi"),
            _F.expr("percentile(value, 0.9)").alias("vlo"),
            _F.max("value").alias("vhi"),
        ).collect()[0]
        zc, _zp = prunable_files(
            sorted(_glob.glob(os.path.join(z_dir, "*.parquet"))),
            {
                "user_id": (vrow["ulo"], vrow["uhi"]),
                "value": (vrow["vlo"], vrow["vhi"]),
            },
            spark=spark,  # the 64-file knee is the ONLY path policy
        )
        metrics["zorder_candidate_ratio"] = round(len(zc) / n_zfiles, 4)
        # copy-on-write CDC merge: key-clustered 16-file lake, 60-key
        # changeset → the footer-range prune should rewrite only the files
        # whose key range is hit (ratio = untouched fraction)
        from rottnest_spark.ops.merge import DELETE_OP  # noqa: F401

        m_dir = os.path.join(bench_cache, "merge_lake")
        orders_df = ep.load(spark, sf_dir, "orders")
        (
            orders_df.repartitionByRange(16, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.parquet(m_dir)
        )
        mlake = ParquetLake(spark, m_dir, os.path.join(bench_cache, "m_idx"))
        n_files = len(mlake.files)
        # a realistic CDC batch touches a key NEIGHBORHOOD (recent orders),
        # not a uniform spread — take one narrow slice so the clustered
        # layout can prune
        changes = (
            orders_df.filter(_F.col("o_orderkey").between(10_000, 10_059))
            .withColumn("seq", _F.lit(1))
            .withColumn(
                "op",
                _F.when(_F.col("o_orderkey") % 2 == 0, _F.lit("D")).otherwise(
                    _F.lit("U")
                ),
            )
        )
        t0m = time.time()
        mstats = mlake.merge_into(changes, "o_orderkey")
        timings["cdc_merge_into_lake"] = round(time.time() - t0m, 3)
        metrics["merge_files_pruned_ratio"] = round(
            mstats["pruned"] / max(n_files, 1), 4
        )
    except Exception as exc:  # metrics must never fail the bench line
        metrics["error"] = str(exc)[:200]

    calibration_end = _calibrate()
    cal_drift = round(
        max(calibration, calibration_end)
        / max(min(calibration, calibration_end), 1e-9),
        3,
    )
    # the vs_prev normalization uses the MEAN of the two anchors; the
    # drift ratio is the run's self-reported trust signal (>1.5 means
    # the host's speed changed mid-run — treat every flag as suspect)
    calibration = round((calibration + calibration_end) / 2, 3)

    total = round(sum(timings.values()), 3)
    jitter = {}
    if spreads:
        vals = sorted(spreads.values())
        jitter = {
            "iters": "5 under 1s, 3 above",
            "stat": "median",
            "median_rel_spread": round(vals[len(vals) // 2], 4),
            "p90_rel_spread": round(vals[int(len(vals) * 0.9)], 4),
            "max_rel_spread": round(vals[-1], 4),
        }

    # -- round-over-round self-annotation --------------------------------
    # Compare this run against the latest recorded BENCH_r*.json and flag
    # only entries whose regression exceeds max(15%, the entry's measured
    # rel spread THIS run) — the round-7 ask: deltas within tolerance are
    # summarized, not itemized, so a flagged entry means something.
    vs_prev: dict = {}
    try:
        import glob as _glob

        recs = sorted(_glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        if recs:
            rec = json.load(open(recs[-1]))
            parsed = rec.get("parsed") or {}
            prev = dict(parsed.get("queries", {})) if parsed else {}
            if parsed and parsed.get("host_calibration_sec"):
                prev["host_calibration_sec"] = parsed["host_calibration_sec"]
            if not prev:
                # driver records keep only the stdout TAIL — recover the
                # surviving "name": seconds pairs by regex, but ONLY from
                # the text before "warmup_sec" (the queries dict comes
                # first in key order): scanning the whole tail ingests
                # vs_prev's own prev/now/delta/allowed pairs and jitter/
                # metrics scalars as if they were query timings (round-9:
                # a rerun's vs_prev came out silently empty because the
                # recovered names were exactly those four keys)
                tail = rec.get("tail", "")
                cut = tail.find('"warmup_sec"')
                for mname, mval in re.findall(
                    r'"([a-z0-9_]+)": ([0-9.]+)',
                    tail if cut < 0 else tail[:cut],
                ):
                    if mname not in ("metric", "value", "sf", "prev",
                                     "now", "delta", "allowed",
                                     "delta_raw", "delta_normalized",
                                     "now_cal_normalized"):
                        prev[mname] = float(mval)
                mcal = re.search(
                    r'"host_calibration_sec": ([0-9.]+)', tail
                )
                if mcal:
                    prev["host_calibration_sec"] = float(mcal.group(1))
            against = os.path.basename(recs[-1])
            if len([k for k in prev if k != "host_calibration_sec"]) < 10:
                # the driver record's tail held (almost) no query
                # timings — fall back to the COMMITTED bench_last.json,
                # the previous round's full snapshot (round-10 fix: the
                # r9 tail was 100% metrics/jitter/vs_prev keys, leaving
                # the comparison silently empty)
                last = os.path.join(REPO, "bench_last.json")
                if os.path.exists(last):
                    full = json.load(open(last))
                    if full.get("queries"):
                        prev = dict(full["queries"])
                        if full.get("host_calibration_sec"):
                            prev["host_calibration_sec"] = full[
                                "host_calibration_sec"
                            ]
                        against = "bench_last.json (committed prev round)"
            prev_cal = prev.pop("host_calibration_sec", None)
            # host-speed normalization: the calibration entry is a fixed
            # pure-JVM job, so cal_now/cal_prev is the host's speed drift
            # between the two records. A flag must survive AFTER dividing
            # this run's time by that ratio — otherwise a slower machine
            # flags every entry at once and a real regression hides in
            # the noise (round 9: three same-code runs disagreed on WHICH
            # entries regressed; the calibration disagreed 10x).
            cal_ratio = (
                round(calibration / prev_cal, 3)
                if prev_cal and prev_cal > 0
                else None
            )
            flagged = {}
            ok = 0
            for qn, now in timings.items():
                if qn not in prev or prev[qn] <= 0:
                    continue
                allowed = max(0.15, spreads.get(qn, 0.0))
                norm_now = now / cal_ratio if cal_ratio else now
                delta_norm = (norm_now - prev[qn]) / prev[qn]
                delta_raw = (now - prev[qn]) / prev[qn]
                # flag only when the regression survives BOTH views: the
                # calibration anchor is pure-JVM integer throughput, and
                # mixed JVM/Python/IO entries do not scale with it — on
                # a host that got 3.5x faster, normalization alone
                # flagged 133 phantom entries (every raw time FELL); on
                # one that got slower, raw alone flags everything. A
                # real code regression is slower in raw seconds AND
                # after normalization.
                if min(delta_raw, delta_norm) > allowed:
                    flagged[qn] = {
                        "prev": prev[qn],
                        "now": now,
                        "now_cal_normalized": round(norm_now, 3),
                        "delta_raw": round(delta_raw, 3),
                        "delta_normalized": round(delta_norm, 3),
                        "allowed": round(allowed, 3),
                    }
                else:
                    ok += 1
            vs_prev = {
                "against": against,
                "within_tolerance": ok,
                "flagged": flagged,
            }
            if prev_cal:
                vs_prev["host_calibration"] = {
                    "prev": prev_cal,
                    "now": calibration,
                    "ratio": cal_ratio,
                    "note": "flag deltas are computed on now/ratio",
                }
    except Exception as exc:  # annotation must never fail the bench line
        vs_prev = {"error": str(exc)[:120]}

    # key order matters: the driver keeps only the stdout TAIL, so the
    # compact high-value keys (jitter, vs_prev, errors, sf) go LAST and
    # the big queries dict first (its head is what truncation eats). The
    # printed line carries only a COMPACT vs_prev summary (flag names,
    # not the per-entry detail) so the mandatory keys survive tail
    # truncation; the COMPLETE record lands in bench_last.json.
    line = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warmup_sec": warmup_sec,
        "metrics": metrics,
        "host_calibration_sec": calibration,
        "host_calibration_drift": cal_drift,
        "jitter": jitter,
        "vs_prev": vs_prev,
        "errors": errors,
        "sf": sf,
    }
    try:
        with open(os.path.join(REPO, "bench_last.json"), "w") as fh:
            json.dump(
                {
                    **line,
                    "spreads": {
                        k: round(v, 4) for k, v in spreads.items()
                    },
                    # steady-state floor of entries still noisy at 5
                    # samples (bimodality evidence — see the loop note)
                    "high_spread_min": noisy_mins,
                },
                fh,
                indent=1,
            )
    except Exception:
        pass
    if isinstance(vs_prev, dict) and isinstance(
        vs_prev.get("flagged"), dict
    ):
        line = {
            **line,
            "vs_prev": {
                **{k: v for k, v in vs_prev.items() if k != "flagged"},
                "n_flagged": len(vs_prev["flagged"]),
                "flagged_names": sorted(vs_prev["flagged"]),
            },
        }
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
