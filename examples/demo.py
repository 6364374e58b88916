"""End-to-end demo — the analog of the reference's demo.py:10-37 (substring
+ uuid index build/search on local parquet), widened to every index family
and the pipeline operators.

Run:  python examples/demo.py  [sf_dir]  (default /root/testdata/sf0.001)
Writes everything under a temp dir; prints one line per capability.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rottnest_spark import ParquetLake, get_spark  # noqa: E402
from rottnest_spark.indices.bm25 import BM25Index, bm25_topk  # noqa: E402
from rottnest_spark.indices.exact import ExactIndex  # noqa: E402
from rottnest_spark.indices.logcloud import LogIndex  # noqa: E402
from rottnest_spark.indices.substring import SubstringIndex  # noqa: E402
from rottnest_spark.indices.vector import VectorIndex, knn_topk  # noqa: E402
from rottnest_spark.ops.pipeline import curation_report  # noqa: E402
from rottnest_spark.sources.reader import read_parquet  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="rottnest_demo_")
    spark = get_spark("rottnest-demo", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs_dir = os.path.join(work, "docs")
        read_parquet(spark, [f"{sf_dir}/documents.parquet"]).repartition(
            4
        ).write.parquet(docs_dir)
        lake = ParquetLake(spark, docs_dir, os.path.join(work, "idx"))

        sub = SubstringIndex()
        lake.build_index(sub, "text")
        hits = lake.search(sub, "text", "merge sort", k=5)
        print("substring search:", [r["doc_id"] for r in hits.collect()])
        print("  plan:", lake.explain_search(sub, "text", "merge sort"))

        bm = BM25Index()
        lake.build_index(bm, "text")
        top = bm25_topk(lake, bm, "text", "spark window merge", 5, "doc_id")
        print("bm25 top-5:", [(r["doc_id"], r["score"]) for r in top.collect()])

        ex = ExactIndex()
        lake.build_index(ex, "doc_id")
        print(
            "exact match doc_id=42:",
            lake.search(ex, "doc_id", 42).select("doc_id").collect(),
        )

        emb_dir = os.path.join(work, "emb")
        read_parquet(spark, [f"{sf_dir}/embeddings.parquet"]).repartition(
            3
        ).write.parquet(emb_dir)
        elake = ParquetLake(spark, emb_dir, os.path.join(work, "eidx"))
        vec = VectorIndex(rows_per_centroid=64, nprobes=8, pq_m=8, pq_k=16)
        elake.build_index(vec, "embedding")
        q = spark.read.parquet(emb_dir).limit(1).collect()[0]["embedding"]
        nn = knn_topk(elake, vec, "embedding", list(q), 5, "vec_id")
        print("vector 3-stage knn:", [r["vec_id"] for r in nn.collect()])

        ev_dir = os.path.join(work, "events")
        read_parquet(spark, [f"{sf_dir}/events.parquet"]).repartition(
            4
        ).write.parquet(ev_dir)
        llake = ParquetLake(spark, ev_dir, os.path.join(work, "lidx"))
        log = LogIndex()
        llake.build_index(log, "props")
        print(
            'log search \'"k": 87\':',
            llake.search(log, "props", '"k": 87').count(),
            "rows",
        )

        docs = spark.read.parquet(docs_dir)
        print(
            "curation report:",
            curation_report(docs, "doc_id", "text").collect()[0].asDict(),
        )

        # conjunctive multi-index: containment AND time range
        tsx = ExactIndex()
        llake.build_index(tsx, "ts")
        import datetime

        lo = datetime.datetime(2024, 1, 5)
        hi = datetime.datetime(2024, 1, 12)
        conj = llake.search_conj(
            [(log, "props", '"k": 87'), (tsx, "ts", (lo, hi))]
        )
        print("conjunctive log+time search:", conj.count(), "rows")

        # round 2: decontamination audit + hybrid lexical/vector retrieval
        from rottnest_spark.ops.decontam import ngram_overlap
        from rottnest_spark.ops.hybrid import ranked, rrf_fuse

        flags = ngram_overlap(
            docs.filter("doc_id % 50 != 0"),
            docs.filter("doc_id % 50 = 0"),
            "doc_id",
            "text",
            n=5,
            min_hits=3,
        )
        print(
            "decontamination: flagged",
            flags.filter("contaminated").count(),
            "of",
            flags.count(),
            "train docs",
        )
        bmr = ranked(
            bm25_topk(lake, bm, "text", "spark window merge", 20, "doc_id"),
            "doc_id",
            [F.desc("score"), F.asc("doc_id")],
        )
        knr = ranked(
            knn_topk(elake, vec, "embedding", list(q), 20, "vec_id"),
            "vec_id",
            [F.asc("dist"), F.asc("vec_id")],
        )
        fused = rrf_fuse([bmr, knr], k=5)
        print("hybrid RRF top-5:", [(r["id"], r["rrf"]) for r in fused.collect()])

        # round 3: event analytics + sessions + attribution + SemDeDup
        from rottnest_spark.ops.analytics import cohort_retention, funnel
        from rottnest_spark.ops.dedup import semantic_dedup
        from rottnest_spark.streaming.joins import attribution_join, last_touch
        from rottnest_spark.streaming.sessions import session_stats

        events = spark.read.parquet(ev_dir)
        fun = funnel(
            events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        )
        print("funnel:", [(r["step"], r["n_users"]) for r in fun.collect()])
        print("cohort cells:", cohort_retention(events, "user_id", "ts").count())
        print("sessions:", session_stats(events).count())
        att = last_touch(
            attribution_join(
                events.filter("event_type = 'click'"),
                events.filter("event_type = 'purchase'"),
            )
        )
        print("last-touch attributed purchases:", att.count())
        emb = spark.read.parquet(emb_dir)
        kept = semantic_dedup(emb, "vec_id", "embedding", threshold=0.98)
        print(
            "semantic dedup kept", kept.count(), "of", emb.count(), "vectors"
        )

        # Bloom membership index: ~10 bits/key for unclustered string keys
        from rottnest_spark.indices.bloom import BloomIndex

        uid_dir = os.path.join(work, "uid_lake")
        (
            spark.read.parquet(docs_dir)
            .withColumn(
                "uid",
                F.concat(F.lit("doc-"), F.md5(F.col("doc_id").cast("string"))),
            )
            .repartition(4)
            .write.parquet(uid_dir)
        )
        blake = ParquetLake(spark, uid_dir, os.path.join(work, "uid_idx"))
        bloom = BloomIndex()
        blake.build_index(bloom, "uid")
        probe = (
            spark.read.parquet(uid_dir).select("uid").orderBy("uid").first()[0]
        )
        print("bloom point lookup rows:", blake.search(bloom, "uid", probe).count())

        # summary sketches: metadata-only distinct / quantiles / overlap
        from rottnest_spark.indices.sketches import (
            QuantileSketchIndex,
            StatsSketchIndex,
            ThetaSketchIndex,
        )

        blake.build_index(StatsSketchIndex(), "uid")
        print("distinct uids ~", blake.distinct_estimate("uid")["estimate"])
        blake.build_index(QuantileSketchIndex(), "n_chars")
        print(
            "n_chars p50/p99 ~",
            blake.quantile_estimate("n_chars", [0.5, 0.99])["quantiles"],
        )
        blake.build_index(ThetaSketchIndex(), "uid")
        half = len(blake.files) // 2
        print(
            "key overlap first/second half:",
            blake.key_overlap_estimate(
                "uid", blake.files[:half], blake.files[half:]
            ),
        )

        # virtual-mode range scan: footer stats prune with NO index build
        olake = ParquetLake(
            spark,
            ["/root/testdata/sf0.001/orders.parquet"],
            os.path.join(work, "noidx"),
        )
        print(
            "virtual range rows:",
            olake.search_range_virtual("o_orderkey", 100, 200).count(),
        )

        # diversity sampling: cluster-balanced caps over embeddings
        from rottnest_spark.ops.sampling import cluster_balanced_sample

        div = cluster_balanced_sample(
            spark.read.parquet(emb_dir), "vec_id", "embedding",
            rows_per_centroid=64, cap_per_cluster=16,
        )
        print("diversity sample kept:", div.count())

        # operational report
        for row in blake.describe_indices():
            print(
                f"  index {row['index_type']}({row['column']}): "
                f"{row['index_bytes']} bytes, ratio {row['size_ratio']}"
            )

        # lifecycle: compaction + vacuum keep results identical
        before = lake.search(sub, "text", "merge sort").count()
        lake.compact_indices(sub, "text", row_threshold=10**9)
        lake.vacuum()
        assert lake.search(sub, "text", "merge sort").count() == before
        print("compaction + vacuum: search unchanged")

        # token-boundary phrase search on the SAME substring index
        from rottnest_spark.indices.substring import PhraseSearch

        ph = lake.search(PhraseSearch(), "text", "merge sort").count()
        print("phrase search hits:", ph)

        # CDC merge: copy-on-write, footer-pruned; then one-call upkeep
        ev = blake.read()
        ch = (
            ev.filter(F.col("uid") == probe)
            .withColumn("seq", F.lit(1))
            .withColumn("op", F.lit("D"))
        )
        st = blake.merge_into(ch, "uid")
        print(
            "cdc merge:", len(st["rewritten"]), "files rewritten,",
            st["pruned"], "pruned",
        )
        print("post-merge upkeep:", blake.refresh_indices()["built"])
        # auto-routed lookup: catalog picks the access path
        print("auto-routed lookup rows:", blake.lookup("uid", probe).count())
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
