"""Runnable tour of the round-4b search surface:

    suffix-array substring search (short needles an n-gram index can't
      prune; single prefix-range probe)
    → batched suffix probes (N needles, one index scan)
    → BM25 with a WordPiece tokenizer (vocab-file parity; config guard)
    → Vamana graph ANN (per-shard DiskANN graphs; exact fp32 rerank)
    → the completed TPC-H surface (all 22 shapes, Q2 + Q21 shown)

Usage: python examples/search_engines_tour.py
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
from rottnest_spark.indices.suffix import SuffixArrayIndex  # noqa: E402
from rottnest_spark.indices.tokenizers import WordPieceTokenizer  # noqa: E402
from rottnest_spark.indices.vamana import VamanaIndex  # noqa: E402
from rottnest_spark.indices.vector import knn_topk  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("search-engines-tour", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="search_tour_")
    try:
        # -- suffix-array substring search --------------------------------
        docs_dir = os.path.join(work, "docs")
        (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .repartition(5)
            .write.parquet(docs_dir)
        )
        lake = ParquetLake(spark, docs_dir, os.path.join(work, "idx"))
        sfx = SuffixArrayIndex()
        lake.build_index(sfx, "text")
        hits = lake.search(sfx, "text", "batch part").count()
        full = (
            spark.read.parquet(docs_dir)
            .filter(F.contains(F.lower("text"), F.lit("batch part")))
            .count()
        )
        assert hits == full
        print(f"suffix search 'batch part': {hits} rows == full scan")
        # a 2-char needle — below any gram size, still index-pruned
        two = lake.search(sfx, "text", "ba").count()
        print(f"suffix search 'ba' (2 chars, sub-gram needle): {two} rows")
        # batched: one index scan for three needles
        many = lake.search_many(sfx, "text", ["merge sort", "ba", "zzz-no"])
        per_q = {
            q: many.filter(F.col("__query__") == q).count()
            for q in ["merge sort", "ba", "zzz-no"]
        }
        assert per_q["zzz-no"] == 0
        print(f"suffix search_many (1 probe scan, 3 needles): {per_q}")

        # -- BM25 with a WordPiece tokenizer ------------------------------
        vocab = [
            "[UNK]", "merge", "sort", "##ing", "hash", "join", "window",
            "spark", "table", "batch", "part", "##s", "key", "value",
            "row", "scan", "fast", "slow", "agg", "the", "a", "line",
        ]
        wp = WordPieceTokenizer(vocab)
        print(
            "wordpiece('merge sorting parts') ->",
            wp.tokenize("merge sorting parts"),
        )
        bm = BM25Index(tokenizer=wp)
        lake.build_index(bm, "text")
        top = bm25_topk(lake, bm, "text", "merge sort parts", 5, "doc_id")
        print(
            "bm25+wordpiece top-5:",
            [(r["doc_id"], r["score"]) for r in top.collect()][:3],
            "... (tokenizer ident in catalog:",
            wp.ident + ")",
        )
        try:  # probing with the default regex tokenizer must fail loudly
            bm25_topk(lake, BM25Index(), "text", "merge", 5, "doc_id")
            raise AssertionError("config guard did not fire")
        except ValueError:
            print("tokenizer config guard: regex probe on wordpiece index rejected")

        # -- Vamana graph ANN ---------------------------------------------
        emb_dir = os.path.join(work, "emb")
        (
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .repartition(4)
            .write.parquet(emb_dir)
        )
        elake = ParquetLake(spark, emb_dir, os.path.join(work, "emb_idx"))
        vam = VamanaIndex(rows_per_cluster=128, nprobes=4, refine=64)
        elake.build_index(vam, "embedding")
        q = [
            float(x)
            for x in spark.read.parquet(emb_dir)
            .filter(F.col("vec_id") == 3)
            .collect()[0]["embedding"]
        ]
        knn = knn_topk(elake, vam, "embedding", q, 10, "vec_id").collect()
        exact = knn_topk(
            elake, vam, "embedding", q, 10, "vec_id", exact=True
        ).collect()
        recall = len(
            {r["vec_id"] for r in knn} & {r["vec_id"] for r in exact}
        ) / 10
        print(
            f"vamana knn: top-10 via per-shard graph beam search, "
            f"recall@10 vs exact = {recall}"
        )

        # -- TPC-H complete (Q2 correlated-min, Q21 waiting suppliers) ----
        from rottnest_spark import entrypoints as ep

        q2 = ep.QUERIES["tpch_q2"](spark, SF_DIR)
        q21 = ep.QUERIES["tpch_q21"](spark, SF_DIR)
        print(
            f"tpch complete (22/22 shapes): q2 -> {q2.count()} min-cost "
            f"suppliers, q21 -> {q21.count()} waiting suppliers"
        )
        print("TOUR OK")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
