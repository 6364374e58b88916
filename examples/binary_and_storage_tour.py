"""Runnable tour of the round-4 surface:

    binary payload indexing (exact point / prefix / byte-subsequence)
    → storage-abstraction routing (RecordingFS observing a compaction
      commit + vacuum)
    → early-stop in-situ scan (k-bounded search over an unindexed tail)
    → embedder swap (RAG retrieval with a custom encoder pair)

Usage: python examples/binary_and_storage_tour.py
Writes everything under a temp dir; prints one line per capability.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from rottnest_spark import ParquetLake, get_spark  # noqa: E402
from rottnest_spark.core.fs import RecordingFS  # noqa: E402
from rottnest_spark.indices.bloom import BloomIndex  # noqa: E402
from rottnest_spark.indices.exact import ExactIndex, PrefixSearch  # noqa: E402
from rottnest_spark.indices.substring import SubstringIndex  # noqa: E402


def main() -> None:
    spark = get_spark("binary-storage-tour", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bin_tour_")
    try:
        # -- binary payloads: md5-digest keys + opaque byte bodies --------
        rows = [
            (
                i,
                bytearray(hashlib.md5(str(i).encode()).digest()),
                bytearray(f"record {i} payload".encode()),
            )
            for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "k bigint, bkey binary, body binary")
        data = os.path.join(work, "lake")
        df.repartition(4).write.parquet(data)

        fs = RecordingFS()
        lake = ParquetLake(spark, data, os.path.join(work, "idx"), fs=fs)

        idx = ExactIndex()
        lake.build_index(idx, "bkey")
        probe = hashlib.md5(b"1234").digest()
        got = [r["k"] for r in lake.search(idx, "bkey", probe).collect()]
        print(f"binary exact match: md5(b'1234') -> k={got}")

        pre = sorted(
            r["k"] for r in lake.search(PrefixSearch(), "bkey", probe[:2]).collect()
        )
        print(f"binary prefix (2 bytes): {len(pre)} keys share prefix {probe[:2].hex()}")

        bloom = BloomIndex(m_bits=1 << 16)
        lake.build_index(bloom, "bkey")
        absent = hashlib.md5(b"no-such-key").digest()
        print(
            "binary bloom: absent digest pruned to "
            f"{lake.search(bloom, 'bkey', absent).count()} rows (absence proof)"
        )

        sub = SubstringIndex()
        lake.build_index(sub, "body")
        needle = b"record 77 "
        hits = [r["k"] for r in lake.search(sub, "body", needle).collect()]
        print(f"binary substring: {needle!r} found in rows {hits}")

        # -- storage abstraction: watch a commit + vacuum through the FS --
        fs.calls.clear()
        new_files = lake.compact_files(target_rows=10**9)
        renames = len(fs.ops("rename"))
        manifests = sum(1 for c in fs.ops("write_text") if "_compactions" in c[1])
        print(
            f"compaction commit via LakeFS: {manifests} manifest write, "
            f"{renames} renames -> {len(new_files)} files"
        )
        fs.calls.clear()
        removed = lake.vacuum()
        print(
            f"vacuum via LakeFS: {len(removed)} stale entries reclaimed "
            f"({len(fs.ops('rmtree'))} rmtree calls recorded)"
        )

        # -- early-stop in-situ scan: k-bounded over an unindexed tail ----
        tail_dir = os.path.join(work, "tail")
        df.repartition(6).write.parquet(tail_dir)
        tail = ParquetLake(spark, tail_dir, os.path.join(work, "idx2"))
        tail.insitu_batch_files = 1
        probe_idx = ExactIndex()  # never built: everything is in-situ
        some = tail.search(probe_idx, "k", (100, 1900), k=5).collect()
        print(
            f"early-stop scan: {len(some)} rows from "
            f"{len(tail._insitu_files_scanned)}/{len(tail.files)} file opens"
        )

        # -- embedder swap: RAG retrieval with a custom encoder pair ------
        from rottnest_spark.ops.rag import rag_retrieve

        docs = spark.createDataFrame(
            [(i, f"document {i} about topic {i % 9} and spark joins") for i in range(200)],
            "doc_id bigint, text string",
        )

        def my_embed_py(t):
            return [
                (int(hashlib.sha256(f"enc:{j}:{t}".encode()).hexdigest()[:8], 16)
                 % 1009) / 1009.0
                for j in range(16)
            ]

        def my_embed_col(c, j):
            h = F.sha2(F.concat(F.lit(f"enc:{j}:"), c), 256)
            return (
                F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 1009
            ) / 1009.0

        top = rag_retrieve(
            docs, "doc_id", "text", "spark joins topic 4", k=3,
            embed_col_fn=my_embed_col, embed_py_fn=my_embed_py,
        ).collect()
        print(
            "RAG with swapped embedder: top-3 "
            f"{[(r['doc_id'], r['score']) for r in top]}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
