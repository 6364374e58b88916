"""Edge cases on the round-4b surfaces — unicode through the suffix
index, CJK/emoji through wordpiece, optimize idempotence, and writable-
lake guard rails. Test-only hardening; no product changes."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices import SubstringIndex, SuffixArrayIndex
from rottnest_spark.indices.tokenizers import WordPieceTokenizer


def test_suffix_unicode_needles(spark, tmp_path):
    """Multi-byte text: needles with accents, CJK, and emoji prune and
    refine exactly (Spark substring()/startswith are character-based)."""
    rows = [
        (0, "café au lait"),
        (1, "CAFÉ NOIR"),
        (2, "日本語のテキスト検索"),
        (3, "emoji 🚀 rocket test"),
        (4, "plain ascii text"),
    ]
    data = str(tmp_path / "d")
    spark.createDataFrame(rows, "doc_id int, text string").repartition(
        2
    ).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    idx = SuffixArrayIndex(prefix_len=6)
    lake.build_index(idx, "text")
    df = spark.read.parquet(data)
    for q in ["café", "日本語", "🚀", "テキスト検索", "zzz"]:
        got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
        want = sorted(
            r["doc_id"]
            for r in df.filter(
                F.contains(F.lower("text"), F.lit(q.lower()))
            ).collect()
        )
        assert got == want, q
    # case-insensitive unicode: 'café' matches the uppercase row too
    got = {r["doc_id"] for r in lake.search(idx, "text", "café").collect()}
    assert got == {0, 1}


def test_wordpiece_cjk_and_emoji():
    """CJK/emoji are letter-category chars (not punctuation): they stay
    inside words and fall to [UNK] unless the vocab carries pieces."""
    tok = WordPieceTokenizer(["[UNK]", "日", "##本", "rocket", "🚀"])
    assert tok.tokenize("日本") == ["日", "##本"]
    assert tok.tokenize("rocket 🚀") == ["rocket", "🚀"]
    assert tok.tokenize("日本語") == ["[UNK]"]  # no ##語 piece
    # idempotent on empty/whitespace
    assert tok.tokenize("") == [] and tok.tokenize("   ") == []


def test_optimize_is_idempotent(spark, sf_dir, tmp_path):
    """A second optimize() right after the first is a no-op: nothing to
    compact, nothing to rebuild, search unchanged."""
    data = str(tmp_path / "lake")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(5).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    lake.optimize(target_rows=10_000)
    before = sorted(
        r["doc_id"] for r in lake.search(idx, "text", "merge sort").collect()
    )
    rep2 = lake.optimize(target_rows=10_000)
    assert rep2["data_files_compacted"] == []
    assert rep2["indices_refreshed"]["built"] == {}
    assert rep2["indices_compacted"] == {}
    after = sorted(
        r["doc_id"] for r in lake.search(idx, "text", "merge sort").collect()
    )
    assert after == before


def test_writable_lake_append_then_optimize_roundtrip(spark, sf_dir, tmp_path):
    """Churn sequence on a Delta-backed lake: append → optimize →
    delete → optimize; the snapshot search equals the oracle at every
    step and the physical retired files never resurface."""
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.sources.delta import delta_live_files
    from rottnest_spark.sources.delta_write import delta_write
    from rottnest_spark.sources.writable import DeltaWritableLake

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = str(tmp_path / "dt")
    delta_write(docs.filter("doc_id < 250").repartition(4), table)
    lake = DeltaWritableLake(spark, table, str(tmp_path / "idx"))
    sidx = SubstringIndex()
    lake.build_index(sidx, "text")
    lake.append(docs.filter("doc_id >= 250"))
    lake.optimize(target_rows=10_000)
    q = "merge sort"
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(q))).collect()
    )
    got = sorted(r["doc_id"] for r in lake.search(sidx, "text", q).collect())
    assert got == want
    eidx = ExactIndex()
    lake.build_index(eidx, "doc_id")
    victim = want[0]
    lake.delete_matching(eidx, "doc_id", victim)
    lake.optimize(target_rows=10_000)
    final = sorted(r["doc_id"] for r in lake.search(sidx, "text", q).collect())
    assert final == [d for d in want if d != victim]
    # post-churn live snapshot holds exactly the surviving rows
    n = spark.read.parquet(*delta_live_files(table)).count()
    assert n == docs.count() - 1
