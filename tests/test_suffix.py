"""Suffix-array substring index (T5): SURVEY §0 invariant — index search ≡
brute-force scan — plus the properties the sorted-suffix design uniquely
claims: short-needle pruning (below any gram size), positional exactness for
needles <= prefix_len, sound truncation for longer needles, binary payloads,
and compaction equivalence."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices import BRUTE_FORCE, SuffixArrayIndex


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def oracle_ids(spark, lake_dir, q):
    df = spark.read.parquet(lake_dir)
    return _ids(df.filter(F.contains(F.lower("text"), F.lit(q.lower()))))


def test_search_equals_full_scan(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SuffixArrayIndex()
    assert lake.build_index(idx, "text")
    for q in ["merge sort", "batch part", "zzz-not-there", "SPARK", "wind"]:
        assert _ids(lake.search(idx, "text", q)) == oracle_ids(
            spark, docs_lake_dir, q
        ), q


def test_short_needle_prunes(spark, docs_lake_dir, tmp_path):
    """The n-gram index cannot prune needles shorter than `gram`; the
    suffix table prunes from one char up — an absent char is a provable
    empty WITHOUT touching data files."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SuffixArrayIndex()
    lake.build_index(idx, "text")
    paths = [e["index_path"] for e in lake.catalog.entries_for("suffix", "text")]
    cands = idx.search(spark, paths, "x")  # 'x' absent from the word salad
    assert cands is not BRUTE_FORCE and cands.count() == 0
    assert _ids(lake.search(idx, "text", "x")) == oracle_ids(
        spark, docs_lake_dir, "x"
    )
    # a present 2-char needle still returns exact results through the index
    assert _ids(lake.search(idx, "text", "ba")) == oracle_ids(
        spark, docs_lake_dir, "ba"
    )


def test_long_needle_probes_with_truncated_prefix(spark, docs_lake_dir, tmp_path):
    """Needle longer than prefix_len: the probe uses its prefix_len-prefix
    (sound — the match's suffix starts with it) and the refine restores
    full-needle exactness."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SuffixArrayIndex(prefix_len=4)
    lake.build_index(idx, "text")
    q = "merge sort"
    assert len(q) > idx.prefix_len
    assert idx._probe_prefix(q) == "merg"
    assert _ids(lake.search(idx, "text", q)) == oracle_ids(
        spark, docs_lake_dir, q
    )


def test_positional_exactness_vs_gram_intersection(spark, tmp_path):
    """A unit whose text contains every gram of the needle but never
    contiguously is NOT a suffix-index candidate for needles <= prefix_len —
    the gram-intersection design provably admits it (both indexes stay
    exact after refine; the suffix probe just reads fewer data files)."""
    from rottnest_spark.indices import SubstringIndex

    data = str(tmp_path / "d")
    # file A: all 3-grams of "abcdef" (abc, bcd, cde, def) present, needle
    # absent; file B: the needle itself. repartitionByRange splits by id.
    spark.createDataFrame(
        [(0, "xabc bcdx cdex defx"), (1, "abcdef zzz")],
        "doc_id int, text string",
    ).repartitionByRange(2, "doc_id").write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    idx = SuffixArrayIndex(unselective_frac=None)
    lake.build_index(idx, "text")
    paths = [e["index_path"] for e in lake.catalog.entries_for("suffix", "text")]
    assert idx.search(spark, paths, "abcdef").count() == 1  # file B only
    gram = SubstringIndex(unselective_frac=None)
    lake.build_index(gram, "text")
    gpaths = [
        e["index_path"] for e in lake.catalog.entries_for("substring", "text")
    ]
    assert gram.search(spark, gpaths, "abcdef").count() == 2  # both admitted
    assert _ids(lake.search(idx, "text", "abcdef")) == [1]
    assert _ids(lake.search(idx, "text", "abc")) == [0, 1]


def test_unselective_escape(spark, docs_lake_dir, tmp_path):
    """A needle whose prefix range covers every unit → BRUTE_FORCE escape;
    search stays exact via the scan path."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SuffixArrayIndex()
    lake.build_index(idx, "text")
    paths = [e["index_path"] for e in lake.catalog.entries_for("suffix", "text")]
    # "sort" appears in essentially every doc of the word-salad fixture
    assert idx.search(spark, paths, "sort") is BRUTE_FORCE
    assert _ids(lake.search(idx, "text", "sort")) == oracle_ids(
        spark, docs_lake_dir, "sort"
    )


def test_compaction_preserves_search(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SuffixArrayIndex()
    lake.build_index(idx, "text", binpack_row_threshold=1)
    assert len(lake.catalog.entries_for("suffix", "text")) > 1
    before = _ids(lake.search(idx, "text", "batch part"))
    assert lake.compact_indices(idx, "text", row_threshold=10_000_000)
    assert len(lake.catalog.entries_for("suffix", "text")) == 1
    assert _ids(lake.search(idx, "text", "batch part")) == before
    lake.catalog.validate()


def test_binary_payloads(spark, tmp_path):
    """BinaryType columns index as byte-aligned hex suffixes; a bytes
    needle probes the same way and the refine compares raw bytes."""
    import hashlib

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("payload"),
    )
    data = str(tmp_path / "d")
    df.repartition(4).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    idx = SuffixArrayIndex(prefix_len=8)
    lake.build_index(idx, "payload")
    needle = hashlib.md5(b"77").digest()[5:11]  # interior 6-byte slice
    got = sorted(r["doc_id"] for r in lake.search(idx, "payload", needle).collect())
    want = sorted(
        r["doc_id"]
        for r in df.filter(F.contains(F.col("payload"), F.lit(needle))).collect()
    )
    assert got == want and 77 in got
    absent = hashlib.md5(b"no-such-row").digest()[:6]
    assert lake.search(idx, "payload", absent).count() == len(
        [r for r in df.filter(F.contains("payload", F.lit(absent))).collect()]
    )


def test_search_many_equals_per_query(spark, docs_lake_dir, tmp_path):
    """Batched probe ≡ per-query probe for every class: hits, provable
    empty (absent char), unselective (BRUTE_FORCE escape)."""
    import pyspark.sql.functions as F

    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SuffixArrayIndex()
    lake.build_index(idx, "text")
    queries = ["merge sort", "x-not-there", "sort", "batch part"]
    batched = lake.search_many(idx, "text", queries)
    for q in queries:
        got = sorted(
            r["doc_id"]
            for r in batched.filter(F.col("__query__") == q).collect()
        )
        want = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
        assert got == want, q
    assert batched.filter(F.col("__query__") == "x-not-there").count() == 0
    assert batched.filter(F.col("__query__") == "merge sort").count() > 0


def test_config_mismatch_raises(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    lake.build_index(SuffixArrayIndex(prefix_len=16), "text")
    with pytest.raises(ValueError, match="config"):
        lake.search(SuffixArrayIndex(prefix_len=8), "text", "merge sort").collect()


def test_row_group_granularity(spark, sf_dir, tmp_path):
    """granularity='row_group' prunes WITHIN files; search stays exact."""
    data = str(tmp_path / "d")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .coalesce(1)
        .write.option("parquet.block.size", 16 * 1024)
        .parquet(data)
    )
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    idx = SuffixArrayIndex(granularity="row_group")
    lake.build_index(idx, "text")
    paths = [e["index_path"] for e in lake.catalog.entries_for("suffix", "text")]
    idx_df = spark.read.parquet(*paths)
    assert idx_df.select("row_group").distinct().count() > 1  # sub-file units
    q = "batch part"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    assert got == oracle_ids(spark, data, q)


def test_suffix_composes_in_disjunction(spark, docs_lake_dir, tmp_path):
    """OR-composition across index types: suffix containment OR exact
    doc_id lookup, one disjunctive search, exact vs the OR-oracle."""
    import pyspark.sql.functions as F

    from rottnest_spark.indices.exact import ExactIndex

    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    sfx = SuffixArrayIndex()
    ex = ExactIndex()
    lake.build_index(sfx, "text")
    lake.build_index(ex, "doc_id")
    got = sorted(
        r["doc_id"]
        for r in lake.search_disj(
            [(sfx, "text", "batch part"), (ex, "doc_id", 7)]
        ).collect()
    )
    df = spark.read.parquet(docs_lake_dir)
    want = sorted(
        r["doc_id"]
        for r in df.filter(
            F.contains(F.lower("text"), F.lit("batch part"))
            | (F.col("doc_id") == 7)
        ).collect()
    )
    assert got == want and 7 in got


def test_index_from_config_roundtrip(spark):
    from rottnest_spark.indices import index_from_config

    idx = SuffixArrayIndex(prefix_len=12, skip_chars=",.")
    back = index_from_config("suffix", idx.config())
    assert isinstance(back, SuffixArrayIndex)
    assert back.config() == idx.config()
