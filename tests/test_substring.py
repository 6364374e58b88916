"""Substring index: the SURVEY §0 invariant — index-accelerated search ≡
brute-force full scan — plus lifecycle properties (reference test/parquet_test.py:13-52)."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices import BRUTE_FORCE, SubstringIndex


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def oracle_ids(spark, lake_dir, q):
    df = spark.read.parquet(lake_dir)
    return _ids(df.filter(F.contains(F.lower("text"), F.lit(q.lower()))))


def test_search_equals_full_scan(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    created = lake.build_index(idx, "text")
    assert created
    for q in ["merge sort", "window window", "zzz-not-there", "SPARK"]:
        got = _ids(lake.search(idx, "text", q))
        assert got == oracle_ids(spark, docs_lake_dir, q), q


def test_k_limit(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    full = oracle_ids(spark, docs_lake_dir, "spark")
    got = lake.search(idx, "text", "spark", k=10)
    rows = got.collect()
    assert len(rows) == min(10, len(full))
    assert set(r["doc_id"] for r in rows) <= set(full)


def test_short_query_goes_brute_force(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    assert idx.search(spark, [], "ab") is BRUTE_FORCE
    assert _ids(lake.search(idx, "text", "ab")) == oracle_ids(
        spark, docs_lake_dir, "ab"
    )


def test_index_prunes_files(spark, docs_lake_dir, tmp_path):
    """A no-hit query must prune to zero candidate files."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    entry = lake.catalog.entries()[0]
    cands = idx.search(spark, [entry["index_path"]], "qqqxyzzy")
    assert cands.count() == 0


def test_unindexed_files_scanned_in_situ(spark, docs_lake_dir, tmp_path, sf_dir):
    """Searching a lake with zero indexes still gives exact results."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    got = _ids(lake.search(idx, "text", "merge sort"))
    assert got == oracle_ids(spark, docs_lake_dir, "merge sort")


def test_incremental_build_and_invariant(spark, docs_lake_dir, tmp_path, sf_dir):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    first = lake.build_index(idx, "text")
    assert lake.build_index(idx, "text") == []  # idempotent
    # append new files to the lake → only they get indexed
    extra = str(tmp_path / "docs_lake" / "extra")
    spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    ).coalesce(1).write.parquet(extra)
    import glob
    import shutil

    for f in glob.glob(extra + "/*.parquet"):
        shutil.move(f, docs_lake_dir + "/extra_" + f.split("/")[-1])
    shutil.rmtree(extra)
    second = lake.build_index(idx, "text")
    assert second and set(second) != set(first)
    lake.catalog.validate()
    got = _ids(lake.search(idx, "text", "merge sort"))
    assert got == oracle_ids(spark, docs_lake_dir, "merge sort")


def test_compaction_preserves_search(spark, docs_lake_dir, tmp_path):
    """search(after compact) ≡ search(before) — reference test.py:48-49."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    # tiny binpack threshold → one index per file → mergeable
    lake.build_index(idx, "text", binpack_row_threshold=1)
    assert len(lake.catalog.entries()) > 1
    before = _ids(lake.search(idx, "text", "merge sort"))
    created = lake.compact_indices(idx, "text", row_threshold=10_000_000)
    assert created
    assert len(lake.catalog.entries_for("substring", "text")) == 1
    after = _ids(lake.search(idx, "text", "merge sort"))
    assert after == before
    lake.catalog.validate()


def test_compaction_never_merges_mixed_configs(spark, sf_dir, tmp_path):
    """Entries built under different configs must not be merged: the merged
    entry would claim one config while containing data built under another,
    silently under-matching probes."""
    import glob
    import shutil

    lake_dir = str(tmp_path / "lake")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(lake_dir)
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    lake.build_index(SubstringIndex(gram=3), "text")
    # new files arrive; they get indexed under a DIFFERENT config
    extra = str(tmp_path / "extra")
    docs.filter("doc_id % 2 = 1").repartition(2).write.parquet(extra)
    for i, f in enumerate(glob.glob(extra + "/*.parquet")):
        shutil.move(f, f"{lake_dir}/extra_{i}.parquet")
    idx4 = SubstringIndex(gram=4)
    lake.build_index(idx4, "text", binpack_row_threshold=1)
    cfgs = [e["config"] for e in lake.catalog.entries_for("substring", "text")]
    assert len(set(cfgs)) == 2 and len(cfgs) == 3
    lake.compact_indices(idx4, "text", row_threshold=10_000_000)
    after = lake.catalog.entries_for("substring", "text")
    # only the two gram=4 entries merged; the gram=3 entry is untouched
    assert len(after) == 2
    assert sorted(e["config"] for e in after) == sorted(set(cfgs))


def test_vacuum_removes_orphans(spark, docs_lake_dir, tmp_path):
    import os

    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    orphan = str(tmp_path / "idx" / "orphan_dir")
    os.makedirs(orphan)
    removed = lake.vacuum()
    assert "orphan_dir" in removed
    assert not os.path.exists(orphan)
    # live index untouched
    assert lake.catalog.entries()


def test_config_mismatch_raises(spark, docs_lake_dir, tmp_path):
    """Probing with different parameters than the build must fail loudly,
    never silently under-match (reference tokenizer assert analog)."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    lake.build_index(SubstringIndex(gram=3), "text")
    with pytest.raises(ValueError, match="config"):
        lake.search(SubstringIndex(gram=4), "text", "merge sort").collect()


def test_vacuum_after_data_deletion_search_stays_exact(spark, sf_dir, tmp_path):
    """Lake shrinks (files deleted) -> vacuum drops dead entries -> search
    over the survivors still equals the full-scan oracle."""
    import glob
    import os

    lake_dir = str(tmp_path / "lake")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(4)
        .write.parquet(lake_dir)
    )
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text", binpack_row_threshold=1)  # entry per file
    n_entries = len(lake.catalog.entries_for("substring", "text"))
    assert n_entries == 4

    for f in sorted(glob.glob(lake_dir + "/*.parquet"))[:2]:
        os.remove(f)
    removed = lake.vacuum()
    assert len(removed) >= 2
    assert len(lake.catalog.entries_for("substring", "text")) == 2

    q = "merge sort"
    got = _ids(lake.search(idx, "text", q))
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(lake_dir)
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .select("doc_id")
        .collect()
    )
    assert got == want


def test_search_with_stale_entries_before_vacuum(spark, sf_dir, tmp_path):
    """Files deleted from the lake but still referenced by index entries
    (pre-vacuum window): candidates for dead files must be filtered by the
    liveness semi-join, never fetched, and results must equal a full scan
    of the survivors."""
    import glob
    import os

    lake_dir = str(tmp_path / "lake")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(4)
        .write.parquet(lake_dir)
    )
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex(unselective_frac=None)  # force the probe path
    lake.build_index(idx, "text")
    for f in sorted(glob.glob(lake_dir + "/*.parquet"))[:2]:
        os.remove(f)
    # NO vacuum: catalog entries still list the dead files
    q = "merge sort"
    got = _ids(lake.search(idx, "text", q))
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(lake_dir)
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .select("doc_id")
        .collect()
    )
    assert got == want and len(got) > 0


def test_brute_force_threshold_falls_back_exactly(spark, docs_lake_dir, tmp_path):
    """An unselective index (candidates > threshold) must fall back to the
    full scan and still return exact results (utils.py:224-225 analog)."""
    lake = ParquetLake(
        spark, docs_lake_dir, str(tmp_path / "idx"), brute_force_threshold=0
    )
    # unselective_frac=None: disable the index's own BRUTE_FORCE escape so
    # this test exercises the lake-level threshold decision specifically
    idx = SubstringIndex(unselective_frac=None)
    lake.build_index(idx, "text")
    q = "merge sort"
    got = _ids(lake.search(idx, "text", q))
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(docs_lake_dir)
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .select("doc_id")
        .collect()
    )
    assert got == want and len(got) > 0
    info = lake.explain_search(idx, "text", q)
    assert info["decision"] == "brute_force_threshold"


def test_unselective_escape_and_df_ranking(spark, docs_lake_dir, tmp_path):
    """Dense query (every gram in every unit) → the index declares
    BRUTE_FORCE instead of probing; search stays exact via the scan path.
    Rarest-gram ranking: probe grams must be the lowest-df grams."""
    from rottnest_spark.indices.base import BRUTE_FORCE as BF

    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    entries = lake.catalog.entries_for("substring", "text")
    paths = [e["index_path"] for e in entries]
    # "sort" appears in essentially every doc of the word-salad fixture →
    # every gram of it is in every unit → provably unprunable
    assert idx.search(spark, paths, "sort sort") is BF
    got = _ids(lake.search(idx, "text", "sort"))
    assert got == oracle_ids(spark, docs_lake_dir, "sort")
    # unit-meta sidecar exists and counts the indexed units
    import json
    import os

    n = sum(
        json.load(open(os.path.join(p, "_unit_meta.json")))["n_units"]
        for p in paths
    )
    assert n >= 1


def test_absent_gram_short_circuits_to_empty(spark, docs_lake_dir, tmp_path):
    """A query containing a gram absent from the index must return an empty
    candidate set WITHOUT a postings probe (absence proof)."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    paths = [
        e["index_path"] for e in lake.catalog.entries_for("substring", "text")
    ]
    cands = idx.search(spark, paths, "sort q9z sort")
    assert cands is not None and cands.count() == 0
    assert _ids(lake.search(idx, "text", "sort q9z sort")) == []


def test_search_many_equals_per_query(spark, sf_dir, tmp_path):
    """Batched search ≡ per-query search for every query class: normal
    hits, provable-empty (absent gram), too-short (BRUTE_FORCE), and
    no-hit-but-present grams."""
    out = str(tmp_path / "lake_many")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(4)
        .write.parquet(out)
    )
    lake = ParquetLake(spark, out, out + "_idx")
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    queries = ["merge sort", "zzqqxx-not-there", "ab", "hash join"]
    batched = lake.search_many(idx, "text", queries)
    got = {
        q: sorted(
            r["doc_id"]
            for r in batched.filter(F.col("__query__") == q).collect()
        )
        for q in queries
    }
    for q in queries:
        want = sorted(
            r["doc_id"] for r in lake.search(idx, "text", q).collect()
        )
        assert got[q] == want, q
    assert got["zzqqxx-not-there"] == []
    assert len(got["merge sort"]) > 0


def test_vacuum_age_guard_spares_inflight_build_dirs(spark, docs_lake_dir, tmp_path):
    """A fresh unreferenced dir (an in-flight build) survives an aged
    vacuum; an immediate vacuum (age 0, the default) reclaims it."""
    import os

    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    inflight = os.path.join(str(tmp_path / "idx"), "substring_inflight_tmp")
    os.makedirs(inflight)
    removed = lake.vacuum(orphan_min_age_sec=3600)
    assert removed == [] and os.path.isdir(inflight)
    removed = lake.vacuum()
    assert "substring_inflight_tmp" in removed and not os.path.isdir(inflight)
    # the committed index is untouched either way
    assert lake.search(idx, "text", "merge sort").count() > 0


def test_search_many_k_and_columns(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lake_many_k")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(3)
        .write.parquet(out)
    )
    lake = ParquetLake(spark, out, out + "_idx")
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    res = lake.search_many(
        idx, "text", ["merge sort", "hash join"], k=3, columns=["doc_id"]
    )
    assert set(res.columns) == {"doc_id", "__query__"}
    per_q = {
        q: res.filter(F.col("__query__") == q).count()
        for q in ["merge sort", "hash join"]
    }
    assert all(0 < n <= 3 for n in per_q.values())
    # k rows must be actual hits (subset of the unlimited result)
    full = {
        r["doc_id"]
        for r in lake.search(idx, "text", "merge sort").collect()
    }
    got = {
        r["doc_id"]
        for r in res.filter(F.col("__query__") == "merge sort").collect()
    }
    assert got <= full


def test_salt_write_auto_decision_and_equivalence(spark, tmp_path):
    """Round-6 cost knob: salt_write='auto' measures postings skew on a
    bounded sample and salts only degenerate corpora. Decisions: diverse
    text → unsalted; run-degenerate text → salted. Search results are
    identical under every layout (physical knob only)."""
    from rottnest_spark.core.layout import WHOLE_FILE
    from rottnest_spark.indices.substring import provenance_file_col

    idx = SubstringIndex()

    def norm_rows(df, col):
        return df.select(
            F.lit("f").alias("file_path"),
            F.lit(WHOLE_FILE).alias("row_group"),
            idx._norm_col(F.col(col)).alias("__norm__"),
        )

    diverse = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over row {i*7}") for i in range(400)],
        "id int, t string",
    )
    degenerate = spark.createDataFrame(
        [(i, "a" * 300) for i in range(400)], "id int, t string"
    )
    assert not idx._gram_skew_needs_salt(norm_rows(diverse, "t"), 3, 1)
    assert idx._gram_skew_needs_salt(norm_rows(degenerate, "t"), 3, 1)

    # equivalence: auto / forced-salt / forced-plain builds answer alike
    data = str(tmp_path / "d")
    diverse.union(
        spark.createDataFrame(
            [(1000 + i, "zzz needle zzz") for i in range(3)], "id int, t string"
        )
    ).repartition(3).write.parquet(data)
    results = {}
    for salt in ("auto", True, False):
        lake = ParquetLake(
            spark, data, str(tmp_path / f"i{salt}"), brute_force_threshold=1
        )
        sidx = SubstringIndex(salt_write=salt)
        lake.build_index(sidx, "t")
        results[salt] = sorted(
            r["id"] for r in lake.search(sidx, "t", "needle").collect()
        )
    assert results["auto"] == results[True] == results[False]
    assert len(results["auto"]) == 3
