"""Physical-plan regression tests: the properties docs/PLANS.md documents
must stay true — probe filters push to the index scan, refine prunes
columns, top-K compiles to TakeOrderedAndProject."""

import pytest
from pyspark.sql import functions as F

from rottnest_spark import ParquetLake
from rottnest_spark.indices.substring import SubstringIndex


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("plans")
    lake_dir = str(out / "lake")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(3)
        .write.parquet(lake_dir)
    )
    lake = ParquetLake(spark, lake_dir, str(out / "idx"))
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    return lake, idx


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_scan_info(df) -> str:
    # formatted explain includes the scan's PushedFilters/ReadSchema
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_probe_pushes_gram_filter_to_scan(spark, built):
    lake, idx = built
    entry = lake.catalog.entries_for("substring", "text")[0]
    # escape disabled: this test inspects the postings-probe plan itself
    probe = SubstringIndex(unselective_frac=None).search(
        spark, [entry["index_path"]], "merge sort"
    )
    plan = _optimized_scan_info(probe)
    assert "PushedFilters: [In(gram" in plan
    # only the three index columns are read
    assert "ReadSchema: struct<gram:string,file_path:string,row_group:int>" in plan


def test_refine_prunes_columns(spark, built):
    lake, idx = built
    res = lake.search(idx, "text", "merge sort", columns=["doc_id"])
    plan = _optimized_scan_info(res)
    # the candidate scan reads only doc_id + the refine column, not lang etc.
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "lang" not in plan.split("ReadSchema")[1][:200]


def test_topk_is_take_ordered(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy(F.desc("n_chars"))
        .limit(5)
    )
    assert "TakeOrderedAndProject" in _executed_plan(df)


def test_bounded_collect_never_materializes_oversized_list(spark):
    """An unselective candidate set (way over threshold) must be detected
    from a LIMIT — not by evaluating/collecting the whole set. Observed via
    an accumulator counting evaluated candidate rows."""
    from rottnest_spark.core.refine import collect_candidates_bounded

    acc = spark.sparkContext.accumulator(0)

    @F.udf("int")
    def counted(x):
        acc.add(1)
        return x

    n = 200_000
    files = {f"/covered/f{i}" for i in range(50)}
    cands = (
        spark.range(n)
        .repartition(16)
        .select(
            F.concat(
                F.lit("/covered/f"), (F.col("id") % 50).cast("string")
            ).alias("file_path"),
            counted((F.col("id") % 1000).cast("int")).alias("row_group"),
        )
    )
    out = collect_candidates_bounded(cands, files, files, threshold=100)
    assert out is None  # over threshold → caller falls back to full scan
    # incremental limit execution touches at most a few partitions, never
    # the whole candidate set
    assert acc.value < n // 2, acc.value


def test_decontam_broadcasts_eval_grams(spark, sf_dir):
    """The eval-gram side of decontamination must be a broadcast semi join:
    at corpus scale the training side is never shuffled for it."""
    from rottnest_spark.ops.decontam import ngram_overlap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_overlap(
        docs.filter("doc_id % 50 != 0"),
        docs.filter("doc_id % 50 = 0"),
        "doc_id",
        "text",
        n=5,
    )
    plan = _executed_plan(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_describe_indices_reports_sizes(spark, sf_dir, tmp_path):
    """describe_indices: one row per entry, real byte sizes, no Spark jobs
    (callable on a hot lake)."""
    from rottnest_spark import ParquetLake
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.indices.bloom import BloomIndex

    out = str(tmp_path / "lake")
    spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(3).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    lake.build_index(ExactIndex(), "o_orderkey")
    lake.build_index(BloomIndex(), "o_orderkey")
    rep = lake.describe_indices()
    assert len(rep) == 2
    types = {r["index_type"] for r in rep}
    assert types == {"exact", "bloom"}
    for r in rep:
        assert r["n_files"] == 3
        assert r["index_bytes"] > 0 and r["data_bytes"] > 0
        assert r["size_ratio"] is not None
        assert r["column"] == "o_orderkey"


def test_maintenance_report(spark, sf_dir, tmp_path):
    """maintenance_report: unindexed counts, mergeable groups, stale
    entries, and small-file candidates — catalog + footers only."""
    import os

    import pyspark.sql.functions as F

    from rottnest_spark import ParquetLake
    from rottnest_spark.indices.exact import ExactIndex

    out = str(tmp_path / "lake")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(4).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = ExactIndex()
    lake.build_index(idx, "o_orderkey", binpack_row_threshold=1)
    rep = lake.maintenance_report()
    assert rep["n_files"] == 4
    assert rep["unindexed"]["exact:o_orderkey"] == 0
    assert rep["mergeable_entries"]["exact:o_orderkey"]  # tiny entries merge
    assert rep["stale_entries"] == []

    # append an unindexed file + delete one indexed file -> both reported
    victim = lake.files[0]  # an ORIGINAL (indexed) file
    orders.limit(10).coalesce(1).write.mode("append").parquet(out)
    os.remove(victim)
    lake2 = ParquetLake(spark, out, str(tmp_path / "idx"))
    rep2 = lake2.maintenance_report()
    assert rep2["unindexed"]["exact:o_orderkey"] >= 1
    assert rep2["stale_entries"]
    assert rep2["small_files"]  # the 10-row file is under half-median
