"""Aggregate analytics operators: rollup levels, binned range-join
semantics (boundaries, overlap, bin misalignment), n-gram top-k tiebreak,
exact-vs-sketch KPI agreement, duplicate-span detection."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.ops.analytics import (
    frequent_ngrams,
    group_kpis,
    group_kpis_approx,
    range_join_binned,
    time_rollup,
)
from rottnest_spark.ops.dedup import duplicate_spans


def test_time_rollup_levels(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", "a", 1.0),
            ("2024-01-01 11:00:00", "a", 2.0),
            ("2024-01-01 12:00:00", "b", 4.0),
            ("2024-01-02 09:00:00", "a", 8.0),
        ],
        "ts string, k string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_rollup(df, "ts", "k", "v").collect()
    by_lvl = {}
    for r in out:
        by_lvl.setdefault(r["lvl"], []).append(r)
    # grand total: lvl 3, all columns rolled up
    (total,) = by_lvl[3]
    assert total["bucket"] is None and total["key"] is None
    assert total["n_rows"] == 4 and total["total_value"] == 15.0
    # daily subtotals: lvl 1
    daily = {str(r["bucket"]): r["total_value"] for r in by_lvl[1]}
    assert daily == {"2024-01-01 00:00:00": 7.0, "2024-01-02 00:00:00": 8.0}
    # leaves: lvl 0, one per (day, key)
    assert len(by_lvl[0]) == 3


@pytest.fixture(scope="module")
def bands(spark):
    return spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 100.0), ("wide", 5.0, 50.0)],
        "band string, lo double, hi double",
    )


def test_range_join_boundaries_and_overlap(spark, bands):
    fact = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 99.99), (5, 100.0), (6, 7.0)],
        "id long, v double",
    )
    out = range_join_binned(fact, bands, "v", "lo", "hi", 4.0)
    got = sorted((r["id"], r["band"]) for r in out.collect())
    # lo-inclusive, hi-exclusive; overlapping 'wide' matches ids 6 (7.0),
    # 2 (9.99), 3 (10.0 in [5,50)), and 100.0 matches nothing.
    assert got == [
        (1, "lo"), (2, "lo"), (2, "wide"), (3, "hi"), (3, "wide"),
        (4, "hi"), (6, "lo"), (6, "wide"),
    ]


def test_range_join_bin_misalignment(spark, bands):
    # bin width much larger than every interval: all dims collapse into a
    # couple of bins; the residual filter must still give exact semantics.
    fact = spark.createDataFrame([(1, 3.0), (2, 55.0)], "id long, v double")
    out = range_join_binned(fact, bands, "v", "lo", "hi", 1000.0)
    got = sorted((r["id"], r["band"]) for r in out.collect())
    assert got == [(1, "lo"), (2, "hi")]


def test_frequent_ngrams_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("x y z x y z",), ("x y z q",), ("a b c",), ("too short",)],
        "text string",
    )
    out = frequent_ngrams(df, "text", n=3, k=3).collect()
    assert [(r["gram"], r["n_occ"]) for r in out] == [
        ("x y z", 3),          # 2 in doc1 + 1 in doc2
        ("a b c", 1),          # count-1 ties resolve alphabetically
        ("y z q", 1),
    ]


def test_group_kpis_exact_and_sketch_agree(spark):
    rows = [("g", i, float(i)) for i in range(1, 101)] + [
        ("h", 1, 5.0), ("h", 1, 15.0)
    ]
    df = spark.createDataFrame(rows, "k string, u long, v double")
    exact = {r["key"]: r for r in group_kpis(df, "k", "u", "v").collect()}
    approx = {
        r["key"]: r for r in group_kpis_approx(df, "k", "u", "v").collect()
    }
    assert exact["g"]["n_users"] == 100 and exact["h"]["n_users"] == 1
    # continuous interpolation: p50 of 1..100 is 50.5
    assert exact["g"]["p50"] == 50.5
    assert exact["h"]["p50"] == 10.0
    for k in ("g", "h"):
        assert abs(approx[k]["n_users"] - exact[k]["n_users"]) <= 3
        assert approx[k]["total_value"] == exact[k]["total_value"]
        # percentile_approx returns an observed value near the exact rank
        assert abs(approx[k]["p50"] - exact[k]["p50"]) <= 5.0


def test_duplicate_spans(spark):
    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            (1, f"intro {shared} outro"),
            (2, f"header {shared} footer"),
            (3, "completely different text with no overlap at all here"),
            (4, f"{shared} {shared}"),  # repeats internally too
        ],
        "doc_id long, text string",
    )
    out = duplicate_spans(df, "doc_id", "text", window=8).collect()
    hits = {r["span_hash"]: r for r in out}
    assert all(r["n_docs"] >= 2 for r in out)
    # the shared 8-token span itself appears in docs 1, 2, 4 (4 has it twice
    # at positions 1 and 9, plus rolling overlaps)
    core = [r for r in out if r["n_docs"] == 3]
    assert core and min(r["first_doc"] for r in core) == 1
    assert max(r["n_occ"] for r in core) >= 4
    # doc 3 shares nothing: no span may involve it as first_doc
    assert all(r["first_doc"] != 3 for r in out)


def test_duplicate_spans_short_docs_vanish(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    assert duplicate_spans(df, "doc_id", "text", window=8).count() == 0
