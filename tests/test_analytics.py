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


def test_funnel_strict_ordering(spark):
    from rottnest_spark.ops.analytics import funnel

    rows = [
        # u1 completes view -> click -> buy in order
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 12:00:00", "buy"),
        # u2 clicks BEFORE viewing: click must not count
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
        # u3 views only
        (3, "2024-01-01 08:00:00", "view"),
        # u4 view+click simultaneous: strict > excludes the click
        (4, "2024-01-01 07:00:00", "view"),
        (4, "2024-01-01 07:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["step"]: r for r in funnel(
        df, "user_id", "ts", "event_type", ["view", "click", "buy"]
    ).collect()}
    assert out["view"]["n_users"] == 4 and out["view"]["step_idx"] == 0
    assert out["click"]["n_users"] == 1  # only u1
    assert out["buy"]["n_users"] == 1


def test_cohort_retention_triangle(spark):
    from rottnest_spark.ops.analytics import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 23:00:00"),  # same day: one activity row
        (1, "2024-01-03 10:00:00"),
        (2, "2024-01-01 11:00:00"),
        (2, "2024-01-02 11:00:00"),
        (3, "2024-01-02 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_active"]
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert out == {
        ("2024-01-01 00:00:00", 0): 2,  # u1, u2
        ("2024-01-01 00:00:00", 1): 1,  # u2
        ("2024-01-01 00:00:00", 2): 1,  # u1
        ("2024-01-02 00:00:00", 0): 1,  # u3
    }


def test_grouped_top_n_matches_single_window(spark, sf_dir):
    from pyspark.sql.window import Window

    from rottnest_spark.ops.analytics import grouped_top_n

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        (F.col("o_orderkey") % 5).alias("g"), "o_orderkey", "o_totalprice"
    )
    ordering = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    got = sorted(
        (r["g"], r["rnk"], r["o_orderkey"])
        for r in grouped_top_n(df, ["g"], ordering, 4).collect()
    )
    w = Window.partitionBy("g").orderBy(*ordering)
    want = sorted(
        (r["g"], r["rnk"], r["o_orderkey"])
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 4)
        .collect()
    )
    assert got == want and len(got) == 20


def test_value_histogram_bins(spark):
    from rottnest_spark.ops.analytics import value_histogram

    df = spark.createDataFrame(
        [(0.0,), (9.99,), (10.0,), (25.0,), (-0.01,)], "v double"
    )
    out = {r["bin_lo"]: r for r in value_histogram(df, "v", 10.0).collect()}
    assert out[0.0]["n_rows"] == 2 and out[0.0]["max_value"] == 9.99
    assert out[10.0]["n_rows"] == 1
    assert out[20.0]["n_rows"] == 1
    assert out[-10.0]["n_rows"] == 1  # negatives floor downward


def test_time_gapfill_zero_rows(spark):
    from rottnest_spark.ops.analytics import time_gapfill

    rows = [
        ("2024-01-01 10:00:00", "a", 1.0),
        ("2024-01-01 10:30:00", "a", 2.0),
        # hour 11 missing entirely; 'b' only appears at 12
        ("2024-01-01 12:00:00", "b", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "ts string, k string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (str(r["bucket"]), r["key"]): (r["n_rows"], r["total_value"])
        for r in time_gapfill(df, "ts", "k", "v", grain="hour").collect()
    }
    # dense axis: 3 hours x 2 keys = 6 cells
    assert len(out) == 6
    assert out[("2024-01-01 10:00:00", "a")] == (2, 3.0)
    assert out[("2024-01-01 11:00:00", "a")] == (0, 0.0)
    assert out[("2024-01-01 11:00:00", "b")] == (0, 0.0)
    assert out[("2024-01-01 12:00:00", "b")] == (1, 4.0)
    assert out[("2024-01-01 10:00:00", "b")] == (0, 0.0)


def test_rolling_agg_window_and_anomaly(spark):
    from rottnest_spark.ops.analytics import rolling_agg

    # 9 days of flat value 10, one spike on day 8
    rows = [(f"2024-01-{d:02d} 09:00:00", 10.0) for d in range(1, 10)]
    rows[7] = ("2024-01-08 09:00:00", 1000.0)
    df = spark.createDataFrame(rows, "ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        str(r["bucket"]): r
        for r in rolling_agg(df, "ts", "v", trailing=3, z_thresh=1.1).collect()
    }
    assert len(out) == 9
    # trailing-3 frame: day1 = itself, day2 = 2 rows, day3+ = 3 rows
    assert out["2024-01-01 00:00:00"]["moving_sum"] == 10.0
    assert out["2024-01-02 00:00:00"]["moving_sum"] == 20.0
    assert out["2024-01-03 00:00:00"]["moving_sum"] == 30.0
    assert out["2024-01-03 00:00:00"]["moving_avg"] == 10.0
    assert out["2024-01-08 00:00:00"]["moving_sum"] == 1020.0
    # flat stretch: stddev 0 -> never anomalous; spike day flagged
    flags = {d: out[d]["is_anomaly"] for d in out}
    assert flags["2024-01-08 00:00:00"] == 1
    assert sum(flags.values()) == 1


def test_mmr_rerank_diversifies(spark, sf_dir):
    """MMR: deterministic, k items, and the picked set is more diverse
    (lower mean pairwise cosine) than the plain top-k."""
    import numpy as np
    import pyspark.sql.functions as F

    from rottnest_spark.ops.hybrid import mmr_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(60)
    # relevance = similarity to vec 0 (forces near-dup heavy top ranks)
    rows = emb.collect()
    q = np.array(rows[0]["embedding"], dtype=float)
    data = [
        (r["vec_id"], float(np.dot(r["embedding"], q)), r["embedding"])
        for r in rows
    ]
    cands = spark.createDataFrame(
        data, "vec_id long, score double, embedding array<float>"
    )
    k = 10
    picked = mmr_rerank(cands, "vec_id", "score", "embedding", k, lam=0.5)
    assert len(picked) == k
    assert picked == mmr_rerank(
        cands, "vec_id", "score", "embedding", k, lam=0.5
    )

    def mean_pairwise(ids):
        m = np.array(
            [r["embedding"] for r in rows if r["vec_id"] in set(ids)],
            dtype=float,
        )
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        s = m @ m.T
        iu = np.triu_indices(len(m), 1)
        return float(s[iu].mean())

    topk_ids = [d[0] for d in sorted(data, key=lambda d: (-d[1], d[0]))[:k]]
    mmr_ids = [p[0] for p in picked]
    assert mean_pairwise(mmr_ids) <= mean_pairwise(topk_ids) + 1e-9


def test_profile_table_exactness(spark, sf_dir):
    """profile_table: exact nulls/distincts/min/max per column in one pass."""
    from rottnest_spark.ops.analytics import profile_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prof = {r["column"]: r for r in profile_table(orders).collect()}
    assert set(prof) == set(orders.columns)
    n = orders.count()
    import pyspark.sql.functions as F

    for c in ["o_orderkey", "o_orderstatus"]:
        r = prof[c]
        assert r["n_rows"] == n and r["n_nulls"] == 0
        assert r["n_distinct"] == orders.select(c).distinct().count()
    assert prof["o_orderkey"]["min_num"] == float(
        orders.agg(F.min("o_orderkey")).collect()[0][0]
    )
    assert prof["o_orderstatus"]["min_str"] is not None
    assert prof["o_orderstatus"]["min_num"] is None
