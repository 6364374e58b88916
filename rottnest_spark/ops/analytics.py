"""Aggregate analytics operators: multi-grain rollups, binned range joins,
corpus n-gram statistics, and grouped KPI summaries (exact + sketch paths).

These round out the query surface a training-data / observability user runs
next to the index queries (reference analog: the metadata aggregations in
`python/rottnest/table.py` are file-level rollups; here they are first-class
table operators).

Scale notes (100 TB):
- `time_rollup` is ONE shuffle: ROLLUP expands each row to its grouping sets
  map-side and partial-aggregates before the exchange, so the shuffle volume
  is bounded by the number of distinct (grain, key) groups, not by row count.
- `range_join_binned` turns an interval predicate into an equi-join on a bin
  key. A non-equi join would be a BroadcastNestedLoopJoin (every fact row
  tested against every dim row — quadratic); binning keeps it a hash join
  whose fan-out is range_width / bin_width per dim row.
- `group_kpis` (exact distinct + exact percentiles) holds each group's values
  on one reducer — correct at any scale but the per-group sort is the cost.
  `group_kpis_approx` swaps in mergeable sketches (HLL for distincts,
  t-digest-style percentile_approx) that partial-aggregate map-side; that is
  the 100 TB default, with the exact variant as the oracle-checkable path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rottnest_spark.core.smalldf import local_df


def time_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    grain: str = "day",
) -> DataFrame:
    """Hypertable-style rollup: (grain-bucket, key) aggregates PLUS per-bucket
    subtotals PLUS the grand total, in one pass via ROLLUP grouping sets.

    `lvl` is the grouping_id bitmask (0 = leaf, 1 = key rolled up,
    3 = grand total) so consumers can split the levels without NULL-sniffing.
    """
    bucket = F.date_trunc(grain, F.col(ts_col)).alias("bucket")
    return (
        df.select(bucket, F.col(key_col).alias("key"), F.col(value_col).alias("v"))
        .rollup("bucket", "key")
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("v"), 2).alias("total_value"),
        )
    )


def range_join_binned(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner join `fact` rows to the `dim` interval containing them:
    fact.value ∈ [dim.lo, dim.hi).

    Each dim interval explodes to the bins it covers; each fact row computes
    one bin; the interval predicate becomes an equi-join on `_bin` plus a
    residual filter that trims the boundary bins. Intervals may overlap (a
    fact row then matches every covering interval). Choose `bin_width` near
    the median interval width: fan-out per dim row is width/bin_width + 1.
    """
    binned_dim = dim.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)),
                F.floor(F.col(hi_col) / F.lit(bin_width)),
            )
        ),
    )
    binned_fact = fact.withColumn(
        "_bin", F.floor(F.col(value_col) / F.lit(bin_width))
    )
    keep = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return binned_fact.join(binned_dim, "_bin").filter(keep).drop("_bin")


def frequent_ngrams(
    df: DataFrame, col: str, n: int = 3, k: int = 20
) -> DataFrame:
    """Corpus-wide top-k token n-grams by occurrence count (whitespace
    tokenization, lowercased — same tokenizer as the dedup shinglers).

    groupBy gets map-side partial aggregation, so the shuffle carries one row
    per distinct gram per task, not per occurrence; the top-k is a TakeOrdered
    (no global sort materialization). Ties at the k boundary break on gram
    text so the result is deterministic across cluster sizes.
    """
    from rottnest_spark.core.tuning import tuned_for_lambda_explode

    docs = (
        tuned_for_lambda_explode(df)
        .select(F.split(F.lower(F.col(col)), " ").alias("tk"))
        .filter(F.size("tk") >= n)
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    # flat-position explode + codegen'd slice/concat projection (HOF
    # transform lambdas run interpreted and re-evaluate per element; see
    # textstats.repetition_signals for the measured comparison)
    grams = docs.select(
        "tk",
        F.explode(F.sequence(F.lit(1), F.size("tk") - F.lit(n - 1))).alias("i"),
    ).select(F.concat_ws(" ", F.slice(F.col("tk"), F.col("i"), n)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.desc("n_occ"), F.asc("gram"))
        .limit(k)
    )


def _exact_pct(value: str, p: float) -> Column:
    return F.round(F.percentile(F.col(value), F.lit(p)), 4)


def group_kpis(
    df: DataFrame, key_col: str, user_col: str, value_col: str
) -> DataFrame:
    """Per-key KPIs with EXACT distinct counts and EXACT continuous-
    interpolation percentiles (matches DuckDB quantile_cont — oracle path)."""
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(user_col)).alias("n_users"),
        _exact_pct(value_col, 0.5).alias("p50"),
        _exact_pct(value_col, 0.9).alias("p90"),
        _exact_pct(value_col, 0.99).alias("p99"),
        F.round(F.sum(value_col), 2).alias("total_value"),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel: how many users performed step[0], then step[1]
    strictly after it, then step[2] strictly after that, ...

    Each stage is min-over-filter: stage i keeps one row per user (the
    earliest qualifying timestamp), so the per-stage join is between two
    user-keyed aggregates that shrink monotonically — the shuffles are on
    the same key throughout and AQE coalesces them as the frontier narrows.
    Never collects per-user event lists (the classic sort-within-user
    funnel holds a whole user history per task; this holds one timestamp).
    """
    u = F.col(user_col)
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("_u"))
        .agg(F.min(ts_col).alias("_t"))
    )
    out = cur.agg(
        F.lit(0).cast("long").alias("step_idx"),
        F.lit(steps[0]).alias("step"),
        F.count(F.lit(1)).alias("n_users"),
    )
    for i, s in enumerate(steps[1:], 1):
        ev = df.filter(F.col(type_col) == s).select(
            u.alias("_u"), F.col(ts_col).alias("_ts")
        )
        cur = (
            ev.join(cur, "_u")
            .filter(F.col("_ts") > F.col("_t"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"))
        )
        out = out.unionAll(
            cur.agg(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    return out


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Day-grain cohort retention: users bucketed by first-active day;
    for each (cohort_day, day_offset) count the cohort members active
    that day.

    The activity set is pre-deduplicated to one row per (user, day) before
    the join, so the shuffle carries at most users × active-days rows, and
    both join sides are keyed on the user — one co-partitioned join, then
    a count over (cohort, offset) whose cardinality is days², not rows.
    """
    u = F.col(user_col)
    # day bucket as a midnight timestamp (not DATE): matches what DuckDB /
    # pandas round-trip losslessly, same convention as time_rollup
    day = F.date_trunc("day", F.col(ts_col)).alias("_day")
    act = df.select(u.alias("_u"), day).distinct()
    first = act.groupBy("_u").agg(F.min("_day").alias("cohort_day"))
    return (
        act.join(first, "_u")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def grouped_top_n(
    df: DataFrame, group_cols: list[str], ordering: list[Column], n: int
) -> DataFrame:
    """Top-n rows per group, scale-safe for few huge groups.

    A single `row_number` window sorts each group on ONE task — with 5
    groups and 100 TB that is 5 tasks doing all the work. Phase 1 instead
    takes a local top-n per (group, input-partition) — embarrassingly
    parallel, no shuffle — which is a superset of the global top-n; phase 2
    runs the real window over at most n × num_partitions rows per group.
    `ordering` must be a total order (include a tie-break column) for a
    deterministic result.
    """
    from pyspark.sql.window import Window

    w_local = Window.partitionBy(
        *group_cols, F.spark_partition_id()
    ).orderBy(*ordering)
    local = (
        df.withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
    w_global = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        local.withColumn("rnk", F.row_number().over(w_global))
        .filter(F.col("rnk") <= n)
    )


def value_histogram(
    df: DataFrame, value_col: str, bin_width: float
) -> DataFrame:
    """Fixed-width histogram: per-bin row count, sum, min, max. One
    map-side-combined groupBy; bin count = value range / width regardless
    of row count."""
    v = F.col(value_col)
    return (
        df.groupBy(F.floor(v / F.lit(bin_width)).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(v), 2).alias("sum_value"),
            F.round(F.min(v), 2).alias("min_value"),
            F.round(F.max(v), 2).alias("max_value"),
        )
        .withColumn("bin_lo", F.round(F.col("bin") * F.lit(bin_width), 2))
        .drop("bin")
    )


def time_gapfill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    grain: str = "day",
) -> DataFrame:
    """Hypertable-style gap-filled rollup: per-(grain-bucket, key) counts
    and sums with MISSING buckets materialized as zero rows — the
    time_bucket_gapfill operation (a chart over sparse events needs the
    zeros).

    Shape: aggregate first (bucket × key cardinality), derive the global
    [min, max] bucket range with a window over that AGGREGATE frame (one
    single-partition pass over bucket×key rows — aggregate-scale, never
    row-scale), then explode one `sequence(lo, hi, interval)` per key. No
    cross join: the dense axis and the final left join are both between
    aggregate-scale frames (broadcast-eligible)."""
    from pyspark.sql.window import Window

    bucket = F.date_trunc(grain, F.col(ts_col))
    agg = (
        df.select(bucket.alias("bucket"), F.col(key_col).alias("key"),
                  F.col(value_col).alias("v"))
        .groupBy("bucket", "key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("v"), 2).alias("total_value"),
        )
    )
    w = Window.partitionBy()  # global bounds; agg frame is tiny
    dense = (
        agg.select(
            "key",
            F.min("bucket").over(w).alias("lo"),
            F.max("bucket").over(w).alias("hi"),
        )
        .groupBy("key", "lo", "hi")
        .agg(F.lit(1))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {grain}"))
            ).alias("bucket"),
        )
    )
    return (
        dense.join(agg, ["bucket", "key"], "left")
        .select(
            "bucket",
            "key",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


def rolling_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    trailing: int = 7,
    z_thresh: float = 2.0,
    grain: str = "day",
) -> DataFrame:
    """Per-bucket totals with trailing-N moving sum/avg and a z-score
    anomaly flag (bucket flagged when it sits > z_thresh sample standard
    deviations from its own trailing window's mean).

    Shape: aggregate to grain buckets FIRST (one map-side-combined shuffle,
    bucket-cardinality output), then run the ROWS-frame window over the
    aggregate — the single-partition window pass touches days, never rows,
    same altitude rule as `time_gapfill`. The frame is ROWS (not RANGE) so
    the moving stats are over the N most recent *observed* buckets; compose
    with `time_gapfill` first when calendar-dense frames are needed.
    """
    from pyspark.sql.window import Window

    daily = (
        df.groupBy(F.date_trunc(grain, F.col(ts_col)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(value_col).alias("_tv"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(-(trailing - 1), 0)
    avg = F.avg("_tv").over(w)
    sd = F.stddev_samp("_tv").over(w)
    return (
        daily.select(
            "bucket",
            "n_rows",
            F.round("_tv", 2).alias("total_value"),
            F.round(F.sum("_tv").over(w), 2).alias("moving_sum"),
            F.round(avg, 2).alias("moving_avg"),
            F.when(
                sd.isNotNull()
                & (sd > 0)
                & (F.abs(F.col("_tv") - avg) > F.lit(z_thresh) * sd),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("is_anomaly"),
        )
    )


def group_kpis_approx(
    df: DataFrame,
    key_col: str,
    user_col: str,
    value_col: str,
    rsd: float = 0.02,
    pct_accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based KPIs — the 100 TB path. approx_count_distinct is an HLL++
    (mergeable, map-side combined, error ~rsd); percentile_approx is a
    mergeable quantile sketch with rank error 1/pct_accuracy. Same schema as
    `group_kpis` so the two are drop-in interchangeable."""
    pcts = F.percentile_approx(
        F.col(value_col), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
        F.lit(pct_accuracy),
    )
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(F.col(user_col), rsd).alias("n_users"),
        F.round(pcts[0], 4).alias("p50"),
        F.round(pcts[1], 4).alias("p90"),
        F.round(pcts[2], 4).alias("p99"),
        F.round(F.sum(value_col), 2).alias("total_value"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Data-quality profile, one row per column: n_rows, n_nulls, EXACT
    n_distinct, and min/max (numeric columns as doubles, string columns as
    strings — other types report counts only).

    The non-distinct stats (rows, nulls, typed min/max) come from ONE
    aggregation pass; each column's EXACT distinct count runs as its own
    partial-aggregated job, overlapped through a small thread pool
    (guide §2.6). That replaces the former single multi-count_distinct
    agg, whose Expand operator multiplied every scanned row by
    (n_cols + 1) and shuffled the expanded rows (measured 4.6x slower).
    Total bytes read are unchanged at any scale: parquet is columnar, so
    each distinct job's pruned scan reads only its own column — N jobs
    together read each column exactly once, same as the single pass.
    At 100 TB swap exact distincts for the HLL summary index
    (`ParquetLake.distinct_estimate`) — this operator is the exact,
    oracle-checkable profile."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql.types import NumericType, StringType

    cols = columns or df.columns
    spark = df.sparkSession
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
        ]
        if isinstance(dt, NumericType):
            # Fixed 4-decimal precision so the value survives any
            # float-formatting normalization in downstream hashers.
            aggs += [
                F.round(F.min(F.col(c)).cast("double"), 4).alias(f"{c}__minn"),
                F.round(F.max(F.col(c)).cast("double"), 4).alias(f"{c}__maxn"),
            ]
        elif isinstance(dt, StringType):
            aggs += [
                F.min(F.col(c)).alias(f"{c}__mins"),
                F.max(F.col(c)).alias(f"{c}__maxs"),
            ]

    def _nd(c: str) -> int:
        return int(
            df.agg(F.count_distinct(F.col(c)).alias("nd")).collect()[0][0]
        )

    # 3-4 jobs in flight fills stage tails without starving the base agg
    with ThreadPoolExecutor(max_workers=min(4, len(cols) or 1)) as pool:
        nd_futs = {c: pool.submit(_nd, c) for c in cols}
        row = df.agg(*aggs).collect()[0]
        nds = {c: f.result() for c, f in nd_futs.items()}
    out = []
    for c in cols:
        out.append(
            (
                c,
                int(row[f"{c}__rows"]),
                int(row[f"{c}__nulls"] or 0),
                nds[c],
                row[f"{c}__minn"] if f"{c}__minn" in row.asDict() else None,
                row[f"{c}__maxn"] if f"{c}__maxn" in row.asDict() else None,
                row[f"{c}__mins"] if f"{c}__mins" in row.asDict() else None,
                row[f"{c}__maxs"] if f"{c}__maxs" in row.asDict() else None,
            )
        )
    return local_df(
        spark,
        out,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_num double, max_num double, min_str string, max_str string",
    )


MAD_SIGMA = 1.4826  # consistency constant: MAD -> std-dev equivalent


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z: float = 3.5,
) -> DataFrame:
    """Per-group robust z-score anomaly detection: flag rows where
    |value − median| > z · 1.4826 · MAD (median absolute deviation).
    Median/MAD instead of mean/std so the detector isn't poisoned by the
    outliers it's hunting — the standard data-quality screen for metric
    monitoring and training-data filtering.

    Plan: two EXACT median aggregations over the small group domain (the
    shuffle key is `group_col`, partial aggregation map-side) with the
    per-group scalars broadcast back onto the fact — the fact table itself
    is never shuffled. Adds `score` = the robust z-score.
    """
    med = df.groupBy(F.col(group_col).alias("__g__")).agg(
        F.median(value_col).alias("__med__")
    )
    dev = df.join(
        F.broadcast(med), F.col(group_col) == F.col("__g__")
    ).withColumn("__adev__", F.abs(F.col(value_col) - F.col("__med__")))
    mad = dev.groupBy(F.col("__g__").alias("__g2__")).agg(
        F.median("__adev__").alias("__mad__")
    )
    return (
        dev.join(F.broadcast(mad), F.col("__g__") == F.col("__g2__"))
        .filter(F.col("__adev__") > F.lit(z) * F.lit(MAD_SIGMA) * F.col("__mad__"))
        .withColumn(
            "score",
            F.round(F.col("__adev__") / (F.lit(MAD_SIGMA) * F.col("__mad__")), 4),
        )
        .drop("__g__", "__g2__", "__med__", "__mad__", "__adev__")
    )
