"""Join co-location utilities: bucketed tables (shuffle-free repeated
joins) and salted joins (skew mitigation beyond AQE's runtime splitting).

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Two standing answers, both expressed through vanilla Spark
primitives so Catalyst keeps doing the planning:

- **Bucketing** pre-partitions a table ON DISK by hash(key) into a fixed
  bucket count recorded in the catalog. Two tables bucketed on the join
  key with the same bucket count sort-merge-join with ZERO exchanges — the
  shuffle was paid once at write time and amortizes over every subsequent
  join/aggregation on that key (`assert_no_shuffle_join` makes the claim
  checkable in tests and CI).

- **Salting** splits a hot key's rows across `salt` sub-keys on the big
  side and replicates only the small side's rows ×salt, turning one
  straggler partition into `salt` parallel ones. AQE's skew-join split
  handles moderate sort-merge skew at runtime; explicit salting still wins
  when one key dominates a *broadcast-ineligible* side or feeds a
  downstream groupBy on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed (+ optionally sorted) catalog table.
    `path` makes it an external table there (the warehouse dir is a static
    conf, so tests point each table at a temp location explicitly).

    Sorting within buckets additionally removes the per-task sort from
    later sort-merge joins (plan shows SortMergeJoin with neither Exchange
    nor Sort on that side)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. When both
    sides' bucket specs cover `on` with equal bucket counts, Catalyst
    plans this without any Exchange (verify with assert_no_shuffle_join)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the physical plan of `df` contains a SHUFFLE exchange —
    the machine-checkable form of 'this join is co-located'. Broadcast
    exchanges pass: replicating a small side is the other co-location
    strategy, not an all-to-all shuffle."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan:
        raise AssertionError(
            f"expected a shuffle-free plan but found a shuffle Exchange:\n{plan}"
        )


def key_skew_stats(df: DataFrame, key_cols: list[str], top: int = 10) -> DataFrame:
    """Skew diagnosis for a prospective shuffle key: the `top` heaviest key
    groups with their share of all rows and a skew factor (heaviest /
    mean). Run BEFORE picking a join/groupBy strategy at scale — a skew
    factor in the hundreds is the signal to salt (salted_join) or rely on
    AQE skew splitting; near 1 means a plain hash shuffle is fine.

    One combine-enabled groupBy; the global aggregates ride a window over
    the GROUPED frame (key-cardinality-scale, not row-scale)."""
    from pyspark.sql.window import Window

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy()
    return (
        counts.withColumn("total", F.sum("n_rows").over(w))
        .withColumn("n_keys", F.count(F.lit(1)).over(w))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("total"), 4).alias("row_share"),
            F.round(
                F.col("n_rows") / (F.col("total") / F.col("n_keys")), 2
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_col: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: `big` rows spread across `num_salts`
    sub-keys (deterministic hash of `salt_col`, so task retries re-derive
    the same salt), `small` rows replicated once per salt. Result is
    row-identical to big.join(small, on, how) for inner/left joins.

    Replication cost is |small| × num_salts — use when `small` is too big
    to broadcast but far smaller than `big`, and one key dominates `big`.
    """
    assert how in ("inner", "left"), "salted_join supports inner/left"
    salted_big = big.withColumn(
        "__salt__", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(num_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias("__salt__")
    salted_small = small.select("*", salts).withColumn(
        "__salt__", F.col("__salt__").cast("long")
    )
    return salted_big.join(salted_small, on + ["__salt__"], how).drop("__salt__")
