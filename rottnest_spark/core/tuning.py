"""Session-level optimizer tuning shared by every operator module.

`InferFiltersFromGenerate` (Spark 4.1) adds a `size(arr) > 0 AND
isnotnull(arr)` filter under every explode(). For arrays built by
higher-order-function lambdas (shingles, token n-grams, span hashes) that
inferred filter is pushed below the projection that materializes the
array's inputs, inlining the full lambda with its source expressions
repeated PER ELEMENT ACCESS — an O(len²) re-evaluation at the scan.
Measured on the 5k-doc sf0.1 documents table: exploding 3-gram shingles
takes 12.3 s with the rule and 0.8 s without it.

Every explode in this package sits above an explicit emptiness guard on
the array's INPUTS (e.g. `size(tokens) >= n`), so the inferred filter is
redundant here, and excluding an optimizer rule can never change results —
it only prunes a plan rewrite. The exclusion is appended (comma list), so
caller-set exclusions survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_INFER_FROM_GENERATE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)
_CONF = "spark.sql.optimizer.excludedRules"


def exclude_generate_filter_inference(spark) -> None:
    """Idempotently append InferFiltersFromGenerate to the session's
    excluded optimizer rules. Safe on any session (the driver's included):
    runtime conf, consulted at each query's optimization."""
    try:
        current = spark.conf.get(_CONF, None)
    except Exception:
        current = None
    if current:
        if _INFER_FROM_GENERATE in current:
            return
        spark.conf.set(_CONF, f"{current},{_INFER_FROM_GENERATE}")
    else:
        spark.conf.set(_CONF, _INFER_FROM_GENERATE)


def cluster_for_hive_write(df: DataFrame, pcols: list[str]) -> DataFrame:
    """Cluster rows by the hive partition-dir columns before a
    `partitionBy` staged write — the Iceberg `write.distribution-mode=hash`
    discipline (guide §6). Without it every upstream slice opens a writer
    for every partition dir it touches, so a staged write lands
    O(slices x dirs) tiny files, and every later step (scans, manifest
    entries, footer probes, renames, DV packs) pays per file. With it a
    dir's rows are contiguous, so the stage writes ~one file per dir.

    The AQE REBALANCE hint (not `repartition(cols)`) is deliberate:
    rebalance both coalesces small output partitions AND SPLITS a hot
    partition dir across tasks at `advisoryPartitionSizeInBytes`, so a
    skewed dir still parallelizes at 100 TB. Without AQE it degrades to a
    plain hash shuffle — still one file per dir. No-op on empty pcols."""
    if not pcols:
        return df
    return df.hint("rebalance", *pcols)


def tuned_for_lambda_explode(df: DataFrame) -> DataFrame:
    """Mark a DataFrame whose plan explodes lambda-built arrays: applies the
    session-level rule exclusion (see module docstring) and returns the
    frame unchanged — call at the top of any op that explodes a
    transform()-built array."""
    exclude_generate_filter_inference(df.sparkSession)
    return df
