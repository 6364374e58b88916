"""SparkSession factory tuned for this engine.

Local testing runs on local[N] but every config here is chosen for cluster
scale: AQE handles skew/coalesce at runtime, Arrow makes the few pandas-UDF
paths batch-vectorized, and shuffle partitions default to a value that AQE
can coalesce down rather than a value that starves a big cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rottnest-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # Ensure local-mode Python workers can import this package even when the
    # driver runs from another cwd (workers resolve modules via PYTHONPATH).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
        )

    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # See core/tuning.py: InferFiltersFromGenerate re-evaluates
        # lambda-built explode inputs per element access at the scan
        # (O(len²)); every explode here guards emptiness on the array's
        # inputs explicitly, so the rule is pure overhead.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    # opt-in JVM flag pinning (bench sets this: fixed initial heap + G1
    # pause target turn multi-second full-GC pauses — the dominant bench
    # jitter term — into bounded incremental ones). -Xmx stays owned by
    # spark.driver.memory; Spark rejects it here anyway. Only applied when
    # set — an empty extraJavaOptions would still override a user's own.
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    return builder.getOrCreate()
