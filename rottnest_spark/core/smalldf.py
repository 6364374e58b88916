"""Driver-local DataFrame construction without the default-parallelism tax.

`spark.createDataFrame(rows, schema)` parallelizes the rows into
defaultParallelism pickled slices. Every downstream task that consumes
several of those slices pays one Python-worker round trip PER SLICE —
measured on local[32]: a 31-row `coalesce(1).write.parquet` costs 3.9 s
(32 sequential worker round trips inside the single coalesced task) vs
0.3 s when the same rows are parallelized into one slice. Index builds
write several such tiny driver-side tables (centroids, PQ codebooks), so
this tax dominated the vector build entries (guide §4: control how data
crosses the JVM↔Python boundary).

`local_df` keeps tiny lists in ONE slice and scales slices up only for
genuinely large lists. Schemas must be explicit (DDL string or StructType)
— schema inference over an RDD would itself run a Spark job.

NOTE (r11 ADVICE): routing rows through sc.parallelize skips
createDataFrame's eager driver-side type verification — a row/schema
type mismatch surfaces as an executor-side task failure at first action
time, not at construction. Accepted trade-off: callers here build rows
from already-typed collects or fixture literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: rows per slice before adding parallelism
_ROWS_PER_SLICE = 5_000


def local_df(spark: SparkSession, rows, schema, slices: int | None = None) -> DataFrame:
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    if slices is None:
        slices = max(
            1,
            min(
                (len(rows) - 1) // _ROWS_PER_SLICE + 1,
                spark.sparkContext.defaultParallelism,
            ),
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )
