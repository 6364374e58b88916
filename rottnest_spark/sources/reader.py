"""Lake parquet reader.

Spark's vectorized reader rejects TIMESTAMP(NANOS) parquet columns
(PARQUET_TYPE_ILLEGAL) — common in pandas/arrow-written lakes (e.g. the
events fixture). We read them via the legacy nanos-as-long session flag and
rebuild a microsecond TimestampType column (`div 1000` truncation — the same
µs truncation DuckDB applies to nanosecond parquet, keeping oracles aligned).

Only a footer peek of ONE file decides whether conversion applies: the lake
invariant (append-only, uniform schema) matches the reference's
schema-on-read stance (column located by name, src/formats/parquet.rs:271-280).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"


def nanos_ts_columns(file: str) -> list[str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.ParquetFile(file).schema_arrow
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def read_parquet(
    spark: SparkSession, files: list[str], columns: list[str] | None = None
) -> DataFrame:
    """spark.read.parquet with transparent nanosecond-timestamp handling.

    NOTE: truncation (not rounding) to µs; pre-1970 nanos would truncate
    toward zero instead of flooring — acceptable for log/event data.
    """
    ns_cols = nanos_ts_columns(files[0])
    if ns_cols:
        spark.conf.set(_NANOS_FLAG, "true")
    df = spark.read.parquet(*files)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if columns:
        df = df.select(*columns)
    return df
